package graft

import org.apache.spark.sql.functions._

/** Round-5 thirty-fifth wave: semi-hard triplets, seasonality
  * strength, term burstiness. */
class Round5WaveThirtyFiveSpec extends SparkSpec {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("triplets: positive nearest, negative hardest-below-positive") {
    val rows = run("q_sim_triplet_semihard").collect()
    assert(rows.length == 10)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    rows.foreach { r =>
      val aid = r.getLong(r.fieldIndex("aid"))
      val (_, ae, al) = vecs.find(_._1 == aid).get
      val others = vecs.filter(_._1 != aid)
        .map(v => (v._1, cos(v._2, ae), v._3))
      val pos = others.filter(_._3 == al)
        .minBy(x => (-x._2, x._1))
      assert(r.getLong(r.fieldIndex("pos_id")) == pos._1, s"anchor $aid")
      assert(r.getDouble(r.fieldIndex("sim_pos")) == pos._2)
      val negs = others.filter(x => x._3 != al && x._2 < pos._2)
      if (negs.nonEmpty) {
        val neg = negs.minBy(x => (-x._2, x._1))
        assert(r.getLong(r.fieldIndex("neg_id")) == neg._1)
        assert(r.getDouble(r.fieldIndex("sim_neg")) == neg._2)
        // the semi-hard invariant
        assert(r.getDouble(r.fieldIndex("sim_neg")) <
          r.getDouble(r.fieldIndex("sim_pos")))
      } else assert(r.isNullAt(r.fieldIndex("neg_id")))
    }
  }

  test("seasonal strength: SS decomposition matches a recount") {
    val rows = run("q_ts_seasonal_strength").collect()
    assert(rows.length == 5)
    val ev = Tables.events(spark, sf).select("event_type", "ts", "value")
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime / 3600000L,
        math.floor(r.getDouble(2)).toLong))
    rows.foreach { r =>
      val t = r.getString(0)
      val grid = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (h, xs) => (h, xs.map(_._3).sum / xs.length) }
      val prof = grid.groupBy(_._1 % 24)
        .map { case (hod, xs) => hod -> xs.map(_._2).sum / xs.length }
      val m = grid.map(_._2).sum / grid.length
      val ssTot = grid.map(g => (g._2 - m) * (g._2 - m)).sum
      val ssRes = grid.map(g =>
        (g._2 - prof(g._1 % 24)) * (g._2 - prof(g._1 % 24))).sum
      assert(r.getLong(r.fieldIndex("n")) == grid.length.toLong)
      assert(r.getLong(r.fieldIndex("ss_tot")) == ssTot)
      assert(r.getLong(r.fieldIndex("ss_res")) == ssRes)
      assert(r.getLong(r.fieldIndex("strength_micro")) ==
        math.max(0L, 1000000L - 1000000L * ssRes / ssTot))
    }
  }

  test("burstiness: dispersion matches a per-doc-count recount") {
    val rows = run("q_text_burstiness").collect()
    assert(rows.length == 20)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val nd = docs.length.toLong
    val perDoc = docs.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity)
        .map { case (w, xs) => (w, id, xs.length.toLong) }
    }
    val byTerm = perDoc.groupBy(_._1)
    rows.foreach { r =>
      val w = r.getString(0)
      val mine = byTerm(w)
      val tot = mine.map(_._3).sum
      val s2 = mine.map(x => x._3 * x._3).sum
      assert(r.getLong(r.fieldIndex("tot")) == tot, w)
      assert(r.getLong(r.fieldIndex("df")) == mine.length.toLong)
      val d = 1000000L * (nd * s2 - tot * tot) / (nd * tot)
      assert(r.getLong(r.fieldIndex("d_micro")) == d)
      assert(r.getBoolean(r.fieldIndex("bursty")) == (d > 1000000L))
    }
  }
}
