package graft

import org.apache.spark.sql.functions._

/** Round-5 thirty-ninth wave: SAX motifs, pseudonymization contract,
  * unpivot. */
class Round5WaveThirtyNineSpec extends SparkSpec {

  test("motif: top words match a symbolization recount") {
    val rows = run("q_ts_motif").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select("event_type", "ts", "value")
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime / 3600000L,
        math.floor(r.getDouble(2)).toLong))
    rows.groupBy(_.getString(0)).foreach { case (t, got) =>
      val grid = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (h, xs) => (h, xs.map(_._3).sum / xs.length) }
        .sortBy(_._1)
      val syms = grid.zip(grid.tail).map { case ((_, a), (_, b)) =>
        val d = b - a
        if (d > 2) "u" else if (d < -2) "d" else "f"
      }
      val words = syms.sliding(4).filter(_.length == 4)
        .map(_.mkString).toSeq
      val top = words.groupBy(identity)
        .map { case (w, xs) => (w, xs.length.toLong) }.toSeq
        .sortBy(x => (-x._2, x._1)).take(3)
      val gotSeq = got.sortBy(_.getInt(got.head.fieldIndex("rk")))
        .map(r => (r.getString(r.fieldIndex("motif")),
          r.getLong(r.fieldIndex("n")))).toSeq
      assert(gotSeq == top, t)
    }
  }

  test("pseudonymize: both contract flags hold and counts are honest") {
    val rows = run("q_priv_pseudonymize").collect()
    assert(rows.length == 5)
    val ev = Tables.events(spark, sf).select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val t = r.getString(0)
      val users = ev.filter(_._1 == t).map(_._2).distinct
      assert(r.getLong(r.fieldIndex("n_users")) == users.length.toLong)
      assert(r.getBoolean(r.fieldIndex("cardinality_preserved")))
      assert(r.getBoolean(r.fieldIndex("mapping_deterministic")))
      assert(r.getLong(r.fieldIndex("n_tokens")) ==
        r.getLong(r.fieldIndex("n_users")))
    }
  }

  test("unpivot: long form carries exactly the wide table's cells") {
    val rows = run("q_agg_unpivot").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 15) // 5 segments x 3 metrics
    assert(rows.map(_._2).distinct.sorted.toSeq ==
      Seq("cents", "n_customers", "n_orders"))
    // recount one metric end-to-end
    val o = Tables.orders(spark, sf).select("o_custkey").collect()
      .map(_.getLong(0))
    val seg = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = o.map(seg).groupBy(identity)
      .map { case (sg, xs) => sg -> xs.length.toLong }
    rows.filter(_._2 == "n_orders").foreach { case (sg, _, v) =>
      assert(counts(sg) == v, sg)
    }
  }
}
