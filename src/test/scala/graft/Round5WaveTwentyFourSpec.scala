package graft

import org.apache.spark.sql.functions._

/** Round-5 twenty-fourth wave: RFM segmentation, changepoint
  * detection, RAKE keyword extraction. */
class Round5WaveTwentyFourSpec extends SparkSpec {

  private def ntile5(ordered: Seq[Long]): Map[Long, Long] = {
    // standard SQL ntile: first (n mod 5) buckets get one extra row
    val n = ordered.length
    val base = n / 5; val extra = n % 5
    ordered.zipWithIndex.map { case (k, i) =>
      val cut = (base + 1) * extra
      val b = if (i < cut) i / (base + 1) + 1
              else (i - cut) / base + extra + 1
      k -> b.toLong
    }.toMap
  }

  test("rfm: quintiles match a manual ntile recount") {
    val rows = run("q_win_rfm").collect()
    def epochOf(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime =>
        d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case i: java.time.Instant => i.toEpochMilli
    }
    val o = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0), epochOf(r.get(1)),
        math.floor(r.getDouble(2)).toLong))
    val agg = o.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.map(_._2).max, xs.length.toLong, xs.map(_._3).sum))
    }
    val rQ = ntile5(agg.toSeq.sortBy(x => (x._2._1, x._1)).map(_._1))
    val fQ = ntile5(agg.toSeq.sortBy(x => (x._2._2, x._1)).map(_._1))
    val mQ = ntile5(agg.toSeq.sortBy(x => (x._2._3, x._1)).map(_._1))
    assert(rows.length == agg.size)
    rows.foreach { r =>
      val k = r.getLong(r.fieldIndex("c_custkey"))
      assert(r.getLong(r.fieldIndex("frequency")) == agg(k)._2)
      assert(r.getLong(r.fieldIndex("monetary_unit")) == agg(k)._3)
      assert(r.getLong(r.fieldIndex("r_q")) == rQ(k), s"r_q $k")
      assert(r.getLong(r.fieldIndex("f_q")) == fQ(k), s"f_q $k")
      assert(r.getLong(r.fieldIndex("m_q")) == mQ(k), s"m_q $k")
      assert(r.getLong(r.fieldIndex("rfm_code")) ==
        100 * rQ(k) + 10 * fQ(k) + mQ(k))
    }
  }

  test("changepoint: argmax matches a brute scan over every split") {
    val rows = run("q_ts_changepoint").collect()
    val ev = Tables.events(spark, sf)
      .select("event_type", "ts", "value").collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).getTime / 3600000L,
        math.floor(r.getDouble(2)).toLong))
    val types = ev.map(_._1).distinct
    assert(rows.length == types.length)
    rows.foreach { r =>
      val t = r.getString(r.fieldIndex("event_type"))
      val grid = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (h, xs) => (h, xs.map(_._3).sum / xs.length) }
        .sortBy(_._1)
      val n = grid.length.toLong
      val sTot = grid.map(_._2).sum
      var best = (-1L, Long.MaxValue) // (score, hour) — earliest wins
      var s1 = 0L
      grid.zipWithIndex.dropRight(1).foreach { case ((h, hm), idx) =>
        val i = idx + 1L
        s1 += hm
        val d = s1 * (n - i) - (sTot - s1) * i
        val score = d * d / (i * (n - i))
        if (score > best._1) best = (score, h)
      }
      assert(r.getLong(r.fieldIndex("score")) == best._1, t)
      assert(r.getTimestamp(r.fieldIndex("split_hour")).getTime
        / 3600000L == best._2, t)
      assert(r.getLong(r.fieldIndex("n1"))
        + r.getLong(r.fieldIndex("n2")) == n, t)
    }
  }

  test("rake: degree/freq scores match a recount") {
    val stop = Set("a", "the", "of", "and", "in", "to", "is")
    val rows = run("q_text_rake").collect()
    assert(rows.length == 15)
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val phrases = docs.flatMap { t =>
      // split token stream on stopwords into maximal runs
      val words = t.split(" ", -1).toSeq
      val runs = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      words.foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) { runs += cur.toSeq; cur.clear() } }
        else cur += w
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs
    }
    val freq = phrases.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val degree = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val expected = freq.keys.toSeq
      .map(w => (w, freq(w), degree(w), 1000000L * degree(w) / freq(w)))
      .sortBy(x => (-x._4, x._1)).take(15)
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq
    assert(got == expected)
  }
}
