package graft

import org.apache.spark.sql.functions._

/** Round-5 thirty-second wave: calibration table, powers-of-two
  * histogram, RSI-14. */
class Round5WaveThirtyTwoSpec extends SparkSpec {

  test("calibration: bin stats match a recount") {
    val rows = run("q_eval_calibration").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("n_chars", "lang")
      .collect().map { r =>
        val score = math.min(1000000L, 1000000L * r.getLong(0) / 1000L)
        (math.min(9L, score / 100000L), score,
          if (r.getString(1) == "en") 1L else 0L)
      }
    assert(rows.map(_.getLong(0)).toSet == docs.map(_._1).toSet)
    rows.foreach { r =>
      val bin = r.getLong(0)
      val mine = docs.filter(_._1 == bin)
      val n = mine.length.toLong
      assert(r.getLong(r.fieldIndex("n")) == n)
      assert(r.getLong(r.fieldIndex("mean_score_micro")) ==
        mine.map(_._2).sum / n)
      assert(r.getLong(r.fieldIndex("pos_rate_micro")) ==
        1000000L * mine.map(_._3).sum / n)
      assert(r.getLong(r.fieldIndex("gap_micro")) ==
        mine.map(_._2).sum / n - 1000000L * mine.map(_._3).sum / n)
    }
  }

  test("log histogram: bit-length buckets partition the domain exactly") {
    val rows = run("q_agg_log_histogram").collect()
      .sortBy(_.getLong(0))
    val us = Tables.events(spark, sf).select("value").collect()
      .map(r => math.floor(r.getDouble(0)).toLong)
    def bucketOf(u: Long): Long =
      if (u == 0) 0L else java.lang.Long.toBinaryString(u).length.toLong
    val byB = us.groupBy(bucketOf)
    assert(rows.length == byB.size)
    var cum = 0L
    rows.foreach { r =>
      val b = r.getLong(0)
      val mine = byB(b)
      assert(r.getLong(r.fieldIndex("n")) == mine.length.toLong)
      assert(r.getLong(r.fieldIndex("min_u")) == mine.min)
      assert(r.getLong(r.fieldIndex("max_u")) == mine.max)
      // range containment: [2^(b-1), 2^b) for b >= 1
      if (b >= 1) {
        assert(mine.min >= (1L << (b - 1).toInt) || b == 1)
        assert(mine.max < (1L << b.toInt))
      }
      cum += mine.length
      assert(r.getLong(r.fieldIndex("cum_n")) == cum)
      assert(r.getLong(r.fieldIndex("cum_share_micro")) ==
        1000000L * cum / us.length)
    }
  }

  test("rsi: trailing gain share matches a recount") {
    val rows = run("q_ts_rsi").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select("event_type", "ts", "value")
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime / 86400000L,
        math.floor(r.getDouble(2)).toLong))
    val grids = ev.groupBy(_._1).map { case (t, xs) =>
      t -> xs.groupBy(_._2).toSeq
        .map { case (d, ys) => (d, ys.map(_._3).sum) }.sortBy(_._1)
    }
    val expected = grids.toSeq.flatMap { case (t, g) =>
      val deltas = g.sliding(2).collect {
        case Seq((_, a), (d, b)) => (d, b - a)
      }.toSeq
      deltas.zipWithIndex.drop(13).map { case ((day, _), i) =>
        val win = deltas.slice(i - 13, i + 1)
        val sg = win.map(x => math.max(x._2, 0L)).sum
        val sl = win.map(x => math.max(-x._2, 0L)).sum
        ((t, day), (sg, sl,
          if (sg + sl > 0) Some(1000000L * sg / (sg + sl)) else None))
      }
    }.toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getString(0), r.getTimestamp(1).getTime / 86400000L)
      val (sg, sl, rsi) = expected(key)
      assert(r.getLong(r.fieldIndex("sg")) == sg, key)
      assert(r.getLong(r.fieldIndex("sl")) == sl, key)
      rsi match {
        case Some(v) => assert(r.getLong(r.fieldIndex("rsi_micro")) == v)
        case None => assert(r.isNullAt(r.fieldIndex("rsi_micro")))
      }
    }
  }
}
