package graft

import org.apache.spark.sql.functions._

/** Round-6 fourth wave: FD audit and sweep-line peak concurrency. */
class Round6WaveFourSpec extends SparkSpec {

  test("fd audit: the key FD holds, fan-outs recount") {
    val rows = run("q_dq_fd_audit").collect()
    assert(rows.length == 4)
    val m = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // o_orderkey is a key: the FD must hold with fan-out exactly 1
    val key = m("o_orderkey->o_custkey")
    assert(key._4 && key._2 == 0L && key._3 == 1L)
    assert(key._1 == Tables.orders(spark, sf).count())
    // recount one non-key candidate
    val cand = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("nd"))
      .collect().map(_.getLong(1))
    val got = m("l_orderkey->l_suppkey")
    assert(got._1 == cand.length)
    assert(got._2 == cand.count(_ > 1))
    assert(got._3 == cand.max)
    assert(got._4 == (cand.count(_ > 1) == 0))
  }

  test("concurrency: peak recounts against a scala sweep line") {
    val rows = run("q_ts_concurrency").collect()
    assert(rows.nonEmpty)
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    rows.foreach { r =>
      val secs = byType(r.getString(0)).map(_._2)
      val deltas = (secs.map(s => (s, 1L)) ++ secs.map(s => (s + 3600L, -1L)))
        .sortBy(identity) // (t asc, d asc): ends close before starts
      var live = 0L; var peak = 0L; var peakAt = Long.MaxValue
      deltas.foreach { case (t, d) =>
        live += d
        if (live > peak) { peak = live; peakAt = t }
      }
      assert(r.getLong(1) == peak, s"${r.getString(0)} peak")
      assert(r.getLong(2) == peakAt, s"${r.getString(0)} peak time")
      // peak can never exceed the type's event count
      assert(peak <= secs.length)
    }
  }
}
