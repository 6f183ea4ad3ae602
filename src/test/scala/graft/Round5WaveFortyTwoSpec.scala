package graft

import org.apache.spark.sql.functions._

/** Round-5 forty-second wave: interval union and peak concurrency. */
class Round5WaveFortyTwoSpec extends SparkSpec {

  private def intervals(): Map[String, Seq[(Long, Long)]] =
    Tables.events(spark, sf).select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000L))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.map(x => (x._2, x._2 + 1800L)).sortBy(identity).toSeq
      }

  test("interval merge: union length matches a sweep recount") {
    val rows = run("q_win_interval_merge").collect()
    assert(rows.length == 5)
    val iv = intervals()
    rows.foreach { r =>
      val t = r.getString(0)
      val xs = iv(t)
      // classic merge sweep
      var blocks = List.empty[(Long, Long)]
      xs.foreach { case (s, e) =>
        blocks match {
          case (bs, be) :: rest if s <= be =>
            blocks = (bs, math.max(be, e)) :: rest
          case _ => blocks = (s, e) :: blocks
        }
      }
      assert(r.getLong(r.fieldIndex("n_intervals")) == xs.length.toLong)
      assert(r.getLong(r.fieldIndex("n_merged")) == blocks.length.toLong)
      assert(r.getLong(r.fieldIndex("covered_seconds")) ==
        blocks.map(b => b._2 - b._1).sum, t)
    }
  }

  test("concurrency: peak matches the endpoint-sweep recount") {
    val rows = run("q_win_concurrency").collect()
    assert(rows.length == 5)
    val iv = intervals()
    rows.foreach { r =>
      val t = r.getString(0)
      // endpoint sweep, ends before starts at equal instants
      val pts = iv(t).flatMap { case (s, e) =>
        Seq((s, 1L, 1L), (e, -1L, 0L))
      }.sortBy(p => (p._1, p._3))
      var open = 0L; var peak = 0L; var firstPeak = -1L
      // peak must be computed in one pass, then first time re-scanned
      val opens = pts.map { p => open += p._2; (p._1, open) }
      peak = opens.map(_._2).max
      firstPeak = opens.find(_._2 == peak).get._1
      assert(r.getLong(r.fieldIndex("peak_concurrency")) == peak, t)
      assert(r.getLong(r.fieldIndex("first_peak_epoch")) == firstPeak)
      assert(peak >= 1L)
    }
  }
}
