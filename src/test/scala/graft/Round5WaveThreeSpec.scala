package graft

import org.apache.spark.sql.functions._

/** Round-5 third wave: streaming EWMA twin, gaps-and-islands, the
  * seasonal profile, Gini diversity, and the day-banded interval
  * overlap join. Exactness is the driver's DuckDB oracle (the EWMA
  * twin shares the batch oracle verbatim); these pin twin equality,
  * structural invariants, and join shape. */
class Round5WaveThreeSpec extends SparkSpec {

  test("stream ewma == batch ewma row for row (shared oracle, shared bits)") {
    val b = run("q_ts_ewma")
    val st = run("q_stream_ewma")
    val cols = Seq("user_id", "event_id", "ts", "value", "ewma").map(col)
    assert(st.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
      b.select(cols: _*).exceptAll(st.select(cols: _*)).isEmpty,
      "streaming ring-state EWMA must equal the batch lag-chain exactly")
  }

  test("gap islands: disjoint per user, len == end - start + 1") {
    val rows = run("q_win_gap_islands").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s0, e0, len) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(len == e0 - s0 + 1, "an island is a dense integer run")
      assert(len >= 2, "declared minimum island length")
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, is) =>
      val sorted = is.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) + 1 < b.getLong(1),
            "islands must be separated by a genuine gap")
        case _ =>
      }
    }
  }

  test("seasonal: residual == value - hod_mean; exactly top-20 by |residual|") {
    val rows = run("q_ts_seasonal").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val v = r.getDouble(r.fieldIndex("value"))
      val m = r.getDouble(r.fieldIndex("hod_mean"))
      val res = r.getDouble(r.fieldIndex("residual"))
      assert(math.abs(v - m - res) < 1e-9)
      assert(r.getInt(r.fieldIndex("hod")) >= 0 &&
        r.getInt(r.fieldIndex("hod")) <= 23)
    }
    val mags = rows.map(r => math.abs(r.getDouble(r.fieldIndex("residual"))))
    assert(mags.toSeq == mags.toSeq.sorted.reverse, "ordered by |residual| desc")
  }

  test("gini: in [0, 1 - 1/k]; zero for single-type users") {
    val rows = run("q_agg_gini").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, g) = (r.getLong(r.fieldIndex("n_types")),
        r.getDouble(r.fieldIndex("gini")))
      assert(g >= 0.0 && g <= 1.0 - 1.0 / k + 1e-12,
        s"gini $g outside [0, 1-1/$k]")
      if (k == 1) assert(g == 0.0, "one type => zero diversity")
    }
  }

  test("interval overlap: banded equi-join (no nested loop), overlap bounds hold") {
    val df = run("q_join_interval_overlap")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join must band on the day key:\n${plan.take(600)}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // same-day intervals always overlap by construction (both contain
    // events of that day), so every emitted overlap is nonnegative and
    // bounded by a day of microseconds
    rows.foreach { r =>
      val o = r.getLong(r.fieldIndex("overlap_us"))
      assert(o >= 0 && o < 86400L * 1000000L)
    }
  }
}
