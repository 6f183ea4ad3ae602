package graft

/** Round-5 fifth wave: collocations, audio segmentation, OLS fit,
  * lag-1 autocorrelation. Exactness is the DuckDB oracle; these pin
  * the statistical invariants. */
class Round5WaveFiveSpec extends SparkSpec {

  test("collocations: positive lift, support gate respected, ordered") {
    val rows = run("q_text_collocations").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("cab")) >= 5, "min-support gate")
      assert(r.getDouble(r.fieldIndex("lift")) > 0)
    }
    val lifts = rows.map(_.getDouble(rows.head.fieldIndex("lift")))
    assert(lifts.toSeq == lifts.toSeq.sorted.reverse)
  }

  test("audio segments: dense runs of >= 2 low-energy frames") {
    val rows = run("q_mm_audio_segments").collect()
    assert(rows.nonEmpty, "threshold must populate the low class")
    rows.foreach { r =>
      val (s0, e0, len) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(len == e0 - s0 + 1, "a segment is a dense frame run")
      assert(len >= 2)
    }
  }

  test("ols: near-zero slope on independent fixture columns; finite intercept") {
    val rows = run("q_agg_ols_fit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val slope = r.getDouble(r.fieldIndex("slope_cents"))
      val icept = r.getDouble(r.fieldIndex("intercept_cents"))
      assert(!slope.isNaN && !icept.isNaN)
      // price and quantity are drawn independently: slope far from 0
      // means broken moment assembly (price cents are ~5e6 scale;
      // a 1-qty step should move the fit < 1% of that)
      assert(math.abs(slope) < 50000, s"suspicious slope $slope")
      assert(icept > 0, "mean price is positive")
    }
  }

  test("autocorr: |r| <= 1, n >= 3, defined for every active series") {
    val rows = run("q_ts_autocorr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n")) >= 3)
      val x = r.getDouble(r.fieldIndex("r_lag1"))
      assert(x >= -1.0 - 1e-12 && x <= 1.0 + 1e-12, s"r out of range: $x")
    }
  }
}
