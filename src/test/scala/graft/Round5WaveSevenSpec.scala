package graft

/** Round-5 seventh wave: embedding standardization, centroid distance
  * matrix, weighted median, MinHash estimator error, period-over-period
  * deltas. Exactness is the DuckDB oracle; these pin the math. */
class Round5WaveSevenSpec extends SparkSpec {

  test("standardize: finite bounded z-values for every projected dim") {
    val rows = run("q_vec_standardize").collect()
    assert(rows.length == 3 * 64, "3 vectors x 64 dims")
    rows.foreach { r =>
      val z = r.getDouble(r.fieldIndex("zval"))
      assert(!z.isNaN && !z.isInfinite)
      assert(math.abs(z) < 10, s"z-score $z implausible for unit-ish data")
    }
  }

  test("centroid distances: full pair matrix, positive, triangle inequality") {
    val rows = run("q_vec_centroid_dist").collect()
    assert(rows.length == 45, "C(10,2) label pairs")
    val d = rows.map { r =>
      (r.getInt(r.fieldIndex("label_a")),
        r.getInt(r.fieldIndex("label_b"))) ->
        r.getDouble(r.fieldIndex("dist"))
    }.toMap
    def dist(a: Int, b: Int): Double =
      if (a < b) d((a, b)) else d((b, a))
    d.values.foreach(v => assert(v > 0))
    for (a <- 0 until 10; b <- 0 until 10; c <- 0 until 10
         if a != b && b != c && a != c) {
      assert(dist(a, c) <= dist(a, b) + dist(b, c) + 1e-6,
        s"triangle violated at ($a,$b,$c)")
    }
  }

  test("weighted median: sits centrally in the 1..50 quantity range") {
    val rows = run("q_agg_weighted_median").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getLong(r.fieldIndex("wmedian_qty"))
      // quantity uniform on 1..50, weight roughly value-proportional:
      // the revenue-weighted median must land in the upper-center band
      assert(m >= 15 && m <= 40, s"weighted median $m off-center")
      assert(r.getLong(r.fieldIndex("total_weight_cents")) > 0)
    }
  }

  test("minhash estimate: 190 source pairs, rational estimator, bounded error") {
    val rows = run("q_dedup_minhash_estimate").collect()
    assert(rows.length == 190, "C(20,2) source pairs")
    var errSum = 0L
    rows.foreach { r =>
      val nm = r.getLong(r.fieldIndex("n_match"))
      val est = r.getLong(r.fieldIndex("est_micro"))
      assert(nm >= 0 && nm <= 16)
      assert(est == nm * 62500L, "estimator is the exact rational")
      val err = r.getLong(r.fieldIndex("err_micro"))
      assert(err <= 500000L, s"err $err beyond 4 sigma of a 16-sample estimator")
      errSum += err
    }
    assert(errSum / 190 < 150000L, "mean estimator error should be ~1-2 components")
  }

  test("pop delta: the rational recomputes from the carried columns") {
    val rows = run("q_ts_pop_delta").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cents = r.getLong(r.fieldIndex("cents"))
      val prev = r.getLong(r.fieldIndex("prev_cents"))
      val dm = r.getLong(r.fieldIndex("delta_micro"))
      assert(prev > 0)
      assert(dm == ((cents - prev) * 1000000L) / prev,
        "delta is the exact truncated rational")
    }
  }
}
