package graft

/** Round-5 twelfth wave: tolerance-bounded as-of join and time-to-
  * convert cohort medians. Exactness is the DuckDB oracle; these pin
  * the semantics vs their unbounded/raw twins. */
class Round5WaveTwelveSpec extends SparkSpec {

  test("asof tolerance: matches are a subset of plain as-of, staleness bounded") {
    val tol = run("q_join_asof_tolerance").collect()
    val plain = run("q_join_asof").collect()
      .map(r => r.getLong(r.fieldIndex("event_id")) ->
        Option(r.getTimestamp(r.fieldIndex("prior_click_ts")))).toMap
    assert(tol.nonEmpty && tol.length == plain.size,
      "same purchase universe as the unbounded as-of")
    var matched = 0
    tol.foreach { r =>
      val id = r.getLong(r.fieldIndex("event_id"))
      val m = r.getBoolean(r.fieldIndex("matched"))
      val pct = Option(r.getTimestamp(r.fieldIndex("prior_click_ts")))
      val ts = r.getTimestamp(r.fieldIndex("ts"))
      if (m) {
        matched += 1
        assert(pct.isDefined)
        assert(pct == plain(id), "a within-tolerance match IS the as-of match")
        assert((ts.getTime - pct.get.getTime) / 1000 <= 3600,
          "staleness bound respected")
      } else {
        assert(pct.isEmpty, "stale/absent matches surface as NULL")
        // stale means: either no click at all, or the as-of match is old
        plain(id).foreach { p =>
          assert((ts.getTime - p.getTime) / 1000 > 3600)
        }
      }
    }
    assert(matched > 0 && matched < tol.length,
      "fixture must exercise both matched and stale paths")
  }

  test("time to convert: cohort counts consistent, median within [0, max]") {
    val rows = run("q_win_time_to_convert").collect()
    assert(rows.nonEmpty)
    var converted = 0L
    rows.foreach { r =>
      val nS = r.getLong(r.fieldIndex("n_signup"))
      val nC = r.getLong(r.fieldIndex("n_converted"))
      assert(nS >= 1 && nC >= 0 && nC <= nS)
      converted += nC
      if (nC > 0) {
        val med2 = r.getLong(r.fieldIndex("med2_seconds"))
        val mx = r.getLong(r.fieldIndex("max_seconds"))
        assert(med2 >= 0 && med2 <= 2 * mx,
          "median (2x scaled) sits inside the observed range")
        assert(mx > 0, "purchase is strictly after signup")
      } else {
        assert(r.isNullAt(r.fieldIndex("med2_seconds")))
      }
    }
    assert(converted > 0, "fixture has converting users")
  }
}
