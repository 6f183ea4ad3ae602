package graft

/** Round-5 fifty-first wave: STL-lite decomposition, LSH band-tuning
  * audit. */
class Round5WaveFiftyOneSpec extends SparkSpec {

  test("stl: decomposition identities hold per (type, hod)") {
    val rows = run("q_ts_stl").collect()
    assert(rows.nonEmpty)
    // 24 hod cells for every type present
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getLong(rs.head.fieldIndex("hod"))).toSet
        .subsetOf((0L to 23L).toSet), t)
    }
    rows.foreach { r =>
      // residual mass can never exceed detrended mass + seasonal shift
      val n = r.getLong(r.fieldIndex("n"))
      val resid = r.getLong(r.fieldIndex("sum_abs_resid"))
      val det = r.getLong(r.fieldIndex("sum_abs_detrended"))
      val seas = r.getLong(r.fieldIndex("seasonal_cents"))
      assert(n > 0)
      assert(resid >= 0 && det >= 0)
      // triangle inequality: |d - s| <= |d| + |s| summed over n rows
      assert(resid <= det + n * math.abs(seas))
      // and the reverse bound proves seasonal actually centered things
      assert(resid >= math.abs(det - n * math.abs(seas)) - det)
    }
    // the seasonal means remove mass overall: total residual <= total
    // detrended (the seasonal term is each cell's own mean, and the
    // shift-floor mean is within 1 of the true mean per cell)
    val totResid = rows.map(_.getLong(rows.head.fieldIndex("sum_abs_resid"))).sum
    val totDet = rows.map(_.getLong(rows.head.fieldIndex("sum_abs_detrended"))).sum
    val totN = rows.map(_.getLong(rows.head.fieldIndex("n"))).sum
    assert(totResid <= totDet + totN) // mean-centering can't add mass
  }

  test("lsh tuning: monotone S-curve trade-off and perfect-row sanity") {
    val rows = run("q_dedup_lsh_tuning").collect().sortBy(_.getInt(1))
    assert(rows.length == 3)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((8, 2), (4, 4), (2, 8)))
    val nTrue = rows.head.getLong(rows.head.fieldIndex("n_true"))
    assert(nTrue > 0, "fixture must contain planted near-dup pairs")
    rows.foreach { r =>
      val tp = r.getLong(r.fieldIndex("tp"))
      val cand = r.getLong(r.fieldIndex("n_cand"))
      assert(tp <= cand && tp <= nTrue)
      assert(r.getLong(r.fieldIndex("recall_micro")) ==
        1000000L * tp / nTrue)
      assert(r.getLong(r.fieldIndex("precision_micro")) ==
        1000000L * tp / cand)
    }
    // more rows per band => fewer candidates (monotone in r)
    val cands = rows.map(_.getLong(rows.head.fieldIndex("n_cand")))
    cands.sliding(2).foreach { case Array(x, y) => assert(x >= y); case _ => }
    // and recall can only fall as r grows
    val recalls = rows.map(_.getLong(rows.head.fieldIndex("recall_micro")))
    recalls.sliding(2).foreach { case Array(x, y) => assert(x >= y); case _ => }
  }
}
