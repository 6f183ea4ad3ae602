package graft

import org.apache.spark.sql.functions._

/** Round-5 fourth wave: deterministic Poisson bootstrap, asymmetric
  * containment, rolling median, nearest-event join. Exactness is the
  * driver's DuckDB oracle; these pin invariants and join shapes. */
class Round5WaveFourSpec extends SparkSpec {

  test("bootstrap: replica mass ~ n (Poisson mean 1), reproducible across runs") {
    val a = run("q_sample_bootstrap").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = run("q_sample_bootstrap").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b, "content-hash draws must be bit-reproducible")
    a.values.foreach { case (nOrig, nBoot) =>
      // mean 1 with variance 1: n_boot within ±10% of n at fixture n
      assert(math.abs(nBoot - nOrig) < nOrig * 0.10 + 50,
        s"bootstrap mass $nBoot far from original $nOrig")
    }
  }

  test("containment: asymmetric, within (0,1], superset of jaccard>=0.7 pairs") {
    val rows = run("q_dedup_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.nonEmpty)
    rows.values.foreach(c => assert(c >= 0.5 && c <= 1.0))
    // any jaccard>=0.7 near-dup pair has containment >= 0.7 >= 0.5 in
    // BOTH directions (J <= min(C(A->B), C(B->A)))
    val jac = run("q_dedup_jaccard_pairs").collect()
    jac.foreach { r =>
      val (x, y) = (r.getLong(r.fieldIndex("ida")), r.getLong(r.fieldIndex("idb")))
      assert(rows.contains((x, y)) && rows.contains((y, x)),
        s"jaccard pair ($x,$y) missing from containment output")
    }
  }

  test("rolling median: bounded by window min/max, robust to a planted spike") {
    val rows = run("q_ts_rolling_median").collect()
    assert(rows.nonEmpty)
    // per user, replay the trailing-11 frame and check the median lies
    // within the frame's [min,max]
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (r.getTimestamp(2).getTime, r.getLong(1)))
      val vals = ordered.map(_.getDouble(3))
      ordered.zipWithIndex.foreach { case (r, i) =>
        val frame = vals.slice(math.max(0, i - 10), i + 1)
        val m = r.getDouble(4)
        assert(m >= frame.min - 1e-9 && m <= frame.max + 1e-9,
          s"median $m outside frame [${frame.min}, ${frame.max}]")
      }
    }
  }

  test("nearest join: one row per matched purchase, |dt|<=1h, banded equi plan") {
    val df = run("q_join_asof_nearest")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val perPurchase = rows.groupBy(_.getLong(1))
    assert(perPurchase.values.forall(_.length == 1),
      "rank-1 window must leave exactly one nearest click per purchase")
    rows.foreach(r => assert(r.getLong(5) <= 3600L * 1000000L))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"nearest join must band on (user, hour bucket):\n${plan.take(600)}")
  }
}
