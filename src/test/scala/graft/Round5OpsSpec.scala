package graft

import org.apache.spark.sql.functions._

/** Round-5 analytics additions: degree-oriented triangle counting,
  * rolling z-score anomaly flags, weekly cohort retention, the
  * cross-source contamination matrix, and the ANN recall@5 eval.
  * Each query's exactness is the driver's DuckDB oracle; these specs
  * pin the structural invariants and plan shapes. */
class Round5OpsSpec extends SparkSpec {

  test("triangles: equi-join enumeration, per-node count bounded by C(deg,2)") {
    val df = run("q_graph_triangles")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle enumeration must be equi-joins:\n${plan.take(800)}")
    val rows = df.collect()
    assert(rows.length == 25, "one row per nation")
    rows.foreach { r =>
      val (deg, tri) = (r.getLong(1), r.getLong(2))
      assert(tri <= deg * (deg - 1) / 2,
        s"${r.getString(0)}: $tri triangles exceeds C($deg,2)")
      assert(tri >= 0 && deg >= 0)
    }
    // a closed wedge needs every corner to touch both others
    assert(rows.exists(_.getLong(2) > 0), "trade graph has triangles")
  }

  test("anomaly flags: causal trailing window, every output flagged, 5<=n<=10") {
    val rows = run("q_ts_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("is_anomaly")))
      val n = r.getLong(r.fieldIndex("n_window"))
      assert(n >= 5 && n <= 10, s"window count $n outside [5,10]")
    }
    // flags are a strict subset of the scored population
    val scored = Tables.events(spark, sf).filter(col("user_id") < 40).count()
    assert(rows.length < scored, "an anomaly detector that flags everything is broken")
  }

  test("retention: offset-0 cell is the cohort itself; cells never exceed cohort") {
    val rows = run("q_win_retention").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, active, cohort) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(active <= cohort, "active users cannot exceed the cohort")
      assert(off >= 0)
      if (off == 0) {
        assert(active == cohort, "everyone is active in their own first week")
        assert(r.getDouble(4) == 1.0)
      }
    }
    assert(rows.exists(_.getLong(1) == 0), "every cohort has its own first week")
  }

  test("cross-source overlap: jaccard in [0,1], intersection bounded, pairs canonical") {
    val rows = run("q_dedup_cross_source_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, s"pair ($a,$b) not canonical")
      val (i, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(i <= math.min(na, nb), "intersection exceeds a side")
      val j = r.getDouble(5)
      assert(j >= 0.0 && j <= 1.0, s"jaccard $j out of range")
      assert(math.abs(j - math.round(i.toDouble / (na + nb - i) * 1e6) / 1e6)
        < 1e-9, "jaccard inconsistent with its own counts")
    }
  }

  test("ann recall eval: one row per probe query, self always retrieved") {
    val rows = run("q_sim_ann_recall").collect()
    assert(rows.length == 20, "one row per probe query")
    rows.foreach { r =>
      val hit = r.getLong(1)
      // the query's own bucket is always probed (mask 0) and self ranks
      // first in both arms at cos 1 — so recall is never zero
      assert(hit >= 1 && hit <= 5, s"n_hit $hit outside [1,5]")
      assert(r.getDouble(2) == hit / 5.0)
    }
  }
}
