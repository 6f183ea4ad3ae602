package graft

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
