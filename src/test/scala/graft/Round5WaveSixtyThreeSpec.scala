package graft

/** Round-5 sixty-third wave: intra-list diversity, new-vs-returning
  * revenue. */
class Round5WaveSixtyThreeSpec extends SparkSpec {

  test("ild: 45 pairs over the brute top-10; value in [0, 2]") {
    val rows = run("q_sim_ild").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("n_pairs")) == 45L)
    val ild = r.getDouble(r.fieldIndex("ild"))
    assert(ild >= 0.0 && ild <= 2.0)
    // the MMR-diversified list must be at least as diverse as the
    // relevance-only top-10 it reranks (on its own 5-item prefix we
    // can't compare directly, but the metric itself must be finite)
    assert(!ild.isNaN)
  }

  test("new_returning: first-year classification recount") {
    val rows = run("q_agg_new_returning").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS LONG) AS yr",
        "CAST(round(o_totalprice * 100) AS LONG) AS cents")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val firstYr = orders.groupBy(_._1).map { case (c, os) =>
      c -> os.map(_._2).min }
    rows.foreach { r =>
      val yr = r.getLong(0)
      val inYr = orders.filter(_._2 == yr)
      val newC = inYr.filter(o => firstYr(o._1) == yr).map(_._3).sum
      val retC = inYr.filter(o => firstYr(o._1) != yr).map(_._3).sum
      assert(r.getLong(r.fieldIndex("n_orders")) == inYr.length.toLong, yr)
      assert(r.getLong(r.fieldIndex("new_cents")) == newC, yr)
      assert(r.getLong(r.fieldIndex("returning_cents")) == retC, yr)
      assert(r.getLong(r.fieldIndex("new_share_micro")) ==
        1000000L * newC / (newC + retC))
    }
    // the first fixture year is 100% new by construction
    val first = rows.head
    assert(first.getLong(first.fieldIndex("returning_cents")) == 0L)
    assert(first.getLong(first.fieldIndex("new_share_micro")) == 1000000L)
    // new share declines as the cohort base matures (weakly, spot check
    // the last year is below the first)
    val last = rows.last
    assert(last.getLong(last.fieldIndex("new_share_micro")) < 1000000L)
  }
}
