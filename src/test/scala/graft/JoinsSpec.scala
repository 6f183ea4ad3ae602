package graft

import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  test("q5 star join broadcasts every dimension") {
    val plan = run("q_join_q5").queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 4, s"expected >=4 broadcast joins, plan:\n$plan")
  }

  test("left outer keeps all customers; zero counts for unmatched") {
    val rows = run("q_join_left_outer").collect()
    assert(rows.length == Tables.customer(spark, sf).count())
    assert(rows.exists(_.getLong(1) == 0L), "expected some customers with 0 big orders")
  }

  test("semi ∪ anti partitions customers (complementary predicates)") {
    val semiC = run("q_join_semi").count()
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
    val antiC = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semiC + antiC == c.count())
  }

  test("theta join: n_poorer equals rank among distinct balances") {
    val rows = run("q_join_theta").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bals = Tables.supplier(spark, sf).collect()
      .map(r => r.getLong(r.fieldIndex("s_suppkey")) ->
        r.getDouble(r.fieldIndex("s_acctbal"))).toMap
    rows.foreach { case (k, n) =>
      assert(n == bals.values.count(_ < bals(k)), s"suppkey $k")
    }
  }

  test("as-of join: prior_click_ts <= purchase ts and is the max such click") {
    val rows = run("q_join_asof").collect()
    assert(rows.nonEmpty)
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select("user_id", "ts").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getTimestamp(1).getTime).sorted).toMap
    rows.foreach { r =>
      val user = r.getLong(1)
      val ts = r.getTimestamp(2).getTime
      val prior = Option(r.getTimestamp(3)).map(_.getTime)
      val expect = clicks.getOrElse(user, Array.empty[Long])
        .filter(_ <= ts).lastOption
      assert(prior == expect, s"user=$user ts=$ts")
    }
  }

  test("range join rows satisfy the interval bound") {
    val n = run("q_join_range").collect().map(_.getLong(1)).sum
    val l = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val brute = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    assert(n == brute)
  }

  test("null-safe join: NULL keys match and nothing is dropped") {
    val rows = run("q_join_null_safe").collect()
    // groups: NULL (user_id%5==0) + 1..4
    assert(rows.length == 5)
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length == 1, "NULL group must survive the join")
    // every event lands in exactly one group: counts sum to table size
    val total = rows.map(r => r.getLong(r.fieldIndex("n"))).sum
    assert(total == Tables.events(spark, sf).count())
    // and within each group, n == grp_total (self-join consistency)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n")) ==
        r.getLong(r.fieldIndex("grp_total")), r.toString)
    }
  }
}
