package graft

import org.apache.spark.sql.functions._

class SortSetSpec extends SparkSpec {

  test("top-k desc is the ordered prefix of the full sort") {
    val topk = run("q_sort_topk_desc").collect()
    assert(topk.length == 20)
    val prices = topk.map(_.getDouble(2))
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
    val globalMax = Tables.lineitem(spark, sf)
      .agg(max("l_extendedprice")).collect()(0).getDouble(0)
    assert(prices.head == globalMax)
  }

  test("top-k uses TakeOrderedAndProject (no global sort/shuffle)") {
    val plan = run("q_sort_topk_desc").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("union all preserves multiplicity; union distinct dedups") {
    val ua = run("q_set_union_all").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, sf).count()
    val nSupp = Tables.supplier(spark, sf).count()
    assert(ua.values.sum == nCust + nSupp)
    val u = run("q_set_union").collect().map(_.getInt(0)).toSet
    assert(u == ua.keySet)
  }

  test("set identity: intersect ∪ except == distinct left keys") {
    val left = Tables.customer(spark, sf)
      .select(col("c_nationkey")).distinct().collect().map(_.getInt(0)).toSet
    val inter = run("q_set_intersect").collect().map(_.getInt(0)).toSet
    val exc = run("q_set_except").collect().map(_.getInt(0)).toSet
    assert((inter union exc) == left)
    assert((inter intersect exc).isEmpty)
  }

  test("exceptAll multiplicities = left count - right count (clamped)") {
    val cust = Tables.customer(spark, sf).groupBy("c_nationkey").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val supp = Tables.supplier(spark, sf).groupBy("s_nationkey").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ours = run("q_set_except_all").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    cust.foreach { case (k, n) =>
      val expect = math.max(0L, n - supp.getOrElse(k, 0L))
      assert(ours.getOrElse(k, 0L) == expect, s"key $k")
    }
  }
}
