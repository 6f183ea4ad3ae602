package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SubqueriesSpec extends SparkSpec {

  test("scalar subquery: threshold equals the global decimal average") {
    val c = Tables.customer(spark, sf)
    val thr = c.agg(
      (sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") /
        count(col("c_acctbal"))).as("t")).collect()(0).getDouble(0)
    val expected = c.filter(col("c_acctbal") > thr).count()
    assert(run("q_sub_scalar").count() == expected && expected > 0)
  }

  test("correlated scalar subquery equals the window-average rewrite") {
    val c = Tables.customer(spark, sf)
    val w = Window.partitionBy(col("c_nationkey"))
    val expected = c
      .withColumn("t",
        sum(col("c_acctbal").cast("decimal(12,2)")).over(w).cast("double") /
          count(col("c_acctbal")).over(w))
      .filter(col("c_acctbal") > col("t"))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val got = run("q_sub_correlated").collect().map(_.getLong(0)).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("correlated subquery decorrelates: one agg + join, no per-row subplan") {
    val plan = run("q_sub_correlated").queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"), "correlated subquery not decorrelated")
    assert(plan.contains("Join") || plan.contains("BroadcastHashJoin"))
  }

  test("IN subquery runs as a semi join and matches the manual semi join") {
    val df = run("q_sub_in")
    assert(df.queryExecution.executedPlan.toString.contains("LeftSemi"))
    val o = Tables.orders(spark, sf)
    val build = Tables.customer(spark, sf)
      .filter(col("c_acctbal") < 0).select(col("c_custkey").as("o_custkey"))
    val expected = o.join(build, Seq("o_custkey"), "left_semi").count()
    assert(df.count() == expected && expected > 0)
  }
}
