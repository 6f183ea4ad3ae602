package graft

import graft.plans.{TopKPerGroup, TopKPerGroupRewrite}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom bounded-heap top-k-per-group operator (§4.2(c)): the
  * rewrite must fire only on the canonical shape, the heap plan must
  * match the window plan row-for-row, and the partial/final pair must
  * both be present (map-side pruning before the exchange). */
class TopKPerGroupSpec extends SparkSpec {

  private def canonical() = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .drop("rn")
  }

  private def withFlag[T](on: Boolean)(body: => T): T = {
    TopKPerGroup.register(spark)
    val prev = spark.conf.getOption(TopKPerGroupRewrite.ConfKey)
    spark.conf.set(TopKPerGroupRewrite.ConfKey, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(TopKPerGroupRewrite.ConfKey, v)
      case None    => spark.conf.unset(TopKPerGroupRewrite.ConfKey)
    }
  }

  test("rewrite fires on the canonical shape: window gone, partial+final heaps") {
    withFlag(on = true) {
      val df = canonical()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"),
        s"expected the heap operator:\n${plan.take(800)}")
      assert(!plan.contains("Window"),
        s"the window must be eliminated, not just pruned:\n${plan.take(800)}")
      assert("TopKPerGroup".r.findAllIn(plan).size >= 2,
        "both the map-side partial and the reduce-side final must plan")
    }
  }

  test("heap plan == window plan row-for-row (total-order tiebreak)") {
    val expected = withFlag(on = false) {
      val df = canonical()
      assert(df.queryExecution.executedPlan.toString.contains("Window"))
      df.collect().toSet
    }
    val got = withFlag(on = true) { canonical().collect().toSet }
    assert(got == expected)
  }

  test("rewrite declines when the rank column survives (window semantics needed)") {
    withFlag(on = true) {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      val df = Tables.part(spark, sf)
        .select(col("p_partkey"), col("p_brand"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3) // rn kept in output
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Window") && !plan.contains("TopKPerGroup"),
        s"rank-preserving query must keep the window:\n${plan.take(600)}")
    }
  }

  test("k=1 via rn = 1 also rewrites; result is the per-group argmax") {
    withFlag(on = true) {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      val df = Tables.part(spark, sf)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .drop("rn")
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      val got = df.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
      val expected = Tables.part(spark, sf)
        .groupBy(col("p_brand"))
        .agg(max(struct(col("p_retailprice"),
          (-col("p_partkey")).as("neg"), col("p_partkey"))).as("m"))
        .select(col("p_brand"), col("m.p_partkey"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }
}
