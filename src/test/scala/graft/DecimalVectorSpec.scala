package graft

import org.apache.spark.sql.functions._

/** Decimal through the codec-v5 vectorized route (round 7 — r6
  * verdict #8): q_src_decimal_e2e's oracle row proves VALUES; this
  * proves the ROUTE — the scan must serve ColumnarBatches (the
  * ColumnarToRow transition in the plan) and the decimal predicate
  * must be pushed to the object reader, not post-filtered only.
  */
class DecimalVectorSpec extends SparkSpec {

  test("decimal scan rides the vectorized route with the predicate pushed") {
    val df = run("q_src_decimal_e2e")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"decimal scan fell off the vectorized route:\n$plan")
    assert(plan.contains("PushedFilters: [") &&
      !plan.contains("PushedFilters: []"),
      "decimal-literal predicate was not pushed")
  }

  test("decimal values survive the object round-trip exactly") {
    run("q_src_decimal_e2e").collect() // ensures the table exists
    val out = "/tmp/graft_decimal_e2e_" + sf.replaceAll("[^a-zA-Z0-9]", "_")
    val back = spark.read.format("graft-objects").load(out)
    val orig = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("price_dec"),
        col("l_discount").cast("decimal(4,2)").as("disc_dec"))
    assert(back.schema("price_dec").dataType.typeName == "decimal(12,2)")
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }
}
