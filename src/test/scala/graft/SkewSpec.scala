package graft

import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join spreads the hot key across salts (shuffle key includes salt)") {
    val df = run("q_skew_salted_join")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("salt"), plan)
    // hot key present with the dominant share
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = rows.values.sum
    assert(rows(0L) >= total * 7 / 10, s"hot key share ${rows(0L)}/$total")
  }

  test("salted agg == plain agg (result transparency)") {
    val salted = run("q_skew_salted_agg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = Tables.events(spark, sf)
      .withColumn("skey",
        when(col("event_id") % 4 =!= 0, lit(0L)).otherwise(col("user_id")))
      .groupBy("skey")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }
}
