package graft

import org.apache.spark.sql.functions._

/** Directory-partitioned layout + partition pruning (SURVEY §4.1 "not
  * in reference: partition pruning over directories" — free in Spark).
  * At 100 TB, partitioning event data by type/date is what turns a
  * full-corpus scan into a directory listing.
  */
class PartitionPruningSpec extends SparkSpec {

  test("partitionBy write + filtered read prunes non-matching directories") {
    val out = "/tmp/graft_events_parted"
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val clicks = spark.read.parquet(out)
      .filter(col("event_type") === "click")
    clicks.collect()
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)

    // correctness: pruned read equals filtered full read
    val expect = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(clicks.count() == expect)

    // physical proof: only the click directory is listed
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.exists(_.startsWith("event_type=click")), dirs.mkString(","))
    val scanned = clicks.queryExecution.executedPlan.toString
    assert(!scanned.contains("event_type=purchase"))
  }
}
