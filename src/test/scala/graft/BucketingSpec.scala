package graft

import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled storage: writing both join sides bucketed
  * by the join key lets the sort-merge join run with ZERO exchanges —
  * the 100 TB co-located-join strategy (SURVEY §2.3 / task brief:
  * "bucketing for co-located joins").
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without any shuffle exchange") {
    val warehouse = "/tmp/graft_warehouse"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Tables.lineitem(spark, sf)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$warehouse/li_bucketed")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, sf)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$warehouse/ord_bucketed")
        .saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN itself must be exchange-free; only the final groupBy
      // may shuffle. SortMergeJoin directly over two bucketed scans:
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin:\n$plan")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
        !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
        s"join sides were shuffled despite bucketing:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan did not use bucketing:\n$plan")

      // and the result equals the plain (shuffled) join
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
