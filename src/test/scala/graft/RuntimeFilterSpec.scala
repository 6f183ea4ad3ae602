package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Runtime object pruning (SupportsRuntimeFiltering): Spark's
  * dynamic-partition-pruning hook applied to the object store. A
  * selective broadcast dim side should collapse a range-laid-out fact
  * scan to the few objects whose footer min/max overlap the build
  * keys — decided at EXECUTION time, when the keys exist.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def factDir(): String = {
    val dir = Files.createTempDirectory("graft_rtf").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/lineitem"
    // range layout on the join key: each object covers a disjoint
    // orderkey band, so footer min/max make band-level pruning exact
    Tables.lineitem(spark, sf)
      .repartitionByRange(8, col("l_orderkey"))
      .write.format("graft-objects").mode("overwrite").save(path)
    path
  }

  private def scanOutputRows(plan: SparkPlan): Long = {
    val scans = plan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, s"no BatchScanExec in:\n$plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("broadcast join build side prunes objects at runtime") {
    val path = factDir()
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = spark.read.format("graft-objects").load(path)
      val total = Tables.lineitem(spark, sf).count()
      val cut = Tables.lineitem(spark, sf)
        .agg(max(col("l_orderkey"))).collect()(0).getLong(0) / 8
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderkey") <= cut)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val joined = fact.join(broadcast(dim),
        col("l_orderkey") === col("o_orderkey"))

      // correctness first: identical to the parquet route
      val expect = Tables.lineitem(spark, sf)
        .join(broadcast(dim), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() === expect)

      // the scan carries a runtime (dynamic pruning) filter
      val fresh = fact.join(broadcast(dim),
        col("l_orderkey") === col("o_orderkey"))
      val n = fresh.collect().length
      assert(n.toLong === expect)
      val planStr = fresh.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("dynamicpruning"),
        s"expected runtime filter on the scan:\n${planStr.take(1200)}")

      // and it engaged: the fact scan emitted only the overlapping
      // band's rows, not the whole table
      val scanRows = scanOutputRows(fresh.queryExecution.executedPlan)
      assert(scanRows < total / 2,
        s"runtime prune should skip most objects: scan=$scanRows total=$total")
      assert(scanRows >= expect, "surviving objects must cover all matches")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    }
  }

  test("runtime-pruned result matches the unpruned result exactly") {
    val path = factDir()
    val fact = spark.read.format("graft-objects").load(path)
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"))
    val viaObjects = fact.join(broadcast(dim),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val viaParquet = Tables.lineitem(spark, sf).join(broadcast(dim),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(viaObjects.toSeq === viaParquet.toSeq)
  }
}
