package graft

import graft.sources.{GraftObjectTable, ObjectFormat}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Codec-v3 write-time column statistics — the runstats analog
  * computed per object AT INGEST (SURVEY §2.4 / §4.1): per-column KMV
  * distinct-count sketches (exact below k=128, mergeable across
  * objects), string byte-length stats, exact null counts, and merged
  * min/max, surfaced through DSv2 `columnStats()` into Catalyst
  * `ColumnStat` so CBO runs off storage metadata with zero ANALYZE
  * cost.
  */
class FooterStatsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** 5000 rows, 4 objects; distinct counts straddle the sketch size
    * so both the exact (<k) and estimated (>k) regimes are hit. */
  private def fixture(tgt: String): DataFrame = {
    val df = spark.range(0, 5000).select(
      (col("id") % 60).as("small"),                       // 60 distinct
      col("id").as("big"),                                // 5000 distinct
      concat(lit("str-"), col("id") % 300).as("s"),       // 300 distinct
      (col("id") % 40).cast("double").divide(7.0).as("d"), // 40 distinct
      when(col("id") % 10 === 0, lit(null))
        .otherwise(col("id") % 50).as("maybe"))           // 500 nulls
    df.repartition(4).write.format("graft-objects").mode("overwrite").save(tgt)
    spark.read.format("graft-objects").load(tgt)
  }

  private def mergedNdv(tgt: String, col: String): Option[Long] = {
    val footers = GraftObjectTable.listObjects(tgt).map(ObjectFormat.readFooter)
    ObjectFormat.ndvEstimate(footers.flatMap(_.ndvSketch.get(col)))
  }

  test("KMV sketches merge to exact NDV below k and ~10% accuracy above") {
    val dir = tmp("graft-ndv"); val tgt = s"$dir/t"
    val back = fixture(tgt)

    assert(mergedNdv(tgt, "small").contains(60L), "60 < k=128 must be exact")
    assert(mergedNdv(tgt, "d").contains(40L), "40 doubles must be exact")
    val exactMaybe = back.filter(col("maybe").isNotNull)
      .select("maybe").distinct().count()
    assert(mergedNdv(tgt, "maybe").contains(exactMaybe),
      "null values must not enter the sketch; non-null NDV < k is exact")

    val big = mergedNdv(tgt, "big").get.toDouble
    assert(math.abs(big - 5000) / 5000 < 0.15,
      s"5000-distinct estimate off by >15%: $big")
    val s = mergedNdv(tgt, "s").get.toDouble
    assert(math.abs(s - 300) / 300 < 0.15,
      s"300-distinct string estimate off by >15%: $s")
  }

  test("DSv2 columnStats surface as Catalyst attributeStats") {
    val dir = tmp("graft-colstat"); val tgt = s"$dir/t"
    val back = fixture(tgt)

    val stats = back.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(5000)))
    def statOf(name: String) = {
      val attr = back.queryExecution.optimizedPlan.output.find(_.name == name).get
      stats.attributeStats.get(attr)
        .getOrElse(fail(s"no ColumnStat for $name"))
    }

    val maybe = statOf("maybe")
    assert(maybe.nullCount.contains(BigInt(500)), "exact footer null sum")
    assert(maybe.min.contains(1L) && maybe.max.contains(49L),
      s"merged min/max, got ${maybe.min}/${maybe.max}")

    val small = statOf("small")
    assert(small.distinctCount.contains(BigInt(60)), "exact NDV below k")
    assert(small.min.contains(0L) && small.max.contains(59L))

    val str = statOf("s")
    assert(str.maxLen.contains(7L), "max byte length of 'str-NNN'")
    assert(str.avgLen.exists(l => l >= 6L && l <= 7L),
      s"avg byte length ≈6.6, got ${str.avgLen}")
    assert(str.min.isEmpty && str.max.isEmpty,
      "truncation-conservative string bounds must stay out of CBO ranges")
  }

  test("pushed-filter selectivity from footer stats flips a join to broadcast") {
    val dir = tmp("graft-sel")
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    orders.repartition(3).write.format("graft-objects").mode("overwrite")
      .save(s"$dir/orders")
    customer.write.format("graft-objects").mode("overwrite")
      .save(s"$dir/customer")
    val o = spark.read.format("graft-objects").load(s"$dir/orders")
    val c = spark.read.format("graft-objects").load(s"$dir/customer")

    // a ~1%-selective o_orderkey range filter is fully absorbed by the
    // scan (no Filter node remains), so the post-filter estimate must
    // come from the scan itself: each object scales by its footer
    // range fraction. The row estimate should land within 2x of truth.
    val maxKey = 1 + (o.agg(max("o_orderkey")).head.getLong(0) * 0.01).toLong
    val filtered = o.filter(col("o_orderkey") <= maxKey)
    val est = filtered.queryExecution.optimizedPlan.stats.rowCount
      .getOrElse(fail("filtered scan must report a row estimate")).toLong
    val actual = filtered.count()
    assert(est > 0 && est <= 4 * math.max(actual, 1) &&
      actual <= 4 * math.max(est, 1),
      s"selectivity estimate $est vs actual $actual")

    // threshold between the filtered estimate and both full-table
    // sizes: the unfiltered join must not broadcast, the filtered one
    // must — the broadcast decision driven by write-time footer stats
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
      val unfiltered = o.join(c, col("o_custkey") === col("c_custkey"))
      assert(!unfiltered.queryExecution.sparkPlan.toString
        .contains("BroadcastHashJoin"),
        "both full tables sit above the threshold")
      val j = filtered.join(c, col("o_custkey") === col("c_custkey"))
      assert(j.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "footer selectivity must shrink the filtered side below the bar")
      assert(j.count() == orders.filter(col("o_orderkey") <= maxKey)
        .join(customer, orders("o_custkey") === customer("c_custkey")).count())
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("CBO join cardinality runs off footer NDV sketches") {
    val dir = tmp("graft-cbojoin")
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    orders.repartition(3).write.format("graft-objects").mode("overwrite")
      .save(s"$dir/orders")
    customer.write.format("graft-objects").mode("overwrite")
      .save(s"$dir/customer")
    val o = spark.read.format("graft-objects").load(s"$dir/orders")
    val c = spark.read.format("graft-objects").load(s"$dir/customer")
    // stats memoize per LogicalPlan node — build a fresh join for
    // each CBO setting so the visitor actually re-runs
    def join() = o.join(c, col("o_custkey") === col("c_custkey"))

    val saved = "spark.sql.cbo.enabled" -> spark.conf.get("spark.sql.cbo.enabled")
    try {
      // size-only estimation carries no row count through a join;
      // CBO's |O|*|C| / max(ndv) formula needs the per-column NDV the
      // footers provide — runstats → ANALYZE-equivalent → CBO, with
      // zero table scans
      spark.conf.set("spark.sql.cbo.enabled", "false")
      assert(join().queryExecution.optimizedPlan.stats.rowCount.isEmpty)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val est = join().queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("CBO must compute a join row estimate")).toLong
      val actual = join().count()
      assert(est <= 2 * actual && actual <= 2 * math.max(est, 1),
        s"NDV-driven join estimate $est vs actual $actual")
    } finally spark.conf.set(saved._1, saved._2)
  }
}
