package graft

import graft.sources.{GraftObjectTable, ObjectFormat}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Value-clustered object layout + storage-partitioned execution:
  * `.option("clusterBy", col)` writes rotate objects at key changes so
  * every object holds one key value; `.option("clusteredBy", col)`
  * reads verify that invariant from footers and report
  * KeyGroupedPartitioning(identity(col)) — Spark then runs joins and
  * aggregations keyed on the column WITHOUT a shuffle (storage-
  * partitioned join). The 100 TB posture: co-locate once at layout
  * time, never exchange the fact table again.
  */
class ClusteredLayoutSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: collectAll(a.executedPlan)
    case q: QueryStageExec => p +: collectAll(q.plan)
    case _ => p +: p.children.flatMap(collectAll)
  }
  private def shuffleCount(df: DataFrame): Int = {
    df.collect() // finalize AQE
    collectAll(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeLike])
  }

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col).toIndexedSeq: _*).collect()
      .map(_.toSeq.map {
        case d: Double => f"$d%.9f"
        case v => String.valueOf(v)
      }.mkString("|")).sorted.toSeq
  }

  private def writeClustered(df: DataFrame, key: String, tgt: String): Unit =
    df.repartition(col(key)).sortWithinPartitions(key)
      .write.format("graft-objects").option("clusterBy", key)
      .mode("overwrite").save(tgt)

  private def readClustered(tgt: String, key: String): DataFrame =
    spark.read.format("graft-objects").option("clusteredBy", key).load(tgt)

  private def withSpjConf[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("clustered write: every object holds exactly one cluster-key value") {
    val dir = tmp("graft-clw"); val tgt = s"$dir/orders"
    writeClustered(Tables.load(spark, sf, "orders"), "o_custkey", tgt)
    val objs = GraftObjectTable.listObjects(tgt)
    assert(objs.nonEmpty)
    objs.foreach { p =>
      val s = ObjectFormat.readFooter(p).stats("o_custkey")
      assert(s.nullCount == 0 && ObjectFormat.cmpExact(s.min, s.max).contains(0),
        s"$p: clustered object must be single-key (min=${s.min} max=${s.max})")
    }
    // content identical to the source
    assert(canon(spark.read.format("graft-objects").load(tgt))
      == canon(Tables.load(spark, sf, "orders")))
  }

  test("storage-partitioned join: co-clustered tables join with ZERO shuffles") {
    val dir = tmp("graft-spj")
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    writeClustered(orders, "o_custkey", s"$dir/orders")
    writeClustered(customer, "c_custkey", s"$dir/customer")

    withSpjConf {
      val joined = readClustered(s"$dir/orders", "o_custkey")
        .join(readClustered(s"$dir/customer", "c_custkey"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name")
      val n = shuffleCount(joined)
      assert(n == 0, s"storage-partitioned join must not shuffle, saw $n:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
      // reported ordering (single-key partitions are trivially sorted
      // by the key) must also elide the merge-join sorts
      val sorts = collectAll(joined.queryExecution.executedPlan)
        .count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
      assert(sorts == 0, s"clustered ordering must elide sorts, saw $sorts:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
      assert(canon(joined) == canon(
        orders.join(customer, col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "o_custkey", "c_name")))
    }
  }

  test("width-bucketed clustering: bounded object count, catalog SPJ " +
      "with zero shuffles at high key cardinality") {
    // identity clustering = one object per KEY — right for low-
    // cardinality keys, O(#keys) partitions otherwise (the r4 bench
    // measured 13 s at sf0.1 from exactly that). Width mode buckets
    // contiguous key ranges: object count tracks #buckets, the scan
    // reports KeyGroupedPartitioning(graft_bucket(W, col)) resolved
    // through the catalog's FunctionCatalog, and co-bucketed tables
    // still join shuffle-free.
    val W = 16L
    val catRoot = tmp("graft-bspj")
    spark.conf.set("spark.sql.catalog.gclu", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gclu.root", catRoot)
    spark.sql(
      s"""CREATE TABLE gclu.main.o
         |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
         |USING `graft-objects`
         |TBLPROPERTIES('clusterBy'='o_custkey','clusterWidth'='$W')"""
        .stripMargin)
    spark.sql(
      s"""CREATE TABLE gclu.main.c (c_custkey BIGINT, c_name STRING)
         |USING `graft-objects`
         |TBLPROPERTIES('clusterBy'='c_custkey','clusterWidth'='$W')"""
        .stripMargin)
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"))
    orders.repartition(4, expr(s"o_custkey div $W"))
      .sortWithinPartitions("o_custkey")
      .writeTo("gclu.main.o").append()
    customer.repartition(4, expr(s"c_custkey div $W"))
      .sortWithinPartitions("c_custkey")
      .writeTo("gclu.main.c").append()

    // object count is bucket-bounded, far below distinct keys
    val nKeys = customer.select("c_custkey").distinct().count()
    val oObjs = GraftObjectTable.listObjects(s"$catRoot/main/o").size
    assert(oObjs > 1 && oObjs <= nKeys / 4,
      s"width clustering must bound objects (got $oObjs for $nKeys keys)")

    withSpjConf {
      val joined = spark.table("gclu.main.o")
        .join(spark.table("gclu.main.c"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")).as("sum_total"),
          min(col("c_name")).as("c_name"))
      val n = shuffleCount(joined.select(col("o_custkey"), col("n_orders")))
      assert(n <= 1, // SPJ elides the join shuffle; the final agg may keep one
        s"bucketed SPJ must elide the join exchange, saw $n:\n" +
          joined.queryExecution.executedPlan.toString.take(2000))
      val joinOnly = spark.table("gclu.main.o")
        .join(spark.table("gclu.main.c"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name")
      assert(shuffleCount(joinOnly) == 0,
        "the bucketed join itself must be shuffle-free:\n" +
          joinOnly.queryExecution.executedPlan.toString.take(2000))
      assert(canon(joinOnly) == canon(
        orders.join(customer, col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "o_custkey", "c_name")))
    }
  }

  test("width-bucketed compaction: appends merge back to one object " +
      "per bucket, SPJ-readable, content preserved") {
    val W = 16L
    val dir = tmp("graft-bcomp"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    def writeOnce(mode: String): Unit =
      orders.repartition(2, expr(s"o_custkey div $W"))
        .sortWithinPartitions("o_custkey")
        .write.format("graft-objects")
        .option("clusterBy", "o_custkey").option("clusterWidth", W.toString)
        .mode(mode).save(tgt)
    writeOnce("overwrite"); writeOnce("append") // 2 objects per bucket
    val before = GraftObjectTable.listObjects(tgt).size
    graft.sources.ObjectStoreMaintenance.compactClustered(
      spark, tgt, "o_custkey", Some(W))
    val after = GraftObjectTable.listObjects(tgt).size
    assert(after < before && after * 2 == before,
      s"compaction must halve the doubled layout ($before -> $after)")
    // every object still single-bucket (footer-verifiable)
    GraftObjectTable.listObjects(tgt).foreach { p =>
      val s = ObjectFormat.readFooter(p).stats("o_custkey")
      def b(v: Any) = Math.floorDiv(
        v match { case i: java.lang.Integer => i.longValue
                  case l: java.lang.Long => l.longValue }, W)
      assert(s.nullCount == 0 && b(s.min) == b(s.max),
        s"$p: compacted object spans buckets")
    }
    // content = two copies of orders
    assert(spark.read.format("graft-objects").load(tgt).count()
      == orders.count() * 2)
  }

  test("aggregation on the cluster key runs without a shuffle") {
    val dir = tmp("graft-spagg"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    writeClustered(orders, "o_custkey", tgt)

    withSpjConf {
      val agg = readClustered(tgt, "o_custkey")
        .groupBy("o_custkey")
        .agg(sum("o_totalprice").as("spend"), count(lit(1)).as("n"))
      val n = shuffleCount(agg)
      assert(n == 0, s"agg on cluster key must not shuffle, saw $n:\n" +
        agg.queryExecution.executedPlan.toString.take(2000))
      assert(canon(agg) == canon(orders.groupBy("o_custkey")
        .agg(sum("o_totalprice").as("spend"), count(lit(1)).as("n"))))
    }
  }

  test("declared clusteredBy on an UNclustered table falls back safely") {
    val dir = tmp("graft-clfb"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    // ordinary multi-key objects
    orders.repartition(3).write.format("graft-objects")
      .mode("overwrite").save(tgt)
    withSpjConf {
      val df = readClustered(tgt, "o_custkey")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      // falls back to a normal shuffle plan; results stay exact
      assert(canon(df) == canon(
        orders.groupBy("o_custkey").agg(count(lit(1)).as("n"))))
    }
  }

  test("clustered read composes with pushed filters and column pruning") {
    val dir = tmp("graft-clpf"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    writeClustered(orders, "o_custkey", tgt)
    val got = readClustered(tgt, "o_custkey")
      .filter(col("o_totalprice") > 50000.0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val exp = orders.filter(col("o_totalprice") > 50000.0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    assert(canon(got) == canon(exp))
  }

  test("compactClustered merges multi-object keys back to one object " +
      "per key; old generation stays time-travelable") {
    val dir = tmp("graft-compact-clustered") + "/nation"
    val nation = Tables.nation(spark, sf)
    // two clustered appends -> two objects per key
    nation.repartition(col("n_nationkey")).sortWithinPartitions("n_nationkey")
      .write.format("graft-objects").option("clusterBy", "n_nationkey")
      .mode("overwrite").save(dir)
    nation.repartition(col("n_nationkey")).sortWithinPartitions("n_nationkey")
      .write.format("graft-objects").option("clusterBy", "n_nationkey")
      .mode("append").save(dir)
    val keys = nation.select("n_nationkey").distinct().count()
    assert(GraftObjectTable.listObjects(dir).size == 2 * keys)
    val before = canon(spark.read.format("graft-objects").load(dir))

    graft.sources.ObjectStoreMaintenance.compactClustered(
      spark, dir, "n_nationkey")

    // one object per key, every object single-key (footer min==max)
    val objs = GraftObjectTable.listObjects(dir)
    assert(objs.size == keys)
    objs.foreach { o =>
      val st = ObjectFormat.readFooter(o).stats("n_nationkey")
      assert(ObjectFormat.cmpExact(st.min, st.max).contains(0))
    }
    // content identical (each row now present twice, same multiset)
    assert(canon(spark.read.format("graft-objects").load(dir)) == before)
    // the pre-compaction generation is a snapshot away
    val v = graft.sources.GraftVersions.currentVersion(dir)
    assert(canon(spark.read.format("graft-objects")
      .load(s"$dir@v" + (v - 1))) == before)
    // clustered read still reports the zero-shuffle layout
    val agg = spark.read.format("graft-objects")
      .option("clusteredBy", "n_nationkey").load(dir)
      .groupBy(col("n_nationkey")).agg(count(lit(1)).as("n"))
    assert(shuffleCount(agg) == 0)
  }

  test("identity clustering refuses past the per-task object cap; " +
      "width buckets absorb the same cardinality") {
    val cap = graft.sources.GraftWriterFactory.MaxIdentityClusterObjectsPerTask
    val keys = spark.range(cap + 10L).withColumnRenamed("id", "k")
    val dir = tmp("graft-ndvguard")
    val e = intercept[Exception] {
      keys.coalesce(1).sortWithinPartitions("k")
        .write.format("graft-objects").option("clusterBy", "k")
        .mode("overwrite").save(s"$dir/ident")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("O(#keys)")),
      s"refusal must name the layout wall, got: ${msgs(e).mkString(" | ")}")
    // explicit opt-in raises the cap (deliberate one-object-per-key
    // layouts — the identity demo query, compaction maintenance)
    keys.coalesce(1).sortWithinPartitions("k")
      .write.format("graft-objects").option("clusterBy", "k")
      .option("maxObjectsPerTask", (cap * 2).toString)
      .mode("overwrite").save(s"$dir/optin")
    assert(GraftObjectTable.listObjects(s"$dir/optin").size == cap + 10)
    // the documented fix absorbs the same key count: bounded objects
    keys.coalesce(1).sortWithinPartitions("k")
      .write.format("graft-objects").option("clusterBy", "k")
      .option("clusterWidth", "1024")
      .mode("overwrite").save(s"$dir/width")
    val objs = GraftObjectTable.listObjects(s"$dir/width")
    assert(objs.size <= (cap + 10) / 1024 + 1, s"width layout ${objs.size} objects")
    assert(spark.read.format("graft-objects").load(s"$dir/width").count() ==
      cap + 10)
  }
}
