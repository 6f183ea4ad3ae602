package graft.operators

import graft.{Ora, Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.1/§2.11 — sources, sinks and physical-format ops.
  *
  * Reference analogs:
  * - CSV ingest ≈ `fbwriter` (CSV → self-describing storage objects,
  *   [pub: src/progly/fbwriter.cc], SURVEY §2.1): here CSV → typed
  *   DataFrame → parquet, explicit schema (never inference — the
  *   reference's fixed-schema discipline, SURVEY §1.2).
  * - JSON roundtrip ≈ SFT_JSON format support (SURVEY §2.1, conf. L).
  * - RID ≈ the reference's per-row uint64 record id (skyhookv2.fbs
  *   Record.RID): surfaced as a deterministic dense id via row_number
  *   over the table key — NOT monotonically_increasing_id(), which is
  *   partition-layout-dependent and would break reproducibility.
  * - Physical re-layout ≈ transform_db / object compaction (SURVEY
  *   §2.11): repartition + sortWithinPartitions + parquet rewrite; the
  *   content must be bit-identical after the rewrite, which is what
  *   the oracle checks.
  *
  * 100 TB posture: ingest/relayout are full-scan + full-write jobs
  * whose parallelism is file-granular; RID assignment via a global
  * row_number IS a global sort — acceptable for ingest-time id-stamping
  * (one-off), never for query-time; queries should key on natural keys.
  */
/** Last q_src_mv_rewrite run's optimized-plan leaf table names — the
  * RuntimeBloom.lastPlan pattern: the query computes eagerly inside
  * its scoped registration window, so the spec reads the substitution
  * evidence here instead of re-planning outside the window. */
object MvRewriteRun { @volatile var lastLeaves: Seq[String] = Nil }

object Sources extends QueryModule {

  private def tmpDir(dir: String, tag: String): String =
    s"/tmp/graft_${tag}_" + dir.replaceAll("[^a-zA-Z0-9]", "_")

  private val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  // CSV ingest roundtrip: parquet -> csv -> typed read -> aggregate;
  // must equal the same aggregate over the original table.
  private val csvRoundtrip = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "csv")
    // default timestamp format roundtrips losslessly (ISO-8601 millis)
    Tables.lineitem(s, dir).write.mode("overwrite")
      .option("header", "true").csv(out)
    s.read.schema(lineitemSchema).option("header", "true").csv(out)
      .agg(count(lit(1)).as("cnt"),
        Ora.dsum(Ora.money(col("l_extendedprice"))).as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  private val csvRoundtripSql =
    """SELECT COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem""".stripMargin

  // JSON roundtrip: rows -> JSON strings -> schema'd parse -> aggregate.
  private val jsonRoundtrip = (s: SparkSession, dir: String) => {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    Tables.events(s, dir)
      .select(to_json(struct(col("event_id"), col("user_id"),
        col("event_type"), col("value"))).as("j"))
      .select(from_json(col("j"), schema).as("r"))
      .select(col("r.*"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"),
        max(col("event_id")).as("max_id"))
  }

  private val jsonRoundtripSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  max(event_id) AS max_id
      |FROM events GROUP BY event_type""".stripMargin

  /** ORC roundtrip — the reference's layered-format story (SURVEY §2.1:
    * SFT_* format tags make the object body format pluggable — Arrow,
    * flatbuffer, CSV, JSON) mapped onto Spark's other first-class
    * columnar format: rewrite events as ORC (zlib, dictionary + RLE
    * encodings distinct from parquet's), read back through the
    * vectorized ORC reader, aggregate. Content must survive the
    * format change bit-exactly; SourcesSpec additionally asserts the
    * scan pushes the event_type filter into the ORC reader
    * (searchArgument row-group pruning at scale). */
  private val orcRoundtrip = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "orc")
    Tables.events(s, dir).write.mode("overwrite")
      .option("compression", "zlib").orc(out)
    s.read.orc(out)
      .filter(col("event_type") =!= "view")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"),
        min(col("ts")).as("min_time"),
        max(col("ts")).as("max_time"))
  }

  private val orcRoundtripSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  min(ts) AS min_time, max(ts) AS max_time
      |FROM events WHERE event_type <> 'view' GROUP BY event_type""".stripMargin

  /** Malformed-record ingest discipline (the fbwriter analog's error
    * path): render events as CSV with a PLANTED parse failure on a
    * deterministic subset (`event_id % 97 == 0` gets a non-numeric
    * value field), read back under PERMISSIVE mode with a
    * `columnNameOfCorruptRecord` column, and account: total rows, rows
    * quarantined to the corrupt column, and the sum over clean rows.
    * Real ingest jobs run exactly this shape — parse what parses,
    * quarantine what doesn't, never drop silently. The oracle computes
    * the expected split closed-form from the plant: the permissive
    * parser must flag EXACTLY the planted rows. */
  private val csvBadRecords = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "csvbad")
    Tables.events(s, dir)
      .select(concat_ws(",",
        col("event_id"),
        when(col("event_id") % 97 === 0, lit("NOT_A_NUMBER"))
          .otherwise(col("value").cast("string")),
        col("event_type")).as("line"))
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType),
      StructField("event_type", StringType), StructField("_bad", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(out)
      .agg(count(lit(1)).as("n_rows"),
        count(col("_bad")).as("n_bad"),
        Ora.dsum(when(col("_bad").isNull, Ora.money(col("value"))))
          .as("sum_good"))
  }

  private val csvBadRecordsSql =
    """SELECT COUNT(*) AS n_rows,
      |  COUNT(CASE WHEN event_id % 97 = 0 THEN 1 END) AS n_bad,
      |  CAST(SUM(CASE WHEN event_id % 97 <> 0
      |           THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)
      |    AS sum_good
      |FROM events""".stripMargin

  // RID surfacing: deterministic dense record ids over the table key.
  // Distributed (the r6 verdict's swap): range-partition on the key +
  // per-partition row numbers + broadcast prefix offsets
  // (GlobalOrder.rowNumbered) — corpus-sized input never crosses one
  // task; the helper's snapshot holds only the 2-column projection.
  private val rid = (s: SparkSession, dir: String) =>
    GlobalOrder.rowNumbered(
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber")),
      Seq(col("l_orderkey").asc, col("l_linenumber").asc), "_rid")
      .filter(col("_rid") % 1000 === 1)
      .select(col("_rid"), col("l_orderkey"), col("l_linenumber"))

  private val ridSql =
    """SELECT _rid, l_orderkey, l_linenumber FROM (
      |  SELECT row_number() OVER (ORDER BY l_orderkey ASC, l_linenumber ASC)
      |    AS _rid, l_orderkey, l_linenumber
      |  FROM lineitem) WHERE _rid % 1000 = 1""".stripMargin

  // Physical re-layout (transform/compaction): rewrite as 4 key-sorted
  // parquet files; the CONTENT must survive the rewrite unchanged.
  private val relayout = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "relayout")
    Tables.orders(s, dir)
      .repartition(4, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"), col("o_orderkey"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
  }

  private val relayoutSql =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Value-index analog (SURVEY §2.11: the reference's omap
    * column-value index): rewrite lineitem with a parquet BLOOM FILTER
    * on l_suppkey + min/max sorted layout, then answer a point lookup
    * through the indexed copy. Parquet bloom filters are the free-
    * standing equivalent of the omap value index: a reader probes the
    * filter per row group and skips groups that cannot contain the
    * key (SourcesSpec asserts the bloom metadata exists in the footer
    * and that the lookup is row-group-prunable). The oracle answers
    * the same lookup from the raw table — the index must not change
    * the answer, only the IO. */
  private val bloomIndex = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "bloomidx")
    Tables.lineitem(s, dir)
      .repartition(4, col("l_suppkey"))
      .sortWithinPartitions(col("l_suppkey"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#l_suppkey", "true")
      .option("parquet.bloom.filter.expected.ndv#l_suppkey", "1000")
      // parquet-mr skips the bloom when a chunk is fully dictionary-
      // encoded (the dictionary already answers membership); at fixture
      // scale every column dict-encodes, so force the bloom to exist
      // for the demo. At 100 TB cardinality does this for free.
      .option("parquet.enable.dictionary#l_suppkey", "false")
      .parquet(out)
    s.read.parquet(out)
      .filter(col("l_suppkey") === 7)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"),
        Ora.dsum(Ora.money(col("l_extendedprice"))).as("sum_price"))
  }

  private val bloomIndexSql =
    """SELECT l_suppkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem WHERE l_suppkey = 7 GROUP BY l_suppkey""".stripMargin

  /** Storage-side aggregation through the custom DSv2 source — the
    * reference's defining `--use-cls` behavior for aggregates (SURVEY
    * §2.4 row 1 / §4.1 row 3: "OSD returns one partial row per
    * object"): orders is rewritten into the object layout, then a
    * global MIN/MAX/COUNT is answered ENTIRELY from object footers via
    * SupportsPushDownAggregates (GraftFooterAggScan — zero rows
    * decoded; ObjectStoreFeaturesSpec proves the plan shape and that
    * the answer survives body corruption). The oracle computes the
    * same aggregate over the raw table: the storage path must change
    * the IO, never the answer. */
  private val objstoreAgg = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "objagg") + "/orders"
    Tables.orders(s, dir)
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(out)
    s.read.format("graft-objects").load(out)
      .agg(min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        count(lit(1)).as("n"),
        count(col("o_custkey")).as("n_cust"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        min(col("o_orderdate")).as("min_date"),
        max(col("o_orderdate")).as("max_date"))
  }

  /** Reader-tier aggregate pushdown — the reference's `--use-cls`
    * headline end-to-end: filter + GROUP BY + MIN/MAX/COUNT/SUM all
    * evaluate INSIDE the object reader, one partial row per object per
    * group leaves storage, Spark merges (ObjectStoreFeaturesSpec
    * asserts the GraftPartialAggScan plan; this binds the values to a
    * DuckDB oracle over the raw table). */
  private[graft] val objAggFilteredSetup = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "objaggf") + "/orders"
    Tables.orders(s, dir)
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(out)
  }

  private[graft] val objAggFilteredRead = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "objaggf") + "/orders"
    s.read.format("graft-objects").load(out)
      .filter(col("o_totalprice") > 50000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey")).as("sum_cust"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        min(col("o_orderdate")).as("min_date"))
  }

  private val objstoreAggFiltered = (s: SparkSession, dir: String) => {
    objAggFilteredSetup(s, dir); objAggFilteredRead(s, dir)
  }

  /** Temporal predicate pushdown through the object store — TPC-H Q6
    * with the l_shipdate range predicates evaluated INSIDE the object
    * reader and, because the layout is range-partitioned on
    * l_shipdate, pruning whole objects by their footer micros bounds
    * before any body read (PushdownWideningSpec proves the prune with
    * corrupted bodies). Before the evaluable-set widening, temporal
    * filter values were refused and the whole WHERE fell back to
    * Spark after full decode. */
  private val pushdownTemporal = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "objtemporal") + "/lineitem"
    Tables.lineitem(s, dir)
      .repartitionByRange(8, col("l_shipdate"))
      .write.format("graft-objects").mode("overwrite").save(out)
    s.read.format("graft-objects").load(out)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(Ora.money(col("l_extendedprice")) * Ora.rate(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  private val pushdownTemporalSql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  private val objstoreAggFilteredSql =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |  min(o_orderdate) AS min_date
      |FROM orders WHERE o_totalprice > 50000.0
      |GROUP BY o_orderstatus""".stripMargin

  /** Value-clustered layout + storage-partitioned execution (the
    * reference's placement-group affinity): both tables are written
    * `clusterBy` their join key (every object single-key, footer
    * min==max), read back with `clusteredBy` (footer-verified →
    * KeyGroupedPartitioning), joined and aggregated ON the cluster
    * key — with v2 bucketing on, the whole plan needs zero shuffles
    * (ClusteredLayoutSpec asserts the plan; this query binds the
    * result to a DuckDB oracle over the raw tables). */
  private[graft] val clusteredJoinSetup = (s: SparkSession, dir: String) => {
    val base = tmpDir(dir, "clustered")
    // This is the deliberate one-object-per-key demonstration layout
    // (its bucketed twin below is the scale path), so it explicitly
    // raises the identity-cluster object cap that would otherwise
    // refuse the write at sf0.1's ~15k keys over 4 tasks — the opt-in
    // that documents "yes, I want O(#keys) objects here".
    Tables.orders(s, dir)
      .repartition(col("o_custkey")).sortWithinPartitions("o_custkey")
      .write.format("graft-objects").option("clusterBy", "o_custkey")
      .option("maxObjectsPerTask", "1000000")
      .mode("overwrite").save(s"$base/orders")
    Tables.customer(s, dir)
      .repartition(col("c_custkey")).sortWithinPartitions("c_custkey")
      .write.format("graft-objects").option("clusterBy", "c_custkey")
      .option("maxObjectsPerTask", "1000000")
      .mode("overwrite").save(s"$base/customer")
  }

  private[graft] val clusteredJoinRead = (s: SparkSession, dir: String) => {
    val base = tmpDir(dir, "clustered")
    val oTgt = s"$base/orders"; val cTgt = s"$base/customer"
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.read.format("graft-objects").option("clusteredBy", "o_custkey").load(oTgt)
      .join(s.read.format("graft-objects").option("clusteredBy", "c_custkey")
        .load(cTgt), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"),
        min(col("c_name")).as("c_name"))
  }

  private val clusteredJoin = (s: SparkSession, dir: String) => {
    clusteredJoinSetup(s, dir); clusteredJoinRead(s, dir)
  }

  /** Width-BUCKETED clustered layout (r4): identity clustering is one
    * object per key — O(#keys) partitions, measured 13 s at sf0.1 in
    * the r4 bench. Width mode buckets contiguous key ranges
    * (floorDiv(key, W)): object count tracks #buckets, footers still
    * verify the layout (floorDiv is monotone, min/max pin the bucket),
    * and the scan reports the standard bucket(W, col) V2 transform
    * resolved through GraftCatalog's FunctionCatalog — two co-bucketed
    * tables join storage-partitioned at ANY key cardinality (the
    * Iceberg bucket-SPJ shape with a range bucket, because contiguity
    * is what footer stats can verify). */
  private val ClusterW = 256L

  private[graft] val clusteredBucketedSetup = (s: SparkSession, dir: String) => {
    graftCatalogRoot(s)
    Seq("orders_spj" -> "o_custkey", "customer_spj" -> "c_custkey")
      .foreach { case (t, _) => s.sql(s"DROP TABLE IF EXISTS graft.main.$t") }
    s.sql(s"""CREATE TABLE graft.main.orders_spj
             |(${Tables.orders(s, dir).schema.toDDL})
             |USING `graft-objects`
             |TBLPROPERTIES('clusterBy'='o_custkey','clusterWidth'='$ClusterW')"""
      .stripMargin)
    s.sql(s"""CREATE TABLE graft.main.customer_spj
             |(${Tables.customer(s, dir).schema.toDDL})
             |USING `graft-objects`
             |TBLPROPERTIES('clusterBy'='c_custkey','clusterWidth'='$ClusterW')"""
      .stripMargin)
    Tables.orders(s, dir)
      .repartition(8, expr(s"o_custkey div $ClusterW"))
      .sortWithinPartitions("o_custkey")
      .writeTo("graft.main.orders_spj").append()
    Tables.customer(s, dir)
      .repartition(8, expr(s"c_custkey div $ClusterW"))
      .sortWithinPartitions("c_custkey")
      .writeTo("graft.main.customer_spj").append()
  }

  private[graft] val clusteredBucketedRead = (s: SparkSession, dir: String) => {
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.table("graft.main.orders_spj")
      .join(s.table("graft.main.customer_spj"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"),
        min(col("c_name")).as("c_name"))
  }

  private val clusteredBucketed = (s: SparkSession, dir: String) => {
    clusteredBucketedSetup(s, dir); clusteredBucketedRead(s, dir)
  }

  private val clusteredJoinSql =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
      |  min(c_name) AS c_name
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_custkey""".stripMargin

  private val objstoreAggSql =
    """SELECT min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      |  COUNT(*) AS n, COUNT(o_custkey) AS n_cust,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
      |FROM orders""".stripMargin

  /** SQL DML through the graft TableCatalog: rebuild the table,
    * DELETE an l_quantity range (object-level: stats-pruned / whole-
    * object unlink / staged in-place rewrite), read survivors back via
    * the catalog. The catalog is registered once per session (catalog
    * instances are cached by name after first resolution, so the root
    * conf must precede first use — hence the memoized registration). */
  private val catalogRegistered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()
  private def graftCatalogRoot(s: SparkSession): String =
    catalogRegistered.computeIfAbsent(s, { _ =>
      val root = java.nio.file.Files
        .createTempDirectory("graft-catalog").toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.root", root)
      root
    })

  private val catalogDelete = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    Tables.lineitem(s, dir)
      .repartitionByRange(4, col("l_orderkey"))
      .write.format("graft-objects").mode("overwrite")
      .save(s"$root/main/lineitem")
    s.sql("DELETE FROM graft.main.lineitem WHERE l_quantity > 30.0")
    s.sql("""SELECT l_returnflag, COUNT(*) AS n_rows,
            |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
            |  max(l_quantity) AS max_qty
            |FROM graft.main.lineitem GROUP BY l_returnflag""".stripMargin)
  }

  private val catalogDeleteSql =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  max(l_quantity) AS max_qty
      |FROM lineitem WHERE NOT (l_quantity > 30.0)
      |GROUP BY l_returnflag""".stripMargin

  /** SQL UPDATE through the catalog — Spark's group-based row-level
    * rewrite over the object store (copy-on-write at object
    * granularity: footer stats pick the affected objects, only those
    * are rewritten — RowLevelOpsSpec proves untouched objects keep
    * their exact bytes). The SET avoids float arithmetic so the
    * readback stays bit-exact against the oracle. */
  private val catalogUpdate = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    Tables.orders(s, dir)
      .repartitionByRange(4, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite")
      .save(s"$root/main/orders_upd")
    s.sql("""UPDATE graft.main.orders_upd SET o_orderpriority = '0-REPRICED'
            |WHERE o_totalprice > 400000.0""".stripMargin)
    s.sql("""SELECT o_orderpriority, COUNT(*) AS n_rows,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
            |FROM graft.main.orders_upd GROUP BY o_orderpriority""".stripMargin)
  }

  private val catalogUpdateSql =
    """SELECT CASE WHEN o_totalprice > 400000.0 THEN '0-REPRICED'
      |            ELSE o_orderpriority END AS o_orderpriority,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1""".stripMargin

  /** runstats-as-data (GraftStats.profile): per-column row/null
    * counts and min/max bounds answered ENTIRELY from object footers
    * (zero body reads — the reference's runstats op), joined with an
    * exact-NDV envelope check on the footer KMV estimate (exact
    * below the sketch size, so o_orderstatus's 3 must be exact; the
    * high-NDV keys must land within ±15%). The oracle recomputes
    * every exact column from the raw table and expects TRUE for the
    * envelope — the estimate itself never reaches the compare. */
  private val statsProfile = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "objprofile") + "/orders"
    Tables.orders(s, dir)
      .repartitionByRange(4, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite").save(out)
    val cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val prof = graft.sources.GraftStats.profile(s, out, cols)
    val t = s.read.format("graft-objects").load(out)
    val exact = t.agg(
      countDistinct(col("o_orderkey")).as("k1"),
      countDistinct(col("o_custkey")).as("k2"),
      countDistinct(col("o_totalprice")).as("k3"),
      countDistinct(col("o_orderstatus")).as("k4"))
      .select(expr("stack(4, 'o_orderkey', k1, 'o_custkey', k2, " +
        "'o_totalprice', k3, 'o_orderstatus', k4) AS (col_name, exact_ndv)"))
    prof.join(exact, Seq("col_name"))
      .select(col("col_name"), col("row_count"), col("null_count"),
        col("min_v"), col("max_v"),
        (abs(col("ndv_est") - col("exact_ndv")) <=
          col("exact_ndv") * 0.15).as("ndv_ok"))
  }

  private val statsProfileSql =
    """SELECT 'o_orderkey' AS col_name, COUNT(*) AS row_count,
      |  COUNT(*) - COUNT(o_orderkey) AS null_count,
      |  CAST(min(o_orderkey) AS VARCHAR) AS min_v,
      |  CAST(max(o_orderkey) AS VARCHAR) AS max_v, TRUE AS ndv_ok
      |FROM orders
      |UNION ALL
      |SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
      |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR),
      |  TRUE
      |FROM orders
      |UNION ALL
      |SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
      |  CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR),
      |  TRUE
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
      |  min(o_orderstatus), max(o_orderstatus), TRUE
      |FROM orders""".stripMargin

  /** Time travel through the catalog (GraftVersions): build the table
    * (version 1), DELETE a price band (version 2), then read BOTH the
    * pre-delete snapshot via `VERSION AS OF 1` — served from the
    * table's version log + archive, not the live objects — and the
    * live state, in one result. The oracle reconstructs both states
    * from the raw table: time travel must change WHICH bytes are
    * read, never the answer for a given version. */
  private[graft] val timeTravelSetup = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    Tables.orders(s, dir)
      .repartitionByRange(4, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite")
      .save(s"$root/main/orders_tt")
    s.sql("DELETE FROM graft.main.orders_tt WHERE o_totalprice > 200000.0")
    ()
  }

  private[graft] val timeTravelRead = (s: SparkSession, dir: String) => {
    graftCatalogRoot(s)
    s.sql("""SELECT 'v1' AS snap, COUNT(*) AS n_rows,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
            |    AS sum_price,
            |  max(o_totalprice) AS max_price
            |FROM graft.main.orders_tt VERSION AS OF 1
            |UNION ALL
            |SELECT 'live', COUNT(*),
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE),
            |  max(o_totalprice)
            |FROM graft.main.orders_tt""".stripMargin)
  }

  private val timeTravel = (s: SparkSession, dir: String) => {
    timeTravelSetup(s, dir); timeTravelRead(s, dir)
  }

  /** Table branches end-to-end (GraftBranches): ingest a base tranche,
    * fork a branch, append the experiment tranche TO THE BRANCH, move
    * MAIN forward with a duplicate tranche, then observe (a) the
    * branch still sees exactly base+experiment — frozen at its fork
    * point, blind to main's later commit; (b) live main sees its own
    * commits and none of the branch's; (c) after the atomic link-merge,
    * main = its own history + the branch overlay. The oracle
    * reconstructs all three states from the raw table by value. */
  private val branchMerge = (s: SparkSession, dir: String) => {
    val tbl = tmpDir(dir, "branch") + "/orders_br"
    val orders = Tables.orders(s, dir)
    if (graft.sources.GraftBranches.exists(tbl, "exp"))
      graft.sources.GraftBranches.drop(tbl, "exp")
    orders.filter(col("o_orderkey") <= 7500)
      .repartitionByRange(2, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite").save(tbl)
    graft.sources.GraftBranches.create(tbl, "exp")
    graft.sources.GraftBranches.append(
      orders.filter(col("o_orderkey") > 7500)
        .repartitionByRange(2, col("o_orderkey")),
      tbl, "exp")
    // main moves past the fork point while the branch is open
    orders.filter(col("o_orderkey") <= 300)
      .repartitionByRange(1, col("o_orderkey"))
      .write.format("graft-objects").mode("append").save(tbl)
    def agg(df: DataFrame, snap: String) =
      df.agg(count(lit(1)).as("n_rows"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
        .select(lit(snap).as("snap"), col("n_rows"), col("sum_total"),
          col("min_key"), col("max_key"))
    val branchPre =
      agg(graft.sources.GraftBranches.read(s, tbl, "exp"), "branch_pre")
    val mainPre = agg(s.read.format("graft-objects").load(tbl), "main_pre")
    // force both pre-merge views to materialize BEFORE the merge
    // mutates the live table (lazy evaluation would otherwise read
    // post-merge bytes)
    val pre = branchPre.unionByName(mainPre).localCheckpoint()
    graft.sources.GraftBranches.merge(tbl, "exp")
    val mainPost = agg(s.read.format("graft-objects").load(tbl), "main_post")
    pre.unionByName(mainPost)
  }

  /** The identical branch workflow driven through the SQL CALL surface
    * (GraftProcedures / ProcedureCatalog) against a catalog table —
    * fork, overlay append, main moving on, merge — sharing the
    * programmatic form's oracle: the SQL verbs must be the same verbs. */
  private val branchSql = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    val tbl = s"$root/main/orders_brsql"
    val orders = Tables.orders(s, dir)
    if (graft.sources.GraftBranches.exists(tbl, "exp"))
      s.sql("CALL graft.system.drop_branch('main.orders_brsql', 'exp')")
    orders.filter(col("o_orderkey") <= 7500)
      .repartitionByRange(2, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite").save(tbl)
    s.sql("CALL graft.system.create_branch('main.orders_brsql', 'exp')")
    graft.sources.GraftBranches.append(
      orders.filter(col("o_orderkey") > 7500)
        .repartitionByRange(2, col("o_orderkey")),
      tbl, "exp")
    orders.filter(col("o_orderkey") <= 300)
      .repartitionByRange(1, col("o_orderkey"))
      .write.format("graft-objects").mode("append").save(tbl)
    def agg(df: DataFrame, snap: String) =
      df.agg(count(lit(1)).as("n_rows"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
        .select(lit(snap).as("snap"), col("n_rows"), col("sum_total"),
          col("min_key"), col("max_key"))
    val pre = agg(graft.sources.GraftBranches.read(s, tbl, "exp"), "branch_pre")
      .unionByName(agg(s.read.format("graft-objects").load(tbl), "main_pre"))
      .localCheckpoint()
    s.sql("CALL graft.system.merge_branch('main.orders_brsql', 'exp')")
    pre.unionByName(
      agg(s.read.format("graft-objects").load(tbl), "main_post"))
  }

  private val branchMergeSql =
    """WITH base AS (SELECT * FROM orders WHERE o_orderkey <= 7500),
      |exp AS (SELECT * FROM orders WHERE o_orderkey > 7500),
      |dup AS (SELECT * FROM orders WHERE o_orderkey <= 300)
      |SELECT 'branch_pre' AS snap, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM (SELECT * FROM base UNION ALL SELECT * FROM exp)
      |UNION ALL
      |SELECT 'main_pre', COUNT(*),
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE),
      |  min(o_orderkey), max(o_orderkey)
      |FROM (SELECT * FROM base UNION ALL SELECT * FROM dup)
      |UNION ALL
      |SELECT 'main_post', COUNT(*),
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE),
      |  min(o_orderkey), max(o_orderkey)
      |FROM (SELECT * FROM base UNION ALL SELECT * FROM dup
      |      UNION ALL SELECT * FROM exp)""".stripMargin

  private val timeTravelSql =
    """SELECT 'v1' AS snap, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
      |  max(o_totalprice) AS max_price
      |FROM orders
      |UNION ALL
      |SELECT 'live', COUNT(*),
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE),
      |  max(o_totalprice)
      |FROM orders WHERE NOT (o_totalprice > 200000.0)""".stripMargin

  /** Incremental delta read (GraftVersions `Delta`): ingest a first
    * tranche of orders (version 1), append the rest (version 2), then
    * read `@v1..2` — ONLY the objects that arrived after version 1,
    * without any predicate on the data itself. This is the
    * "process exactly what's new since the last run" primitive an
    * incremental 100 TB pipeline checkpoints on (one int), replacing
    * both full rescans and fragile ingest-time watermark columns. The
    * oracle computes the same aggregate over the second tranche by
    * predicate: the delta view must select the same rows by
    * STRUCTURE (commit membership) that the oracle selects by VALUE. */
  private val changesSince = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "objdelta") + "/orders"
    val orders = Tables.orders(s, dir)
    orders.filter(col("o_orderkey") <= 7500)
      .repartitionByRange(2, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite").save(out)
    orders.filter(col("o_orderkey") > 7500)
      .repartitionByRange(2, col("o_orderkey"))
      .write.format("graft-objects").mode("append").save(out)
    // address the last two commits relative to the CURRENT version so
    // reruns over a pre-existing tmp table stay self-consistent (the
    // log only ever grows)
    val cur = graft.sources.GraftVersions.currentVersion(out)
    s.read.format("graft-objects").load(s"$out@v${cur - 1}..$cur")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
  }

  private val changesSinceSql =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_total,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders WHERE o_orderkey > 7500
      |GROUP BY o_orderstatus""".stripMargin

  /** ROW-level change feed (GraftVersions.changes — the CDF view the
    * object-granularity delta read cannot express): ingest orders,
    * row-level DELETE (partially-covered objects take the in-place
    * rewrite path, fully-covered ones unlink), append a tranche, then
    * ask for every inserted/deleted ROW in the window. Deletes must
    * surface the pre-image rows reconstructed from the archive —
    * including rows from REWRITTEN objects via the bounded exceptAll
    * diff — and inserts exactly the appended tranche. The oracle
    * reconstructs both sides by VALUE from the raw table; the feed
    * must match by STRUCTURE (log membership + archive diff). */
  private val changesRows = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    val out = s"$root/main/orders_cdf"
    Tables.orders(s, dir)
      .repartitionByRange(4, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite").save(out)
    val v0 = graft.sources.GraftVersions.currentVersion(out)
    s.sql("DELETE FROM graft.main.orders_cdf WHERE o_totalprice > 200000.0")
    Tables.orders(s, dir).filter(col("o_orderkey") <= 1000)
      .repartition(1)
      .write.format("graft-objects").mode("append").save(out)
    val v = graft.sources.GraftVersions.currentVersion(out)
    graft.sources.GraftVersions.changes(s, out, v0, v)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"))
  }

  /** STREAMING change feed (the CDC face of the version log): offsets
    * are VERSION numbers; `.option("changeFeed", "true")` turns commit
    * history into a stream of inserted/deleted rows (object-granular:
    * a rewrite emits full pre-image deletes + post-image inserts — the
    * file-level CDC encoding). The fixture writes orders WIDTH-
    * CLUSTERED on o_orderkey (W=1000) so object membership is a pure
    * function of the VALUES — which is exactly what makes the
    * object-granular event stream closed-form for the oracle: DELETE
    * o_orderkey<=1500 provably unlinks bucket 0 (keys ≤999, footer
    * max<=1500) and rewrites bucket 1 (keys 1000..1999), so deletes =
    * all rows ≤1999 and inserts = the bucket-1 post-image (1501..1999)
    * plus the appended tranche (≤500). AvailableNow drains the feed
    * from the captured pre-op version into a memory sink. */
  private val changeFeedStream = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    val out = s"$root/main/orders_cdfs"
    Tables.orders(s, dir)
      .repartition(4, expr("o_orderkey div 1000"))
      .sortWithinPartitions("o_orderkey")
      .write.format("graft-objects")
      .option("clusterBy", "o_orderkey").option("clusterWidth", "1000")
      .mode("overwrite").save(out)
    val v0 = graft.sources.GraftVersions.currentVersion(out)
    s.sql("DELETE FROM graft.main.orders_cdfs WHERE o_orderkey <= 1500")
    Tables.orders(s, dir).filter(col("o_orderkey") <= 500)
      .repartition(1)
      .write.format("graft-objects").mode("append").save(out)
    val feed = s.readStream.format("graft-objects")
      .option("changeFeed", "true")
      .option("startingVersion", v0.toString)
      .load(out)
    val sink = "cdfs_sink_" + java.util.UUID.randomUUID().toString.take(8)
    val q = feed.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cdfs-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"))
  }

  /** CDC REPLICATION end-to-end: the change feed applied. A mirror
    * table is seeded from the source's v0 snapshot; the source then
    * takes a DELETE and an append; the streaming change feed (version
    * offsets) drains into `foreachBatch`, where each micro-batch is
    * NETTED per key (latest version wins; within a version the
    * post-image insert beats the pre-image delete) and applied to the
    * mirror as one keyed MERGE (DELETE / UPDATE / INSERT clauses).
    * The compared output is the MIRROR's content — equality with the
    * closed-form final source state proves replication converged.
    * Idempotent by construction (keyed MERGE), so micro-batch replay
    * after a crash re-applies harmlessly — the Delta-style CDC-apply
    * contract. */
  private val cdcApply = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    s.sql("DROP TABLE IF EXISTS graft.main.orders_cdc_src")
    s.sql("DROP TABLE IF EXISTS graft.main.orders_cdc_mirror")
    val src = s"$root/main/orders_cdc_src"
    val mirror = s"$root/main/orders_cdc_mirror"
    val orders = Tables.orders(s, dir)
    orders.repartition(4, expr("o_orderkey div 1000"))
      .sortWithinPartitions("o_orderkey")
      .write.format("graft-objects")
      .option("clusterBy", "o_orderkey").option("clusterWidth", "1000")
      .mode("overwrite").save(src)
    val v0 = graft.sources.GraftVersions.currentVersion(src)
    s.read.format("graft-objects").load(src)
      .write.format("graft-objects").mode("overwrite").save(mirror)
    s.sql("DELETE FROM graft.main.orders_cdc_src WHERE o_orderkey <= 1500")
    orders.filter(col("o_orderkey") <= 500).repartition(1)
      .write.format("graft-objects").mode("append").save(src)
    val feed = s.readStream.format("graft-objects")
      .option("changeFeed", "true")
      .option("startingVersion", v0.toString)
      .load(src)
    val cols = orders.columns.toSeq
    val q = feed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        // net per key: latest version wins; within a version the
        // post-image insert beats the pre-image delete — by EXPLICIT
        // priority, not change-type string ordering (a future
        // update_preimage/postimage value must not silently re-rank)
        val w = Window.partitionBy(col("o_orderkey"))
          .orderBy(col("_version").desc,
            when(col("_change_type") === "insert", 1).otherwise(0).desc)
        // batch-scoped view name: concurrent runs over the same session
        // must not clobber each other's nets
        val net = s"cdc_net_${batchId}_" +
          java.util.UUID.randomUUID().toString.take(8)
        batch.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn", "_version")
          .createOrReplaceTempView(net)
        ss.sql(
          s"""MERGE INTO graft.main.orders_cdc_mirror m
             |USING $net n ON m.o_orderkey = n.o_orderkey
             |WHEN MATCHED AND n._change_type = 'delete' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET
             |  ${cols.map(c => s"m.$c = n.$c").mkString(", ")}
             |WHEN NOT MATCHED AND n._change_type = 'insert' THEN
             |  INSERT (${cols.mkString(", ")})
             |  VALUES (${cols.map("n." + _).mkString(", ")})""".stripMargin)
        ss.catalog.dropTempView(net)
        ()
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-cdc-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
            |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
            |    AS sum_total
            |FROM graft.main.orders_cdc_mirror
            |GROUP BY o_orderpriority""".stripMargin)
  }

  private val cdcApplySql =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
      |    AS sum_total
      |FROM orders WHERE o_orderkey > 1500 OR o_orderkey <= 500
      |GROUP BY o_orderpriority""".stripMargin

  private val changeFeedStreamSql =
    """SELECT 'delete' AS _change_type, COUNT(*) AS n,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_total
      |FROM orders WHERE o_orderkey <= 1999
      |UNION ALL
      |SELECT 'insert', COUNT(*), min(o_orderkey), max(o_orderkey),
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
      |FROM (SELECT * FROM orders WHERE o_orderkey BETWEEN 1501 AND 1999
      |      UNION ALL SELECT * FROM orders WHERE o_orderkey <= 500)""".stripMargin

  private val changesRowsSql =
    """SELECT 'delete' AS _change_type, COUNT(*) AS n,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_total
      |FROM orders WHERE o_totalprice > 200000.0
      |UNION ALL
      |SELECT 'insert', COUNT(*), min(o_orderkey), max(o_orderkey),
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
      |FROM orders WHERE o_orderkey <= 1000""".stripMargin

  /** MERGE INTO through the catalog: matched rows get a status flag,
    * unmatched source rows are inserted — one ReplaceData plan whose
    * commit swaps only the objects holding matches (inserts land as
    * fresh tail objects). */
  private val catalogMerge = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    Tables.orders(s, dir)
      .repartitionByRange(4, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite")
      .save(s"$root/main/orders_mrg")
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 500 === 0)
      .select(col("o_orderkey").as("k"))
      .union(s.range(1, 3).select((-col("id")).cast("long").as("k")))
      .createOrReplaceTempView("merge_src")
    s.sql("""MERGE INTO graft.main.orders_mrg t USING merge_src s
            |ON t.o_orderkey = s.k
            |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M'
            |WHEN NOT MATCHED THEN INSERT
            |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            |   o_orderdate, o_orderpriority)
            |  VALUES (s.k, 0, 'N', 0.0,
            |          TIMESTAMP '1995-01-01 00:00:00', '9-MERGED')""".stripMargin)
    s.sql("""SELECT o_orderstatus, COUNT(*) AS n_rows,
            |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
            |FROM graft.main.orders_mrg GROUP BY o_orderstatus""".stripMargin)
  }

  private val catalogMergeSql =
    """SELECT o_orderstatus, COUNT(*) AS n_rows,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM (
      |  SELECT CASE WHEN o_orderkey % 500 = 0 THEN 'M'
      |              ELSE o_orderstatus END AS o_orderstatus, o_orderkey
      |  FROM orders
      |  UNION ALL SELECT 'N', -1
      |  UNION ALL SELECT 'N', -2)
      |GROUP BY o_orderstatus""".stripMargin

  /** Z-ordered object layout (graft.functions.GraftLayout): lineitem
    * clustered on the interleaved (l_orderkey, l_suppkey) curve, then
    * queried on the SECOND dimension — the filter a single-key sort
    * cannot prune. Both dimensions' footer ranges are tight per
    * object, so the suppkey point-range scan skips most objects
    * (ZOrderSpec proves the pruning on a controlled grid; here the
    * result itself is oracle-checked against the raw table). */
  private val zorderScan = (s: SparkSession, dir: String) => {
    val tgt = tmpDir(dir, "zorder") + "/lineitem"
    graft.functions.GraftLayout.zorderWrite(
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")),
      tgt, Seq("l_orderkey", "l_suppkey"), 8)
    s.read.format("graft-objects").load(tgt)
      .filter(col("l_suppkey") <= 3)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_orderkey")).as("max_okey"))
  }

  private val zorderScanSql =
    """SELECT l_suppkey, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM lineitem WHERE l_suppkey <= 3 GROUP BY l_suppkey""".stripMargin

  /** Z-order with a STRING dimension (round-6): orders clustered on
    * the interleaved (o_orderkey, o_orderpriority) curve via the
    * order-preserving 8-byte prefix code, then queried on the STRING
    * dimension — the footer's truncated string min/max bounds are
    * tight per curve cell, so the equality scan prunes objects a
    * key-sorted layout could not (ZOrderSpec proves the per-dimension
    * pruning; the result is oracle-checked against the raw table). */
  private val zorderStringScan = (s: SparkSession, dir: String) => {
    val tgt = tmpDir(dir, "zorderstr") + "/orders"
    graft.functions.GraftLayout.zorderWrite(
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice")),
      tgt, Seq("o_orderkey", "o_orderpriority"), 8)
    s.read.format("graft-objects").load(tgt)
      .filter(col("o_orderpriority") === "1-URGENT")
      .agg(count(lit(1)).as("n_rows"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"),
        min(col("o_orderkey")).as("min_okey"),
        max(col("o_orderkey")).as("max_okey"))
  }

  private val zorderStringScanSql =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS sum_total,
      |  min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey
      |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  /** RLE-run layout advisor (the table_health family): for candidate
    * sort orders, how compressible would each column be? Runs count
    * under the CANONICAL order (l_orderkey, l_linenumber — the
    * deterministic total order, so the answer is a property of the
    * DATA, not of an engine's partitioning), and the advisor reads
    * runs/rows in micro: a column at ~10⁶ never benefits from RLE; a
    * column near 0 is begging to lead the sort key. The storage
    * engine's columnar bodies (codec v5) are where the advice lands.
    *
    * 100 TB posture: at scale the same audit runs per object over the
    * already-sorted layout (runs are footer-computable at write); the
    * global form here is one window pass over the imposed order. */
  private val rleAdviceQ = (s: SparkSession, dir: String) => {
    // the fixture's (orderkey, linenumber) is NOT unique — the
    // canonical order appends the audited columns themselves, so rows
    // tying on the full key are interchangeable w.r.t. every audited
    // run count (route-independence: ObjectStoreSpec's DSv2 sweep).
    //
    // Distributed (the r6 verdict's swap — this was the repo's single
    // worst scale plan): range-partition on the canonical order, count
    // run STARTS per partition (each partition head counts as a
    // start), then subtract one per column wherever a partition's
    // first value equals the previous partition's last value — the
    // boundary correction over ≤ parts tiny rows.
    //
    // r9 optimization (guide §2.4 "remove shuffles outright" + §1.2
    // step 1): the previous form paid range-exchange → eager
    // localCheckpoint → a SECOND full hash-exchange on _pid for the
    // lag window → a separate bounds pass → a final global agg — five
    // materializations of the fact for what is one streaming scan of
    // each sorted range. Counting run starts under a known
    // within-partition order is an ORDERED streaming aggregation,
    // which the expression layer cannot express without that second
    // window exchange, so this is one of the repo's few deliberate
    // mapPartitions kernels (the media-decode rule): O(1) state, one
    // input row at a time, emits ONE row per partition (n, 4 start
    // counts, first/last audited values — the bounds rows folded into
    // the same pass). The driver fold over ≤ 32 partition rows applies
    // the boundary correction and assembles the 4-row advisor table —
    // the same constant-bounded collect the bounds pass already did.
    // Run-count semantics are unchanged (RleAdviceKernelSpec pins the
    // old window form against this one; the DuckDB oracle pins the
    // global answer).
    val sortCols = Seq(col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"), col("l_linestatus"), col("ship_day"),
      col("l_suppkey"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate").cast("date").as("ship_day"),
        col("l_suppkey"))
      .repartitionByRange(32, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    import s.implicits._
    // per-partition summary: (pid, n, starts×4, first×4, last×4);
    // audited row positions 2..5 = (returnflag, linestatus, ship_day,
    // suppkey)
    val parts = li.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var n = 0L
        val starts = Array(0L, 0L, 0L, 0L)
        var fFlag: String = null; var fStat: String = null
        var fDay: java.sql.Date = null; var fSupp: java.lang.Long = null
        var pFlag: String = null; var pStat: String = null
        var pDay: java.sql.Date = null; var pSupp: java.lang.Long = null
        while (it.hasNext) {
          val r = it.next()
          val cFlag = r.getAs[String](2)
          val cStat = r.getAs[String](3)
          val cDay = r.getAs[java.sql.Date](4)
          val cSupp = if (r.isNullAt(5)) null
            else java.lang.Long.valueOf(r.getLong(5))
          if (n == 0L) {
            fFlag = cFlag; fStat = cStat; fDay = cDay; fSupp = cSupp
            starts(0) += 1; starts(1) += 1; starts(2) += 1; starts(3) += 1
          } else {
            if (!java.util.Objects.equals(cFlag, pFlag)) starts(0) += 1
            if (!java.util.Objects.equals(cStat, pStat)) starts(1) += 1
            if (!java.util.Objects.equals(cDay, pDay)) starts(2) += 1
            if (!java.util.Objects.equals(cSupp, pSupp)) starts(3) += 1
          }
          pFlag = cFlag; pStat = cStat; pDay = cDay; pSupp = cSupp
          n += 1L
        }
        Iterator.single((pid, n, starts(0), starts(1), starts(2), starts(3),
          fFlag, fStat, fDay, Option(fSupp).map(_.longValue),
          pFlag, pStat, pDay, Option(pSupp).map(_.longValue)))
      }
    }.collect().sortBy(_._1)
    val totalN = parts.map(_._2).sum
    // boundary correction: a partition head equal to the previous
    // partition's tail is NOT a true run start
    def runs(startIdx: Int, fi: Int, li2: Int): Long = {
      val startSum = parts.map(p => p.productElement(startIdx)
        .asInstanceOf[Long]).sum
      val corrections = parts.iterator.sliding(2).withPartial(false).count {
        case Seq(a, b) => java.util.Objects.equals(
          a.productElement(li2), b.productElement(fi))
        case _ => false
      }
      startSum - corrections
    }
    // productElement indices in the tuple above:
    //   starts 2..5, first 6..9, last 10..13
    val names = Seq("l_returnflag", "l_linestatus", "ship_day", "l_suppkey")
    val runCounts = names.indices.map(k => runs(2 + k, 6 + k, 10 + k))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("col_name", StringType, nullable = false),
      StructField("n_runs", LongType),
      StructField("n", LongType, nullable = false),
      StructField("rle_ratio_micro", LongType)))
    val out = names.zipWithIndex.map { case (nm, k) =>
      if (totalN == 0L) Row(nm, null, 0L, null)
      else Row(nm, runCounts(k), totalN,
        java.lang.Long.valueOf(1000000L * runCounts(k) / totalN))
    }
    s.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava), schema)
  }

  private val rleAdviceSql =
    """WITH o AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(l_shipdate AS DATE) AS ship_day, l_suppkey,
      |    lag(l_returnflag) OVER w AS p1,
      |    lag(l_linestatus) OVER w AS p2,
      |    lag(CAST(l_shipdate AS DATE)) OVER w AS p3,
      |    lag(l_suppkey) OVER w AS p4
      |  FROM lineitem
      |  WINDOW w AS (ORDER BY l_orderkey, l_linenumber,
      |    l_returnflag, l_linestatus, CAST(l_shipdate AS DATE),
      |    l_suppkey)),
      |r AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN l_returnflag IS NOT DISTINCT FROM p1
      |      THEN 0 ELSE 1 END) AS BIGINT) AS r1,
      |    CAST(SUM(CASE WHEN l_linestatus IS NOT DISTINCT FROM p2
      |      THEN 0 ELSE 1 END) AS BIGINT) AS r2,
      |    CAST(SUM(CASE WHEN ship_day IS NOT DISTINCT FROM p3
      |      THEN 0 ELSE 1 END) AS BIGINT) AS r3,
      |    CAST(SUM(CASE WHEN l_suppkey IS NOT DISTINCT FROM p4
      |      THEN 0 ELSE 1 END) AS BIGINT) AS r4
      |  FROM o)
      |SELECT t.col_name, t.n_runs, r.n,
      |  (1000000 * t.n_runs) // r.n AS rle_ratio_micro
      |FROM r, (SELECT 'l_returnflag' AS col_name, r1 AS n_runs FROM r
      |  UNION ALL SELECT 'l_linestatus', r2 FROM r
      |  UNION ALL SELECT 'ship_day', r3 FROM r
      |  UNION ALL SELECT 'l_suppkey', r4 FROM r) t""".stripMargin

  /** Bench split forms: setup = the one-off layout write (load-time,
    * untimed — amortized exactly like Bench.objectify's ingest), read =
    * the query itself. The correctness-gate queries above still bundle
    * both so write+read stays end-to-end proven. */
  private[graft] val benchSetups: Map[String, (SparkSession, String) => Unit] =
    Map(
      "q_src_objstore_agg_filtered" -> objAggFilteredSetup,
      "q_src_clustered_join_bucketed" -> ((s: SparkSession, dir: String) =>
        clusteredBucketedSetup(s, dir)),
      "q_src_time_travel" -> timeTravelSetup)

  private[graft] val benchReads: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_src_objstore_agg_filtered" -> objAggFilteredRead,
      "q_src_clustered_join_bucketed" -> clusteredBucketedRead,
      "q_src_time_travel" -> timeTravelRead)

  /** CHECK-constraint gate end-to-end (GraftChecks): a catalog table
    * declares named predicates as TBLPROPERTIES; an INSERT of the raw
    * corpus FAILS inside the writer tasks and commits nothing, the
    * pre-filtered INSERT lands, and the read-back aggregates prove
    * exactly the constraint-satisfying rows exist. `rejected_all`
    * carries the first INSERT's observed refusal into the compared
    * output so the oracle also asserts the gate actually fired. */
  private val constraintGate = (s: SparkSession, dir: String) => {
    graftCatalogRoot(s)
    s.sql("DROP TABLE IF EXISTS graft.main.docs_gated")
    s.sql("""CREATE TABLE graft.main.docs_gated
            |(doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT)
            |TBLPROPERTIES (
            |  'check.len' = 'n_chars BETWEEN 60 AND 520',
            |  'check.lang' = 'lang IN (''en'',''de'',''fr'',''es'')')"""
      .stripMargin)
    Tables.documents(s, dir).createOrReplaceTempView("docs_src")
    val rejected =
      try {
        s.sql("""INSERT INTO graft.main.docs_gated
                |SELECT doc_id, lang, source, n_chars FROM docs_src"""
          .stripMargin)
        false
      } catch { case t: Throwable =>
        // count the refusal ONLY if it is the CHECK gate by name — an
        // unrelated failure (analysis error, catalog misconfig) must
        // not masquerade as the constraint firing
        def msgs(e: Throwable): Seq[String] =
          if (e == null) Nil
          else Option(e.getMessage).toSeq ++ msgs(e.getCause)
        val m = msgs(t).mkString(" | ")
        m.contains("CHECK constraint") &&
          (m.contains("'len'") || m.contains("'lang'"))
      }
    s.sql("""INSERT INTO graft.main.docs_gated
            |SELECT doc_id, lang, source, n_chars FROM docs_src
            |WHERE n_chars BETWEEN 60 AND 520
            |  AND lang IN ('en','de','fr','es')""".stripMargin)
    s.sql("""SELECT lang, COUNT(*) AS n_rows,
            |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
            |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
            |FROM graft.main.docs_gated GROUP BY lang""".stripMargin)
      .withColumn("rejected_all", lit(rejected))
  }

  private val constraintGateSql =
    """SELECT lang, COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  true AS rejected_all
      |FROM documents
      |WHERE n_chars BETWEEN 60 AND 520
      |  AND lang IN ('en','de','fr','es')
      |GROUP BY lang""".stripMargin

  /** Incremental index maintenance (§2.11 build-index + §1.1 DML
    * composed): the inverted index lives as a catalog TABLE; when a
    * batch of documents is appended, ONLY the delta objects
    * (`@vA..B` incremental view — cost ∝ the append, never the
    * corpus) are tokenized and MERGEd into the stored index
    * (occurrence counts add, doc ranges widen). Oracle equality
    * against a full recompute over the unioned corpus proves
    * incremental maintenance ≡ rebuild — the contract that makes a
    * 100 TB index affordable to keep fresh. */
  private val indexIncremental = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    s.sql("DROP TABLE IF EXISTS graft.main.docs_inc")
    s.sql("DROP TABLE IF EXISTS graft.main.idx_inc")
    val docsDir = s"$root/main/docs_inc"
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def indexOf(d: DataFrame): DataFrame = d
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_postings"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
    docs.repartition(4).write.format("graft-objects")
      .mode("overwrite").save(docsDir)
    val v1 = graft.sources.GraftVersions.currentVersion(docsDir)
    indexOf(s.read.format("graft-objects").load(docsDir))
      .write.format("graft-objects").mode("overwrite")
      .save(s"$root/main/idx_inc")
    val batch = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    batch.repartition(1).write.format("graft-objects")
      .mode("append").save(docsDir)
    val v2 = graft.sources.GraftVersions.currentVersion(docsDir)
    indexOf(s.read.format("graft-objects").load(s"$docsDir@v$v1..$v2"))
      .createOrReplaceTempView("idx_delta")
    s.sql("""MERGE INTO graft.main.idx_inc t USING idx_delta d
            |ON t.term = d.term
            |WHEN MATCHED THEN UPDATE SET
            |  n_postings = t.n_postings + d.n_postings,
            |  first_doc = least(t.first_doc, d.first_doc),
            |  last_doc = greatest(t.last_doc, d.last_doc)
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql("""SELECT term, n_postings, first_doc, last_doc
            |FROM graft.main.idx_inc
            |ORDER BY n_postings DESC, term ASC LIMIT 30""".stripMargin)
  }

  private val indexIncrementalSql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50),
      |terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM corpus)
      |SELECT term, COUNT(*) AS n_postings,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM terms GROUP BY term
      |ORDER BY n_postings DESC, term ASC LIMIT 30""".stripMargin

  /** Incremental MATERIALIZED-VIEW maintenance — the aggregate twin of
    * the index case: an additive per-group rollup (counts + decimal
    * sums) lives as a catalog table; an append refreshes it by
    * aggregating ONLY the `@vA..B` delta and MERGEing the partials in
    * (counts add, sums add, mins/maxes widen). Oracle equality vs a
    * full recompute over the unioned corpus proves refresh ≡ rebuild —
    * additive aggregates never need the base table again. */
  private val mvIncremental = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    s.sql("DROP TABLE IF EXISTS graft.main.docs_mv_src")
    s.sql("DROP TABLE IF EXISTS graft.main.docs_mv")
    val srcDir = s"$root/main/docs_mv_src"
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    def rollup(d: DataFrame): DataFrame = d
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
    docs.repartition(4).write.format("graft-objects")
      .mode("overwrite").save(srcDir)
    val v1 = graft.sources.GraftVersions.currentVersion(srcDir)
    rollup(s.read.format("graft-objects").load(srcDir))
      .write.format("graft-objects").mode("overwrite")
      .save(s"$root/main/docs_mv")
    docs.filter(col("doc_id") < 40)
      .select((col("doc_id") + 200000L).as("doc_id"), col("lang"),
        col("n_chars"))
      .repartition(1).write.format("graft-objects")
      .mode("append").save(srcDir)
    val v2 = graft.sources.GraftVersions.currentVersion(srcDir)
    rollup(s.read.format("graft-objects").load(s"$srcDir@v$v1..$v2"))
      .createOrReplaceTempView("mv_delta")
    s.sql("""MERGE INTO graft.main.docs_mv t USING mv_delta d
            |ON t.lang = d.lang
            |WHEN MATCHED THEN UPDATE SET
            |  n_docs = t.n_docs + d.n_docs,
            |  sum_chars = t.sum_chars + d.sum_chars,
            |  first_doc = least(t.first_doc, d.first_doc),
            |  last_doc = greatest(t.last_doc, d.last_doc)
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql("""SELECT lang, n_docs, CAST(sum_chars AS BIGINT) AS sum_chars,
            |  first_doc, last_doc
            |FROM graft.main.docs_mv""".stripMargin)
  }

  private val mvIncrementalSql =
    """WITH corpus AS (
      |  SELECT doc_id, lang, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000, lang, n_chars FROM documents
      |  WHERE doc_id < 40)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM corpus GROUP BY lang""".stripMargin

  /** Hive-style directory partitioning end-to-end as an oracled query
    * (PartitionPruningSpec proves the pruning physically; this makes
    * the capability part of the compared surface): events written
    * `partitionBy(event_type)`, read back with a partition filter that
    * lists ONLY the matching directories, joined to a second partition
    * for a cross-partition aggregate. */
  private val partitionedWrite = (s: SparkSession, dir: String) => {
    // per-run temp dir (JVM-exit cleaned): a fixed path would race two
    // concurrent runs over the same fixtures on mode("overwrite")
    val out = java.nio.file.Files
      .createTempDirectory("graft-parted").toString
    sys.addShutdownHook {
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
          .asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists)
      } catch { case _: Throwable => }
    }
    Tables.events(s, dir)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val parted = s.read.parquet(out)
    parted.filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        Ora.dsum(Ora.money(col("value"))).as("sum_value"))
  }

  /** Incremental n-gram novelty — the streaming-ingest form of
    * q_text_ngram_novelty: the corpus's 3-gram FIRST-OCCURRENCE map
    * lives as a maintained catalog table (the index/MV discipline);
    * scoring a new batch touches only (a) the batch's own grams and
    * (b) the stored map — the historical corpus is NEVER re-read.
    * Batch docs are half exact copies (novelty 0 by construction) and
    * half token-reversed mutations (novel grams), so both paths are
    * exercised; after scoring, the batch's grams MERGE into the map
    * (min-combine), leaving it ready for the next batch. The oracle
    * recomputes novelty over the UNIONED corpus from scratch and reads
    * only the batch docs — delta-scoring ≡ full-rebuild is the
    * checked contract, exactly as for the incremental MV/index twins. */
  private val noveltyIncremental = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    s.sql("DROP TABLE IF EXISTS graft.main.novelty_idx")
    def grams(d: DataFrame): DataFrame = d
      .withColumn("tk", split(col("text"), " "))
      .withColumn("sh", expr(
        "CASE WHEN size(tk) >= 3 THEN transform(sequence(0, size(tk) - 3), " +
          "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])) " +
          "ELSE array_repeat('', 0) END"))
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .distinct()
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    grams(base).groupBy(col("g"))
      .agg(min(col("doc_id")).as("first_doc"))
      .write.format("graft-objects").mode("overwrite")
      .save(s"$root/main/novelty_idx")
    val batch = base.filter(col("doc_id") < 40)
      .select((col("doc_id") + 200000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat_ws(" ", reverse(split(col("text"), " "))))
          .as("text"))
    val bg = grams(batch)
    val bFirst = bg.groupBy(col("g")).agg(min(col("doc_id")).as("b_first"))
    val idx = s.read.format("graft-objects").load(s"$root/main/novelty_idx")
    val combined = bFirst
      .join(idx.withColumnRenamed("g", "g2"),
        col("g") === col("g2"), "left")
      .select(col("g"),
        least(col("b_first"), coalesce(col("first_doc"), col("b_first")))
          .as("first_doc"))
    val out = bg.join(combined, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_micro", expr("(1000000 * n_novel) div n_grams"))
    // maintain the map for the next batch (min-combine MERGE)
    combined.createOrReplaceTempView("novelty_delta")
    s.sql("""MERGE INTO graft.main.novelty_idx t USING novelty_delta d
            |ON t.g = d.g
            |WHEN MATCHED THEN UPDATE SET
            |  first_doc = least(t.first_doc, d.first_doc)
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    out
  }

  private val noveltyIncrementalSql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN text
      |         ELSE array_to_string(list_reverse(string_split(text, ' ')), ' ')
      |    END AS text
      |  FROM documents WHERE doc_id < 40),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
      |       FROM toks),
      |d AS (SELECT DISTINCT doc_id, g FROM sh),
      |f AS (SELECT g, min(doc_id) AS first_doc FROM d GROUP BY 1)
      |SELECT d.doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_novel,
      |  (1000000 * CAST(SUM(CASE WHEN f.first_doc = d.doc_id
      |     THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*) AS novelty_micro
      |FROM d JOIN f ON d.g = f.g
      |WHERE d.doc_id >= 200000
      |GROUP BY 1""".stripMargin

  /** Automatic materialized-view substitution — [[mvIncremental]]
    * maintains the rollup; this query proves the OPTIMIZER can use it:
    * the returned DataFrame is written as the plain corpus aggregate
    * (groupBy lang over the base graft-objects table), and
    * [[graft.plans.MvRewrite]] — conf-gated, registered at runtime like
    * the other §4.2 rules — substitutes a Project over the |langs|-row
    * MV scan with the original output exprIds. The driver's DuckDB
    * oracle computes the same aggregate from the raw corpus, so the
    * rewrite result is proven equal to the scan it eliminated; the
    * companion spec asserts the plan reads the MV table and NOT the
    * base. Freshness contract: the MV is (re)built here, in the same
    * operation that registers it. */
  /** Builds the base + rollup tables, registers the MV, and installs
    * the rule — the MV-maintenance window opener. Callers MUST pair it
    * with `MvRewrite.unregisterMv(baseName)` + a conf restore (the
    * runtimeBloomQ scoped-conf discipline): a registration left behind
    * would let a later aggregate silently read the rollup after the
    * base has changed. Returns the base table's DSv2 name. */
  private[graft] def registerDocsMv(s: SparkSession, dir: String): String = {
    val root = graftCatalogRoot(s)
    val basePath = s"$root/main/docs_mvrw_base"
    val mvPath = s"$root/main/docs_mvrw"
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(basePath)
    // agg.pushdown off: the rule's logical match needs the plain
    // Aggregate-over-scan shape (storage partial-agg is the OTHER,
    // per-object tier of the same idea — see Scaladoc above)
    val base = s.read.format("graft-objects")
      .option("agg.pushdown", "false").load(basePath)
    base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .write.format("graft-objects").mode("overwrite").save(mvPath)
    val baseName = base.queryExecution.analyzed.collectLeaves().head match {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.name()
    }
    graft.plans.MvRewrite.registerMv(baseName,
      graft.plans.MvRewrite.MvDef(
        s.read.format("graft-objects").load(mvPath)
          .queryExecution.optimizedPlan,
        groupCols = Seq("lang"),
        aggCols = Map(
          "n_docs" -> ("count", "1"),
          "sum_chars" -> ("sum", "n_chars"),
          "first_doc" -> ("min", "doc_id"),
          "last_doc" -> ("max", "doc_id"))))
    graft.plans.MvRewrite.register(s)
    baseName
  }

  private val mvRewrite = (s: SparkSession, dir: String) => {
    val root = graftCatalogRoot(s)
    val basePath = s"$root/main/docs_mvrw_base"
    // Scoped registration + conf (the runtimeBloomQ discipline): the
    // query computes EAGERLY inside the maintenance window, records
    // its optimized-plan leaves for the spec, then restores the conf
    // and unregisters — no later aggregate over the base table can
    // silently read the rollup once this operation's window closed.
    val confKey = graft.plans.MvRewrite.ConfKey
    val saved = scala.util.Try(s.conf.get(confKey)).toOption
    val baseName = registerDocsMv(s, dir)
    s.conf.set(confKey, "true")
    try {
      val df = s.read.format("graft-objects")
        .option("agg.pushdown", "false").load(basePath)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
      val rows = df.collect()
      MvRewriteRun.lastLeaves =
        df.queryExecution.optimizedPlan.collectLeaves().collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
            r.table.name()
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.relation.table.name()
        }
      s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    } finally {
      saved match {
        case Some(v) => s.conf.set(confKey, v)
        case None => s.conf.unset(confKey)
      }
      graft.plans.MvRewrite.unregisterMv(baseName)
    }
  }

  private val mvRewriteSql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM documents GROUP BY 1""".stripMargin

  private val partitionedWriteSql =
    """SELECT event_type, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_type IN ('click', 'purchase')
      |GROUP BY event_type""".stripMargin

  /** Merge-on-read DELETE through deletion vectors (§2.11 — the
    * Delta/Iceberg MoR discipline): ingest orders into the object
    * layout, `deleteMoR(o_totalprice <= 150000)` writes `_dv/` row-
    * ordinal sidecars WITHOUT rewriting any data object, then the
    * normal read path answers the post-delete aggregate — every
    * reader subtracts the DV at decode time. The oracle is the
    * survivor set on raw parquet; DeletionVectorSpec additionally
    * proves the data objects' bytes are untouched, time travel shows
    * the pre-delete rows, a second delete folds, and compaction
    * invalidates stale DVs. */
  private val deleteMoRQ = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "delmor") + "/orders"
    Tables.orders(s, dir)
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(out)
    graft.sources.ObjectStoreMaintenance.deleteMoR(out,
      Array(org.apache.spark.sql.sources.LessThanOrEqual(
        "o_totalprice", 150000.0)))
    s.read.format("graft-objects").load(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
  }

  private val deleteMoRSql =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS sum_total,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM orders
      |WHERE NOT (o_totalprice <= 150000) OR o_totalprice IS NULL
      |GROUP BY o_orderstatus""".stripMargin

  /** Merge-on-read UPDATE (the Iceberg delete-file + data-file shape):
    * matched rows are DV-deleted in place and re-appended with the
    * constant assignment applied as ONE new object, one commit. Here:
    * redact the order priority of every low-value order. */
  private val updateMoRQ = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "updmor") + "/orders"
    Tables.orders(s, dir)
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(out)
    graft.sources.ObjectStoreMaintenance.updateMoR(out,
      Array(org.apache.spark.sql.sources.LessThanOrEqual(
        "o_totalprice", 100000.0)),
      Map("o_orderpriority" -> "9-REDACTED"))
    s.read.format("graft-objects").load(out)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"))
  }

  private val updateMoRSql =
    """SELECT CASE WHEN o_totalprice <= 100000 THEN '9-REDACTED'
      |            ELSE o_orderpriority END AS o_orderpriority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS sum_total
      |FROM orders GROUP BY 1""".stripMargin

  /** Merge-on-read UPDATE with a COMPUTED assignment — `SET x = f(x)`
    * over the pre-image (the incremental-pipeline form): double every
    * low-value order's total (×2 is an exact IEEE scaling, so both
    * engines agree bit-for-bit) WITHOUT rewriting any data object.
    * UpdateMoRExprSpec additionally proves the objects' bytes are
    * untouched and snapshots stay exact. */
  private val updateMoRExprQ = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "updmorx") + "/orders"
    Tables.orders(s, dir)
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(out)
    graft.sources.ObjectStoreMaintenance.updateMoRExpr(s, out,
      Array(org.apache.spark.sql.sources.LessThanOrEqual(
        "o_totalprice", 100000.0)),
      Map("o_totalprice" -> "o_totalprice * 2"))
    s.read.format("graft-objects").load(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        Ora.dsum(Ora.money(col("o_totalprice"))).as("sum_total"))
  }

  private val updateMoRExprSql =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(CASE WHEN o_totalprice <= 100000
      |       THEN o_totalprice * 2 ELSE o_totalprice END
      |       AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
      |FROM orders GROUP BY 1""".stripMargin

  /** Decimal END-TO-END through the object store (round 7 — r6
    * verdict #8): the codec serializes DecimalType and pushdown
    * compares BigDecimal exactly, but no oracled query read a
    * Decimal-typed table column through codec v5 until now. Writes
    * lineitem money as DECIMAL(12,2)/DECIMAL(4,2) object columns,
    * reads back through the VECTORIZED route (DecimalType is
    * `vectorizable`; DecimalVectorSpec asserts the ColumnarToRow
    * plan) with a pushed decimal-literal predicate, aggregates in
    * exact decimal, and surfaces doubles only at the top level (the
    * driver-hasher contract). */
  private val decimalE2eQ = (s: SparkSession, dir: String) => {
    val out = tmpDir(dir, "decimal_e2e")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("price_dec"),
        col("l_discount").cast("decimal(4,2)").as("disc_dec"))
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(out)
    s.read.format("graft-objects").load(out)
      .filter(expr("price_dec > CAST(30000.00 AS DECIMAL(12,2))"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("price_dec") * (lit(1) - col("disc_dec")))
          .cast("double").as("revenue"),
        min(col("price_dec")).cast("double").as("min_price"),
        max(col("price_dec")).cast("double").as("max_price"))
  }

  private val decimalE2eSql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS revenue,
      |  CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS min_price,
      |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS max_price
      |FROM lineitem
      |WHERE CAST(l_extendedprice AS DECIMAL(12,2)) > 30000.00
      |GROUP BY 1""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_src_decimal_e2e" -> Q(decimalE2eQ, Some(decimalE2eSql),
      "DECIMAL columns end-to-end: codec v5 write, vectorized read, pushed decimal predicate, exact decimal agg"),
    "q_src_update_mor" -> Q(updateMoRQ, Some(updateMoRSql),
      "merge-on-read UPDATE: DV-delete + one appended object with the assignment applied"),
    "q_src_update_mor_expr" -> Q(updateMoRExprQ, Some(updateMoRExprSql),
      "merge-on-read UPDATE with a computed SET x = f(x) over pre-images, objects untouched"),
    "q_src_delete_mor" -> Q(deleteMoRQ, Some(deleteMoRSql),
      "merge-on-read DELETE: deletion-vector sidecars, data objects untouched"),
    "q_src_partitioned_write" -> Q(partitionedWrite,
      Some(partitionedWriteSql),
      "hive-style partitionBy write + partition-pruned filtered read-back"),
    "q_src_mv_incremental" -> Q(mvIncremental, Some(mvIncrementalSql),
      "incremental materialized-view refresh: delta-only agg + MERGE == rebuild"),
    "q_src_mv_rewrite" -> Q(mvRewrite, Some(mvRewriteSql),
      "automatic MV substitution: optimizer rule swaps the corpus agg onto the rollup table"),
    "q_text_novelty_incremental" -> Q(noveltyIncremental,
      Some(noveltyIncrementalSql),
      "incremental n-gram novelty: delta docs scored against the stored first-occurrence index"),
    "q_src_index_incremental" -> Q(indexIncremental,
      Some(indexIncrementalSql),
      "incremental index maintenance: delta-only tokenize + MERGE == rebuild"),
    "q_src_constraint_gate" -> Q(constraintGate, Some(constraintGateSql),
      "CHECK-constraint write gate: violating INSERT refused atomically"),
    "q_src_rle_advice" -> Q(rleAdviceQ, Some(rleAdviceSql),
      "RLE-run layout advisor: per-column runs under the canonical order, ratio in micro"),
    "q_src_zorder_string" -> Q(zorderStringScan, Some(zorderStringScanSql),
      "z-order with a string dimension: 8-byte prefix code interleaved, string-filter pruning"),
    "q_src_zorder" -> Q(zorderScan, Some(zorderScanSql),
      "Z-ordered multi-dimension object layout: second-key filter prunes"),
    "q_src_objstore_agg" -> Q(objstoreAgg, Some(objstoreAggSql),
      "storage-side MIN/MAX/COUNT from object footers (agg pushdown)"),
    "q_src_objstore_agg_filtered" -> Q(objstoreAggFiltered,
      Some(objstoreAggFilteredSql),
      "filtered+grouped agg evaluated in the object reader (use-cls analog)"),
    "q_src_pushdown_temporal" -> Q(pushdownTemporal, Some(pushdownTemporalSql),
      "TPC-H Q6 through graft-objects: timestamp range evaluated in the reader, objects pruned by footer micros bounds"),
    "q_src_catalog_delete" -> Q(catalogDelete, Some(catalogDeleteSql),
      "SQL DELETE through the graft TableCatalog (object-level delete)"),
    "q_src_catalog_update" -> Q(catalogUpdate, Some(catalogUpdateSql),
      "SQL UPDATE via group-based row-level rewrite (object copy-on-write)"),
    "q_src_catalog_merge" -> Q(catalogMerge, Some(catalogMergeSql),
      "MERGE INTO via group-based row-level rewrite (update + insert)"),
    "q_src_time_travel" -> Q(timeTravel, Some(timeTravelSql),
      "VERSION AS OF snapshot read: pre-DELETE state from the archive"),
    "q_src_branch_merge" -> Q(branchMerge, Some(branchMergeSql),
      "table branches: fork ref + overlay writes, snapshot-isolated both ways, atomic link merge"),
    "q_src_branch_sql" -> Q(branchSql, Some(branchMergeSql),
      "the same branch workflow driven by SQL CALL procedures (ProcedureCatalog)"),
    "q_src_changes_since" -> Q(changesSince, Some(changesSinceSql),
      "incremental delta view @vA..B: exactly the objects added since A"),
    "q_src_changes_rows" -> Q(changesRows, Some(changesRowsSql),
      "row-level change feed: inserted/deleted rows via log + archive diff"),
    "q_stream_change_feed" -> Q(changeFeedStream, Some(changeFeedStreamSql),
      "streaming CDC: version-number offsets, insert/delete row events"),
    "q_stream_cdc_apply" -> Q(cdcApply, Some(cdcApplySql),
      "CDC replication: change feed netted per key + MERGEd into a mirror"),
    "q_src_clustered_join" -> Q(clusteredJoin, Some(clusteredJoinSql),
      "value-clustered layout: storage-partitioned join + agg, zero shuffles" +
        " (DELIBERATE one-object-per-key demonstration: O(#keys) file" +
        " creates — sf1 = 300k objects, >1800s wall even solo (r9 screen);" +
        " scale users call the width-bucketed twin)",
      scale = graft.ScaleClass.FixtureDiagnostic(
        "q_src_clustered_join_bucketed")),
    "q_src_clustered_join_bucketed" -> Q(clusteredBucketed,
      Some(clusteredJoinSql),
      "width-bucketed clustered layout: bucket(W,key) SPJ at high cardinality"),
    "q_src_bloom_index" -> Q(bloomIndex, Some(bloomIndexSql),
      "bloom-filter value index write+lookup (omap value-index analog)"),
    "q_src_csv_roundtrip" -> Q(csvRoundtrip, Some(csvRoundtripSql),
      "CSV ingest roundtrip with explicit schema (fbwriter analog)"),
    "q_src_json_roundtrip" -> Q(jsonRoundtrip, Some(jsonRoundtripSql),
      "JSON encode/parse roundtrip (SFT_JSON analog)"),
    "q_src_orc_roundtrip" -> Q(orcRoundtrip, Some(orcRoundtripSql),
      "ORC rewrite + vectorized read-back (pluggable body format analog)"),
    "q_src_csv_bad_records" -> Q(csvBadRecords, Some(csvBadRecordsSql),
      "PERMISSIVE ingest: planted malformed rows quarantined, never dropped"),
    "q_src_stats_profile" -> Q(statsProfile, Some(statsProfileSql),
      "runstats-as-data: footer-only column profile + NDV envelope"),
    "q_src_rid" -> Q(rid, Some(ridSql),
      "deterministic RID surfacing (Record.RID analog)"),
    "q_src_relayout" -> Q(relayout, Some(relayoutSql),
      "physical re-layout rewrite (transform_db/compaction analog)"))
}
