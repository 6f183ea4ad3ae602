package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer.
  *
  * The reference (SkyhookDM, see SURVEY.md §1) partitions each logical
  * table into many self-describing ~10 MB storage objects and fans
  * queries out object-by-object. Spark's equivalent of that layout is a
  * partitioned parquet dataset: one input split ≈ one object, the file
  * footer ≈ the embedded per-object schema, and row-group min/max stats
  * ≈ the reference's per-object index/stats. We therefore read plain
  * parquet and let the datasource do split-granular parallelism,
  * predicate pushdown and column pruning — the Spark-native form of the
  * reference's in-storage scan (`--use-cls` pushdown).
  *
  * Scale note (100 TB posture): nothing here collects to the driver;
  * a production deployment would point `dir` at an object-store prefix
  * with thousands of files and the same code holds — parallelism is
  * `spark.sql.files.maxPartitionBytes`-driven, not table-count-driven.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Catalog-style relation cache: building a parquet DataFrame pays
    * file listing + footer schema inference every time; a catalog
    * resolves a table name to an already-built relation. Fixture paths
    * are immutable for a session, so memoize per (session, dir, name).
    * This is metadata caching only — no row data is cached. */
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    relCache.computeIfAbsent(
      s"${System.identityHashCode(spark)}|$key", _ => build)

  /** When set, `load` reads `<root>/<table>/<table>.<seq>` objects via
    * the custom DSv2 source (graft.sources.GraftObjectSource) instead
    * of parquet — the reference's storage path. Populate the root with
    * ObjectStoreIngest.ingest, then flip this (ObjectStoreSpec drives
    * the whole query suite through it). */
  @volatile var objectStoreRoot: Option[String] = None

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    objectStoreRoot match {
      case Some(root) =>
        cached(spark, s"objstore|$root|$name") {
          spark.read.format("graft-objects").load(s"$root/$name")
        }
      case None =>
        cached(spark, s"$dir|$name") {
          spark.read.parquet(s"$dir/$name.parquet")
        }
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) [local: FIXTURES.md], which
    * Spark's vectorized reader rejects. Read nanos as long (legacy conf)
    * and truncate to micros — the same floor DuckDB applies when it
    * loads nanos into its microsecond timestamps, so oracle parity holds.
    */
  def events(s: SparkSession, d: String): DataFrame =
    cached(s, s"${objectStoreRoot.getOrElse("pq")}|$d|events-typed") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = objectStoreRoot match {
        case Some(root) => s.read.format("graft-objects").load(s"$root/events")
        case None       => s.read.parquet(s"$d/events.parquet")
      }
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture table as a temp view (for spark.sql paths).
    * Routes through the typed accessors so tables with special physical
    * types (events: nanos timestamps) load correctly. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
