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
  /** `events.ts` physical type has varied across fixture generations:
    * TIMESTAMP(NANOS) (read as long under the legacy conf, truncated to
    * micros — the same floor DuckDB applies) and TIMESTAMP(MICROS)
    * without timezone (read as TIMESTAMP_NTZ). Normalize both to
    * session-timezone TimestampType: every session here pins
    * `spark.sql.session.timeZone=UTC`, so the NTZ→TZ cast is
    * wall-clock-preserving and matches DuckDB's naive-timestamp view
    * of the same column. Dispatch on the LOADED schema, not the
    * fixture doc, so object-store copies of either generation keep
    * working. */
  def events(s: SparkSession, d: String): DataFrame =
    cached(s, s"${objectStoreRoot.getOrElse("pq")}|$d|events-typed") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = objectStoreRoot match {
        case Some(root) => s.read.format("graft-objects").load(s"$root/events")
        case None       => s.read.parquet(s"$d/events.parquet")
      }
      normalizeTs(raw)
    }
  /** The events fixture's physical schema as a stream reader must
    * declare it (file streams require an explicit schema). Probed from
    * the parquet footer under the same legacy conf the batch path
    * uses, so both fixture generations (nanos-as-long, micros NTZ)
    * resolve to whatever the files actually hold. */
  def eventsPhysicalSchema(s: SparkSession, d: String)
      : org.apache.spark.sql.types.StructType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evDir = s"$d/events.parquet"
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(evDir)))
      s.read.parquet(evDir).schema
    else
      s.read.option("pathGlobFilter", "events.parquet").parquet(d).schema
  }

  /** Normalize a raw events `ts` column (either generation) to
    * session-timezone TimestampType — the shape every query, window
    * and watermark in the suite is written against. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long generation: floor to micros
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
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
