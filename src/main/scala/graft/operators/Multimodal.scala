package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 — multimodal columns (north-star).
  *
  * Media (image/audio/video) is modeled the way a 100 TB training
  * pipeline stores it: an opaque `BinaryType` payload column plus a
  * typed metadata struct, decoded lazily by per-partition batch
  * functions. The image/audio codecs are NOT in this container, so the
  * decode kernel is a clearly-marked DETERMINISTIC STUB — but everything
  * Spark-side is real and load-bearing: the binary column, the metadata
  * struct schema, the `mapPartitions` batch shape (one iterator per
  * partition — the Scala analog of `mapInPandas` batches: amortize
  * per-batch setup, never per-row), the frame explosion, and the
  * partition-preserving execution.
  *
  * The fixture carrier is `documents.text` cast to bytes — the
  * pipeline does not care what the bytes are; that is the point of an
  * opaque media column.
  *
  * 100 TB posture: decode is embarrassingly parallel map-side work;
  * the only shuffle in this module is the optional per-media-type
  * aggregate. Frame sampling explodes rows map-side; downstream
  * consumers should repartition by (doc_id) only if they need
  * frame-locality, which is a documented choice, not a default.
  */
object Multimodal extends QueryModule {

  /** Typed rows for the Dataset[T] (encoder-checked) decode path. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)
  final case class DecodedRow(doc_id: Long, media_type: String,
      width: Int, height: Int, channels: Int, feature: Array[Double])

  /** ======= STUB ======= deterministic fake decoder.
    * A real deployment links an image/audio codec here (e.g. JPEG →
    * WxHxC pixels). This stub derives dims from content so tests are
    * deterministic and schema/batch plumbing is exercised end-to-end.
    */
  private def stubDecode(m: MediaRow): DecodedRow = {
    val n = m.media.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val channels = 3
    // fake "feature": 8 stripe-sums over the byte payload (deterministic)
    val feature = Array.tabulate(8) { s =>
      var acc = 0.0
      var i = s
      while (i < n) { acc += (m.media(i) & 0xff); i += 8 }
      acc
    }
    DecodedRow(m.doc_id, m.media_type, width, height, channels, feature)
  }

  /** Binary payload + typed metadata struct (schema is the contract). */
  private def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text").cast("binary")).as("checksum")).as("meta"))

  // Metadata projection — fully SQL-expressible, oracle-exact.
  private val metaQ = (s: SparkSession, dir: String) =>
    mediaTable(s, dir).select(
      col("doc_id"),
      col("meta.media_type").as("media_type"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.checksum").as("checksum"))

  private val metaSql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  length(text) AS n_bytes, md5(text) AS checksum
      |FROM documents""".stripMargin

  /** Batch decode via mapPartitions over a typed Dataset — the
    * mapInPandas-shaped path (iterator-in/iterator-out per partition).
    * Rows-only for the driver (the stub is engine-side); the spec
    * checks determinism, schema, and partition preservation.
    */
  private val decodeQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    val ds = mediaTable(s, dir)
      .select(col("doc_id"), col("media"), col("meta.media_type").as("media_type"))
      .as[MediaRow]
    ds.mapPartitions(_.map(stubDecode)).toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("channels"), round(element_at(col("feature"), 1), 6).as("f1"))
  }

  // Frame sampling: every 64-byte block of a "video" payload is a
  // frame; sample every 4th frame. Pure column expressions (posexplode
  // over a computed range) — map-side, no shuffle — and SQL-expressible.
  private val frameQ = (s: SparkSession, dir: String) =>
    mediaTable(s, dir)
      .filter(col("meta.media_type") === "video" && col("meta.n_bytes") >= 64)
      .select(col("doc_id"), col("media"),
        posexplode(expr("sequence(0, CAST(meta.n_bytes / 64 AS INT) - 1, 4)"))
          .as(Seq("pos", "frame_idx")))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr("substring(media, frame_idx * 64 + 1, 64)")).as("frame_checksum"))

  private val frameSql =
    """WITH v AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE doc_id % 3 = 2 AND length(text) >= 64),
      |idx AS (
      |  SELECT doc_id, text, unnest(range(0, CAST(floor(length(text) / 64) AS BIGINT), 4)) AS frame_idx
      |  FROM v)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |  md5(substring(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_checksum
      |FROM idx""".stripMargin

  // Per-media-type resource accounting (the pipeline-planning query).
  private val statsQ = (s: SparkSession, dir: String) =>
    mediaTable(s, dir)
      .groupBy(col("meta.media_type").as("media_type"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))

  private val statsSql =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  COUNT(*) AS n_files, CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
      |  MAX(length(text)) AS max_bytes
      |FROM documents GROUP BY 1""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_mm_meta" -> Q(metaQ, Some(metaSql),
      "binary media column + typed metadata struct projection"),
    "q_mm_decode" -> Q(decodeQ, None,
      "batch decode via typed mapPartitions (STUB kernel; rows-only)"),
    "q_mm_frames" -> Q(frameQ, Some(frameSql),
      "frame sampling: every 4th 64-byte block of video payloads"),
    "q_mm_stats" -> Q(statsQ, Some(statsSql),
      "per-media-type resource accounting"))
}
