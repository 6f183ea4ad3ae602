package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 — multimodal columns (north-star).
  *
  * Media (image/audio/video) is modeled the way a 100 TB training
  * pipeline stores it: an opaque `BinaryType` payload column plus a
  * typed metadata struct, decoded lazily by per-partition batch
  * functions (the Scala analog of `mapInPandas` batches: one iterator
  * per partition, amortize per-batch setup, never per-row).
  *
  * The decode kernels are REAL pure-JVM codecs over self-describing
  * formats: 24-bit uncompressed BMP (header parse: magic, pixel-data
  * offset, dims, bpp; row iteration honors the 4-byte stride padding
  * and bottom-up row order) and 16-bit PCM mono WAV (RIFF/fmt/data
  * chunk parse, little-endian sample decode). Because the container
  * ships no image/audio libraries, the PAYLOADS are synthesized —
  * planted BMP/WAV bytes whose dimensions and channel statistics are
  * closed-form functions of `doc_id` — which is exactly what makes the
  * decode oracle-checkable in DuckDB: the kernel must recover planted
  * dims and means by actually parsing headers and walking pixel/sample
  * bytes (stride, padding, endianness, chunk offsets all load-bearing:
  * any mis-parse skews the means away from the closed form).
  *
  * 100 TB posture: synthesis and decode are embarrassingly parallel
  * map-side work; the only shuffle in this module is the optional
  * per-media-type aggregate. Frame sampling explodes rows map-side;
  * downstream consumers repartition by doc_id only if they need
  * frame-locality — a documented choice, not a default.
  */
object Multimodal extends QueryModule {

  /** Typed rows for the Dataset[T] (encoder-checked) decode paths. */
  final case class MediaBytes(doc_id: Long, media: Array[Byte])
  final case class BmpRow(doc_id: Long, width: Int, height: Int,
      channels: Int, mean_b: Double, mean_g: Double, mean_r: Double)
  final case class WavRow(doc_id: Long, sample_rate: Int, n_channels: Int,
      bits: Int, n_samples: Int, mean_amp: Double)
  final case class FrameFeat(doc_id: Long, frame: Long, f_len: Long,
      energy_q: Long, zcr: Long, peak: Long)

  // ---- little-endian packing shared by synth + parse ----------------
  private def putLeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def putLeShort(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def putTag(b: Array[Byte], off: Int, tag: String): Unit = {
    var i = 0; while (i < tag.length) { b(off + i) = tag.charAt(i).toByte; i += 1 }
  }
  private def hasTag(b: Array[Byte], off: Int, tag: String): Boolean = {
    var i = 0
    while (i < tag.length) {
      if (b(off + i) != tag.charAt(i).toByte) return false; i += 1
    }
    true
  }

  // ---- planted-payload parameters (the oracle's closed form) --------
  // BMP: width 4..16, height 3..9; pixel(x,·,c) = base(c) + x where
  // base(c) = (doc_id*7 + c*50) % 240 (so base+x ≤ 254, never wraps).
  private def bmpW(id: Long): Int = 4 + (id % 13).toInt
  private def bmpH(id: Long): Int = 3 + (id % 7).toInt
  private def bmpBase(id: Long, c: Int): Int = ((id * 7 + c * 50) % 240).toInt
  // WAV: mono 16-bit PCM; n = 64 + doc_id%100 samples at
  // 8000 + 100*(doc_id%5) Hz; sample(i) = amp + i%2, amp = doc_id%400 - 200.
  private def wavN(id: Long): Int = 64 + (id % 100).toInt
  private def wavRate(id: Long): Int = 8000 + 100 * (id % 5).toInt
  private def wavAmp(id: Long): Int = (id % 400).toInt - 200

  /** Synthesize a spec-compliant 24bpp bottom-up BMP (54-byte header,
    * rows padded to 4-byte stride, channels stored B,G,R). */
  private[graft] def synthBmp(id: Long): Array[Byte] = {
    val w = bmpW(id); val h = bmpH(id)
    val stride = (3 * w + 3) & ~3
    val bytes = new Array[Byte](54 + stride * h)
    putTag(bytes, 0, "BM")
    putLeInt(bytes, 2, bytes.length)
    putLeInt(bytes, 10, 54)          // pixel-data offset
    putLeInt(bytes, 14, 40)          // BITMAPINFOHEADER size
    putLeInt(bytes, 18, w)
    putLeInt(bytes, 22, h)           // positive = bottom-up row order
    putLeShort(bytes, 26, 1)         // planes
    putLeShort(bytes, 28, 24)        // bpp
    putLeInt(bytes, 34, stride * h)  // image size (compression = 0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          bytes(54 + y * stride + x * 3 + c) = (bmpBase(id, c) + x).toByte
          c += 1
        }
        x += 1
      }
      y += 1 // padding bytes stay 0 — a decoder that reads them skews the mean
    }
    bytes
  }

  /** Parse a 24bpp BMP: header fields + per-channel pixel means.
    * Every field is read from the bytes (nothing inferred from doc_id). */
  private[graft] def parseBmp(id: Long, bytes: Array[Byte]): BmpRow = {
    require(hasTag(bytes, 0, "BM"), s"doc $id: bad BMP magic")
    val off = leInt(bytes, 10)
    val w = leInt(bytes, 18)
    val h = leInt(bytes, 22)
    val bpp = leShort(bytes, 28)
    require(bpp == 24, s"doc $id: unsupported bpp $bpp")
    require(h > 0, s"doc $id: top-down BMP not expected here")
    val stride = (3 * w + 3) & ~3
    require(bytes.length >= off + stride * h, s"doc $id: truncated pixel data")
    val sums = new Array[Long](3)
    var y = 0
    while (y < h) {
      val row = off + (h - 1 - y) * stride // bottom-up: last row first
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { sums(c) += bytes(row + x * 3 + c) & 0xff; c += 1 }
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    BmpRow(id, w, h, 3,
      sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
  }

  /** Synthesize a canonical 44-byte-header RIFF/WAVE, 16-bit PCM mono. */
  private[graft] def synthWav(id: Long): Array[Byte] = {
    val n = wavN(id); val rate = wavRate(id); val amp = wavAmp(id)
    val dataSize = n * 2
    val bytes = new Array[Byte](44 + dataSize)
    putTag(bytes, 0, "RIFF"); putLeInt(bytes, 4, 36 + dataSize)
    putTag(bytes, 8, "WAVE"); putTag(bytes, 12, "fmt ")
    putLeInt(bytes, 16, 16)          // fmt chunk size
    putLeShort(bytes, 20, 1)         // PCM
    putLeShort(bytes, 22, 1)         // mono
    putLeInt(bytes, 24, rate)
    putLeInt(bytes, 28, rate * 2)    // byte rate
    putLeShort(bytes, 32, 2)         // block align
    putLeShort(bytes, 34, 16)        // bits per sample
    putTag(bytes, 36, "data"); putLeInt(bytes, 40, dataSize)
    var i = 0
    while (i < n) { putLeShort(bytes, 44 + i * 2, amp + (i % 2)); i += 1 }
    bytes
  }

  /** Parse RIFF/fmt/data + decode LE int16 samples → count and mean. */
  private[graft] def parseWav(id: Long, bytes: Array[Byte]): WavRow = {
    require(hasTag(bytes, 0, "RIFF") && hasTag(bytes, 8, "WAVE"),
      s"doc $id: bad RIFF header")
    require(hasTag(bytes, 12, "fmt ") && hasTag(bytes, 36, "data"),
      s"doc $id: unexpected chunk layout")
    require(leShort(bytes, 20) == 1, s"doc $id: not PCM")
    val channels = leShort(bytes, 22)
    val rate = leInt(bytes, 24)
    val bits = leShort(bytes, 34)
    val dataSize = leInt(bytes, 40)
    require(bits == 16, s"doc $id: unsupported bit depth $bits")
    require(bytes.length == 44 + dataSize, s"doc $id: truncated data chunk")
    val n = dataSize / 2 / channels
    var sum = 0L
    var i = 0
    while (i < n * channels) {
      sum += leShort(bytes, 44 + i * 2).toShort // sign-extend LE int16
      i += 1
    }
    WavRow(id, rate, channels, bits, n, sum.toDouble / (n * channels))
  }

  /** A second planted WAV family for FEATURE extraction: the decode
    * query's near-constant ramp has degenerate energy/zero-crossing
    * structure, so this one carries a deterministic pseudo-noise tone —
    * sample i = ((id·31 + i·17) mod 401) − 200 — that both the byte
    * kernel and the closed-form oracle can reproduce exactly. Same
    * canonical RIFF layout as synthWav. */
  private[graft] def synthWavTone(id: Long): Array[Byte] = {
    val n = wavN(id); val rate = wavRate(id)
    val dataSize = n * 2
    val bytes = new Array[Byte](44 + dataSize)
    putTag(bytes, 0, "RIFF"); putLeInt(bytes, 4, 36 + dataSize)
    putTag(bytes, 8, "WAVE"); putTag(bytes, 12, "fmt ")
    putLeInt(bytes, 16, 16)
    putLeShort(bytes, 20, 1)
    putLeShort(bytes, 22, 1)
    putLeInt(bytes, 24, rate)
    putLeInt(bytes, 28, rate * 2)
    putLeShort(bytes, 32, 2)
    putLeShort(bytes, 34, 16)
    putTag(bytes, 36, "data"); putLeInt(bytes, 40, dataSize)
    var i = 0
    while (i < n) {
      putLeShort(bytes, 44 + i * 2, (((id * 31 + i * 17) % 401) - 200).toInt)
      i += 1
    }
    bytes
  }

  /** Framed audio features FROM THE BYTES (frame = 32 samples, hop =
    * frame, last frame partial): per frame the integer energy Σx², the
    * strict zero-crossing count (x_{i-1}·x_i < 0 within the frame) and
    * the peak |x| — the classic VAD/segmentation trio, computed in
    * exact integer arithmetic so the oracle matches bit-for-bit. */
  private[graft] def wavFrameFeats(id: Long, bytes: Array[Byte]): Seq[FrameFeat] = {
    require(hasTag(bytes, 0, "RIFF") && hasTag(bytes, 8, "WAVE"),
      s"doc $id: bad RIFF header")
    require(leShort(bytes, 34) == 16 && leShort(bytes, 22) == 1,
      s"doc $id: feature kernel wants 16-bit mono")
    val n = leInt(bytes, 40) / 2
    val F = 32
    (0 until n).grouped(F).zipWithIndex.map { case (idx, f) =>
      var energy = 0L; var zcr = 0L; var peak = 0L
      var prev = 0L; var first = true
      idx.foreach { i =>
        val x = leShort(bytes, 44 + i * 2).toShort.toLong
        energy += x * x
        if (!first && prev * x < 0) zcr += 1
        if (math.abs(x) > peak) peak = math.abs(x)
        prev = x; first = false
      }
      FrameFeat(id, f.toLong, idx.size.toLong, energy, zcr, peak)
    }.toSeq
  }

  /** Nearest-neighbor resize: parse the source BMP, resample into a
    * fresh spec-compliant BMP (new stride/padding computed for the
    * target dims), preserving bottom-up row order. The mapping is the
    * standard floor(dst·src/dstDim) sample grid. Everything is read
    * from the BYTES — dims, offset, stride — never from doc_id. */
  private[graft] def resizeBmp(src: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    require(hasTag(src, 0, "BM"), "bad BMP magic")
    val off = leInt(src, 10)
    val w = leInt(src, 18); val h = leInt(src, 22)
    require(leShort(src, 28) == 24 && h > 0, "unsupported BMP variant")
    val strideS = (3 * w + 3) & ~3
    val strideD = (3 * w2 + 3) & ~3
    val out = new Array[Byte](54 + strideD * h2)
    putTag(out, 0, "BM")
    putLeInt(out, 2, out.length)
    putLeInt(out, 10, 54); putLeInt(out, 14, 40)
    putLeInt(out, 18, w2); putLeInt(out, 22, h2)
    putLeShort(out, 26, 1); putLeShort(out, 28, 24)
    putLeInt(out, 34, strideD * h2)
    var y2 = 0
    while (y2 < h2) {
      val ys = (y2.toLong * h / h2).toInt
      var x2 = 0
      while (x2 < w2) {
        val xs = (x2.toLong * w / w2).toInt
        var c = 0
        while (c < 3) {
          out(54 + y2 * strideD + x2 * 3 + c) = src(off + ys * strideS + xs * 3 + c)
          c += 1
        }
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** 64-bit average hash (aHash) computed FROM BMP BYTES: parse the
    * header, nearest-neighbor-sample the pixel grid to 8×8, convert
    * each cell to 3×grayscale (b+g+r — no division, stays integer),
    * and set bit j=y·8+x iff the cell is strictly brighter than the
    * grid mean (`64·g3(j) > Σg3` — an exact integer comparison, so
    * the hash is bit-stable everywhere). This is the standard
    * image-near-dup fingerprint a multimodal curation pipeline buckets
    * on; hamming-adjacent hashes would route through the simhash
    * band-split join, equal hashes dedupe with a plain groupBy. */
  private[graft] def aHashBmp(bytes: Array[Byte]): Long = {
    require(hasTag(bytes, 0, "BM"), "bad BMP magic")
    val off = leInt(bytes, 10)
    val w = leInt(bytes, 18); val h = leInt(bytes, 22)
    require(leShort(bytes, 28) == 24 && h > 0, "unsupported BMP variant")
    val stride = (3 * w + 3) & ~3
    val g3 = new Array[Long](64)
    var sum3 = 0L
    var j = 0
    while (j < 64) {
      val y2 = j / 8; val x2 = j % 8
      val ys = y2 * h / 8; val xs = x2 * w / 8
      val p = off + (h - 1 - ys) * stride + xs * 3 // bottom-up rows
      g3(j) = (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)
      sum3 += g3(j)
      j += 1
    }
    var hash = 0L
    j = 0
    while (j < 64) {
      if (64L * g3(j) > sum3) hash |= 1L << j
      j += 1
    }
    hash
  }

  /** Binary payload + typed metadata struct (schema is the contract).
    * Carrier bytes are the document text — meta/frames/stats treat the
    * payload as opaque, which is the point of a media column. */
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

  /** Image decode: synthesize the planted BMP payload into a binary
    * media column (map-side), then batch-decode it via mapPartitions
    * over a typed Dataset — the mapInPandas-shaped path (iterator-in /
    * iterator-out per partition). One plan, zero shuffles; the oracle
    * checks parsed dims + channel means against the closed form. */
  private val decodeBmpQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaBytes(id, synthBmp(id))))
    media.mapPartitions(_.map(m => parseBmp(m.doc_id, m.media))).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("channels"),
        round(col("mean_b"), 6).as("mean_b"),
        round(col("mean_g"), 6).as("mean_g"),
        round(col("mean_r"), 6).as("mean_r"))
  }

  // mean of channel c = (h*(w*base + w*(w-1)/2)) / (w*h), all-integer
  // numerator mirroring the kernel's exact byte sum.
  private val decodeBmpSql =
    """WITH img AS (
      |  SELECT doc_id,
      |    CAST(4 + doc_id % 13 AS INT) AS w,
      |    CAST(3 + doc_id % 7 AS INT) AS h,
      |    (doc_id * 7) % 240 AS b0,
      |    (doc_id * 7 + 50) % 240 AS b1,
      |    (doc_id * 7 + 100) % 240 AS b2
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id, w AS width, h AS height, 3 AS channels,
      |  round((h * (w * b0 + (w * (w - 1)) // 2)) * 1.0 / (w * h), 6) AS mean_b,
      |  round((h * (w * b1 + (w * (w - 1)) // 2)) * 1.0 / (w * h), 6) AS mean_g,
      |  round((h * (w * b2 + (w * (w - 1)) // 2)) * 1.0 / (w * h), 6) AS mean_r
      |FROM img""".stripMargin

  /** Audio decode: same shape over planted 16-bit PCM WAV payloads. */
  private val decodeWavQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaBytes(id, synthWav(id))))
    media.mapPartitions(_.map(m => parseWav(m.doc_id, m.media))).toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_channels"),
        col("bits"), col("n_samples"), round(col("mean_amp"), 6).as("mean_amp"))
  }

  // sum = amp*n + n//2 (the i%2 ramp), mean mirrors the kernel division.
  private val decodeWavSql =
    """WITH au AS (
      |  SELECT doc_id,
      |    CAST(8000 + 100 * (doc_id % 5) AS INT) AS sample_rate,
      |    CAST(64 + doc_id % 100 AS INT) AS n,
      |    (doc_id % 400) - 200 AS amp
      |  FROM documents WHERE doc_id % 3 = 1)
      |SELECT doc_id, sample_rate, 1 AS n_channels, 16 AS bits,
      |  n AS n_samples,
      |  round((amp * n + n // 2) * 1.0 / n, 6) AS mean_amp
      |FROM au""".stripMargin

  /** Audio feature extraction: synth tone payloads → byte kernel →
    * framed energy/ZCR/peak/RMS. Map-side end to end (the per-doc
    * flatMap is the mapPartitions-kernel pattern every media op here
    * uses); at 100 TB this is the embarrassingly-parallel
    * feature-extraction pass before audio dedup/filtering. */
  private val audioFeaturesQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaBytes(id, synthWavTone(id))))
    media.flatMap(m => wavFrameFeats(m.doc_id, m.media)).toDF()
      .select(col("doc_id"), col("frame"), col("f_len"),
        col("energy_q"), col("zcr"), col("peak"),
        round(sqrt(col("energy_q").cast("double") / col("f_len")), 6)
          .as("rms"))
  }

  private val audioFeaturesSql =
    """WITH au AS (
      |  SELECT doc_id, CAST(64 + doc_id % 100 AS INT) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |sm AS (
      |  SELECT doc_id, i,
      |    ((doc_id * 31 + i * 17) % 401) - 200 AS x,
      |    i // 32 AS frame
      |  FROM au CROSS JOIN unnest(range(0, n)) AS t(i)),
      |zc AS (
      |  SELECT doc_id, frame, i, x,
      |    lag(x) OVER (PARTITION BY doc_id, frame ORDER BY i) AS px
      |  FROM sm)
      |SELECT doc_id, frame, COUNT(*) AS f_len,
      |  CAST(SUM(x * x) AS BIGINT) AS energy_q,
      |  CAST(COUNT(*) FILTER (WHERE px * x < 0) AS BIGINT) AS zcr,
      |  max(abs(x)) AS peak,
      |  round(sqrt(CAST(SUM(x * x) AS BIGINT) * 1.0 / COUNT(*)), 6) AS rms
      |FROM zc GROUP BY 1, 2""".stripMargin

  /** Low-energy segment detection over the framed features — the
    * VAD/segmentation composition: gate frames on mean energy
    * (energy_q < 13400 · f_len — the pseudo-noise mean E[x²], so the
    * low class is ~half the frames and adjacent-run structure exists
    * at every fixture scale; integer compare, no division), then collapse consecutive low frames into maximal
    * runs with the gaps-and-islands constant (frame − row_number),
    * keeping runs of ≥ 2 frames. Decode and gating are map-only; the
    * one shuffle is the per-clip window — the same posture as every
    * series op. */
  private val audioSegmentsQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaBytes(id, synthWavTone(id))))
    val feats = media.flatMap(m => wavFrameFeats(m.doc_id, m.media)).toDF()
    val low = feats
      .filter(col("energy_q") < lit(13400L) * col("f_len"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame").asc)
    low
      .withColumn("grp", col("frame") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("frame")).as("seg_start"),
        max(col("frame")).as("seg_end"),
        count(lit(1)).as("seg_len"),
        sum(col("energy_q")).as("seg_energy_q"))
      .filter(col("seg_len") >= 2)
      .select(col("doc_id"), col("seg_start"), col("seg_end"),
        col("seg_len"), col("seg_energy_q"))
  }

  private val audioSegmentsSql =
    """WITH au AS (
      |  SELECT doc_id, CAST(64 + doc_id % 100 AS INT) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |sm AS (
      |  SELECT doc_id, i,
      |    ((doc_id * 31 + i * 17) % 401) - 200 AS x,
      |    i // 32 AS frame
      |  FROM au CROSS JOIN unnest(range(0, n)) AS t(i)),
      |fr AS (
      |  SELECT doc_id, frame, COUNT(*) AS f_len,
      |    CAST(SUM(x * x) AS BIGINT) AS energy_q
      |  FROM sm GROUP BY 1, 2),
      |low AS (
      |  SELECT doc_id, frame, energy_q,
      |    frame - row_number() OVER (PARTITION BY doc_id
      |      ORDER BY frame ASC) AS grp
      |  FROM fr WHERE energy_q < 13400 * f_len)
      |SELECT doc_id, min(frame) AS seg_start, max(frame) AS seg_end,
      |  COUNT(*) AS seg_len,
      |  CAST(SUM(CAST(energy_q AS DECIMAL(18,0))) AS BIGINT)
      |    AS seg_energy_q
      |FROM low GROUP BY doc_id, grp
      |HAVING COUNT(*) >= 2""".stripMargin

  /** Image resize: synth → half-size nearest-neighbor resize (target
    * dims derived from the PARSED header, min 2) → decode the resized
    * bytes. The oracle reproduces the sample grid arithmetically:
    * resized mean_c = (h2·(w2·base_c + Σ⌊x2·w/w2⌋)) / (w2·h2) — the
    * same single-division integer form the kernel computes, so the
    * doubles match bit-for-bit. */
  private val resizeQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaBytes(id, synthBmp(id))))
    media.mapPartitions(_.map { m =>
      val w = leInt(m.media, 18); val h = leInt(m.media, 22)
      val resized = resizeBmp(m.media, math.max(2, w / 2), math.max(2, h / 2))
      parseBmp(m.doc_id, resized)
    }).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("channels"),
        round(col("mean_b"), 6).as("mean_b"),
        round(col("mean_g"), 6).as("mean_g"),
        round(col("mean_r"), 6).as("mean_r"))
  }

  private val resizeSql =
    """WITH img AS (
      |  SELECT doc_id,
      |    CAST(4 + doc_id % 13 AS INT) AS w,
      |    CAST(3 + doc_id % 7 AS INT) AS h,
      |    (doc_id * 7) % 240 AS b0,
      |    (doc_id * 7 + 50) % 240 AS b1,
      |    (doc_id * 7 + 100) % 240 AS b2
      |  FROM documents WHERE doc_id % 3 = 0),
      |d AS (SELECT *, GREATEST(2, w // 2) AS w2, GREATEST(2, h // 2) AS h2
      |      FROM img),
      |g AS (SELECT doc_id, w2, h2, b0, b1, b2,
      |        list_sum(list_transform(range(0, w2), x -> (x * w) // w2)) AS sx
      |      FROM d)
      |SELECT doc_id, CAST(w2 AS INT) AS width, CAST(h2 AS INT) AS height,
      |  3 AS channels,
      |  round((h2 * (w2 * b0 + sx)) * 1.0 / (w2 * h2), 6) AS mean_b,
      |  round((h2 * (w2 * b1 + sx)) * 1.0 / (w2 * h2), 6) AS mean_g,
      |  round((h2 * (w2 * b2 + sx)) * 1.0 / (w2 * h2), 6) AS mean_r
      |FROM g""".stripMargin

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

  /** Scene-cut detection — the video-segmentation pass frame sampling
    * feeds: every 64-byte frame's energy (byte-value sum, integer-
    * exact) is compared to its predecessor per video; a jump above the
    * threshold marks a cut. Energy extraction is a map-side 64-way
    * fold per frame (no shuffle — the same per-frame feature shape as
    * the audio energy/ZCR kernel); the only exchange is the per-video
    * lag window, keyed on doc_id. At 100 TB each video's frames stay
    * in one task unless a single video outgrows it — then the same
    * chunk-boundary split the gap-fill LOCF documents applies. */
  private val SceneCutThresh = 250
  private val sceneCutsQ = (s: SparkSession, dir: String) => {
    val frames = mediaTable(s, dir)
      .filter(col("meta.media_type") === "video" && col("meta.n_bytes") >= 128)
      .select(col("doc_id"), col("media").cast("string").as("txt"),
        explode(expr("sequence(0, CAST(meta.n_bytes / 64 AS INT) - 1)"))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr("""aggregate(sequence(1, 64), 0L, (acc, i) ->
               |  acc + ascii(substring(txt, frame_idx * 64 + i, 1)))"""
          .stripMargin).as("energy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx").asc)
    frames
      .withColumn("delta", col("energy") - lag(col("energy"), 1).over(w))
      .filter(abs(col("delta")) > SceneCutThresh)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("energy"), col("delta"))
  }

  private val sceneCutsSql =
    s"""WITH v AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % 3 = 2 AND length(text) >= 128),
       |f AS (
       |  SELECT doc_id, text,
       |    unnest(range(0, CAST(floor(length(text) / 64) AS BIGINT)))
       |      AS frame_idx
       |  FROM v),
       |e AS (
       |  SELECT doc_id, frame_idx,
       |    list_sum(list_transform(range(1, 65),
       |      i -> ord(substring(text, CAST(frame_idx * 64 + i AS INT), 1))))
       |      AS energy
       |  FROM f),
       |d AS (
       |  SELECT doc_id, frame_idx, CAST(energy AS BIGINT) AS energy,
       |    CAST(energy - lag(energy) OVER (
       |      PARTITION BY doc_id ORDER BY frame_idx) AS BIGINT) AS delta
       |  FROM e)
       |SELECT doc_id, frame_idx, energy, delta
       |FROM d WHERE abs(delta) > $SceneCutThresh""".stripMargin

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

  /** Pattern-payload generator for the perceptual-hash demo: same BMP
    * container as synthBmp, but the CONTENT is a doc-keyed binary
    * stripe image — pixel(x,·,·) is bright (220) where bit
    * `(x·8)/w` of `doc_id % 255` is set, dark (30) elsewhere. Unlike
    * the linear gradient (whose aHash is structurally constant: a
    * monotone ramp thresholded at its mean always splits 4/4), stripe
    * content makes the hash a genuine function of the image, giving
    * real near-identical clusters (docs sharing a stripe pattern). */
  private[graft] def synthBmpPattern(id: Long): Array[Byte] = {
    val w = bmpW(id); val h = bmpH(id)
    val m = (id % 255).toInt
    val stride = (3 * w + 3) & ~3
    val bytes = new Array[Byte](54 + stride * h)
    putTag(bytes, 0, "BM")
    putLeInt(bytes, 2, bytes.length)
    putLeInt(bytes, 10, 54); putLeInt(bytes, 14, 40)
    putLeInt(bytes, 18, w); putLeInt(bytes, 22, h)
    putLeShort(bytes, 26, 1); putLeShort(bytes, 28, 24)
    putLeInt(bytes, 34, stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = if (((m >> (x * 8 / w)) & 1) == 1) 220 else 30
        var c = 0
        while (c < 3) {
          bytes(54 + y * stride + x * 3 + c) = v.toByte; c += 1
        }
        x += 1
      }
      y += 1
    }
    bytes
  }

  /** Image dedup by perceptual hash: synthesize stripe-pattern image
    * payloads, aHash each FROM BYTES (map-side, zero shuffles until
    * the final small groupBy on the 8-byte hash), group equal hashes
    * into near-identical-image clusters with a canonical keeper.
    * Hamming-adjacent hashes would route through the simhash
    * band-split join; equal hashes dedupe with this plain groupBy.
    * The planted stripes make the hash closed-form for DuckDB: cell
    * (x₂,·) samples pixel xs=(x₂·w)/8 whose stripe bit is
    * (xs·8)/w, every row identical (8-bit pattern × 0x0101…01), and
    * the threshold `8·v > Σv` keeps exactly the bright cells (unless
    * all 8 samples are bright — then nothing exceeds the mean). The
    * byte-walking kernel must reproduce those exact 64-bit values
    * (MultimodalSpec additionally tampers a sampled pixel to prove
    * the bytes are read). */
  private val phashQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, aHashBmp(synthBmpPattern(id)))))
      .toDF("doc_id", "phash")
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("keep_doc_id"))
  }

  private val phashSql =
    """WITH img AS (
      |  SELECT doc_id, 4 + doc_id % 13 AS w, doc_id % 255 AS m
      |  FROM documents WHERE doc_id % 3 = 0),
      |cell AS (
      |  SELECT doc_id, w, m, unnest(range(0, 8)) AS x2 FROM img),
      |cv AS (
      |  SELECT doc_id, x2,
      |    CASE WHEN ((m >> ((((x2 * w) // 8) * 8) // w)) & 1) = 1
      |         THEN 220 ELSE 30 END AS v
      |  FROM cell),
      |s AS (SELECT doc_id, SUM(v) AS sv FROM cv GROUP BY 1),
      |rb AS (
      |  SELECT cv.doc_id,
      |    CAST(SUM(CASE WHEN 8 * v > sv THEN 1 << x2 ELSE 0 END)
      |      AS HUGEINT) AS rowbits
      |  FROM cv JOIN s ON cv.doc_id = s.doc_id GROUP BY 1),
      |hv AS (
      |  SELECT doc_id,
      |    rowbits * CAST(72340172838076673 AS HUGEINT) AS v FROM rb),
      |ph AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN v >= CAST('9223372036854775808' AS HUGEINT)
      |         THEN v - CAST('18446744073709551616' AS HUGEINT)
      |         ELSE v END AS BIGINT) AS phash
      |  FROM hv)
      |SELECT phash, COUNT(*) AS n_images, min(doc_id) AS keep_doc_id
      |FROM ph GROUP BY phash""".stripMargin

  /** Grid-payload generator for HAMMING-ADJACENT perceptual-hash
    * clustering: an 8×8 24bpp BMP whose pixels one-to-one cover the
    * aHash sample grid, so the hash recovers a doc-derived 64-bit
    * pattern exactly. Docs share a base pattern per group
    * g = (doc_id/3) % 16; every 4th group member additionally flips
    * 1 planted bit, every 8th flips 2 — near-identical-but-NOT-equal
    * images (hash hamming 1-2) that a plain equal-hash groupBy can
    * never cluster. Storage row sy holds pattern row (7-sy) so the
    * bottom-up BMP read in aHashBmp lands bit j of the pattern at
    * hash bit j. */
  private[graft] def synthBmpGrid(id: Long): Array[Byte] = {
    val t = id / 3; val g = (t % 16).toInt
    var pattern = 0L
    var j = 0
    while (j < 64) {
      val b = (13 * g + 29 * (j / 8)) % 256
      if (((b >> (j % 8)) & 1) == 1) pattern ^= 1L << j
      j += 1
    }
    if (t % 4 == 0) pattern ^= 1L << (id % 64).toInt
    if (t % 8 == 0) pattern ^= 1L << ((id * 7 + 11) % 64).toInt
    val w = 8; val h = 8
    val stride = (3 * w + 3) & ~3
    val bytes = new Array[Byte](54 + stride * h)
    putTag(bytes, 0, "BM")
    putLeInt(bytes, 2, bytes.length)
    putLeInt(bytes, 10, 54); putLeInt(bytes, 14, 40)
    putLeInt(bytes, 18, w); putLeInt(bytes, 22, h)
    putLeShort(bytes, 26, 1); putLeShort(bytes, 28, 24)
    putLeInt(bytes, 34, stride * h)
    var sy = 0
    while (sy < h) {
      val py = 7 - sy // bottom-up: storage row sy = image row 7-sy
      var x = 0
      while (x < w) {
        val v = if (((pattern >> (py * 8 + x)) & 1L) == 1L) 220 else 30
        var c = 0
        while (c < 3) {
          bytes(54 + sy * stride + x * 3 + c) = v.toByte; c += 1
        }
        x += 1
      }
      sy += 1
    }
    bytes
  }

  /** Hamming-adjacent image dedup — the r3 gap closed: near-identical
    * images whose hashes are CLOSE but unequal route through an 8×8-bit
    * band-split self-join on the 64-bit aHash (pigeonhole: hamming ≤ 7
    * ⇒ at least one byte-band equal — a THEOREM, so unlike cosine LSH
    * this candidate generation is exact at every scale), hamming is
    * verified on candidates only, and connected components label the
    * clusters. 100 TB: 8 rows per image into one (band, value)
    * equi-join; the corpus is never crossed with itself; CC runs over
    * the verified edge list only. The oracle rebuilds every planted
    * pattern closed-form, packs it through HUGEINT into the same
    * signed 64-bit value, and clusters ALL hamming≤7 pairs by
    * recursive CTE — exact equality proves the banded path loses no
    * pair (MultimodalSpec additionally proves nonzero-hamming pairs
    * cluster and the plan carries no nested-loop join). */
  private val phashNearQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    val imgs = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, aHashBmp(synthBmpGrid(id)))))
      .toDF("doc_id", "phash")
    val bands = imgs.select(col("doc_id"), col("phash"),
      explode(array((0 until 8).map(i => struct(lit(i).as("band"),
        shiftright(col("phash"), i * 8).bitwiseAND(lit(255L)).as("bv"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(col("x.phash").bitwiseXOR(col("y.phash"))) <= 7)
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
      .distinct()
    Dedup.connectedComponentsStars(pairs)
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("kept", col("doc_id") === col("cluster_id"))
  }

  /** For MultimodalSpec: the verified hamming-adjacent pair list. */
  private[graft] def phashNearPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val imgs = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, aHashBmp(synthBmpGrid(id)))))
      .toDF("doc_id", "phash")
    val bands = imgs.select(col("doc_id"), col("phash"),
      explode(array((0 until 8).map(i => struct(lit(i).as("band"),
        shiftright(col("phash"), i * 8).bitwiseAND(lit(255L)).as("bv"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .filter(col("hamming") <= 7)
      .distinct()
  }

  /** Domain-scaled twin of [[phashNearQ]] (r9 sf1 screen finding —
    * 23.6× wall at 10× data): the synthetic BMP family recycles 16
    * base patterns, so ScaleGen copies pile near-identical images
    * into the SAME pattern space — duplicate CLASS size grows ∝ data
    * and the TRUE pair count is quadratic. The banded pigeonhole plan
    * is not at fault (its hamming ≤ 7 ⇒ shared-byte-band theorem holds
    * at every scale); the ANSWER is quadratic, exactly the unscaled-ER
    * shape r8 caught. Real corpora grow their image domain with the
    * data, so the twin scopes near-dup detection to the ingestion
    * band (doc_id div 10⁷ — ScaleGen's copy stride, the same move
    * q_dedup_er_entities_scaled makes): per-band candidates are
    * constant, totals ∝ copies, and within a band this is
    * [[phashNearQ]]'s exact structure (at sf ≤ 0.1 — one band — the
    * two queries coincide). BlockingGateSpec audits the volume on the
    * copies axis via [[phashScaledBandsCopies]]. */
  private val phashNearScaledQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    val imgs = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, aHashBmp(synthBmpGrid(id)))))
      .toDF("doc_id", "phash")
      .withColumn("cpy", expr("doc_id div 10000000"))
    val bands = imgs.select(col("doc_id"), col("phash"), col("cpy"),
      explode(array((0 until 8).map(i => struct(lit(i).as("band"),
        shiftright(col("phash"), i * 8).bitwiseAND(lit(255L)).as("bv"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("phash"), col("cpy"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.cpy") === col("y.cpy") &&
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(col("x.phash").bitwiseXOR(col("y.phash"))) <= 7)
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
      .distinct()
    Dedup.connectedComponentsStars(pairs)
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("kept", col("doc_id") === col("cluster_id"))
  }

  /** For BlockingGateSpec: the scaled twin's (id, k) band assignments
    * under its own growth axis (doc_id-shifted copies — ScaleGen's
    * move), so the gate can check candidate volume ∝ copies. */
  private[graft] def phashScaledBandsCopies(copies: Int)(
      s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val imgs = (0 until copies).map { c =>
      Tables.documents(s, dir).select(
        (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"))
    }.reduce(_ unionByName _)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, aHashBmp(synthBmpGrid(id)))))
      .toDF("doc_id", "phash")
      .withColumn("cpy", expr("doc_id div 10000000"))
    imgs.select(col("doc_id").as("id"),
      explode(array((0 until 8).map(i =>
        concat_ws("|", col("cpy"), lit(i),
          shiftright(col("phash"), i * 8).bitwiseAND(lit(255L)))): _*))
        .as("k"))
  }

  private val phashNearScaledSql =
    """WITH RECURSIVE img AS (
      |  SELECT doc_id, doc_id // 3 AS t, (doc_id // 3) % 16 AS g
      |  FROM documents WHERE doc_id % 3 = 0),
      |jb AS (SELECT doc_id, t, g, unnest(range(64)) AS j FROM img),
      |bits AS (SELECT doc_id, j,
      |  ((((13 * g + 29 * (j // 8)) % 256) >> CAST(j % 8 AS INT)) & 1
      |   + CASE WHEN t % 4 = 0 AND j = doc_id % 64 THEN 1 ELSE 0 END
      |   + CASE WHEN t % 8 = 0 AND j = (doc_id * 7 + 11) % 64 THEN 1 ELSE 0 END
      |  ) % 2 AS b
      |  FROM jb),
      |pc AS (SELECT doc_id, SUM(b) AS k FROM bits GROUP BY 1),
      |hv AS (SELECT bits.doc_id,
      |  CAST(SUM(CASE WHEN b = 1 AND k > 0 AND k < 64
      |       THEN CAST(power(2, j) AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)
      |    AS HUGEINT) AS v
      |  FROM bits JOIN pc ON bits.doc_id = pc.doc_id GROUP BY 1),
      |ph AS (SELECT doc_id,
      |  CAST(CASE WHEN v >= CAST('9223372036854775808' AS HUGEINT)
      |       THEN v - CAST('18446744073709551616' AS HUGEINT)
      |       ELSE v END AS BIGINT) AS phash FROM hv),
      |ham AS (SELECT a.doc_id AS ida, b.doc_id AS idb
      |        FROM ph a JOIN ph b ON a.doc_id < b.doc_id
      |         AND a.doc_id // 10000000 = b.doc_id // 10000000
      |        WHERE bit_count(xor(a.phash, b.phash)) <= 7),
      |edges AS (SELECT ida AS a, idb AS b FROM ham
      |          UNION SELECT idb, ida FROM ham),
      |reach AS (SELECT a AS id, b AS peer FROM edges
      |          UNION
      |          SELECT r.id, e.b FROM reach r JOIN edges e ON r.peer = e.a)
      |SELECT id AS doc_id, least(id, min(peer)) AS cluster_id,
      |  id = least(id, min(peer)) AS kept
      |FROM reach GROUP BY id""".stripMargin

  private val phashNearSql =
    """WITH RECURSIVE img AS (
      |  SELECT doc_id, doc_id // 3 AS t, (doc_id // 3) % 16 AS g
      |  FROM documents WHERE doc_id % 3 = 0),
      |jb AS (SELECT doc_id, t, g, unnest(range(64)) AS j FROM img),
      |bits AS (SELECT doc_id, j,
      |  ((((13 * g + 29 * (j // 8)) % 256) >> CAST(j % 8 AS INT)) & 1
      |   + CASE WHEN t % 4 = 0 AND j = doc_id % 64 THEN 1 ELSE 0 END
      |   + CASE WHEN t % 8 = 0 AND j = (doc_id * 7 + 11) % 64 THEN 1 ELSE 0 END
      |  ) % 2 AS b
      |  FROM jb),
      |pc AS (SELECT doc_id, SUM(b) AS k FROM bits GROUP BY 1),
      |hv AS (SELECT bits.doc_id,
      |  CAST(SUM(CASE WHEN b = 1 AND k > 0 AND k < 64
      |       THEN CAST(power(2, j) AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)
      |    AS HUGEINT) AS v
      |  FROM bits JOIN pc ON bits.doc_id = pc.doc_id GROUP BY 1),
      |ph AS (SELECT doc_id,
      |  CAST(CASE WHEN v >= CAST('9223372036854775808' AS HUGEINT)
      |       THEN v - CAST('18446744073709551616' AS HUGEINT)
      |       ELSE v END AS BIGINT) AS phash FROM hv),
      |ham AS (SELECT a.doc_id AS ida, b.doc_id AS idb
      |        FROM ph a JOIN ph b ON a.doc_id < b.doc_id
      |        WHERE bit_count(xor(a.phash, b.phash)) <= 7),
      |edges AS (SELECT ida AS a, idb AS b FROM ham
      |          UNION SELECT idb, ida FROM ham),
      |reach AS (SELECT a AS id, b AS peer FROM edges
      |          UNION
      |          SELECT r.id, e.b FROM reach r JOIN edges e ON r.peer = e.a)
      |SELECT id AS doc_id, least(id, min(peer)) AS cluster_id,
      |  id = least(id, min(peer)) AS kept
      |FROM reach GROUP BY id""".stripMargin

  /** Query-by-image (perceptual-hash ranked retrieval): the doc-0
    * grid image is the query; every other image ranks by EXACT hamming
    * distance between stored aHashes (`bit_count(xor)`) — top-5,
    * doc_id tie-break. This is the retrieval face of the same hash
    * family [[phashNearQ]] clusters: one map-side scalar per image +
    * a TakeOrdered merge, no shuffle. At 100 TB the banded equi-join
    * (pigeonhole: hamming ≤ 7 shares one of 8 byte-bands) prunes the
    * scan to candidates first — the exact ranking below is the
    * verification stage of that plan, and the oracle for both. */
  private val phashSearchQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    // the [[phashQ]] image family: its oracle (phashSql chain) is
    // proven BIT-identical to aHashBmp(synthBmpPattern(_)) — the hash
    // VALUE rides in q_mm_phash_dedup's exact-checked output — so
    // cross-engine hamming distances cannot diverge
    val imgs = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, aHashBmp(synthBmpPattern(id)))))
      .toDF("doc_id", "phash")
    val qh = imgs.filter(col("doc_id") === 0)
      .select(col("phash").as("qh"))
    imgs.filter(col("doc_id") =!= 0)
      .crossJoin(broadcast(qh))
      .select(col("doc_id"),
        bit_count(col("phash").bitwiseXOR(col("qh"))).as("hamming"))
      .orderBy(col("hamming").asc, col("doc_id").asc)
      .limit(5)
  }

  private val phashSearchSql = {
    // identical hash derivation as phashSql's chain (bit-identical to
    // aHashBmp(synthBmpPattern(_)) — exact-checked via q_mm_phash_dedup)
    val phChain =
      """WITH img AS (
        |  SELECT doc_id, 4 + doc_id % 13 AS w, doc_id % 255 AS m
        |  FROM documents WHERE doc_id % 3 = 0),
        |cell AS (
        |  SELECT doc_id, w, m, unnest(range(0, 8)) AS x2 FROM img),
        |cv AS (
        |  SELECT doc_id, x2,
        |    CASE WHEN ((m >> ((((x2 * w) // 8) * 8) // w)) & 1) = 1
        |         THEN 220 ELSE 30 END AS v
        |  FROM cell),
        |s AS (SELECT doc_id, SUM(v) AS sv FROM cv GROUP BY 1),
        |rb AS (
        |  SELECT cv.doc_id,
        |    CAST(SUM(CASE WHEN 8 * v > sv THEN 1 << x2 ELSE 0 END)
        |      AS HUGEINT) AS rowbits
        |  FROM cv JOIN s ON cv.doc_id = s.doc_id GROUP BY 1),
        |hv AS (
        |  SELECT doc_id,
        |    rowbits * CAST(72340172838076673 AS HUGEINT) AS v FROM rb),
        |ph AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN v >= CAST('9223372036854775808' AS HUGEINT)
        |         THEN v - CAST('18446744073709551616' AS HUGEINT)
        |         ELSE v END AS BIGINT) AS phash
        |  FROM hv)""".stripMargin
    s"""$phChain,
       |q AS (SELECT phash AS qh FROM ph WHERE doc_id = 0)
       |SELECT p.doc_id,
       |  CAST(bit_count(xor(p.phash, q.qh)) AS INTEGER) AS hamming
       |FROM ph p, q WHERE p.doc_id <> 0
       |ORDER BY hamming ASC, p.doc_id ASC LIMIT 5""".stripMargin
  }

  final case class DomColor(doc_id: Long, qb: Long, qg: Long, qr: Long,
      pix_count: Long)

  /** Dominant color — per image, the most frequent 16-level-quantized
    * RGB bucket (the palette/thumbnail primitive): the kernel READS
    * every pixel from the decoded bytes (bottom-up rows, stride
    * padding skipped — same honest walk as [[parseBmp]]), counts
    * (b div 16, g div 16, r div 16) triples, and picks the max with
    * the lexicographically-smallest-bucket tie-break. The oracle
    * recomputes from the planted closed form.
    *
    * 100 TB posture: map-only per-image kernel (iterator-in/out per
    * partition, the mapInPandas shape); nothing shuffles. */
  private[graft] def dominantColor(id: Long, bytes: Array[Byte]): DomColor = {
    require(hasTag(bytes, 0, "BM"), s"doc $id: bad BMP magic")
    val off = leInt(bytes, 10)
    val w = leInt(bytes, 18)
    val h = leInt(bytes, 22)
    require(leShort(bytes, 28) == 24, s"doc $id: unsupported bpp")
    val stride = (3 * w + 3) & ~3
    val counts = new java.util.HashMap[Long, Long]()
    var y = 0
    while (y < h) {
      val row = off + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val qb = (bytes(row + x * 3) & 0xff) / 16
        val qg = (bytes(row + x * 3 + 1) & 0xff) / 16
        val qr = (bytes(row + x * 3 + 2) & 0xff) / 16
        val key = qb.toLong * 256 + qg * 16 + qr
        counts.merge(key, 1L, (a, b) => a + b)
        x += 1
      }
      y += 1
    }
    var bestKey = -1L; var bestN = -1L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey.longValue; val n = e.getValue.longValue
      if (n > bestN || (n == bestN && k < bestKey)) { bestKey = k; bestN = n }
    }
    DomColor(id, bestKey / 256, (bestKey / 16) % 16, bestKey % 16, bestN)
  }

  private val domColorQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => dominantColor(id, synthBmp(id))))
      .toDF()
  }

  private val domColorSql =
    """WITH img AS (
      |  SELECT doc_id,
      |    CAST(4 + doc_id % 13 AS INT) AS w,
      |    CAST(3 + doc_id % 7 AS INT) AS h,
      |    (doc_id * 7) % 240 AS b0,
      |    (doc_id * 7 + 50) % 240 AS b1,
      |    (doc_id * 7 + 100) % 240 AS b2
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT doc_id, h,
      |    (b0 + x) // 16 AS qb, (b1 + x) // 16 AS qg,
      |    (b2 + x) // 16 AS qr
      |  FROM img CROSS JOIN unnest(range(0, w)) AS t(x)),
      |cnt AS (
      |  SELECT doc_id, qb, qg, qr,
      |    COUNT(*) * MAX(h) AS pix_count
      |  FROM px GROUP BY 1, 2, 3, 4),
      |pick AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY pix_count DESC, qb ASC, qg ASC, qr ASC) AS rk
      |  FROM cnt)
      |SELECT doc_id, CAST(qb AS BIGINT) AS qb, CAST(qg AS BIGINT) AS qg,
      |  CAST(qr AS BIGINT) AS qr, CAST(pix_count AS BIGINT) AS pix_count
      |FROM pick WHERE rk = 1""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_mm_dominant_color" -> Q(domColorQ, Some(domColorSql),
      "per-image dominant quantized RGB bucket from the decoded pixels, map-only"),
    "q_mm_phash_search" -> Q(phashSearchQ, Some(phashSearchSql),
      "query-by-image: exact hamming rank over stored aHashes, top-5"),
    "q_mm_phash_dedup" -> Q(phashQ, Some(phashSql),
      "image near-dup clusters: aHash from decoded bytes, closed-form oracle"),
    "q_mm_phash_near" -> Q(phashNearQ, Some(phashNearSql),
      "hamming-adjacent image clusters: banded aHash join, CC over verified pairs" +
        " (fixture recycles 16 patterns: the ANSWER is pair-quadratic in data" +
        " — r9 screen measured 23.6x wall at 10x; scale users call the twin)",
      scale = graft.ScaleClass.FixtureDiagnostic("q_mm_phash_near_scaled")),
    "q_mm_phash_near_scaled" -> Q(phashNearScaledQ, Some(phashNearScaledSql),
      "domain-scaled hamming clusters: near-dup scoped to the ScaleGen copy" +
        " band (doc_id div 1e7), volume proportional to copies — linear total"),
    "q_mm_meta" -> Q(metaQ, Some(metaSql),
      "binary media column + typed metadata struct projection"),
    "q_mm_decode" -> Q(decodeBmpQ, Some(decodeBmpSql),
      "real 24bpp BMP decode (header parse + per-channel pixel means) over planted payloads"),
    "q_mm_decode_wav" -> Q(decodeWavQ, Some(decodeWavSql),
      "real 16-bit PCM WAV decode (RIFF parse + sample stats) over planted payloads"),
    "q_mm_audio_segments" -> Q(audioSegmentsQ, Some(audioSegmentsSql),
      "low-energy audio segmentation: frame gate + consecutive-run islands per clip"),
    "q_mm_audio_features" -> Q(audioFeaturesQ, Some(audioFeaturesSql),
      "framed audio features from bytes: energy/ZCR/peak/RMS, integer-exact"),
    "q_mm_resize" -> Q(resizeQ, Some(resizeSql),
      "nearest-neighbor BMP resize (re-encode + re-decode), closed-form oracle"),
    "q_mm_frames" -> Q(frameQ, Some(frameSql),
      "frame sampling: every 4th 64-byte block of video payloads"),
    "q_mm_scene_cuts" -> Q(sceneCutsQ, Some(sceneCutsSql),
      "scene-cut detection: integer frame-energy deltas over a per-video lag window"),
    "q_mm_stats" -> Q(statsQ, Some(statsSql),
      "per-media-type resource accounting"))
}

/** Pluggable media-decode kernels (the r4 verdict's extension point):
  * the oracle-checked operators above are constrained to codecs whose
  * output is a CLOSED-FORM function of doc_id (BMP/WAV over planted
  * bytes), but a production pipeline meets JPEG/PNG/FLAC/MP4. This
  * registry is the seam where real codecs plug in WITHOUT touching the
  * engine: a kernel is any `Dataset[MediaBytes] ⇒ DataFrame` — the
  * same per-partition batch shape every built-in uses (one iterator
  * per partition; amortize codec setup per batch, never per row;
  * embarrassingly parallel, no shuffle introduced by decode itself).
  *
  * Built-ins register the BMP/WAV parsers at load; MultimodalSpec
  * registers a real JPEG kernel over `javax.imageio` (JDK-bundled, no
  * external dependency) and proves round-trip dimension recovery —
  * spec-only because lossy pixel output has no DuckDB closed form.
  * Kernels are format-keyed so ingest can route a mixed corpus by its
  * media-type column: `formats().map(f => decode(f, slice(f)))`. */
object MediaKernels {
  import org.apache.spark.sql.Dataset
  import Multimodal.MediaBytes

  type Kernel = Dataset[MediaBytes] => DataFrame

  private val kernels =
    new java.util.concurrent.ConcurrentHashMap[String, Kernel]()

  /** Register (or replace) the decode kernel for a format key. */
  def register(format: String, k: Kernel): Unit = kernels.put(format, k)

  def formats: Set[String] = {
    import scala.jdk.CollectionConverters._
    kernels.keySet.asScala.toSet
  }

  /** Decode a media column through the registered kernel. */
  def decode(format: String, media: Dataset[MediaBytes]): DataFrame = {
    val k = kernels.get(format)
    require(k != null,
      s"media kernels: no decoder registered for '$format' " +
        s"(have: ${formats.toSeq.sorted.mkString(", ")})")
    k(media)
  }

  // built-in kernels: the same parsers the oracle-checked queries run
  register("bmp", ds => {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(m =>
      Multimodal.parseBmp(m.doc_id, m.media))).toDF()
  })
  register("wav", ds => {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(m =>
      Multimodal.parseWav(m.doc_id, m.media))).toDF()
  })
}
