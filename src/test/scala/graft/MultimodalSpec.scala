package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("bmp decode: schema is the typed contract; output deterministic") {
    val df = run("q_mm_decode")
    assert(df.columns.toSeq ==
      Seq("doc_id", "width", "height", "channels", "mean_b", "mean_g", "mean_r"))
    val a = df.collect().map(_.toString).sorted
    val b = run("q_mm_decode").collect().map(_.toString).sorted
    assert(a.sameElements(b))
    val imageDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0).count()
    assert(a.length == imageDocs)
  }

  test("bmp decode recovers the planted dims and channel means") {
    run("q_mm_decode").collect().foreach { r =>
      val id = r.getLong(0)
      val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == 3)
      // mean(c) = base(c) + (w-1)/2 — exact, the pixel ramp is linear in x
      Seq(4, 5, 6).zipWithIndex.foreach { case (idx, c) =>
        val expect = ((id * 7 + c * 50) % 240) + (w - 1) / 2.0
        assert(math.abs(r.getDouble(idx) - expect) < 1e-9,
          s"doc $id channel $c: ${r.getDouble(idx)} != $expect")
      }
    }
  }

  test("wav decode recovers planted rate, count, and sample mean") {
    run("q_mm_decode_wav").collect().foreach { r =>
      val id = r.getLong(0)
      val n = 64 + (id % 100).toInt
      assert(r.getInt(1) == 8000 + 100 * (id % 5).toInt)
      assert(r.getInt(2) == 1 && r.getInt(3) == 16 && r.getInt(4) == n)
      val amp = (id % 400).toInt - 200
      // the query rounds mean_amp to 6 dp (HALF_UP, like the oracle)
      val expect = BigDecimal((amp.toLong * n + n / 2).toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - expect) < 1e-9)
    }
  }

  test("kernels parse bytes, not doc ids: corrupt headers are rejected") {
    val bmp = Multimodal.synthBmp(42)
    bmp(0) = 'X'.toByte // break the BM magic
    intercept[IllegalArgumentException](Multimodal.parseBmp(42, bmp))
    val wav = Multimodal.synthWav(43)
    wav(9) = 'X'.toByte // break WAVE tag
    intercept[IllegalArgumentException](Multimodal.parseWav(43, wav))
  }

  test("bmp stride padding is skipped; pixel bytes are load-bearing") {
    // id 27: doc_id%3==0 (image), width 4+27%13=5 -> 15 pixel bytes/row,
    // stride 16: one padding byte per row
    val id = 27L
    val clean = Multimodal.parseBmp(id, Multimodal.synthBmp(id))
    // flipping a PADDING byte must not change any mean
    val padded = Multimodal.synthBmp(id)
    val w = clean.width; val stride = (3 * w + 3) & ~3
    if (stride > 3 * w) {
      padded(54 + 3 * w) = 0x7f // first row's first padding byte
      assert(Multimodal.parseBmp(id, padded) == clean)
    }
    // flipping a PIXEL byte must change the affected channel's mean
    val tampered = Multimodal.synthBmp(id)
    tampered(54) = (tampered(54) + 40).toByte // blue of pixel (0, bottom row)
    val t = Multimodal.parseBmp(id, tampered)
    assert(t.mean_b != clean.mean_b && t.mean_g == clean.mean_g)
  }

  test("wav endianness is load-bearing: byte-swapped samples diverge") {
    val id = 44L * 3 + 1
    val clean = Multimodal.parseWav(id, Multimodal.synthWav(id))
    val swapped = Multimodal.synthWav(id)
    // swap the two bytes of the first sample
    val lo = swapped(44); swapped(44) = swapped(45); swapped(45) = lo
    val s = Multimodal.parseWav(id, swapped)
    assert(s.mean_amp != clean.mean_amp)
  }


  test("audio features read sample bytes: a tampered sample shifts its frame only") {
    val id = 44L * 3 + 1
    val clean = Multimodal.wavFrameFeats(id, Multimodal.synthWavTone(id))
    assert(clean.nonEmpty && clean.map(_.f_len).sum == 64 + id % 100)
    // flip one sample in frame 1 to an extreme value
    val tampered = Multimodal.synthWavTone(id)
    tampered(44 + 33 * 2) = 0x00.toByte
    tampered(44 + 33 * 2 + 1) = 0x7f.toByte // sample 33 -> +32512
    val t = Multimodal.wavFrameFeats(id, tampered)
    assert(t(1).energy_q != clean(1).energy_q && t(1).peak == 32512L)
    assert(t.head == clean.head, "frame 0 must be untouched")
  }

  test("resize: samples the source bytes (tampered pixel shifts the resized mean)") {
    val id = 12L // w=16 -> w2=8, h=furthest from degenerate
    val src = Multimodal.synthBmp(id)
    val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
    val w2 = math.max(2, w / 2); val h2 = math.max(2, h / 2)
    val clean = Multimodal.parseBmp(id, Multimodal.resizeBmp(src, w2, h2))
    assert(clean.width == w2 && clean.height == h2)
    // tamper a pixel the half-size sample grid HITS: (x=0, stored row 0)
    val tampered = src.clone()
    tampered(54) = (tampered(54) + 60).toByte
    val t = Multimodal.parseBmp(id, Multimodal.resizeBmp(tampered, w2, h2))
    assert(t.mean_b != clean.mean_b,
      "resize must read sampled source bytes, not closed forms")
    // tampering a pixel the grid SKIPS leaves the resize unchanged:
    // with w=16, w2=8 the grid takes even x only - poke odd x=1
    if (w == 16) {
      val skipped = src.clone()
      skipped(54 + 3) = (skipped(54 + 3) + 60).toByte // x=1, blue
      val sres = Multimodal.parseBmp(id, Multimodal.resizeBmp(skipped, w2, h2))
      assert(sres == clean, "nearest-neighbor must skip unsampled pixels")
    }
  }

  test("resize output is a spec-compliant BMP (round-trips the parser)") {
    (0L until 45L by 3).foreach { id =>
      val src = Multimodal.synthBmp(id)
      val r = Multimodal.resizeBmp(src, 3, 2) // odd target width: stride padding exercised
      val row = Multimodal.parseBmp(id, r)
      assert(row.width == 3 && row.height == 2 && row.channels == 3)
    }
  }

  test("decode preserves input partitioning (no repartition/coalesce)") {
    // synth + decode add no exchange: output partitions == input partitions
    val in = Tables.documents(spark, sf).rdd.getNumPartitions
    val out = run("q_mm_decode").rdd.getNumPartitions
    assert(out == in, s"decode changed partitioning $in -> $out")
    val plan = run("q_mm_decode").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("frames: only video docs, every 4th frame, valid checksums") {
    val rows = run("q_mm_frames").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 3 == 2) // video = doc_id % 3 == 2
      assert(r.getInt(1) % 4 == 0)
      assert(r.getString(2).length == 32) // md5 hex
    }
  }

  test("media stats account for every byte of the corpus") {
    val total = run("q_mm_stats").collect().map(_.getLong(2)).sum
    val expect = Tables.documents(spark, sf)
      .select(sum(length(col("text")))).collect()(0).getLong(0)
    assert(total == expect)
  }

  test("aHash reads sampled bytes: tampering a sampled pixel flips the " +
      "hash, an unsampled one leaves it") {
    val id = 12L // w=16, h=5: 8x8 grid samples even x only
    val clean = Multimodal.aHashBmp(Multimodal.synthBmpPattern(id))
    // the hash replicates one 8-bit row pattern up all 8 rows
    val row = clean & 0xffL
    assert((0 until 8).forall(r => ((clean >>> (8 * r)) & 0xffL) == row))
    // brighten a SAMPLED dark pixel far above the stripe levels: the
    // grid mean and at least that cell's verdict must move
    val t = Multimodal.synthBmpPattern(id)
    val w = 16; val stride = (3 * w + 3) & ~3
    // pixel (x=0, stored row 0) is sampled by cell (0, 7) (bottom-up)
    t(54) = 255.toByte; t(55) = 255.toByte; t(56) = 255.toByte
    assert(Multimodal.aHashBmp(t) != clean,
      "hash must be computed from pixel bytes")
    // an x the half grid skips (odd x=1) leaves the hash unchanged
    val sk = Multimodal.synthBmpPattern(id)
    sk(54 + 3) = 255.toByte; sk(54 + 4) = 255.toByte; sk(54 + 5) = 255.toByte
    assert(Multimodal.aHashBmp(sk) == clean,
      "nearest-neighbor aHash must skip unsampled pixels")
  }

  test("hamming-adjacent phash: planted non-equal near-dups are found and clustered") {
    val pairs = Multimodal.phashNearPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    // the planted 1-2-bit variants must surface as UNEQUAL near pairs —
    // the case an equal-hash groupBy can never catch
    val nonZero = pairs.count(_._3 > 0)
    assert(nonZero > 0, "no nonzero-hamming pair found; band path untested")
    assert(pairs.forall(_._3 <= 7))
    // and those near-pairs really end up in one cluster
    val clusters = run("q_mm_phash_near").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.filter(_._3 > 0).foreach { case (a, b, _) =>
      assert(clusters(a) == clusters(b),
        s"near pair ($a,$b) split across clusters")
    }
  }

  test("hamming-adjacent phash plan: banded equi-join, no nested-loop pairing") {
    val plan = Multimodal.phashNearPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"pair generation must be an equi-join on the hash band:\n${plan.take(800)}")
  }

  test("kernel registry: built-ins route by format; a real ImageIO JPEG " +
      "kernel plugs in and recovers dimensions") {
    import graft.operators.MediaKernels
    import graft.operators.Multimodal.MediaBytes
    val s = spark
    import s.implicits._
    assert(Set("bmp", "wav").subsetOf(MediaKernels.formats))
    // built-in routing: registry("bmp") ≡ the oracle-checked parser
    val ids = (0L until 12L).toSeq
    val bmp = ids.map(id => MediaBytes(id, Multimodal.synthBmp(id))).toDS()
    val viaRegistry = MediaKernels.decode("bmp", bmp)
      .select("doc_id", "width", "height").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(viaRegistry == ids.map(id =>
      (id, 4 + (id % 13).toInt, 3 + (id % 7).toInt)).toSet)
    // a REAL lossy codec plugs in without touching the engine: encode
    // per-doc-sized JPEGs with the JDK's ImageIO, register a kernel
    // that ImageIO-decodes per partition, recover the planted dims
    def jpegBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 37 + y * 101) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no JPEG writer")
      bos.toByteArray
    }
    MediaKernels.register("jpeg", ds => {
      import ds.sparkSession.implicits._
      ds.mapPartitions(_.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.media))
        (m.doc_id, img.getWidth, img.getHeight)
      }).toDF("doc_id", "width", "height")
    })
    val jpgs = ids.map(id =>
      MediaBytes(id, jpegBytes(5 + (id % 9).toInt, 4 + (id % 5).toInt))).toDS()
    val got = MediaKernels.decode("jpeg", jpgs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == ids.map(id =>
      (id, 5 + (id % 9).toInt, 4 + (id % 5).toInt)).toSet,
      "JPEG kernel must recover every planted dimension")
    // unknown format refuses with the available set
    val e = intercept[IllegalArgumentException] {
      MediaKernels.decode("mp4", bmp)
    }
    assert(e.getMessage.contains("no decoder registered"))
  }
}
