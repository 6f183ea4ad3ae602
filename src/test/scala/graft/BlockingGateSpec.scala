package graft

import graft.operators.BlockingAudit
import org.apache.spark.sql.functions._

/** r8 verdict #8 — the editdist lesson as a commit-time gate. For
  * every audited pigeonhole/banding scheme (BlockingAudit mirrors each
  * registered plan's key derivation) this spec measures the EXACT
  * candidate-pair volume of the band equi-join at two fixture scales
  * and enforces:
  *
  *  1. absolute:  volume ≤ linearC · N at BOTH scales (linearC is the
  *     entry's documented candidates-per-row bound), and
  *  2. growth:    volume grows ≤ GROWTH_SLACK × the row growth between
  *     the scales (a constant-entropy block key makes occupancy ∝ N
  *     and volume ∝ N² — growth ≈ rows² is exactly what this catches).
  *
  * Deliberately-degenerate schemes (linearC = None: the fuzzy-names
  * 10³ tercet space, simhash's fixed 32-value bands) are asserted to
  * EXCEED the growth bound — proving the gate fires — and their
  * registered queries are required to be quarantined (fuzzy_names is a
  * FixtureDiagnostic; simhash's constant collision fraction is pinned
  * by its own fraction assertion below).
  */
class BlockingGateSpec extends SparkSpec {

  // sf0.01 → sf0.1 (not sf0.001 →): below sf0.01 the 10³-value digit
  // slices are still FILLING (occupancy < 1 per key), so volume growth
  // is dominated by codespace saturation, not plan shape; from sf0.01
  // up the audited schemes are in their steady regime and growth reads
  // the true exponent.
  private val sfSmall = "/root/testdata/sf0.01"
  private val sfBig = "/root/testdata/sf0.1"
  // linear growth between the scales is ~10×; 3× occupancy slack.
  private val GROWTH_SLACK = 3.0

  private def measurePair(a: BlockingAudit.Audited) = {
    val lo = BlockingAudit.measure(a, spark, sfSmall)
    val hi = BlockingAudit.measure(a, spark, sfBig)
    info(f"${a.query}: lo rows=${lo.nRows} keys=${lo.nKeys} " +
      f"max=${lo.maxBucket} vol=${lo.volume} (${lo.volumePerRow}%.2f/row); " +
      f"hi rows=${hi.nRows} keys=${hi.nKeys} max=${hi.maxBucket} " +
      f"vol=${hi.volume} (${hi.volumePerRow}%.2f/row)")
    (lo, hi)
  }

  BlockingAudit.entries.filter(_.linearC.isDefined).foreach { a =>
    test(s"${a.query}: candidate volume is linear-bounded [${a.mirrors}]") {
      val (lo, hi) = measurePair(a)
      val c = a.linearC.get
      assert(lo.volume <= c * lo.nRows,
        s"lo volume ${lo.volume} > $c x ${lo.nRows} rows")
      assert(hi.volume <= c * hi.nRows,
        s"hi volume ${hi.volume} > $c x ${hi.nRows} rows")
      val rowGrowth = hi.nRows.toDouble / math.max(1L, lo.nRows)
      val volGrowth = hi.volume.toDouble / math.max(1L, lo.volume)
      assert(volGrowth <= GROWTH_SLACK * rowGrowth,
        f"volume grew $volGrowth%.1fx for $rowGrowth%.1fx rows — " +
          "super-linear: the block key is losing entropy")
    }
  }

  test("er_entities_scaled: volume is linear on ITS growth axis " +
      "(key-shifted copies)") {
    // Base-roster growth saturates the weakest 4-digit segment's 10⁴
    // codespace past N ≈ 10⁴ (this gate measured 88× volume for 10×
    // base rows sf0.01→sf0.1 — the documented boundary of the
    // sparse-code scheme). The twin's DESIGNED growth axis is
    // ScaleGen-style key-shifted copies, where the custkey div 10⁷
    // band prefix gives every copy its own blocking universe:
    // volume must be ∝ copies there.
    def at(copies: Int) = BlockingAudit.measure(
      BlockingAudit.Audited("q_dedup_er_entities_scaled",
        "Dedup.erScaledQ via erScaledBandsCopies",
        BlockingAudit.erScaledBandsCopies(copies), None, Some(8.0)),
      spark, sfSmall)
    val lo = at(1)
    val hi = at(10)
    info(f"er_scaled copies=1: rows=${lo.nRows} vol=${lo.volume} " +
      f"(${lo.volumePerRow}%.2f/row); copies=10: rows=${hi.nRows} " +
      f"vol=${hi.volume} (${hi.volumePerRow}%.2f/row)")
    assert(hi.volume <= 8.0 * hi.nRows)
    val rowGrowth = hi.nRows.toDouble / lo.nRows
    val volGrowth = hi.volume.toDouble / math.max(1L, lo.volume)
    assert(volGrowth <= GROWTH_SLACK * rowGrowth,
      f"volume grew $volGrowth%.1fx for $rowGrowth%.1fx rows across " +
        "key-shifted copies — the band prefix is not isolating copies")
  }

  test("phash_near_scaled: volume is linear on ITS growth axis " +
      "(doc_id-shifted copies)") {
    // The BMP fixture recycles 16 base patterns, so BASE growth piles
    // images into the same hash space and the true pair count is
    // quadratic (r9 sf1 screen: 23.6× wall at 10× data —
    // q_mm_phash_near is FixtureDiagnostic for exactly that). The
    // twin's designed growth axis is ScaleGen copies, where the cpy
    // band scopes every copy to its own blocking universe: volume
    // must be ∝ copies.
    def at(copies: Int) = BlockingAudit.measure(
      BlockingAudit.Audited("q_mm_phash_near_scaled",
        "Multimodal.phashNearScaledQ via phashScaledBandsCopies",
        graft.operators.Multimodal.phashScaledBandsCopies(copies), None,
        linearC = None),
      spark, sfSmall)
    val lo = at(1)
    val hi = at(10)
    info(f"phash_scaled copies=1: rows=${lo.nRows} vol=${lo.volume} " +
      f"(${lo.volumePerRow}%.2f/row); copies=10: rows=${hi.nRows} " +
      f"vol=${hi.volume} (${hi.volumePerRow}%.2f/row)")
    val rowGrowth = hi.nRows.toDouble / lo.nRows
    val volGrowth = hi.volume.toDouble / math.max(1L, lo.volume)
    assert(volGrowth <= GROWTH_SLACK * rowGrowth,
      f"volume grew $volGrowth%.1fx for $rowGrowth%.1fx rows across " +
        "doc_id-shifted copies — the cpy band is not isolating copies")
    // and the unscaled original is machine-quarantined
    assert(SparkEntry.scaleClass("q_mm_phash_near")
      .startsWith("fixture_diagnostic:"))
  }

  test("the gate FIRES on the degenerate witnesses (fixed codespaces)") {
    BlockingAudit.entries.filter(_.linearC.isEmpty).foreach { a =>
      val (lo, hi) = measurePair(a)
      val rowGrowth = hi.nRows.toDouble / math.max(1L, lo.nRows)
      val volGrowth = hi.volume.toDouble / math.max(1L, lo.volume)
      assert(volGrowth > GROWTH_SLACK * rowGrowth,
        s"${a.query} no longer degenerate? volume growth $volGrowth " +
          s"vs rows $rowGrowth — revisit its classification")
      // and the degenerate QUERIES are machine-quarantined
      assert(SparkEntry.scaleClass(a.query)
        .startsWith("fixture_diagnostic:"),
        s"${a.query} exceeds the growth bound but is not flagged " +
          "FixtureDiagnostic in the registry")
    }
  }

  test("simhash's collision fraction is the documented constant") {
    // 12 bands × 32 values: the band VALUE space is fixed, so same-
    // band collisions are a constant FRACTION of all pairs (on this
    // low-entropy word-soup corpus the measured fraction is ~1.9 —
    // the band join is pigeonhole-COMPLETE for hamming ≤ 10 but NOT a
    // cost win here, which is why q_dedup_simhash is registered
    // FixtureDiagnostic with the minhash-LSH family as its scale
    // twin). Pin the fraction so drift is visible: a hash change that
    // concentrates values further would push it toward the 12×
    // per-band ceiling.
    val a = BlockingAudit.entries.find(_.query == "q_dedup_simhash").get
    val hi = BlockingAudit.measure(a, spark, sfBig)
    val n = hi.nRows // distinct docs
    val allPairs = n.toDouble * (n - 1) / 2
    val frac = hi.volume / allPairs
    info(f"simhash same-band candidate fraction = $frac%.3f of all pairs")
    assert(frac < 4.0,
      f"simhash candidate volume is $frac%.2fx all-pairs (measured ~1.9" +
        " at calibration) — the hash is concentrating toward the 12x ceiling")
  }

  test("a constant block key fails the gate (synthetic degeneracy)") {
    val syn = BlockingAudit.Audited("synthetic_constant_key", "spec-local",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey").as("id"),
          substring(col("c_name"), 1, 8).as("k")), // "Customer" — constant
      None, linearC = Some(64.0))
    val lo = BlockingAudit.measure(syn, spark, sfSmall)
    val hi = BlockingAudit.measure(syn, spark, sfBig)
    val rowGrowth = hi.nRows.toDouble / lo.nRows
    val volGrowth = hi.volume.toDouble / math.max(1L, lo.volume)
    assert(volGrowth > GROWTH_SLACK * rowGrowth,
      "the synthetic constant key must trip the growth gate")
    assert(hi.volume > 64.0 * hi.nRows,
      "the synthetic constant key must trip the absolute gate")
  }
}
