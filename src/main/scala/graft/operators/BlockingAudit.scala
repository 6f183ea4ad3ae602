package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structural audit of every pigeonhole/banding plan's candidate
  * volume (r8 verdict #8 — "harden the editdist lesson into a gate").
  *
  * The r8 decade tier caught, by MEASUREMENT, a family of silent
  * blocking degeneracies: a block key whose entropy does not grow
  * with the data (editdist's "Custom"/"er#000" constant segments, the
  * ER 10⁷ pinned codespace, fuzzy_names' 10³ tercets) makes bucket
  * occupancy ∝ N and the "blocked" join quadratic exactly at scale.
  * This audit is the structural, commit-time version of that lesson:
  * for each banding query it recomputes the block-key ASSIGNMENTS
  * (one row per (item, block key) — mirroring the registered plan's
  * own key derivation, citation in each entry) and returns the exact
  * candidate-pair volume the band equi-join would produce:
  *
  *   self-join entries:  volume = Σ_k c_k·(c_k−1)/2
  *   two-sided entries:  volume = Σ_k a_k·b_k
  *
  * BlockingGateSpec runs every entry at two fixture scales and fails
  * if volume exceeds the entry's documented linear bound or grows
  * super-linearly between scales — so the next constant-key
  * degeneracy is caught at `sbt test` time, not at the decade tier.
  */
object BlockingAudit {

  /** One audited blocking scheme.
    *
    * @param query    registered query whose plan this mirrors
    * @param mirrors  where the mirrored key derivation lives
    * @param left     (id, k) block assignments of the probe/left side
    * @param right    (id, k) of the build side; None = self-join on left
    * @param linearC  documented bound: volume ≤ linearC · max(N_left, N_right)
    *                 (None = deliberately-degenerate witness, expected to FAIL)
    */
  final case class Audited(
      query: String,
      mirrors: String,
      left: (SparkSession, String) => DataFrame,
      right: Option[(SparkSession, String) => DataFrame],
      linearC: Option[Double])

  final case class Result(query: String, nRows: Long, nKeys: Long,
      maxBucket: Long, volume: Long) {
    def volumePerRow: Double = volume.toDouble / math.max(1L, nRows)
  }

  /** Exact candidate volume of an audited entry at one fixture dir.
    * `nRows` = distinct ITEMS on the build (right/self) side, so
    * `volumePerRow` reads as candidates-per-item at every entry. */
  def measure(a: Audited, s: SparkSession, dir: String): Result = {
    val l = a.left(s, dir)
    val lc = l.groupBy(col("k")).agg(count(lit(1)).as("ln"))
    a.right match {
      case None =>
        val nItems = l.agg(countDistinct(col("id"))).head().getLong(0)
        val row = lc.agg(
          count(lit(1)).as("keys"),
          max(col("ln")).as("mx"),
          sum(col("ln") * (col("ln") - 1L)).as("vol2")).head()
        Result(a.query, nItems, row.getLong(0), row.getLong(1),
          row.getLong(2) / 2)
      case Some(r) =>
        val rdf = r(s, dir)
        val nItems = rdf.agg(countDistinct(col("id"))).head().getLong(0)
        val rc = rdf.groupBy(col("k")).agg(count(lit(1)).as("rn"))
        val row = lc.join(rc, Seq("k"))
          .agg(count(lit(1)).as("keys"),
            max(greatest(col("ln"), col("rn"))).as("mx"),
            sum(col("ln") * col("rn")).as("vol")).head()
        Result(a.query, nItems, row.getLong(0), row.getLong(1),
          row.getLong(2))
    }
  }

  // ---- per-query key extractors (each mirrors the registered plan's
  //      derivation — same expressions, same band composition) -------

  /** q_join_editdist corpus side: 4 pigeonhole region keys over
    * c_name (3×3-digit slices + remainder suffix). Mirrors
    * Joins.editJoinQ's cb/block derivation. */
  private def editCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("g1", expr("substr(c_name, 10, 3)"))
      .withColumn("g2", expr("substr(c_name, 13, 3)"))
      .withColumn("g3", expr("substr(c_name, 16, 3)"))
      .withColumn("gs", expr("substr(c_name, 19)"))
      .select(col("c_custkey").as("id"), explode(array(
        concat_ws("|", lit("b0"), col("g2"), col("g3"), col("gs")),
        concat_ws("|", lit("b1"), col("g1"), col("g3"), col("gs")),
        concat_ws("|", lit("b2"), col("g1"), col("g2"), col("gs")),
        concat_ws("|", lit("b3"), col("g1"), col("g2"), col("g3"))))
        .as("k"))

  /** q_join_editdist probe side: every 50th name, one digit corrupted,
    * same 4 region keys. Mirrors Joins.editJoinQ's probes/pb. */
  private def editProbes(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") % 50L === 0L)
      .withColumn("ppos", (lit(10L) + col("c_custkey") % 8L).cast("int"))
      .withColumn("pn", expr("concat(substr(c_name, 1, ppos - 1)," +
        " CAST((CAST(substr(c_name, ppos, 1) AS INT) + 1) % 10" +
        " AS STRING), substr(c_name, ppos + 1))"))
      .withColumn("h1", expr("substr(pn, 10, 3)"))
      .withColumn("h2", expr("substr(pn, 13, 3)"))
      .withColumn("h3", expr("substr(pn, 16, 3)"))
      .withColumn("hs", expr("substr(pn, 19)"))
      .select(col("c_custkey").as("id"), explode(array(
        concat_ws("|", lit("b0"), col("h2"), col("h3"), col("hs")),
        concat_ws("|", lit("b1"), col("h1"), col("h3"), col("hs")),
        concat_ws("|", lit("b2"), col("h1"), col("h2"), col("hs")),
        concat_ws("|", lit("b3"), col("h1"), col("h2"), col("h3"))))
        .as("k"))

  /** q_dedup_minhash_lsh buckets: 16 bands × xxhash64 over 4 minima.
    * Mirrors Dedup.minhashQ's bandStructs/buckets derivation. */
  private def minhashBuckets(s: SparkSession, dir: String): DataFrame = {
    val profile = Dedup.minhashProfileForAudit(s, dir)
    Dedup.minhashBucketsForAudit(profile)
      .select(col("doc_id").as("id"),
        concat_ws("|", col("band"), col("bh")).as("k"))
  }

  /** q_dedup_simhash buckets: 12 bands × 5-bit slice. Mirrors
    * Dedup.simhashQ's bandCols derivation. NOTE the 5-bit band VALUE
    * space is fixed (32 values/band): collisions are a constant
    * FRACTION of pairs by design (hamming ≤ 10 of 60 pigeonholes at
    * band width 5 — wider bands would break the recall guarantee), so
    * this entry's bound is calibrated to the fixture's measured
    * constant, and the entry exists to catch the fraction DRIFTING,
    * not to certify linearity. */
  private def simhashBuckets(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashesForAudit(s, dir)
      .select(col("doc_id").as("id"), explode(array(
        (0 until 12).map(b => concat_ws("|", lit(b),
          shiftright(col("simhash"), b * 5).bitwiseAND(31L))): _*))
        .as("k"))

  /** q_join_spatial_grid_scaled: left = 3×3-exploded neighbor cells,
    * right = home cell, over the domain-scaling py. Mirrors
    * Joins.spatialScaledQ's pts/left/right derivation. */
  private def spatialPts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id").as("id"),
        pmod(floor(col("value") * 100d).cast("long"), lit(1000L))
          .as("px"),
        (pmod(col("user_id"), lit(1000L))
          + expr("user_id div 10000000") * 1000L).as("py"))

  private def spatialLeft(s: SparkSession, dir: String): DataFrame = {
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    spatialPts(s, dir)
      .withColumn("o", explode(offsets))
      .select(col("id"), concat_ws("|",
        expr("px div 8") + col("o.dx"),
        expr("py div 8") + col("o.dy")).as("k"))
  }

  private def spatialRight(s: SparkSession, dir: String): DataFrame =
    spatialPts(s, dir).select(col("id"),
      concat_ws("|", expr("px div 8"), expr("py div 8")).as("k"))

  /** q_dedup_er_entities_scaled under ITS OWN growth model: the twin
    * is designed for ScaleGen-style domain growth (key-shifted copies,
    * custkey + copy·10⁷ — the band prefix custkey div 10⁷ then splits
    * every copy into its own blocking universe). Growing the BASE
    * roster instead saturates the weakest 4-digit segment's 10⁴
    * codespace past N ≈ 10⁴ (the gate measured 88× volume for 10×
    * base rows sf0.01→sf0.1 — a real, documented boundary of the
    * sparse-code scheme, not a regression), so the audit replicates
    * the sf0.01 roster `copies` times with the 10⁷ key shift and
    * checks volume ∝ copies — the axis the query actually scales on. */
  private[graft] def erScaledBandsCopies(copies: Int)(
      s: SparkSession, dir: String): DataFrame = {
    val shifted = (0 until copies).map { c =>
      Tables.customer(s, dir).select(
        (col("c_custkey") + lit(c.toLong * 10000000L)).as("c_custkey"))
    }.reduce(_ unionByName _)
    val base = shifted
      .select(col("c_custkey").as("kk"),
        expr("c_custkey div 10000000").cast("string").as("band"),
        lpad((col("c_custkey") % 10000000L * 7919L % 10000000L)
          .cast("string"), 7, "0").as("code"))
    val roster = base
      .select(col("kk").as("rid"), col("band"), col("code"))
      .unionByName(base.filter(col("kk") % 20L === 0L)
        .select((col("kk") + 10000000000L).as("rid"), col("band"),
          concat(substring(col("code"), 1, 2),
            ((substring(col("code"), 3, 1).cast("long") + 1L) % 10L)
              .cast("string"),
            substring(col("code"), 4, 4)).as("code")))
    roster.select(col("rid").as("id"), explode(array(
      concat_ws("|", lit(0), col("band"), substring(col("code"), 1, 5)),
      concat_ws("|", lit(1), col("band"),
        concat(substring(col("code"), 1, 3),
          substring(col("code"), 6, 2))),
      concat_ws("|", lit(2), col("band"), substring(col("code"), 4, 4))))
      .as("k"))
  }

  /** q_dedup_fuzzy_names tercet bands WITHOUT the constant-100 probe
    * restriction — the structural (both-sides-full) form. The 10³
    * tercet codespace is FIXED, so occupancy ∝ N and the volume is
    * quadratic: this is the registry's deliberately-degenerate
    * witness (the query is flagged FixtureDiagnostic), kept in the
    * audit so the gate provably FAILS it. Mirrors Dedup.fuzzyNamesQ's
    * banded derivation. */
  private def fuzzyTercets(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("d", expr("substring(c_name, 10, 9)"))
      .select(col("c_custkey").as("id"), explode(array(
        concat_ws("|", lit(0), substring(col("d"), 1, 3)),
        concat_ws("|", lit(1), substring(col("d"), 4, 3)),
        concat_ws("|", lit(2), substring(col("d"), 7, 3))))
        .as("k"))

  /** All dir-driven audited schemes. linearC values are calibrated
    * from measured sf0.01/sf0.1 volumes (BlockingGateSpec prints them)
    * with ~3× headroom; the growth gate is what catches degeneracy.
    * q_dedup_er_entities_scaled is audited separately via
    * [[erScaledBandsCopies]] (its growth axis is key-shifted copies,
    * not base-roster size — see that doc). */
  val entries: Seq[Audited] = Seq(
    Audited("q_join_editdist", "Joins.editJoinQ (4-region pigeonhole)",
      editProbes, Some(editCorpus), linearC = Some(16.0)),
    Audited("q_dedup_minhash_lsh", "Dedup.minhashQ (16x4 banding)",
      minhashBuckets, None, linearC = Some(48.0)),
    Audited("q_dedup_simhash", "Dedup.simhashQ (12x5-bit bands)",
      simhashBuckets, None, linearC = None),
    Audited("q_join_spatial_grid_scaled",
      "Joins.spatialScaledQ (8x8 grid cells, 3x3 neighbor explode)",
      spatialLeft, Some(spatialRight), linearC = Some(96.0)),
    Audited("q_dedup_fuzzy_names",
      "Dedup.fuzzyNamesQ (10^3 tercets, both sides full)",
      fuzzyTercets, None, linearC = None))
}
