package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-handling techniques (SURVEY §7 risk 5 / task brief: "skewed
  * keys → salting or AQE skew-join").
  *
  * The first line of defense at 100 TB is AQE's runtime skew-join
  * splitting (enabled in every session here). This module implements
  * the MANUAL techniques for the cases AQE does not cover, as
  * result-transparent rewrites — the DuckDB oracle runs the PLAIN
  * (unsalted) query, so the hash-equality gate itself proves the salted
  * plans change performance, never results:
  *
  * 1. Salted equi-join: fact side gets a deterministic salt in
  *    [0, S); the (small) build side is exploded ×S; join key becomes
  *    (key, salt), spreading one hot key over S reducers.
  * 2. Two-phase (salted) aggregation: groupBy(key, salt) partial →
  *    groupBy(key) final, for aggregations whose per-key state is too
  *    heavy for one reducer (heavy-hitter keys with large payloads).
  *
  * A synthetic hot key (75% of events collapse to user 0) makes the
  * skew real at fixture scale.
  */
object Skew extends QueryModule {

  private val Salts = 8

  /** events with a deliberately skewed join key: three quarters of all
    * events collapse onto user 0. */
  private def skewedEvents(s: SparkSession, dir: String) =
    Tables.events(s, dir)
      .withColumn("skey",
        when(col("event_id") % 4 =!= 0, lit(0L)).otherwise(col("user_id")))

  // 1. Salted join of skewed events against per-user reference rows.
  private val saltedJoin = (s: SparkSession, dir: String) => {
    val fact = skewedEvents(s, dir)
      // deterministic salt: spreads the hot key across Salts reducers
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(Salts)))
    val dim = Tables.events(s, dir)
      .groupBy(col("user_id").as("skey"))
      .agg(count(lit(1)).as("user_total_events"))
      // explode the build side times Salts so every (key, salt) matches
      .withColumn("salt", explode(array((0 until Salts).map(lit(_)): _*)))
      .withColumn("salt", col("salt").cast("long"))
    fact.join(dim, Seq("skey", "salt"))
      .groupBy(col("skey"))
      .agg(count(lit(1)).as("n_events"),
        max(col("user_total_events")).as("user_total_events"))
  }

  private val saltedJoinSql =
    """WITH fact AS (
      |  SELECT CASE WHEN event_id % 4 <> 0 THEN 0 ELSE user_id END AS skey
      |  FROM events),
      |dim AS (SELECT user_id AS skey, COUNT(*) AS user_total_events
      |        FROM events GROUP BY user_id)
      |SELECT fact.skey, COUNT(*) AS n_events,
      |  max(user_total_events) AS user_total_events
      |FROM fact JOIN dim ON fact.skey = dim.skey
      |GROUP BY fact.skey""".stripMargin

  // 2. Two-phase salted aggregation over the skewed key.
  private val saltedAgg = (s: SparkSession, dir: String) => {
    val partial = skewedEvents(s, dir)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(Salts)))
      .groupBy(col("skey"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(12,2)")).as("psum"))
    partial.groupBy(col("skey"))
      .agg(sum(col("pn")).as("n"),
        sum(col("psum")).cast("double").as("sum_value"))
  }

  private val saltedAggSql =
    """SELECT CASE WHEN event_id % 4 <> 0 THEN 0 ELSE user_id END AS skey,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  // 3. ZIPFIAN-key scaled pair (round 8 — r7 verdict #7): the single
  // hot key above demonstrates the mechanism at fixture scale; real
  // 100 TB key distributions are power laws. zkey = D div (u+1) over
  // uniform u = event_id mod D is an exact integral zipf(2): key 1
  // carries 50% of all rows, key k carries ~D/(k(k+1)), ~2√D distinct
  // keys — deterministic and SQL-identical in both engines (ScaleGen's
  // +k·10⁷ id shifts are ≡0 mod D, so every scale tier sees the SAME
  // distribution, only more rows of it). Two result-identical routes:
  //   * _salted: manual salt-explode (ZipfSalts reducers per key) —
  //     the static defense;
  //   * _aqe: the plain join, leaving skew to AQE's runtime
  //     skew-join splitting — the default defense.
  // The sf1 bench runs the pair head-to-head and the plan audit
  // checks neither route leaves a single-task straggler stage.
  // D = 1000 so the uniform u covers [0, D) even on the 1k-row spec
  // fixture (event_id % D must wrap fully for key 1 to exist)
  private val ZipfSalts = 32
  private val ZipfD = 1000L

  private def zipfFact(s: SparkSession, dir: String) =
    Tables.events(s, dir)
      .withColumn("zkey",
        expr(s"$ZipfD div ((event_id % $ZipfD) + 1)"))

  private def zipfDim(s: SparkSession, dir: String) =
    zipfFact(s, dir)
      .groupBy(col("zkey"))
      .agg(count(lit(1)).as("key_total"))

  private def zipfResult(joined: org.apache.spark.sql.DataFrame) =
    joined.groupBy(col("zkey"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("sum_value"),
        max(col("key_total")).as("key_total"))

  private val zipfSaltedJoin = (s: SparkSession, dir: String) => {
    val fact = zipfFact(s, dir)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(ZipfSalts)))
    val dim = zipfDim(s, dir)
      .withColumn("salt", explode(array((0 until ZipfSalts).map(lit(_)): _*)))
      .withColumn("salt", col("salt").cast("long"))
    zipfResult(fact.join(dim, Seq("zkey", "salt")))
  }

  private val zipfAqeJoin = (s: SparkSession, dir: String) =>
    zipfResult(zipfFact(s, dir).join(zipfDim(s, dir), Seq("zkey")))

  // The plain route above never exposes the skew at bench scale:
  // Catalyst broadcasts the ~2√D-row dim, so no exchange ever hashes
  // on zkey (the audit confirms BroadcastHashJoin). This third route
  // FORCES the shuffled plan a 100 TB dim would produce (MERGE hints
  // — AQE respects them, no conf flip needed) and scales AQE's
  // skew-split thresholds to fixture bytes (production defaults are
  // 256 MB/64 MB — the hot key at sf1 is ~4 MB of shuffle, exactly
  // the same 5×-median shape two decades smaller). Two non-obvious
  // ingredients, both found by reading the EXECUTED plan (the r8
  // audit; a pre-execution plan prints isFinalPlan=false and no skew
  // markers):
  //   * the dim must MATERIALIZE before the join (localCheckpoint):
  //     with the usual partial/final agg, the final HashAggregate
  //     sits between the join's Sort and the shuffle stage, and
  //     OptimizeSkewedJoin's Sort(ShuffleStage) pattern never
  //     matches — the skew handler silently no-ops for the
  //     agg-built-dim shape however skewed the fact is;
  //   * forceOptimizeSkewedJoin, because the downstream same-key agg
  //     reuses the join's partitioning and AQE otherwise vetoes the
  //     split rather than re-shuffle the (tiny) agg input.
  // The conf window must span EXECUTION, not just planning — AQE
  // reads these at runtime — so the result materializes via
  // localCheckpoint inside the window (the TopKPerGroup idiom).
  // Measured at sf1: split fires (SortMergeJoin(skew=true), 17 tasks,
  // max shuffle read 3.97→1.17 MB, warm join stage 585→237 ms).
  private val zipfShuffleJoin = (s: SparkSession, dir: String) => {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try zipfResult(
        zipfFact(s, dir).hint("merge")
          .join(zipfDim(s, dir).localCheckpoint().hint("merge"),
            Seq("zkey")))
      .localCheckpoint()
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  private val zipfJoinSql =
    s"""WITH fact AS (
      |  SELECT $ZipfD // ((event_id % $ZipfD) + 1) AS zkey, value
      |  FROM events),
      |dim AS (SELECT zkey, COUNT(*) AS key_total FROM fact GROUP BY 1)
      |SELECT fact.zkey, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  max(key_total) AS key_total
      |FROM fact JOIN dim ON fact.zkey = dim.zkey
      |GROUP BY fact.zkey""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_skew_salted_join" -> Q(saltedJoin, Some(saltedJoinSql),
      "salted equi-join over a hot key; oracle runs the plain join"),
    "q_skew_salted_agg" -> Q(saltedAgg, Some(saltedAggSql),
      "two-phase salted aggregation; oracle runs the plain groupBy"),
    "q_skew_zipf_salted_join" -> Q(zipfSaltedJoin, Some(zipfJoinSql),
      "zipf(2)-key join, manual salt route; oracle runs the plain join"),
    "q_skew_zipf_aqe_join" -> Q(zipfAqeJoin, Some(zipfJoinSql),
      "zipf(2)-key join, plain plan (Catalyst broadcasts the dim away)"),
    "q_skew_zipf_shuffle_join" -> Q(zipfShuffleJoin, Some(zipfJoinSql),
      "zipf(2)-key join forced shuffled (merge hints); AQE skew split at fixture-scaled thresholds"))
}
