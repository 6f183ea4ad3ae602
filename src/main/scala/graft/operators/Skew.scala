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

  override val queries: Map[String, Q] = Map(
    "q_skew_salted_join" -> Q(saltedJoin, Some(saltedJoinSql),
      "salted equi-join over a hot key; oracle runs the plain join"),
    "q_skew_salted_agg" -> Q(saltedAgg, Some(saltedAggSql),
      "two-phase salted aggregation; oracle runs the plain groupBy"))
}
