package graft.operators

import graft.{Ora, Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — window/analytic functions (absent in the reference;
  * PARITY/NS surface — top-k-per-group is the output shape of the
  * north-star similarity search).
  *
  * Every window is ordered by a unique key suffix so ranks and frames
  * are deterministic — a window over a non-total order is not
  * reproducible on any engine.
  *
  * 100 TB posture: each query shuffles exactly once on its partition
  * key (user_id / segment / brand), then sorts within partitions;
  * cardinality of the partition key is high (users, brands), so
  * partitions stay small and skew-free. No window here is global —
  * a `Window.orderBy` without partitionBy funnels 100 TB through one
  * task and is banned in this codebase.
  */
object Windows extends QueryModule {

  // Ranking trio + top-k per group (row_number filter).
  private val rankQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        // exact small-rational doubles on both engines — hash-safe
        percent_rank().over(w).as("prk"),
        cume_dist().over(w).as("cd"))
      .filter(col("rn") <= 5)
  }

  private val rankSql =
    """SELECT c_custkey, c_mktsegment, c_acctbal, rn, rk, drk, prk, cd FROM (
      |  SELECT c_custkey, c_mktsegment, c_acctbal,
      |    row_number() OVER w AS rn, rank() OVER w AS rk,
      |    dense_rank() OVER w AS drk,
      |    percent_rank() OVER w AS prk, cume_dist() OVER w AS cd
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment
      |               ORDER BY c_acctbal DESC, c_custkey ASC)
      |) WHERE rn <= 5""".stripMargin

  // lag/lead over per-user event streams.
  private val lagLead = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
  }

  private val lagLeadSql =
    """SELECT event_id, user_id, value,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin

  // Running total (ROWS frame) in exact decimal.
  private val runningSum = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(Ora.money(col("o_totalprice"))).over(w).cast("double")
          .as("running_total"))
  }

  private val runningSumSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |  AS running_total
      |FROM orders""".stripMargin

  // RANGE frame over a numeric order key: peers within 10k below.
  private val rangeFrame = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc)
      .rangeBetween(-10000L, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_within_10k"))
  }

  private val rangeFrameSql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC
      |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k
      |FROM orders""".stripMargin

  // ntile + first/last over the full-partition frame.
  private val ntileFirstLast = (s: SparkSession, dir: String) => {
    val ord = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(ord).as("quartile"),
        first(col("c_acctbal")).over(full).as("seg_min_bal"),
        last(col("c_acctbal")).over(full).as("seg_max_bal"))
  }

  private val ntileFirstLastSql =
    """SELECT c_custkey, c_mktsegment,
      |  ntile(4) OVER w AS quartile,
      |  first_value(c_acctbal) OVER wf AS seg_min_bal,
      |  last_value(c_acctbal) OVER wf AS seg_max_bal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC),
      |  wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  // Top-k per group — the similarity-search output shape (§2.10).
  private val topkPerGroup = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .drop("rn")
  }

  private val topkPerGroupSql =
    """SELECT p_partkey, p_brand, p_retailprice FROM (
      |  SELECT p_partkey, p_brand, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      |  FROM part) WHERE rn <= 3""".stripMargin

  /** The same canonical top-k-per-group query, executed through the
    * custom bounded-heap operator (plans.TopKPerGroupExec — SURVEY
    * §4.2(c)): the conf-gated rewrite recognizes the window shape and
    * replaces sort+rank+filter with partial/final size-k heaps. Shares
    * the window form's oracle — the rewrite must never change the
    * answer (total-order tiebreak on p_partkey). */
  private val topkNative = (s: SparkSession, dir: String) => {
    graft.plans.TopKPerGroup.register(s)
    val prev = s.conf.getOption(graft.plans.TopKPerGroupRewrite.ConfKey)
    s.conf.set(graft.plans.TopKPerGroupRewrite.ConfKey, "true")
    try {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      val df = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .drop("rn")
      // materialize the plan under the flag: localCheckpoint pins the
      // physical plan now, so later lazy evaluation (after the finally
      // restores the conf) still runs the heap operator
      df.localCheckpoint()
    } finally prev match {
      case Some(v) => s.conf.set(graft.plans.TopKPerGroupRewrite.ConfKey, v)
      case None    => s.conf.unset(graft.plans.TopKPerGroupRewrite.ConfKey)
    }
  }

  /** Batch sessionization — the batch twin of the streaming session
    * window (q_stream_session): per user, a gap of > 30 minutes starts
    * a new session (lag + running sum of boundary markers), then one
    * aggregate per (user, session). Two windows + one agg, all
    * partitioned by user_id — one shuffle total, skew-free at user
    * cardinality. Gap arithmetic in unix_millis so both engines compare
    * the same integers (timestamp-interval arithmetic has per-engine
    * precision quirks; epoch millis do not). */
  private val sessionizeQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("gap_ms",
        unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("gap_ms") > 30L * 60 * 1000, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
  }

  private val sessionizeSql =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_ms
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN gap_ms > 1800000 THEN 1 ELSE 0 END AS new_sess
      |  FROM g),
      |sids AS (
      |  SELECT *, SUM(new_sess) OVER
      |    (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |     ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM m)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events, MIN(ts) AS sess_start, MAX(ts) AS sess_end
      |FROM sids GROUP BY user_id, session_id""".stripMargin

  /** Funnel analysis — the ordered-event-pattern classic (the
    * MATCH_RECOGNIZE shape Spark lacks, expressed as staged firsts):
    * per user, the first 'view', the first 'click' strictly AFTER that
    * view, the first 'purchase' strictly after that click; the funnel
    * counts users surviving each stage plus the end-to-end conversion
    * rate. Each stage is one user-keyed aggregate joined forward —
    * shuffles carry |users| rows, never events. The stage joins carry
    * NO broadcast hint (r4 verdict): the build side is a per-user
    * aggregate whose cardinality grows with the user population, so a
    * forced broadcast is a driver/executor OOM at 100x users. Left to
    * the planner it broadcasts at fixture scale (AQE/size stats) and
    * degrades to a user_id equi-join at scale — both correct. */
  private val funnelQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
      .select(col("n_view"), col("n_click_after"), col("n_purchase_after"),
        round(col("n_purchase_after") / col("n_view"), 6).as("conversion"))
  }

  private val funnelSql =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click_after,
      |  (SELECT COUNT(*) FROM p) AS n_purchase_after,
      |  round((SELECT COUNT(*) FROM p) * 1.0 /
      |        (SELECT COUNT(*) FROM v), 6) AS conversion""".stripMargin

  /** Equi-width histogram per group — binning done arithmetically
    * (bin = floor(value/5) capped at 9) so both engines bin the same
    * doubles identically; one partial-agg shuffle of groups×bins. */
  private val histogramQ = (s: SparkSession, dir: String) =>
    Tables.events(s, dir)
      .select(col("event_type"),
        least(floor(col("value") / 5.0), lit(9.0)).cast("int").as("bin"),
        col("value"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))

  private val histogramSql =
    """SELECT event_type,
      |  CAST(least(floor(value / 5.0), 9.0) AS INT) AS bin,
      |  COUNT(*) AS n, min(value) AS min_v, max(value) AS max_v
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Strict-adjacency sequence pattern (the MATCH_RECOGNIZE row-
    * pattern shape, funnel's stricter sibling): count per-user
    * occurrences of view → click → purchase as THREE CONSECUTIVE
    * events in the user's stream — lead() twice over one user-keyed
    * sort, so detection is a single window pass, no joins. */
  private val seqPatternQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .filter(col("event_type") === "view" &&
        col("t1") === "click" && col("t2") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_patterns"),
        min(col("ts")).as("first_at"))
  }

  private val seqPatternSql =
    """WITH m AS (
      |  SELECT user_id, ts, event_type,
      |    lead(event_type, 1) OVER w AS t1,
      |    lead(event_type, 2) OVER w AS t2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
      |SELECT user_id, COUNT(*) AS n_patterns, min(ts) AS first_at
      |FROM m
      |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      |GROUP BY user_id""".stripMargin

  /** Deterministic per-group MODE — Spark's and DuckDB's builtin
    * `mode()` both break ties arbitrarily, so the exact form is a
    * count + rank with an explicit value tiebreak (the only mode a
    * cross-engine contract can state). */
  private val modeQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n").desc, col("event_type").asc)
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"),
        col("n").as("mode_n"))
  }

  private val modeSql =
    """SELECT user_id, event_type AS mode_type, n AS mode_n FROM (
      |  SELECT user_id, event_type, COUNT(*) AS n,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY COUNT(*) DESC, event_type ASC) AS rk
      |  FROM events GROUP BY 1, 2) WHERE rk = 1""".stripMargin

  /** Weekly cohort retention — the product-analytics matrix beside the
    * funnel: users cohorted by first-active week; for each (cohort,
    * week-offset) cell, how many came back and what fraction of the
    * cohort that is. Three stages, each one user- or cohort-keyed
    * hash shuffle over ALREADY-AGGREGATED rows: distinct (user, week)
    * activity (≤ users × weeks), per-user first week, then the cell
    * counts; cohort sizes join back on the cohort key (broadcast at
    * dim scale, equi-join at any scale). Offsets are integer day
    * arithmetic on week-truncated timestamps — no float anywhere
    * except the final display ratio, rounded identically in both
    * engines. */
  private val retentionQ = (s: SparkSession, dir: String) => {
    val wk = Tables.events(s, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val first = wk.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    val sizes = first.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_cohort"))
    wk.join(first, "user_id")
      .withColumn("week_offset",
        (datediff(col("wk"), col("cohort")) / 7).cast("long"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort")
      .select(col("cohort"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        round(col("n_active") / col("n_cohort"), 6).as("retention"))
  }

  private val retentionSql =
    """WITH wk AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |first AS (
      |  SELECT user_id, min(wk) AS cohort FROM wk GROUP BY 1),
      |sizes AS (
      |  SELECT cohort, COUNT(*) AS n_cohort FROM first GROUP BY 1),
      |cells AS (
      |  SELECT f.cohort,
      |    date_diff('day', f.cohort, wk.wk) // 7 AS week_offset,
      |    COUNT(*) AS n_active
      |  FROM wk JOIN first f ON wk.user_id = f.user_id
      |  GROUP BY 1, 2)
      |SELECT c.cohort, c.week_offset, c.n_active, s.n_cohort,
      |  round(c.n_active * 1.0 / s.n_cohort, 6) AS retention
      |FROM cells c JOIN sizes s ON c.cohort = s.cohort""".stripMargin

  /** Last-touch attribution — the conversion-credit companion to the
    * funnel: each purchase is credited to the user's most recent
    * view/click within a 3-day lookback, else 'none'. ONE pass, one
    * user-keyed shuffle: a trailing `last(…, ignoreNulls)` window
    * carries the latest touch's type and epoch-millis forward (two
    * window columns, provably from the SAME row: both are null exactly
    * when the row isn't a touch), so no self-join of purchases against
    * touches ever happens — the classic O(purchases × touches) join
    * shape collapses into the sort the window already pays. Millis
    * arithmetic keeps the lookback integer-exact. */
  private val attributionQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val touchMs = when(col("event_type") =!= "purchase", unix_millis(col("ts")))
    ev.withColumn("t_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("t_ms", last(touchMs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("t_ms").isNotNull &&
          unix_millis(col("ts")) - col("t_ms") <= 3L * 24 * 3600 * 1000,
          col("t_type")).otherwise(lit("none")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
  }

  private val attributionSql =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type, value FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |t AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type <> 'purchase'
      |      THEN event_type END IGNORE NULLS) OVER w AS t_type,
      |    last_value(CASE WHEN event_type <> 'purchase'
      |      THEN epoch_ms(ts) END IGNORE NULLS) OVER w AS t_ms
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT CASE WHEN t_ms IS NOT NULL AND epoch_ms(ts) - t_ms <= 259200000
      |         THEN t_type ELSE 'none' END AS channel,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM t WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  // ---- rolling distinct count (trailing 20 rows) -----------------
  //
  // Per event: how many DISTINCT event types the same user produced in
  // the trailing 20 rows (19 preceding + current) — the "behavioral
  // diversity" feature every engagement model wants. Spark has no
  // COUNT(DISTINCT) over windows; the composition is
  // size(collect_set() OVER w) — set semantics inside the frame, still
  // one hash shuffle on the series key and key-local frames. The set
  // is bounded by the event-type vocabulary (small by construction),
  // so state per frame is O(|vocab|), not O(frame) — at 100 TB the
  // same plan holds per series. The oracle has no window-DISTINCT
  // either; it verifies through the row-number self-range form.
  private val rollingDistinctQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-19, 0)
    Tables.events(s, dir)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("n_types_20",
        size(collect_set(col("event_type")).over(w)).cast("long"))
  }

  private val rollingDistinctSql =
    """WITH r AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM events WHERE user_id < 8)
      |SELECT a.user_id, a.event_id, a.ts, a.event_type,
      |  (SELECT COUNT(DISTINCT b.event_type) FROM r b
      |   WHERE b.user_id = a.user_id
      |     AND b.rn BETWEEN a.rn - 19 AND a.rn) AS n_types_20
      |FROM r a""".stripMargin

  // ---- gaps and islands ------------------------------------------
  //
  // Per user: maximal runs of CONSECUTIVE event_ids (islands) in the
  // user's event set — the classic tabibitosan shape: within a user,
  // event_id − row_number() is constant exactly along a consecutive
  // run, so islands fall out of one groupBy on that difference. One
  // hash shuffle on the series key for the window, the island
  // aggregate reuses the same partitioning (no second exchange of the
  // data). Scales as pure per-key work at any corpus size.
  private val gapIslandsQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"))
      .withColumn("grp", col("event_id") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("event_id")).as("island_start"),
        max(col("event_id")).as("island_end"),
        count(lit(1)).as("island_len"))
      .filter(col("island_len") >= 2)
      .select(col("user_id"), col("island_start"), col("island_end"),
        col("island_len"))
  }

  private val gapIslandsSql =
    """WITH r AS (
      |  SELECT user_id, event_id,
      |    event_id - row_number() OVER (PARTITION BY user_id
      |      ORDER BY event_id ASC) AS grp
      |  FROM events)
      |SELECT user_id, min(event_id) AS island_start,
      |  max(event_id) AS island_end, COUNT(*) AS island_len
      |FROM r GROUP BY user_id, grp
      |HAVING COUNT(*) >= 2""".stripMargin

  /** Time-to-convert per signup cohort — the product-analytics
    * companion to retention: each user's FIRST signup, their first
    * purchase strictly after it, the gap in integer seconds, rolled up
    * per signup-day cohort with the exact interpolated median (med2 =
    * the sum of the two middle order statistics — the
    * q_agg_mad_outliers discipline, so interpolation never leaves the
    * integers; median seconds = med2/2). Cohorts with no conversion
    * report 0 converted and a NULL median.
    *
    * 100 TB posture: two user-keyed partial-agg passes (first signup,
    * first qualifying purchase), then every window keys on the cohort
    * — the |users| corpus collapses before any ranking happens. */
  private val timeToConvertQ = (s: SparkSession, dir: String) => {
    val e = Tables.events(s, dir)
    val su = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(su, "user_id")
      .filter(col("ts") > col("s_ts"))
      .groupBy(col("user_id"), col("s_ts")).agg(min(col("ts")).as("p_ts"))
    val deltas = pu.select(col("user_id"), to_date(col("s_ts")).as("cohort"),
      (unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))).as("dt"))
    val wR = Window.partitionBy(col("cohort"))
      .orderBy(col("dt").asc, col("user_id").asc)
    val conv = deltas.withColumn("rn", row_number().over(wR))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cohort"))))
      .withColumn("lo", expr("(n + 1) div 2"))
      .withColumn("hi", expr("(n + 2) div 2"))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_converted"),
        (sum(when(col("rn") === col("lo"), col("dt")).otherwise(0L))
          + sum(when(col("rn") === col("hi"), col("dt")).otherwise(0L)))
          .as("med2_seconds"),
        max(col("dt")).as("max_seconds"))
    su.groupBy(to_date(col("s_ts")).as("cohort"))
      .agg(count(lit(1)).as("n_signup"))
      .join(conv, Seq("cohort"), "left")
      .select(col("cohort"), col("n_signup"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"),
        col("med2_seconds"), col("max_seconds"))
  }

  private val timeToConvertSql =
    """WITH su AS (
      |  SELECT user_id, min(ts) AS s_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |pu AS (
      |  SELECT e.user_id, su.s_ts, min(e.ts) AS p_ts
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > su.s_ts
      |  GROUP BY 1, 2),
      |deltas AS (
      |  SELECT user_id, CAST(s_ts AS DATE) AS cohort,
      |    date_diff('second', s_ts, p_ts) AS dt
      |  FROM pu),
      |r AS (
      |  SELECT cohort, dt,
      |    row_number() OVER (PARTITION BY cohort
      |      ORDER BY dt ASC, user_id ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY cohort) AS n
      |  FROM deltas),
      |conv AS (
      |  SELECT cohort, COUNT(*) AS n_converted,
      |    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN dt ELSE 0 END)
      |       + SUM(CASE WHEN rn = (n + 2) // 2 THEN dt ELSE 0 END)
      |      AS BIGINT) AS med2_seconds,
      |    MAX(dt) AS max_seconds
      |  FROM r GROUP BY 1)
      |SELECT s.cohort, s.n_signup,
      |  COALESCE(c.n_converted, 0) AS n_converted,
      |  c.med2_seconds, c.max_seconds
      |FROM (SELECT CAST(s_ts AS DATE) AS cohort, COUNT(*) AS n_signup
      |      FROM su GROUP BY 1) s
      |LEFT JOIN conv c ON s.cohort = c.cohort""".stripMargin

  /** RFM segmentation — the classic marketing/CRM cut: per customer,
    * Recency (last order), Frequency (order count), Monetary
    * (floor-unit spend), each assigned an ntile(5) quintile over a
    * TOTAL order (metric, then custkey — ties can never straddle
    * engines), composed into the 3-digit RFM code.
    *
    * 100 TB posture: the fact table collapses to ONE row per customer
    * first (one custkey shuffle); each quintile is then EXACT ntile
    * arithmetic over a DISTRIBUTED global rank (GlobalOrder: range
    * partition + per-partition row numbers + broadcast offsets) — no
    * unpartitioned window anywhere, same answer as SQL ntile(5)
    * because ntile is a pure function of (rank, n):
    * the first n mod 5 buckets take ceil(n/5) rows, the rest take
    * floor(n/5). */
  private val rfmQ = (s: SparkSession, dir: String) => {
    val per0 = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(floor(col("o_totalprice")).cast("long")).as("monetary_unit"))
    // the three global ranks chain through the same helper; each call
    // range-repartitions on its own metric (dimension-sized exchanges)
    val (ranked, n) = GlobalOrder.rowNumberedWithCount(
      GlobalOrder.rowNumbered(
        GlobalOrder.rowNumbered(per0,
          Seq(col("last_order").asc, col("c_custkey").asc), "_r_rn",
         ),
        Seq(col("frequency").asc, col("c_custkey").asc), "_f_rn",
       ),
      Seq(col("monetary_unit").asc, col("c_custkey").asc), "_m_rn",
     )
    // n comes from the last offset pass's own driver fold — no extra
    // count() job (r7 verdict #5)
    // ntile(5) closed form: q=floor(n/5), r=n mod 5; ranks up to
    // r*(q+1) fall in the first r (larger) buckets, the rest in the
    // remaining (smaller) ones
    val qd = n / 5; val rm = n % 5
    def tileExpr(rn: String) =
      if (qd == 0L) col(rn) // n < 5: every bucket has one row
      else expr(s"CASE WHEN $rn <= ${rm * (qd + 1)} " +
        s"THEN ($rn + $qd) div ${qd + 1} " +
        s"ELSE $rm + ($rn - ${rm * (qd + 1)} + ${qd - 1}) div $qd END")
    ranked
      .withColumn("r_q", tileExpr("_r_rn"))
      .withColumn("f_q", tileExpr("_f_rn"))
      .withColumn("m_q", tileExpr("_m_rn"))
      .withColumn("rfm_code",
        col("r_q") * 100L + col("f_q") * 10L + col("m_q"))
      .drop("_r_rn", "_f_rn", "_m_rn")
  }

  private val rfmSql =
    """WITH per AS (
      |  SELECT o_custkey AS c_custkey,
      |    MAX(o_orderdate) AS last_order,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
      |      AS monetary_unit
      |  FROM orders GROUP BY 1)
      |SELECT c_custkey, last_order, frequency, monetary_unit,
      |  CAST(ntile(5) OVER (ORDER BY last_order ASC, c_custkey ASC)
      |    AS BIGINT) AS r_q,
      |  CAST(ntile(5) OVER (ORDER BY frequency ASC, c_custkey ASC)
      |    AS BIGINT) AS f_q,
      |  CAST(ntile(5) OVER (ORDER BY monetary_unit ASC, c_custkey ASC)
      |    AS BIGINT) AS m_q,
      |  CAST(ntile(5) OVER (ORDER BY last_order ASC, c_custkey ASC)
      |    AS BIGINT) * 100
      |  + CAST(ntile(5) OVER (ORDER BY frequency ASC, c_custkey ASC)
      |    AS BIGINT) * 10
      |  + CAST(ntile(5) OVER (ORDER BY monetary_unit ASC, c_custkey ASC)
      |    AS BIGINT) AS rfm_code
      |FROM per""".stripMargin

  /** Maximum drawdown — the finance risk metric on the cumulative
    * daily-revenue series per market segment: running peak minus
    * current cumulative, maximized, in exact cents; the trough day
    * reported via argmax-by-struct (ties → earliest day).
    *
    * 100 TB posture: the fact collapses to (segment, day) cells in
    * one partial agg; cumsum/running-peak windows run per segment
    * over the DAY GRID. */
  private val drawdownQ = (s: SparkSession, dir: String) => {
    val daily = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .as("cents"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum", sum(col("cents")).over(w))
      .withColumn("peak", max(col("cum")).over(w))
      .withColumn("dd", col("peak") - col("cum"))
      .withColumn("mdd",
        max(col("dd")).over(Window.partitionBy(col("c_mktsegment"))))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_days"),
        max(col("peak")).as("final_peak_cents"),
        max(col("dd")).as("max_drawdown_cents"),
        min(when(col("dd") === col("mdd"), col("day")))
          .as("trough_day"))
  }

  private val drawdownSql =
    """WITH daily AS (
      |  SELECT c.c_mktsegment,
      |    CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP) AS day,
      |    CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT c_mktsegment, day,
      |    CAST(SUM(cents) OVER (PARTITION BY c_mktsegment ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum
      |  FROM daily),
      |p AS (
      |  SELECT c_mktsegment, day, cum,
      |    MAX(cum) OVER (PARTITION BY c_mktsegment ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM w),
      |d AS (SELECT *, peak - cum AS dd,
      |    MAX(peak - cum) OVER (PARTITION BY c_mktsegment) AS mdd
      |  FROM p)
      |SELECT c_mktsegment, COUNT(*) AS n_days,
      |  MAX(peak) AS final_peak_cents,
      |  MAX(dd) AS max_drawdown_cents,
      |  MIN(CASE WHEN dd = mdd THEN day END) AS trough_day
      |FROM d GROUP BY 1""".stripMargin

  /** Ratio-to-report — the BI staple: each order's share of its
    * segment's revenue and of the grand total, exact cents, micro
    * floor-div; top 5 orders per segment by share (bounded output).
    *
    * 100 TB posture: fact collapses to order grain in one partial
    * agg; segment totals are a window over the order table, the grand
    * total a broadcast scalar; top-5 per segment bounds the result. */
  private val ratioToReportQ = (s: SparkSession, dir: String) => {
    val orders = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderkey"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .as("cents"))
    val segW = Window.partitionBy(col("c_mktsegment"))
    val rankW = segW.orderBy(col("cents").desc, col("o_orderkey").asc)
    orders
      .withColumn("seg_cents", sum(col("cents")).over(segW))
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= 5)
      .crossJoin(broadcast(orders.agg(sum(col("cents")).as("tot_cents"))))
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
        col("cents"),
        expr("(1000000 * cents) div seg_cents").as("seg_share_micro"),
        expr("(1000000 * cents) div tot_cents").as("tot_share_micro"))
  }

  private val ratioToReportSql =
    """WITH o AS (
      |  SELECT c.c_mktsegment, l.l_orderkey AS o_orderkey,
      |    CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem l
      |  JOIN orders od ON l.l_orderkey = od.o_orderkey
      |  JOIN customer c ON od.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT *,
      |    CAST(SUM(cents) OVER (PARTITION BY c_mktsegment) AS BIGINT)
      |      AS seg_cents,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY cents DESC, o_orderkey ASC) AS rk
      |  FROM o),
      |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot_cents FROM o)
      |SELECT c_mktsegment, CAST(rk AS INT) AS rk, o_orderkey, cents,
      |  (1000000 * cents) // seg_cents AS seg_share_micro,
      |  (1000000 * cents) // tot_cents AS tot_share_micro
      |FROM w, t WHERE rk <= 5""".stripMargin

  /** Alert debounce — the monitoring hysteresis rule that kills alert
    * noise: a breach (hourly mean above the per-type grid mean) fires
    * an alert only after ≥ 3 CONSECUTIVE breached grid rows; each
    * surviving alert interval reports its span and peak. Islands via
    * the id-minus-rank constant over the breach rows (the gap-islands
    * discipline on the grid index).
    *
    * 100 TB posture: corpus → grid once; breach flag, islands, and
    * the interval rollup all run per type over the GRID. */
  private val debounceQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("hm", expr("hs div hc"))
    val ordW = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val t = Window.partitionBy(col("event_type"))
    val flagged = grid
      .withColumn("i", row_number().over(ordW).cast("long"))
      .withColumn("mean", expr(
        "sum(hm) over (partition by event_type) div " +
          "count(1) over (partition by event_type)"))
      .filter(col("hm") > col("mean"))
    val islW = Window.partitionBy(col("event_type")).orderBy(col("i"))
    flagged
      .withColumn("isl", col("i") - row_number().over(islW))
      .groupBy(col("event_type"), col("isl"))
      .agg(count(lit(1)).as("len"),
        min(col("hour")).as("start_hour"),
        max(col("hour")).as("end_hour"),
        max(col("hm")).as("peak_hm"))
      .filter(col("len") >= 3L)
      .drop("isl")
  }

  private val debounceSql =
    """WITH grid AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, hour, hm,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour)
      |      AS i,
      |    CAST(SUM(hm) OVER (PARTITION BY event_type) AS BIGINT)
      |      // COUNT(*) OVER (PARTITION BY event_type) AS mean
      |  FROM grid),
      |f AS (
      |  SELECT event_type, hour, hm, i,
      |    i - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY i)
      |      AS isl
      |  FROM w WHERE hm > mean)
      |SELECT event_type, COUNT(*) AS len,
      |  MIN(hour) AS start_hour, MAX(hour) AS end_hour,
      |  MAX(hm) AS peak_hm
      |FROM f GROUP BY event_type, isl
      |HAVING COUNT(*) >= 3""".stripMargin

  /** Interval union (merge overlapping intervals) — the classic
    * scheduling/SLA kernel: each event opens a 30-minute interval;
    * per event type, overlapping intervals merge (an interval starts
    * a NEW merged block iff its start exceeds the running max end of
    * everything before it — the running-max sweep), reporting raw vs
    * merged counts and the exact covered seconds.
    *
    * 100 TB posture: one type-keyed sort window (the sweep), one
    * block rollup — both on the event domain, the documented cost of
    * any order-dependent interval op. */
  private val intervalMergeQ = (s: SparkSession, dir: String) => {
    val iv = Tables.events(s, dir)
      .select(col("event_type"), col("ts").cast("long").as("st"))
      .withColumn("en", col("st") + 1800L)
    val ordW = Window.partitionBy(col("event_type"))
      .orderBy(col("st"), col("en"))
    val sweep = iv
      .withColumn("max_en_before", max(col("en")).over(
        ordW.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_block",
        when(col("max_en_before").isNull
          || col("st") > col("max_en_before"), 1L).otherwise(0L))
      .withColumn("block", sum(col("new_block")).over(
        ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sweep.groupBy(col("event_type"), col("block"))
      .agg(count(lit(1)).as("n_raw"), min(col("st")).as("bs"),
        max(col("en")).as("be"))
      .groupBy(col("event_type"))
      .agg(sum(col("n_raw")).as("n_intervals"),
        count(lit(1)).as("n_merged"),
        sum(col("be") - col("bs")).as("covered_seconds"))
  }

  private val intervalMergeSql =
    """WITH iv AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS st,
      |    CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS en
      |  FROM events),
      |sweep AS (
      |  SELECT event_type, st, en,
      |    CASE WHEN MAX(en) OVER (PARTITION BY event_type
      |        ORDER BY st, en
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      IS NULL
      |      OR st > MAX(en) OVER (PARTITION BY event_type
      |        ORDER BY st, en
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_block
      |  FROM iv),
      |blocks AS (
      |  SELECT event_type, st, en,
      |    CAST(SUM(new_block) OVER (PARTITION BY event_type
      |      ORDER BY st, en
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS block
      |  FROM sweep),
      |g AS (
      |  SELECT event_type, block, COUNT(*) AS n_raw,
      |    MIN(st) AS bs, MAX(en) AS be
      |  FROM blocks GROUP BY 1, 2)
      |SELECT event_type, CAST(SUM(n_raw) AS BIGINT) AS n_intervals,
      |  COUNT(*) AS n_merged,
      |  CAST(SUM(be - bs) AS BIGINT) AS covered_seconds
      |FROM g GROUP BY 1""".stripMargin

  /** Maximum concurrency — the other classic interval kernel (room
    * scheduling / peak sessions): +1 at each interval start, −1 at
    * each end, running sum over the merged endpoint stream; the max
    * is the peak number of simultaneously-open intervals, reported
    * with the earliest time it is reached. Ends sort BEFORE starts
    * at the same instant (half-open [st, en) intervals).
    *
    * 100 TB posture: endpoint stream = 2 rows per event, one
    * type-keyed sort window — the unavoidable order dependency. */
  private val concurrencyQ = (s: SparkSession, dir: String) => {
    val iv = Tables.events(s, dir)
      .select(col("event_type"), col("ts").cast("long").as("st"))
      .withColumn("en", col("st") + 1800L)
    val pts = iv.select(col("event_type"), col("st").as("t"),
        lit(1L).as("d"), lit(1L).as("ord"))
      .unionByName(iv.select(col("event_type"), col("en").as("t"),
        lit(-1L).as("d"), lit(0L).as("ord")))
    val ordW = Window.partitionBy(col("event_type"))
      .orderBy(col("t"), col("ord"))
    val swept = pts
      .withColumn("open", sum(col("d")).over(
        ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val t = Window.partitionBy(col("event_type"))
    swept
      .withColumn("peak", max(col("open")).over(t))
      .filter(col("open") === col("peak"))
      .groupBy(col("event_type"))
      .agg(max(col("peak")).as("peak_concurrency"),
        min(col("t")).as("first_peak_epoch"))
  }

  private val concurrencySql =
    """WITH iv AS (
      |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS st,
      |    CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS en
      |  FROM events),
      |pts AS (
      |  SELECT event_type, st AS t, 1 AS d, 1 AS ord FROM iv
      |  UNION ALL
      |  SELECT event_type, en AS t, -1 AS d, 0 AS ord FROM iv),
      |sw AS (
      |  SELECT event_type, t,
      |    CAST(SUM(d) OVER (PARTITION BY event_type ORDER BY t, ord
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS open
      |  FROM pts),
      |pk AS (
      |  SELECT event_type, t, open,
      |    MAX(open) OVER (PARTITION BY event_type) AS peak
      |  FROM sw)
      |SELECT event_type, MAX(peak) AS peak_concurrency,
      |  MIN(t) AS first_peak_epoch
      |FROM pk WHERE open = peak GROUP BY 1""".stripMargin

  /** Longest consecutive-day activity streak per user — the
    * engagement kernel (login streaks / habit metrics): collapse to
    * DISTINCT active days, then the day-minus-rank constant groups
    * each run of consecutive days into one island (the gaps-and-
    * islands trick lifted from id-space to the calendar), and the
    * longest island is the streak. Reported with total active days
    * and number of distinct streaks — n_days = Σ streak lengths is
    * the built-in consistency check.
    *
    * 100 TB posture: corpus collapses to (user, day) first (one
    * partial-distinct agg); the rank window and island rollup run on
    * active-day rows only. */
  private val streakQ = (s: SparkSession, dir: String) => {
    val days = Tables.events(s, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG) div 86400").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days.withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
  }

  private val streakSql =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |isl AS (
      |  SELECT user_id,
      |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
      |      AS grp
      |  FROM days),
      |runs AS (
      |  SELECT user_id, grp, COUNT(*) AS len
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
      |  CAST(MAX(len) AS BIGINT) AS longest_streak,
      |  COUNT(*) AS n_streaks
      |FROM runs GROUP BY 1""".stripMargin

  /** Inter-purchase interval distribution per market segment — the
    * repeat-purchase cadence metric (the "when will they buy again"
    * input to CLV models): per customer, gaps in days between
    * consecutive orders (lag over the order timeline, orderkey
    * tiebreak), rolled up per segment with the exact med2 integer
    * median (the time-to-convert discipline: sum of the two middle
    * ranks — interpolation-free, engine-stable) and the exact P90
    * (value-domain disc).
    *
    * 100 TB posture: one customer-keyed sort window builds the gaps;
    * the segment rollup windows run per segment over gap rows. */
  private val interpurchaseQ = (s: SparkSession, dir: String) => {
    val o = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"),
        // o_orderdate is TIMESTAMP_NTZ in the fixture; the session is
        // pinned UTC, so NTZ→TZ is wall-clock-preserving (= DuckDB's
        // naive epoch)
        expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
          .as("day"),
        col("o_orderkey"))
    val wc = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val gaps = o
      .withColumn("prev_day", lag(col("day"), 1).over(wc))
      .filter(col("prev_day").isNotNull)
      .select(col("c_mktsegment"),
        (col("day") - col("prev_day")).as("gap_days"))
    val wR = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("gap_days").asc)
    val wS = Window.partitionBy(col("c_mktsegment"))
    gaps
      .withColumn("rn", row_number().over(wR))
      .withColumn("n", count(lit(1)).over(wS))
      .withColumn("lo", expr("(n + 1) div 2"))
      .withColumn("hi", expr("(n + 2) div 2"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_gaps"),
        (sum(when(col("rn") === col("lo"), col("gap_days")).otherwise(0L))
          + sum(when(col("rn") === col("hi"), col("gap_days"))
            .otherwise(0L))).as("med2_days"),
        min(when(expr("rn * 10 >= 9 * n"), col("gap_days")))
          .as("p90_days"),
        max(col("gap_days")).as("max_days"))
  }

  private val interpurchaseSql =
    """WITH o AS (
      |  SELECT c.c_mktsegment, o.o_custkey,
      |    CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS day,
      |    o.o_orderkey
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |g AS (
      |  SELECT c_mktsegment,
      |    day - lag(day) OVER (PARTITION BY o_custkey
      |      ORDER BY day, o_orderkey) AS gap_days
      |  FROM o),
      |gg AS (SELECT c_mktsegment, gap_days FROM g
      |       WHERE gap_days IS NOT NULL),
      |rk AS (
      |  SELECT c_mktsegment, gap_days,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY gap_days ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      |  FROM gg)
      |SELECT c_mktsegment, COUNT(*) AS n_gaps,
      |  CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN gap_days ELSE 0 END)
      |    + SUM(CASE WHEN rn = (n + 2) // 2 THEN gap_days ELSE 0 END)
      |    AS BIGINT) AS med2_days,
      |  MIN(CASE WHEN rn * 10 >= 9 * n THEN gap_days END) AS p90_days,
      |  MAX(gap_days) AS max_days
      |FROM rk GROUP BY 1""".stripMargin

  /** Linear multi-touch attribution — the fairness upgrade over
    * q_win_attribution's last-touch rule: every purchase's value is
    * split EQUALLY across all of the user's view/click touches in
    * the trailing 3 days. Credits are exact rationals in
    * micro-cents: per (purchase, channel), (cents·10⁶·n_ch) div k —
    * one floor per purchase-channel cell, both engines identical.
    * Touchless purchases credit 'none' in full. The per-channel
    * totals are what a marketing-mix readout compares against the
    * last-touch table.
    *
    * 100 TB posture: the purchase×touch pairing is a USER-keyed
    * equi-join with a residual time-range filter (the interval-join
    * discipline) — never a time-only cross; everything after runs on
    * purchase-channel cells. */
  private val attributionLinearQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"),
        round(col("value") * 100).cast("long").as("cents"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("sec").as("psec"), col("cents"))
    val t = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_type").as("channel"),
        col("sec").as("tsec"))
    val cells = p.join(t,
        p("user_id") === t("user_id") &&
          col("tsec") < col("psec") &&
          col("tsec") >= col("psec") - 3L * 24 * 3600, "left")
      .select(col("pid"), col("cents"),
        coalesce(col("channel"), lit("none")).as("channel"))
      .groupBy(col("pid"), col("cents"), col("channel"))
      .agg(count(lit(1)).as("n_ch"))
    val wp = Window.partitionBy(col("pid"))
    cells
      .withColumn("k", sum(col("n_ch")).over(wp))
      .withColumn("credit_microcents",
        expr("(cents * 1000000 * n_ch) div k"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("credit_microcents")).as("credit_microcents"))
  }

  private val attributionLinearSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |p AS (
      |  SELECT user_id, event_id AS pid, sec AS psec, cents
      |  FROM ev WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, event_type AS channel, sec AS tsec
      |  FROM ev WHERE event_type <> 'purchase'),
      |cells AS (
      |  SELECT p.pid, p.cents,
      |    COALESCE(t.channel, 'none') AS channel, COUNT(*) AS n_ch
      |  FROM p LEFT JOIN t ON p.user_id = t.user_id
      |    AND t.tsec < p.psec AND t.tsec >= p.psec - 259200
      |  GROUP BY 1, 2, 3),
      |cr AS (
      |  SELECT channel, n_ch, cents,
      |    (cents * 1000000 * n_ch)
      |      // CAST(SUM(n_ch) OVER (PARTITION BY pid) AS BIGINT)
      |      AS credit
      |  FROM cells)
      |SELECT channel, COUNT(*) AS n_cells,
      |  CAST(SUM(credit) AS BIGINT) AS credit_microcents
      |FROM cr GROUP BY 1""".stripMargin

  /** Weekly growth accounting — the new/retained/resurrected/churned
    * decomposition every growth review reads (the counterpart to the
    * cohort retention MATRIX, which slices by signup cohort instead
    * of state transition). Activity collapses to DISTINCT
    * (user, week); per user-week the state is decided by first-week
    * and previous-week membership (one self-join on week−1); churn
    * into week w = active in w−1, absent in w (only counted while w
    * is inside the observed range). The identity
    * active(w) = new + retained + resurrected is spec-asserted.
    *
    * 100 TB posture: one (user, week) partial-distinct collapse;
    * the state joins are user-keyed on the collapsed table. */
  private val growthQ = (s: SparkSession, dir: String) => {
    val uw = Tables.events(s, dir)
      .select(col("user_id"),
        expr("(CAST(ts AS LONG) div 86400 + 3) div 7").as("w"))
      .distinct()
    val firsts = uw.groupBy(col("user_id")).agg(min(col("w")).as("fw"))
    val prev = uw.select(col("user_id"), (col("w") + 1L).as("w"))
      .withColumn("had_prev", lit(1L))
    val states = uw.join(firsts, "user_id")
      .join(prev, Seq("user_id", "w"), "left")
      .withColumn("is_new", (col("w") === col("fw")).cast("long"))
      .withColumn("is_retained",
        (col("had_prev").isNotNull && col("w") > col("fw")).cast("long"))
      .withColumn("is_resurrected",
        (col("had_prev").isNull && col("w") > col("fw")).cast("long"))
    val active = states.groupBy(col("w"))
      .agg(count(lit(1)).as("n_active"),
        sum(col("is_new")).as("n_new"),
        sum(col("is_retained")).as("n_retained"),
        sum(col("is_resurrected")).as("n_resurrected"))
    val maxW = uw.agg(max(col("w")).as("mw"))
    val churn = uw.select(col("user_id"), (col("w") + 1L).as("w"))
      .join(uw.withColumn("still", lit(1L)), Seq("user_id", "w"), "left")
      .filter(col("still").isNull)
      .crossJoin(broadcast(maxW))
      .filter(col("w") <= col("mw"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_churned_in"))
    active.join(churn, Seq("w"), "left")
      .withColumn("n_churned_in", coalesce(col("n_churned_in"), lit(0L)))
  }

  private val growthSql =
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) // 7 AS w
      |  FROM events),
      |f AS (SELECT user_id, MIN(w) AS fw FROM uw GROUP BY 1),
      |st AS (
      |  SELECT uw.user_id, uw.w, f.fw,
      |    CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS had_prev
      |  FROM uw JOIN f ON uw.user_id = f.user_id
      |  LEFT JOIN uw p ON p.user_id = uw.user_id AND p.w = uw.w - 1),
      |act AS (
      |  SELECT w, COUNT(*) AS n_active,
      |    CAST(SUM(CASE WHEN w = fw THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_new,
      |    CAST(SUM(CASE WHEN had_prev = 1 AND w > fw THEN 1 ELSE 0
      |      END) AS BIGINT) AS n_retained,
      |    CAST(SUM(CASE WHEN had_prev = 0 AND w > fw THEN 1 ELSE 0
      |      END) AS BIGINT) AS n_resurrected
      |  FROM st GROUP BY 1),
      |mw AS (SELECT MAX(w) AS mw FROM uw),
      |ch AS (
      |  SELECT a.w + 1 AS w, COUNT(*) AS n_churned_in
      |  FROM uw a LEFT JOIN uw b
      |    ON a.user_id = b.user_id AND b.w = a.w + 1
      |  CROSS JOIN mw
      |  WHERE b.user_id IS NULL AND a.w + 1 <= mw.mw
      |  GROUP BY 1)
      |SELECT act.w, act.n_active, act.n_new, act.n_retained,
      |  act.n_resurrected,
      |  COALESCE(ch.n_churned_in, 0) AS n_churned_in
      |FROM act LEFT JOIN ch ON act.w = ch.w""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_win_growth_accounting" -> Q(growthQ, Some(growthSql),
      "weekly growth accounting: new/retained/resurrected/churned decomposition"),
    "q_win_attribution_linear" -> Q(attributionLinearQ,
      Some(attributionLinearSql),
      "linear multi-touch attribution: exact rational credit split, 3-day window"),
    "q_win_interpurchase" -> Q(interpurchaseQ, Some(interpurchaseSql),
      "inter-purchase gap distribution per segment: exact med2 + P90 disc"),
    "q_win_streak" -> Q(streakQ, Some(streakSql),
      "longest consecutive-day streak per user: calendar gaps-and-islands"),
    "q_win_interval_merge" -> Q(intervalMergeQ, Some(intervalMergeSql),
      "interval union: running-max sweep merges overlaps, exact covered seconds"),
    "q_win_concurrency" -> Q(concurrencyQ, Some(concurrencySql),
      "peak concurrent intervals via the +1/-1 endpoint sweep, half-open semantics"),
    "q_win_debounce" -> Q(debounceQ, Some(debounceSql),
      "alert debounce: >=3 consecutive breached grid rows form one alert interval"),
    "q_win_ratio_to_report" -> Q(ratioToReportQ, Some(ratioToReportSql),
      "ratio-to-report: per-order share of segment and grand totals, top-5 per segment"),
    "q_win_drawdown" -> Q(drawdownQ, Some(drawdownSql),
      "max drawdown per segment on the cumulative daily-revenue series, exact cents"),
    "q_win_rfm" -> Q(rfmQ, Some(rfmSql),
      "RFM quintile segmentation: one custkey collapse, ntile over the customer aggregate"),
    "q_win_time_to_convert" -> Q(timeToConvertQ, Some(timeToConvertSql),
      "per-cohort signup-to-purchase gap: exact interpolated median seconds"),
    "q_win_gap_islands" -> Q(gapIslandsQ, Some(gapIslandsSql),
      "gaps-and-islands: consecutive event_id runs via the id-minus-rank constant"),
    "q_win_rolling_distinct" -> Q(rollingDistinctQ, Some(rollingDistinctSql),
      "distinct event types over a trailing 20-row frame via collect_set"),
    "q_win_attribution" -> Q(attributionQ, Some(attributionSql),
      "last-touch attribution: trailing ignoreNulls window, no purchase×touch join"),
    "q_win_retention" -> Q(retentionQ, Some(retentionSql),
      "weekly cohort retention matrix: distinct activity → first-week cohorts → cell ratios"),
    "q_win_seq_pattern" -> Q(seqPatternQ, Some(seqPatternSql),
      "strict-adjacency row pattern (view,click,purchase) via double lead"),
    "q_agg_mode" -> Q(modeQ, Some(modeSql),
      "deterministic per-group mode: count + rank with value tiebreak"),
    "q_win_funnel" -> Q(funnelQ, Some(funnelSql),
      "funnel analysis: staged firsts (view -> click -> purchase) + conversion"),
    "q_agg_histogram" -> Q(histogramQ, Some(histogramSql),
      "equi-width histogram per group, arithmetic binning"),
    "q_win_sessionize" -> Q(sessionizeQ, Some(sessionizeSql),
      "batch sessionization: 30-min-gap sessions via lag + running sum"),
    "q_win_rank" -> Q(rankQ, Some(rankSql),
      "row_number/rank/dense_rank + top-5 per segment"),
    "q_win_lag_lead" -> Q(lagLead, Some(lagLeadSql),
      "lag/lead over per-user event streams"),
    "q_win_running_sum" -> Q(runningSum, Some(runningSumSql),
      "ROWS-frame running total (exact decimal)"),
    "q_win_range_frame" -> Q(rangeFrame, Some(rangeFrameSql),
      "RANGE frame over numeric order key"),
    "q_win_ntile_first_last" -> Q(ntileFirstLast, Some(ntileFirstLastSql),
      "ntile + first/last over full-partition frame"),
    "q_win_topk_per_group" -> Q(topkPerGroup, Some(topkPerGroupSql),
      "top-k per group via row_number filter"),
    "q_win_topk_native" -> Q(topkNative, Some(topkPerGroupSql),
      "top-k per group via the custom bounded-heap operator (window eliminated)"))
}
