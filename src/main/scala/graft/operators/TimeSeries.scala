package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping over the `events` stream table — the batch
  * side of the engine's temporal story (SURVEY §2.5 sessionization and
  * §2.3 as-of join are the neighbors; these are the resample /
  * interpolate shapes every metrics pipeline needs).
  *
  * 100 TB posture: both queries are a single hash shuffle keyed on
  * `user_id` (the natural series key) followed by key-local work —
  * the hourly grid is GENERATED map-side from each key's own bounds
  * (`sequence()` after a per-key min/max aggregate), never built as a
  * global calendar and never joined across keys, so output scales
  * with Σ per-key spans and the plan is embarrassingly parallel over
  * series. LOCF uses a running `last(ignoreNulls)` window per key —
  * at 100 TB a series whose span outgrows one task would range-
  * partition on (user_id, time-chunk) and carry one boundary row per
  * chunk, the standard prefix-scan split; at the fixture scale one
  * partition per key is the plan you want.
  *
  * Determinism: `value` doubles are carried (min/max/argmax), never
  * summed; the only sums are decimal-cast (2-decimal money-style) —
  * the Ora discipline — so both engines produce identical bits.
  */
object TimeSeries extends QueryModule {

  // ---- 1. hourly gap-fill + last-observation-carried-forward ----
  //
  // Per user: a dense hourly grid from their first to last event hour;
  // hours with no events get n_events = 0 and the LOCF value of the
  // latest earlier event. The "last observation in each hour" is the
  // row_number()=1 row by (ts, event_id) DESC — event_id breaks exact
  // timestamp ties deterministically.
  /** Mann–Kendall trend test — the non-parametric "is this series
    * trending?" companion to Theil–Sen's "how steeply?": over the
    * same hourly grid, S = Σ_{i<j} sign(y_j − y_i) (exact integer,
    * pairs bounded by the TIME-domain grid², the theilsen contract),
    * the tie-corrected variance ×18 stays integer
    * (n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)), and the normal
    * approximation z = (S ∓ 1)/√(var18/18) is ONE final double
    * expression from exact integer inputs (the corr-matrix
    * discipline). |z| > 1.96 is the 5% trend flag.
    *
    * 100 TB posture: corpus → hourly grid in one partial agg; the
    * pair join never sees raw events. */
  private val mannKendallQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      // TRUNCATING division toward zero to pair with DuckDB's `//`
      // (Spark's `div` FLOORS, so a negative hourly sum would
      // diverge — the kmeans discipline; hc = COUNT(*) > 0 always)
      .withColumn("y", expr(
        "CASE WHEN hs >= 0 THEN hs div hc ELSE -((-hs) div hc) END"))
      .withColumn("hi",
        (unix_timestamp(col("hour")) / 3600L).cast("long"))
      .select(col("event_type"), col("hi"), col("y"))
      .localCheckpoint()
    val sStat = grid.as("a")
      .join(grid.as("b"), col("a.event_type") === col("b.event_type")
        && col("b.hi") > col("a.hi"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(signum(col("b.y") - col("a.y")).cast("long")).as("s_stat"),
        (count(lit(1)) * 2).as("n_pairs2"))
    val ties = grid.groupBy(col("event_type"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .as("tie_corr"))
    sStat.join(ties, "event_type")
      .withColumn("var18",
        col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
          - col("tie_corr"))
      .select(col("event_type"), col("n"), col("s_stat"), col("var18"),
        round(
          (col("s_stat") - signum(col("s_stat")).cast("long"))
            .cast("double") / sqrt(col("var18").cast("double") / 18.0d),
          6).as("z"))
  }

  private val mannKendallSql =
    """WITH grid AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hi,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT a.event_type,
      |    CAST(SUM(CASE WHEN b.y > a.y THEN 1
      |         WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM grid a JOIN grid b
      |    ON a.event_type = b.event_type AND b.hi > a.hi
      |  GROUP BY 1),
      |t AS (
      |  SELECT event_type, CAST(SUM(t) AS BIGINT) AS n,
      |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_corr
      |  FROM (SELECT event_type, y, COUNT(*) AS t
      |        FROM grid GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT s.event_type, t.n, s.s_stat,
      |  t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_corr AS var18,
      |  round(CAST(s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
      |      WHEN s.s_stat < 0 THEN -1 ELSE 0 END AS DOUBLE)
      |    / sqrt(CAST(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_corr
      |        AS DOUBLE) / 18.0), 6) AS z
      |FROM s JOIN t ON s.event_type = t.event_type""".stripMargin

  /** Peak concurrency by sweep-line — "how many one-hour activity
    * intervals overlap at the worst moment?": every event opens an
    * interval [sec, sec+3600); the sweep emits +1 at each start and
    * −1 at each end, a running sum ordered by (time, delta ASC — ends
    * close before starts open at the same instant, the half-open
    * convention) is the live concurrency, and the peak plus its
    * FIRST attainment time is the capacity-planning answer.
    * Complements interval_merge (union length) with the max-overlap
    * question merging cannot answer.
    *
    * 100 TB posture: one type-keyed shuffle carrying 2 deltas per
    * event, one ordered window pass per type — the sessionize shape. */
  private val concurrencyQ = (s: SparkSession, dir: String) => {
    val deltas = Tables.events(s, dir)
      .select(col("event_type"), col("ts").cast("long").as("sec"))
      .select(col("event_type"), explode(array(
        struct(col("sec").as("t"), lit(1L).as("d")),
        struct((col("sec") + 3600L).as("t"), lit(-1L).as("d"))))
        .as("e"))
      .select(col("event_type"), col("e.t").as("t"), col("e.d").as("d"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val live = deltas.withColumn("live", sum(col("d")).over(w))
    val peak = live.groupBy(col("event_type").as("pt"))
      .agg(max(col("live")).as("peak"))
    live.join(peak, col("event_type") === col("pt"))
      .groupBy(col("event_type"))
      .agg(max(col("peak")).as("peak"),
        min(when(col("live") === col("peak"), col("t")))
          .as("peak_at_sec"))
  }

  private val concurrencySql =
    """WITH d AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t, 1 AS d
      |  FROM events
      |  UNION ALL
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) + 3600, -1
      |  FROM events),
      |r AS (
      |  SELECT event_type, t,
      |    CAST(SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS live
      |  FROM d),
      |p AS (SELECT event_type, MAX(live) AS peak FROM r GROUP BY 1)
      |SELECT r.event_type, p.peak,
      |  MIN(CASE WHEN r.live = p.peak THEN r.t END) AS peak_at_sec
      |FROM r JOIN p ON r.event_type = p.event_type
      |GROUP BY 1, 2""".stripMargin

  /** Ingest-order audit — the watermark-sizing evidence a streaming
    * deployment reads before picking `withWatermark`: events arrive in
    * `event_id` order (the append sequence); an event is LATE when its
    * event time trails the running event-time max of everything that
    * arrived before it. Reports per type: late count, late share in
    * micro, and the max lateness in seconds (= the smallest watermark
    * that would have admitted every event).
    *
    * 100 TB posture: one type-keyed shuffle, one ordered window pass —
    * the same shape as every sessionize/EWMA query here; at stream
    * time the same quantity falls out of the watermark metrics. */
  private val outOfOrderQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        col("ts").cast("long").as("sec"))
      .withColumn("prev_max", max(col("sec")).over(w))
      .withColumn("late_by",
        when(col("prev_max") > col("sec"), col("prev_max") - col("sec"))
          .otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_by") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_by")).as("max_late_sec"))
      .withColumn("late_share_micro",
        expr("(1000000 * n_late) div n_events"))
  }

  private val outOfOrderSql =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
      |  FROM events),
      |r AS (
      |  SELECT event_type, sec,
      |    MAX(sec) OVER (PARTITION BY event_type ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS prev_max
      |  FROM e),
      |l AS (
      |  SELECT event_type,
      |    CASE WHEN prev_max > sec THEN prev_max - sec ELSE 0 END
      |      AS late_by
      |  FROM r)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN late_by > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_late,
      |  CAST(MAX(late_by) AS BIGINT) AS max_late_sec,
      |  (1000000 * CAST(SUM(CASE WHEN late_by > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT)) // COUNT(*) AS late_share_micro
      |FROM l GROUP BY 1""".stripMargin

  private val gapfillQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("ts"), col("value"), col("event_id"),
        date_trunc("hour", col("ts")).as("h"))
    val bounds = ev.groupBy(col("user_id"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val grid = bounds.select(col("user_id"),
      explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val inHour = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val hourly = ev
      .withColumn("rn", row_number().over(inHour))
      .groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn") === 1, col("value"))).as("last_v"))
    val locf = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("last_v"), ignoreNulls = true).over(locf).as("value_locf"),
        col("n_events").isNull.as("gap_filled"))
  }

  private val gapfillSql =
    """WITH ev AS (
      |  SELECT user_id, ts, value, event_id, date_trunc('hour', ts) AS h
      |  FROM events WHERE user_id < 8),
      |bounds AS (
      |  SELECT user_id, min(h) AS lo, max(h) AS hi FROM ev GROUP BY 1),
      |grid AS (
      |  SELECT user_id,
      |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |  FROM bounds),
      |hourly AS (
      |  SELECT user_id, h, COUNT(*) AS n_events,
      |    max(CASE WHEN rn = 1 THEN value END) AS last_v
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, h
      |          ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
      |  GROUP BY 1, 2)
      |SELECT g.user_id, g.h,
      |  COALESCE(hh.n_events, 0) AS n_events,
      |  last_value(hh.last_v IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
      |  hh.n_events IS NULL AS gap_filled
      |FROM grid g LEFT JOIN hourly hh
      |  ON g.user_id = hh.user_id AND g.h = hh.h""".stripMargin

  // ---- 2. 6-hour OHLC resample ----
  //
  // Downsample each user's value series to 6-hour bars: open (first by
  // ts), high, low, close (last by ts), event count, and a decimal-
  // exact volume sum. The open/close picks use bidirectional
  // row_number() with event_id tiebreaks; high/low are plain min/max
  // (exact on carried doubles); the sum goes through DECIMAL so
  // engine-side accumulation order cannot leak into the bits.
  private val ohlcQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .withColumn("bar",
        timestamp_seconds(floor(unix_timestamp(col("ts")) / 21600) * 21600))
    val asc = Window.partitionBy(col("user_id"), col("bar"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val desc = Window.partitionBy(col("user_id"), col("bar"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("ra", row_number().over(asc))
      .withColumn("rd", row_number().over(desc))
      .groupBy(col("user_id"), col("bar"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("ra") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rd") === 1, col("value"))).as("close"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("volume"))
  }

  private val ohlcSql =
    """WITH ev AS (
      |  SELECT user_id, ts, value, event_id,
      |    make_timestamp(CAST(floor(epoch(ts) / 21600) AS BIGINT)
      |      * 21600 * 1000000) AS bar
      |  FROM events WHERE user_id < 8),
      |rk AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, bar
      |      ORDER BY ts ASC, event_id ASC) AS ra,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, bar
      |      ORDER BY ts DESC, event_id DESC) AS rd
      |  FROM ev)
      |SELECT user_id, bar, COUNT(*) AS n_events,
      |  max(CASE WHEN ra = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rd = 1 THEN value END) AS close,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS volume
      |FROM rk GROUP BY 1, 2""".stripMargin

  // ---- 3. trailing time-RANGE moving window ----
  //
  // Per event row: count and decimal-exact sum of the same user's
  // events in the trailing hour INCLUSIVE — a RANGE frame over the
  // physical microsecond timestamp (not a row frame: peers are
  // time-defined, so bursts and gaps are handled correctly). One
  // shuffle on the series key; each key's frame scan is linear
  // (two-pointer) in both engines. Microsecond epoch ordering on the
  // Spark side == DuckDB's `RANGE INTERVAL 1 HOUR PRECEDING` over the
  // raw timestamp, since the fixtures carry micros precision.
  private val movingQ = (s: SparkSession, dir: String) => {
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-hourUs, 0)
    Tables.events(s, dir)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        sum(col("value").cast("decimal(12,2)")).over(w)
          .cast("double"))
  }

  private val movingSql =
    """SELECT user_id, event_id, ts, value,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
      |    AS sum_1h
      |FROM events WHERE user_id < 8
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""
      .stripMargin

  // ---- 4. rolling z-score anomaly flags -------------------------
  //
  // Per user, each event is scored against the 10 PRECEDING events
  // (never itself — the trailing-baseline discipline that keeps the
  // detector causal/streamable): flag when |x − μ| > 2σ. Entirely
  // INTEGER-EXACT: with cents c = round(value·100), window sums
  // s1 = Σc, s2 = Σc², the test (x−μ)² > 4σ² multiplies through by n²
  // to (n·x − s1)² > 4·(n·s2 − s1²) — BIGINT-safe (n ≤ 10, |c| ≤ 10⁶
  // ⇒ widest term ≲ 4·10¹⁴) and identical bits in both engines; no
  // sqrt, no float accumulation. One hash shuffle on the series key,
  // then key-local window sums — same posture as every query above.
  // Warmup rows (fewer than 5 priors) are unflaggable by contract.
  private val anomalyQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-10, -1)
    Tables.events(s, dir)
      .filter(col("user_id") < 40)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .withColumn("n", count(col("c")).over(w))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .filter(col("n") >= 5)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("c") / 100.0, 2).as("value"),
        col("n").as("n_window"),
        ((col("n") * col("c") - col("s1")) * (col("n") * col("c") - col("s1")) >
          lit(4L) * (col("n") * col("s2") - col("s1") * col("s1")))
          .as("is_anomaly"))
      .filter(col("is_anomaly"))
  }

  /** Shared with the streaming twin (StreamOps.q_stream_anomaly): the
    * two execution modes must give the same answer on the same data. */
  private[graft] val anomalySql =
    """WITH c AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events WHERE user_id < 40),
      |wsum AS (
      |  SELECT user_id, ts, event_id, c,
      |    COUNT(c) OVER w AS n, SUM(c) OVER w AS s1,
      |    SUM(c * c) OVER w AS s2
      |  FROM c
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
      |SELECT user_id, event_id, ts, round(c / 100.0, 2) AS value,
      |  n AS n_window,
      |  (n * c - CAST(s1 AS BIGINT)) * (n * c - CAST(s1 AS BIGINT)) >
      |    4 * (n * CAST(s2 AS BIGINT) - CAST(s1 AS BIGINT) * CAST(s1 AS BIGINT))
      |    AS is_anomaly
      |FROM wsum
      |WHERE n >= 5
      |  AND (n * c - CAST(s1 AS BIGINT)) * (n * c - CAST(s1 AS BIGINT)) >
      |    4 * (n * CAST(s2 AS BIGINT) - CAST(s1 AS BIGINT) * CAST(s1 AS BIGINT))"""
      .stripMargin

  // ---- 5. exponentially-weighted moving average (half-life form) ---
  //
  // Per event: EWMA over the 8 most recent observations (current + 7
  // lags) with dyadic weights 128,64,…,1 — the α=1/2 exponential decay
  // truncated at 8 taps. INTEGER-EXACT: cents × power-of-two weights
  // sum in BIGINT (widest: 255·weights × 32768-cent values ≪ 2⁶³);
  // missing lags (series warmup) drop out of BOTH numerator and
  // denominator, so early rows are the exact EWMA of what exists. The
  // single float op is the final num/den/100 division+round, identical
  // bits in both engines. One hash shuffle on the series key; the lag
  // chain is one window pass — the streamable trailing-state shape
  // (the stream twin would carry 7 cents in keyed state).
  private val ewmaQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val base = Tables.events(s, dir)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
    val lagged = (1 to 7).foldLeft(base) { (df, j) =>
      df.withColumn(s"c$j", lag(col("c"), j).over(w))
    }
    val num = (1 to 7).foldLeft(col("c") * 128L) { (acc, j) =>
      acc + coalesce(col(s"c$j"), lit(0L)) * (1L << (7 - j))
    }
    val den = (1 to 7).foldLeft(lit(128L)) { (acc, j) =>
      acc + when(col(s"c$j").isNull, 0L).otherwise(1L << (7 - j))
    }
    lagged.select(col("user_id"), col("event_id"), col("ts"),
      round(col("c") / 100.0, 2).as("value"),
      // no round(): num and den are exact integers, so the two-step
      // double division is ONE deterministic value in both engines,
      // while round() at a fixed scale can land exactly on a half
      // boundary (dyadic num/den admits x.xxxx5 rationals) where
      // engine rounding conventions differ.
      (num / den / 100.0).as("ewma"))
  }

  /** Shared with the streaming twin (StreamOps.q_stream_ewma). */
  private[graft] val ewmaSql = {
    val lagDefs = (1 to 7)
      .map(j => s"lag(c, $j) OVER w AS c$j").mkString(", ")
    val num = "c * 128 + " + (1 to 7)
      .map(j => s"COALESCE(c$j, 0) * ${1L << (7 - j)}").mkString(" + ")
    val den = "128 + " + (1 to 7)
      .map(j => s"(CASE WHEN c$j IS NULL THEN 0 ELSE ${1L << (7 - j)} END)")
      .mkString(" + ")
    s"""WITH c AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(round(value * 100) AS BIGINT) AS c
       |  FROM events WHERE user_id < 8),
       |l AS (
       |  SELECT user_id, ts, event_id, c, $lagDefs
       |  FROM c
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
       |SELECT user_id, event_id, ts, round(c / 100.0, 2) AS value,
       |  ($num) / ($den) / 100.0 AS ewma
       |FROM l""".stripMargin
  }

  // ---- 6. hour-of-day seasonal profile + residual outliers --------
  //
  // Deseasonalization: the per-(user, hour-of-day) mean is the
  // seasonal component; each event's residual = value − seasonal mean.
  // Top-20 |residual| events surface the off-pattern behavior. The
  // seasonal mean is an EXACT integer ratio (Σcents / n) realized as
  // one double division; the residual subtracts two deterministic
  // doubles — no float accumulation anywhere. Plan: one partial-agg
  // shuffle builds the (user, hod) profile (bounded: keys × 24), it
  // broadcasts back onto the events — corpus is never re-shuffled.
  private val seasonalQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("event_id"), col("ts"),
        hour(col("ts")).as("hod"),
        round(col("value") * 100).cast("long").as("c"))
    val profile = ev.groupBy(col("user_id"), col("hod"))
      .agg(sum(col("c")).as("sc"), count(lit(1)).as("n"))
      .select(col("user_id"), col("hod"),
        (col("sc") / col("n") / 100.0).as("hod_mean"))
    ev.join(broadcast(profile), Seq("user_id", "hod"))
      .select(col("user_id"), col("event_id"), col("ts"), col("hod"),
        round(col("c") / 100.0, 2).as("value"), col("hod_mean"),
        (col("c") / 100.0 - col("hod_mean")).as("residual"))
      .orderBy(abs(col("residual")).desc, col("event_id").asc)
      .limit(20)
  }

  private val seasonalSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, ts, hour(ts) AS hod,
      |    CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events WHERE user_id < 8),
      |profile AS (
      |  SELECT user_id, hod,
      |    CAST(SUM(CAST(c AS DECIMAL(18,0))) AS BIGINT) / COUNT(*) / 100.0
      |      AS hod_mean
      |  FROM ev GROUP BY 1, 2)
      |SELECT e.user_id, e.event_id, e.ts, e.hod,
      |  round(e.c / 100.0, 2) AS value, p.hod_mean,
      |  e.c / 100.0 - p.hod_mean AS residual
      |FROM ev e JOIN profile p
      |  ON e.user_id = p.user_id AND e.hod = p.hod
      |ORDER BY abs(e.c / 100.0 - p.hod_mean) DESC, e.event_id ASC
      |LIMIT 20""".stripMargin

  // ---- 7. rolling median (robust smoother) ------------------------
  //
  // Trailing 11-row median of cents per series — the robust twin of
  // the EWMA smoother (outliers shift a mean, not a median). Exact
  // percentile over a ROWS frame: both engines interpolate even-count
  // medians as lower + (upper−lower)/2 on INTEGER cents, which is
  // exact double arithmetic below 2⁵² — identical bits, no rounding
  // discipline needed. One hash shuffle on the series key.
  private val medianQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-10, 0)
    Tables.events(s, dir)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("c"))
      .withColumn("med_c", expr("percentile(c, 0.5)").over(w))
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("c") / 100.0, 2).as("value"),
        (col("med_c") / 100.0).as("median_11"))
  }

  private val medianSql =
    """SELECT user_id, event_id, ts, round(c / 100.0, 2) AS value,
      |  quantile_cont(c, 0.5) OVER w / 100.0 AS median_11
      |FROM (SELECT user_id, event_id, ts,
      |        CAST(round(value * 100) AS BIGINT) AS c
      |      FROM events WHERE user_id < 8)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |  ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)""".stripMargin

  /** First-order Markov transition matrix over each user's event-type
    * sequence: one window pass pairs consecutive events (ts then
    * event_id — a total order), one groupBy counts (src, dst)
    * transitions, and the row-normalized probability is the exact
    * rational `(c · 10⁶) div total` so no float division ever happens.
    * `rnk` orders each row's successors (count-major, name-minor) —
    * rnk=1 is the greedy next-state prediction.
    *
    * 100 TB posture: the window shuffle is keyed on the series key
    * (user_id) — the same single exchange every per-series op here
    * pays — and the transition table is bounded by |event-type
    * vocabulary|², so the join that attaches row totals broadcasts. */
  private val markovQ = (s: SparkSession, dir: String) => {
    val mw = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(mw))
      .filter(col("dst").isNotNull)
    val trans = pairs.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("c"))
    val totals = trans.groupBy(col("src")).agg(sum(col("c")).as("tot"))
    val rw = Window.partitionBy(col("src"))
      .orderBy(col("c").desc, col("dst").asc)
    trans.join(broadcast(totals), "src")
      .select(col("src"), col("dst"), col("c"),
        expr("(c * 1000000) div tot").as("p_micro"))
      .withColumn("rnk", row_number().over(rw))
  }

  private val markovSql =
    """WITH p AS (
      |  SELECT event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS dst
      |  FROM events),
      |tr AS (SELECT src, dst, COUNT(*) AS c
      |       FROM p WHERE dst IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT src, SUM(c) AS tot FROM tr GROUP BY 1)
      |SELECT tr.src, tr.dst, tr.c,
      |  CAST((tr.c * 1000000) // t.tot AS BIGINT) AS p_micro,
      |  CAST(row_number() OVER (PARTITION BY tr.src
      |    ORDER BY tr.c DESC, tr.dst ASC) AS INTEGER) AS rnk
      |FROM tr JOIN t ON tr.src = t.src""".stripMargin

  /** CUSUM change-point scan per event type: micro-unit values
    * (`floor(value·10⁶)` — floor of an IEEE product, identical bits in
    * both engines), the per-type floor-mean subtracted, and the running
    * sum of deviations S_i accumulated in event-time order. The
    * reported extremes (s_max / s_min) bound the largest sustained
    * upward/downward drift; the peak row (max |S|, earliest wins) is
    * where a change-point detector would split the series.
    *
    * All arithmetic is BIGINT: vm ≤ 10⁶·max(value), |S| ≤ n·max|dev| —
    * safe past 10¹⁰ rows per type at this value range; both engines
    * fail LOUDLY on overflow past it (Spark 4 ANSI, DuckDB HUGEINT
    * widening is fenced off by the explicit BIGINT casts).
    *
    * 100 TB posture: one broadcast of the |type|-row totals, one
    * window shuffle keyed on the series key. A single type whose
    * series outgrows one task range-partitions on (type, time-chunk)
    * with one carry row per chunk — the standard prefix-scan split. */
  private val cusumQ = (s: SparkSession, dir: String) => {
    val vals = Tables.events(s, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 1000000L).cast("long").as("vm"))
    val tot = vals.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("sv"))
    val ws = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = vals.join(broadcast(tot), "event_type")
      .withColumn("mu", expr("sv div n"))
      .withColumn("dev", col("vm") - col("mu"))
      .withColumn("s", sum(col("dev")).over(ws))
    val agg = cs.groupBy(col("event_type"), col("n"), col("mu"))
      .agg(max(col("s")).as("s_max"), min(col("s")).as("s_min"))
    val wp = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("s")).desc, col("ts").asc, col("event_id").asc)
    val peak = cs.withColumn("rn", row_number().over(wp))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("event_id").as("peak_event_id"),
        col("s").as("peak_s"))
    agg.join(peak, "event_type")
  }

  private val cusumSql =
    """WITH v AS (
      |  SELECT event_type, ts, event_id,
      |    CAST(floor(value * 1000000) AS BIGINT) AS vm
      |  FROM events),
      |t AS (SELECT event_type, COUNT(*) AS n,
      |        CAST(SUM(vm) AS BIGINT) AS sv
      |      FROM v GROUP BY 1),
      |cs AS (
      |  SELECT v.event_type, v.ts, v.event_id, t.n,
      |    CAST(t.sv // t.n AS BIGINT) AS mu,
      |    CAST(SUM(v.vm - t.sv // t.n) OVER (
      |      PARTITION BY v.event_type
      |      ORDER BY v.ts ASC, v.event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS s
      |  FROM v JOIN t ON v.event_type = t.event_type),
      |agg AS (
      |  SELECT event_type, n, mu, MAX(s) AS s_max, MIN(s) AS s_min
      |  FROM cs GROUP BY 1, 2, 3),
      |peak AS (
      |  SELECT event_type, event_id AS peak_event_id, s AS peak_s
      |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
      |          ORDER BY abs(s) DESC, ts ASC, event_id ASC) AS rn
      |        FROM cs)
      |  WHERE rn = 1)
      |SELECT a.event_type, a.n, a.mu, a.s_max, a.s_min,
      |  p.peak_event_id, p.peak_s
      |FROM agg a JOIN peak p ON a.event_type = p.event_type""".stripMargin

  /** Period-over-period delta — the BI staple: daily cent totals per
    * event type, each day's change vs the PREVIOUS OBSERVED day as the
    * exact rational `(Δ·10⁶) div prev` (trunc-toward-zero in both
    * engines; prev=0 days are excluded rather than divided). One
    * partial-agg pass collapses the corpus to |type|·|days| rows; the
    * lag window runs on that bounded table. */
  private val popDeltaQ = (s: SparkSession, dir: String) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
    daily.withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .filter(col("prev_cents").isNotNull && col("prev_cents") > 0)
      .withColumn("delta_micro",
        expr("((cents - prev_cents) * 1000000) div prev_cents"))
      .select("event_type", "day", "cents", "prev_cents", "delta_micro")
  }

  private val popDeltaSql =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT *, lag(cents) OVER (PARTITION BY event_type
      |    ORDER BY day ASC) AS prev_cents
      |  FROM d)
      |SELECT event_type, day, cents, prev_cents,
      |  CAST(((cents - prev_cents) * 1000000) // prev_cents AS BIGINT)
      |    AS delta_micro
      |FROM l WHERE prev_cents IS NOT NULL AND prev_cents > 0""".stripMargin

  /** Linear interpolation onto the hourly grid — the resampling mode
    * LOCF (q_ts_gapfill) can't express: a grid hour between two
    * observations takes the value `v0 + (v1−v0)·Δt/span` in cent
    * micro-units, computed as ONE integer expression (`div` truncation,
    * engine-identical) from the bracketing observations. The bracketing
    * itself is the gapfill machinery: per-hour last/first observation,
    * then LOCF carries (prev hour, prev value) forward and its mirror
    * carries (next hour, next value) backward — two windows on the
    * same series key, one exchange. Grid hours before the first /
    * after the last observation stay NULL (no extrapolation).
    *
    * 100 TB posture: identical to gapfill — per-key grids from per-key
    * bounds, every window keyed on the series key. */
  private val interpQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("ts"), col("event_id"),
        date_trunc("hour", col("ts")).as("h"),
        round(col("value") * 100).cast("long").as("cents"))
    val bounds = ev.groupBy(col("user_id"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val grid = bounds.select(col("user_id"),
      explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val inHour = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val hourly = ev
      .withColumn("rn", row_number().over(inHour))
      .groupBy(col("user_id"), col("h"))
      .agg(max(when(col("rn") === 1, col("cents"))).as("obs"))
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("h").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy(col("user_id")).orderBy(col("h").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("ph", last(when(col("obs").isNotNull, col("h")), ignoreNulls = true).over(fwd))
      .withColumn("pv", last(col("obs"), ignoreNulls = true).over(fwd))
      .withColumn("nh", first(when(col("obs").isNotNull, col("h")), ignoreNulls = true).over(bwd))
      .withColumn("nv", first(col("obs"), ignoreNulls = true).over(bwd))
      .select(col("user_id"), col("h"), col("obs"),
        when(col("obs").isNotNull, col("obs") * 1000000L)
          .otherwise(when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") * 1000000L +
              expr("""((nv - pv) * 1000000
                     | * (unix_timestamp(h) - unix_timestamp(ph)))
                     | div (unix_timestamp(nh) - unix_timestamp(ph))"""
                .stripMargin)))
          .as("interp_micro_cents"),
        col("obs").isNull.as("interpolated"))
  }

  private val interpSql =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, date_trunc('hour', ts) AS h,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE user_id < 8),
      |bounds AS (
      |  SELECT user_id, min(h) AS lo, max(h) AS hi FROM ev GROUP BY 1),
      |grid AS (
      |  SELECT user_id,
      |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      |  FROM bounds),
      |hourly AS (
      |  SELECT user_id, h, max(CASE WHEN rn = 1 THEN cents END) AS obs
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, h
      |          ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT g.user_id, g.h, hh.obs,
      |    last_value(CASE WHEN hh.obs IS NOT NULL THEN g.h END IGNORE NULLS)
      |      OVER (PARTITION BY g.user_id ORDER BY g.h ASC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
      |    last_value(hh.obs IGNORE NULLS)
      |      OVER (PARTITION BY g.user_id ORDER BY g.h ASC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    first_value(CASE WHEN hh.obs IS NOT NULL THEN g.h END IGNORE NULLS)
      |      OVER (PARTITION BY g.user_id ORDER BY g.h ASC
      |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh,
      |    first_value(hh.obs IGNORE NULLS)
      |      OVER (PARTITION BY g.user_id ORDER BY g.h ASC
      |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
      |  FROM grid g LEFT JOIN hourly hh
      |    ON g.user_id = hh.user_id AND g.h = hh.h)
      |SELECT user_id, h, obs,
      |  CASE WHEN obs IS NOT NULL THEN obs * 1000000
      |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
      |      pv * 1000000 + ((nv - pv) * 1000000
      |        * date_diff('second', ph, h)) // date_diff('second', ph, nh)
      |    ELSE NULL END AS interp_micro_cents,
      |  obs IS NULL AS interpolated
      |FROM j""".stripMargin

  /** Seasonal-naive forecast + backtest — the baseline every real
    * forecaster must beat: hold out the final 7 days (relative to the
    * series' own max timestamp, so the split is a pure function of the
    * data at every scale), forecast each (event_type, hour-of-day)
    * test value as the TRAIN mean for that slot in integer micro-units
    * (exact floor-div mean), and score per event type with MAE in the
    * same micro-units. Slots unseen in training simply drop out of the
    * backtest (COUNT carries the coverage).
    *
    * 100 TB posture: one broadcast scalar (the split point), one
    * |types×24|-bounded profile aggregate, one broadcast probe of the
    * test rows against the profile, one final rollup — the corpus is
    * scanned twice and shuffled never (both aggregates collapse
    * map-side to tiny keys). */
  private val snaiveQ = (s: SparkSession, dir: String) => {
    val e = Tables.events(s, dir)
      .select(col("event_type"), col("ts"),
        floor(col("value") * 1000000L).cast("long").as("vm"))
    val split = e.agg((max(unix_micros(col("ts")))
      - lit(7L * 24 * 3600 * 1000000L)).as("cut"))
    val tagged = e.crossJoin(broadcast(split))
      .withColumn("is_test", unix_micros(col("ts")) >= col("cut"))
      .withColumn("hod", hour(col("ts")).cast("long"))
    val profile = tagged.filter(!col("is_test"))
      .groupBy(col("event_type"), col("hod"))
      .agg(expr("sum(vm) div count(1)").as("fc"))
    tagged.filter(col("is_test"))
      .join(broadcast(profile), Seq("event_type", "hod"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test"),
        expr("sum(abs(vm - fc)) div count(1)").as("mae_micro"),
        max(abs(col("vm") - col("fc"))).as("max_err_micro"))
  }

  private val snaiveSql =
    """WITH e AS (
      |  SELECT event_type, ts,
      |    CAST(floor(value * 1000000) AS BIGINT) AS vm
      |  FROM events),
      |cut AS (
      |  SELECT epoch_us(MAX(ts))
      |    - CAST(7 AS BIGINT) * 24 * 3600 * 1000000 AS cut FROM e),
      |tagged AS (
      |  SELECT event_type, vm, CAST(hour(ts) AS BIGINT) AS hod,
      |    epoch_us(ts) >= cut AS is_test
      |  FROM e, cut),
      |profile AS (
      |  SELECT event_type, hod,
      |    CAST(SUM(vm) // COUNT(*) AS BIGINT) AS fc
      |  FROM tagged WHERE NOT is_test GROUP BY 1, 2)
      |SELECT t.event_type, COUNT(*) AS n_test,
      |  CAST(SUM(abs(t.vm - p.fc)) // COUNT(*) AS BIGINT) AS mae_micro,
      |  MAX(abs(t.vm - p.fc)) AS max_err_micro
      |FROM tagged t
      |JOIN profile p ON t.event_type = p.event_type AND t.hod = p.hod
      |WHERE t.is_test GROUP BY 1""".stripMargin

  /** Changepoint detection (binary-segmentation step 1): per
    * event_type, the hourly mean-level series is split at the point
    * maximizing the between-segment sum of squares. With prefix sum
    * s1 over i of n ordered hour-means (total S), BSS(i) ∝
    * d²/(n1·n2), d = s1·n2 − (S−s1)·n1 — all integer, so the argmax
    * is bit-stable (ties break to the earliest hour).
    *
    * Magnitude bound: d ≤ n·Σ|hm| needs n·S < 3·10⁹ for d² to stay
    * in BIGINT — hourly floor-means ≤ 10³ keep that safe past 10⁶
    * grid points (a century of hours); raw hourly SUMS would blow it
    * at sf0.1 already, which is why the series is the floor-MEAN.
    *
    * 100 TB posture: the corpus collapses to the (type, hour) grid in
    * one partial-agg shuffle; both windows (prefix sum, argmax rank)
    * run per-type over the GRID, never over events. */
  private val changepointQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("hm", expr("hs div hc"))
    val ordW = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val scored = grid
      .withColumn("i", row_number().over(ordW).cast("long"))
      .withColumn("s1", sum(col("hm")).over(
        ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("s_tot", sum(col("hm")).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("i") < col("n"))
      .withColumn("d", col("s1") * (col("n") - col("i"))
        - (col("s_tot") - col("s1")) * col("i"))
      .withColumn("score",
        expr("(d * d) div (i * (n - i))"))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(col("score").desc, col("hour").asc)
    scored
      .withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("hour").as("split_hour"),
        col("i").as("n1"), (col("n") - col("i")).as("n2"),
        col("score"),
        expr("(1000 * s1) div i").as("mean1_milli"),
        expr("(1000 * (s_tot - s1)) div (n - i)").as("mean2_milli"))
  }

  private val changepointSql =
    """WITH grid AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, hour, hm,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour)
      |      AS i,
      |    CAST(SUM(hm) OVER (PARTITION BY event_type ORDER BY hour
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS s1,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n,
      |    CAST(SUM(hm) OVER (PARTITION BY event_type) AS BIGINT)
      |      AS s_tot
      |  FROM grid),
      |scored AS (
      |  SELECT event_type, hour, i, n, s1, s_tot,
      |    (s1 * (n - i) - (s_tot - s1) * i)
      |      * (s1 * (n - i) - (s_tot - s1) * i)
      |      // (i * (n - i)) AS score
      |  FROM w WHERE i < n),
      |pick AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY score DESC, hour ASC) AS rk
      |  FROM scored)
      |SELECT event_type, hour AS split_hour, i AS n1, n - i AS n2,
      |  CAST(score AS BIGINT) AS score,
      |  (1000 * s1) // i AS mean1_milli,
      |  (1000 * (s_tot - s1)) // (n - i) AS mean2_milli
      |FROM pick WHERE rk = 1""".stripMargin

  /** VWAP — volume-weighted average price per ship month, the
    * finance-standard resample (TWAP's sibling): price in EXACT cents
    * via the decimal(12,2) money cast (the suite-wide money
    * discipline), quantity as the integer it is, vwap = Σ(c·q) div Σq
    * floor-div'd in cents, with the unweighted mean for contrast.
    *
    * 100 TB posture: pure partial aggregation — one month-key
    * shuffle, every term map-combines. */
  private val vwapQ = (s: SparkSession, dir: String) => {
    Tables.lineitem(s, dir)
      .select(date_trunc("month", col("l_shipdate")).as("month"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).as("qty_tot"),
        sum(col("cents") * col("qty")).as("pq"),
        sum(col("cents")).as("p"))
      .select(col("month"), col("n"), col("qty_tot"),
        expr("pq div qty_tot").as("vwap_cents"),
        expr("p div n").as("avg_cents"))
  }

  private val vwapSql =
    """WITH b AS (
      |  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
      |    AS month,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS cents,
      |    CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem)
      |SELECT month, COUNT(*) AS n,
      |  CAST(SUM(qty) AS BIGINT) AS qty_tot,
      |  CAST(SUM(cents * qty) AS BIGINT) // CAST(SUM(qty) AS BIGINT)
      |    AS vwap_cents,
      |  CAST(SUM(cents) AS BIGINT) // COUNT(*) AS avg_cents
      |FROM b GROUP BY 1""".stripMargin

  /** Peak detection on the hourly grid: a peak is a strict local
    * maximum (above both neighbors — plateaus excluded by the strict
    * compare, boundary hours excluded by requiring both neighbors)
    * that also clears the per-type grid mean (floor-div) — the
    * monitoring primitive behind alert spikes.
    *
    * 100 TB posture: corpus → (type, hour) grid in one partial agg;
    * lag/lead and the mean run per-type over the GRID. */
  private val peaksQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("hm", expr("hs div hc"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val t = Window.partitionBy(col("event_type"))
    grid
      .withColumn("prev_hm", lag(col("hm"), 1).over(w))
      .withColumn("next_hm", lead(col("hm"), 1).over(w))
      .withColumn("grid_mean", expr(
        "sum(hm) over (partition by event_type) div " +
          "count(1) over (partition by event_type)"))
      .filter(col("prev_hm").isNotNull && col("next_hm").isNotNull
        && col("hm") > col("prev_hm") && col("hm") > col("next_hm")
        && col("hm") > col("grid_mean"))
      .select(col("event_type"), col("hour"), col("hm"),
        col("prev_hm"), col("next_hm"), col("grid_mean"))
  }

  private val peaksSql =
    """WITH grid AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, hour, hm,
      |    LAG(hm, 1) OVER (PARTITION BY event_type ORDER BY hour)
      |      AS prev_hm,
      |    LEAD(hm, 1) OVER (PARTITION BY event_type ORDER BY hour)
      |      AS next_hm,
      |    CAST(SUM(hm) OVER (PARTITION BY event_type) AS BIGINT)
      |      // COUNT(*) OVER (PARTITION BY event_type) AS grid_mean
      |  FROM grid)
      |SELECT event_type, hour, hm, prev_hm, next_hm, grid_mean
      |FROM w
      |WHERE prev_hm IS NOT NULL AND next_hm IS NOT NULL
      |  AND hm > prev_hm AND hm > next_hm AND hm > grid_mean"""
      .stripMargin

  /** Theil-Sen robust trend — the median of all pairwise slopes on
    * the hourly floor-mean grid, per event_type (the estimator that
    * shrugs off the outliers OLS chases). Slopes are exact rationals
    * dv/dh; the ORDER key is the IEEE double quotient — correctly-
    * rounded division means equal rationals produce the IDENTICAL
    * double in both engines, so the rank order (tie-broken by
    * (dv, dh)) is bit-stable. The reported med2 (sum of the two
    * middle slopes — the suite's exact-median convention) is rounded
    * to 6 dp, the cosine-oracle precedent.
    *
    * 100 TB posture: corpus → (type, hour) grid in one partial agg;
    * the pair self-join is GRID×GRID per type (≤720² fixture rows,
    * explicitly bounded by the hourly resample — never raw events),
    * one type-keyed window ranks the slopes. */
  private val theilSenQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("hm", expr("hs div hc"))
      .withColumn("hi",
        (unix_timestamp(col("hour")) / 3600L).cast("long"))
      .select(col("event_type"), col("hi"), col("hm"))
    // r9 optimization (guide §2.3/§2.4/§3.1): (a) the grid self-join
    // ran as a sort-merge over FIVE event_type keys — the whole
    // quadratic pair fan-out in ≤5 tasks; broadcasting the (hour-grid
    // sized, time-domain-bounded by contract) probe side generates
    // pairs map-side at scan parallelism. (b) np was a second
    // full-partition count window buffering every pair; it equals
    // C(h,2) analytically (hi is distinct within a type by
    // construction), computed from the 5-row hour-count agg and
    // broadcast-joined AFTER the rank, off the shuffle. (c) slope
    // leaves the exchange: the rank window orders by the same dv/dh
    // expression and the surviving ≤2 rows per type recompute it —
    // identical doubles, 8 fewer bytes per shuffled pair.
    val pairs = grid.as("a")
      .join(broadcast(grid.as("b")),
        col("a.event_type") === col("b.event_type")
          && col("b.hi") > col("a.hi"))
      .select(col("a.event_type").as("event_type"),
        (col("b.hm") - col("a.hm")).as("dv"),
        (col("b.hi") - col("a.hi")).as("dh"))
    val np = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("h"))
      .select(col("event_type"), expr("h * (h - 1) div 2").as("np"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy((col("dv").cast("double") / col("dh")).asc,
        col("dv").asc, col("dh").asc)
    pairs
      .withColumn("rn", row_number().over(w))
      .join(broadcast(np), Seq("event_type"))
      .filter(expr("rn = (np + 1) div 2 OR rn = (np + 2) div 2"))
      .withColumn("slope", col("dv").cast("double") / col("dh"))
      .groupBy(col("event_type"))
      // odd np selects ONE middle row twice-filtered to once ⇒ double
      // it; even np selects the two middles ⇒ plain sum. med2 = 2·median.
      .agg(max(col("np")).as("n_pairs"),
        round(sum(col("slope"))
          + when(max(col("np")) % 2 === 1, sum(col("slope")))
            .otherwise(lit(0.0)), 6).as("med2_slope"))
  }

  private val theilSenSql =
    """WITH grid AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hi,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT a.event_type, b.hm - a.hm AS dv, b.hi - a.hi AS dh,
      |    CAST(b.hm - a.hm AS DOUBLE) / (b.hi - a.hi) AS slope
      |  FROM grid a JOIN grid b
      |    ON a.event_type = b.event_type AND b.hi > a.hi),
      |r AS (
      |  SELECT event_type, slope,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY slope ASC, dv ASC, dh ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS np
      |  FROM p)
      |SELECT event_type, MAX(np) AS n_pairs,
      |  round(SUM(slope) + CASE WHEN MAX(np) % 2 = 1 THEN SUM(slope)
      |    ELSE 0 END, 6) AS med2_slope
      |FROM r
      |WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2
      |GROUP BY 1""".stripMargin

  /** RSI-14 (simple-average form, documented — Wilder's recursive
    * smoothing is the EWMA family's job) on the DAILY total series
    * per event_type: gains and losses over the trailing 14 deltas,
    * RSI = 10⁶·Σgain/(Σgain+Σloss) in micro — algebraically
    * 100−100/(1+RS) without any division chain. Rows emit only once
    * 14 full deltas exist; an all-flat window reports NULL.
    *
    * 100 TB posture: corpus → (type, day) grid in one partial agg;
    * the lag and trailing-frame windows run per type over the DAY
    * GRID. */
  private val rsiQ = (s: SparkSession, dir: String) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value")).cast("long")).as("tot"))
    val ordW = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val frame = ordW.rowsBetween(-13, Window.currentRow)
    daily
      .withColumn("d", col("tot") - lag(col("tot"), 1).over(ordW))
      .filter(col("d").isNotNull)
      .withColumn("gain", greatest(col("d"), lit(0L)))
      .withColumn("loss", greatest(-col("d"), lit(0L)))
      .withColumn("i", row_number().over(ordW))
      .withColumn("sg", sum(col("gain")).over(frame))
      .withColumn("sl", sum(col("loss")).over(frame))
      .filter(col("i") >= 14)
      .select(col("event_type"), col("day"), col("sg"), col("sl"),
        when(col("sg") + col("sl") > 0L,
          expr("(1000000 * sg) div (sg + sl)")).as("rsi_micro"))
  }

  private val rsiSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
      |      AS day,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS tot
      |  FROM events GROUP BY 1, 2),
      |d AS (
      |  SELECT event_type, day,
      |    tot - LAG(tot, 1) OVER (PARTITION BY event_type
      |      ORDER BY day) AS d
      |  FROM daily),
      |g AS (
      |  SELECT event_type, day,
      |    greatest(d, 0) AS gain, greatest(-d, 0) AS loss,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
      |      AS i
      |  FROM d WHERE d IS NOT NULL),
      |f AS (
      |  SELECT event_type, day, i,
      |    CAST(SUM(gain) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS sg,
      |    CAST(SUM(loss) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS sl
      |  FROM g)
      |SELECT event_type, day, sg, sl,
      |  CAST(CASE WHEN sg + sl > 0 THEN (1000000 * sg) // (sg + sl)
      |    END AS BIGINT) AS rsi_micro
      |FROM f WHERE i >= 14""".stripMargin

  /** Chart downsampling by largest triangle (one-bucket / LTOB form —
    * the windowed sibling of LTTB, whose bucket-sequential greediness
    * needs recursion): the hourly grid is cut into 12-point buckets
    * and each bucket keeps its maximum-effective-area point, area via
    * the integer cross product |Δx₁·Δy₂ − Δx₂·Δy₁| over the immediate
    * grid neighbors — ties break to the earliest hour. Boundary
    * points (missing a neighbor) are not candidates.
    *
    * 100 TB posture: corpus → grid, then lag/lead + the per-bucket
    * argmax all run on the GRID per type. */
  private val lttbQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("hm", expr("hs div hc"))
      .withColumn("hi",
        (unix_timestamp(col("hour")) / 3600L).cast("long"))
    val ordW = Window.partitionBy(col("event_type")).orderBy(col("hi"))
    val scored = grid
      .withColumn("i", row_number().over(ordW).cast("long"))
      .withColumn("px", lag(col("hi"), 1).over(ordW))
      .withColumn("py", lag(col("hm"), 1).over(ordW))
      .withColumn("nx", lead(col("hi"), 1).over(ordW))
      .withColumn("ny", lead(col("hm"), 1).over(ordW))
      .filter(col("px").isNotNull && col("nx").isNotNull)
      .withColumn("area2", abs(
        (col("hi") - col("px")) * (col("ny") - col("py"))
          - (col("nx") - col("px")) * (col("hm") - col("py"))))
      .withColumn("bucket", expr("(i - 1) div 12"))
    val pick = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("area2").desc, col("hour").asc)
    scored.withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("bucket"), col("hour"),
        col("hm"), col("area2"))
  }

  private val lttbSql =
    """WITH grid AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hi,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, hour, hi, hm,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hi)
      |      AS i,
      |    LAG(hi, 1) OVER (PARTITION BY event_type ORDER BY hi) AS px,
      |    LAG(hm, 1) OVER (PARTITION BY event_type ORDER BY hi) AS py,
      |    LEAD(hi, 1) OVER (PARTITION BY event_type ORDER BY hi) AS nx,
      |    LEAD(hm, 1) OVER (PARTITION BY event_type ORDER BY hi) AS ny
      |  FROM grid),
      |sc AS (
      |  SELECT event_type, hour, hm, (i - 1) // 12 AS bucket,
      |    abs((hi - px) * (ny - py) - (nx - px) * (hm - py)) AS area2
      |  FROM w WHERE px IS NOT NULL AND nx IS NOT NULL),
      |p AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, bucket
      |    ORDER BY area2 DESC, hour ASC) AS rk
      |  FROM sc)
      |SELECT event_type, CAST(bucket AS BIGINT) AS bucket, hour, hm,
      |  CAST(area2 AS BIGINT) AS area2
      |FROM p WHERE rk = 1""".stripMargin

  /** Bollinger bands on the daily-total series per type: trailing-14
    * mean (floor) and population variance (exact rational floor via
    * (n·Σx² − (Σx)²) div n²), bands at mean ± 2·isqrt(var) — isqrt is
    * floor(sqrt(double)), IEEE-exact below 4·10¹⁵ (the temperature-
    * weights precedent). Emits once the window holds 14 rows.
    *
    * Magnitude bound: n·Σx² with daily totals ≤ 10⁶ and n = 14 stays
    * below 1.5·10¹³ — safe by 10⁵×; totals past ~10⁸ should switch
    * the series to means (the changepoint discipline). */
  private val bollingerQ = (s: SparkSession, dir: String) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value")).cast("long")).as("tot"))
    val ordW = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val frame = ordW.rowsBetween(-13, Window.currentRow)
    daily
      .withColumn("i", row_number().over(ordW))
      .withColumn("s1", sum(col("tot")).over(frame))
      .withColumn("s2", sum(col("tot") * col("tot")).over(frame))
      .filter(col("i") >= 14)
      .withColumn("ma", expr("s1 div 14"))
      .withColumn("v", expr("(14 * s2 - s1 * s1) div (14 * 14)"))
      .withColumn("sd", floor(sqrt(col("v").cast("double"))).cast("long"))
      .select(col("event_type"), col("day"), col("tot"), col("ma"),
        col("v").as("var_unit2"),
        (col("ma") - lit(2L) * col("sd")).as("band_lo"),
        (col("ma") + lit(2L) * col("sd")).as("band_hi"),
        (col("tot") > col("ma") + lit(2L) * col("sd")
          || col("tot") < col("ma") - lit(2L) * col("sd"))
          .as("breakout"))
  }

  private val bollingerSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
      |      AS day,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS tot
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day, tot,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
      |      AS i,
      |    CAST(SUM(tot) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS s1,
      |    CAST(SUM(tot * tot) OVER (PARTITION BY event_type
      |      ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS s2
      |  FROM daily),
      |b AS (
      |  SELECT event_type, day, tot, s1 // 14 AS ma,
      |    (14 * s2 - s1 * s1) // (14 * 14) AS v
      |  FROM w WHERE i >= 14),
      |sd AS (
      |  SELECT *, CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT)
      |    AS sdv
      |  FROM b)
      |SELECT event_type, day, tot, ma, v AS var_unit2,
      |  ma - 2 * sdv AS band_lo, ma + 2 * sdv AS band_hi,
      |  (tot > ma + 2 * sdv OR tot < ma - 2 * sdv) AS breakout
      |FROM sd""".stripMargin

  /** Seasonality strength (the STL-style F_s statistic in integer
    * form): per type, fit the hour-of-day profile (floor-mean per
    * hod), then strength = 1 − SS_resid/SS_total over the hourly
    * grid, in micro (clamped at 0). A strong daily cycle → near 10⁶;
    * white noise → near 0. Floors at the profile and grand mean are
    * the documented contract.
    *
    * 100 TB posture: grid → 24-row profile (broadcast back) → one
    * grid pass for both sums of squares. */
  private val seasonalStrengthQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("hm", expr("hs div hc"))
      .withColumn("hod", hour(col("hour")).cast("long"))
    val prof = grid.groupBy(col("event_type"), col("hod"))
      .agg(expr("sum(hm) div count(1)").as("p"))
    val mean = grid.groupBy(col("event_type"))
      .agg(expr("sum(hm) div count(1)").as("m"))
    grid.join(broadcast(prof), Seq("event_type", "hod"))
      .join(broadcast(mean), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("hm") - col("m")) * (col("hm") - col("m")))
          .as("ss_tot"),
        sum((col("hm") - col("p")) * (col("hm") - col("p")))
          .as("ss_res"))
      .withColumn("strength_micro", greatest(lit(0L),
        lit(1000000L) - expr("(1000000 * ss_res) div ss_tot")))
  }

  private val seasonalStrengthSql =
    """WITH grid0 AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT event_type, hour, hm,
      |    CAST(hour(hour) AS BIGINT) AS hod
      |  FROM grid0),
      |prof AS (SELECT event_type, hod,
      |    CAST(SUM(hm) AS BIGINT) // COUNT(*) AS p
      |  FROM grid GROUP BY 1, 2),
      |m AS (SELECT event_type,
      |    CAST(SUM(hm) AS BIGINT) // COUNT(*) AS m
      |  FROM grid GROUP BY 1)
      |SELECT g.event_type, COUNT(*) AS n,
      |  CAST(SUM((g.hm - m.m) * (g.hm - m.m)) AS BIGINT) AS ss_tot,
      |  CAST(SUM((g.hm - prof.p) * (g.hm - prof.p)) AS BIGINT)
      |    AS ss_res,
      |  greatest(0, 1000000
      |    - (1000000 * CAST(SUM((g.hm - prof.p) * (g.hm - prof.p))
      |        AS BIGINT))
      |      // CAST(SUM((g.hm - m.m) * (g.hm - m.m)) AS BIGINT))
      |    AS strength_micro
      |FROM grid g
      |JOIN prof ON g.event_type = prof.event_type AND g.hod = prof.hod
      |JOIN m ON g.event_type = m.event_type
      |GROUP BY 1""".stripMargin

  /** Wald-Wolfowitz runs test — is the daily series random noise
    * around its median, or structured? Values are signed against the
    * EXACT median (2·v vs med2, the suite's half-free convention;
    * exact ties dropped, standard practice), runs counted via a lag
    * window, and z² computed fully rationally:
    * z² = (Rn − 2n₁n₂ − n)²·(n−1) / (2n₁n₂·(2n₁n₂ − n)) in micro,
    * flagged at the χ²₁ 95% cut. A low-R flag means trending/cyclic
    * structure; a high-R flag means oscillation.
    *
    * 100 TB posture: everything after the daily collapse runs on the
    * per-type DAY GRID (median rank, lag, one rollup). */
  private val runsTestQ = (s: SparkSession, dir: String) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value")).cast("long")).as("tot"))
    val ordV = Window.partitionBy(col("event_type"))
      .orderBy(col("tot").asc, col("day").asc)
    val t = Window.partitionBy(col("event_type"))
    val med = daily
      .withColumn("rn", row_number().over(ordV))
      .withColumn("nn", count(lit(1)).over(t))
      .filter(expr("rn = (nn + 1) div 2 OR rn = (nn + 2) div 2"))
      .groupBy(col("event_type"))
      .agg((sum(col("tot"))
        + when(max(col("nn")) % 2 === 1, sum(col("tot")))
          .otherwise(lit(0L))).as("med2"))
    val signed = daily.join(broadcast(med), "event_type")
      .filter(lit(2L) * col("tot") =!= col("med2"))
      .withColumn("sgn",
        when(lit(2L) * col("tot") > col("med2"), 1L).otherwise(0L))
    val ordD = Window.partitionBy(col("event_type")).orderBy(col("day"))
    signed
      .withColumn("chg",
        when(lag(col("sgn"), 1).over(ordD).isNull
          || lag(col("sgn"), 1).over(ordD) =!= col("sgn"), 1L)
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("sgn")).as("n1"),
        sum(lit(1L) - col("sgn")).as("n2"),
        sum(col("chg")).as("runs"))
      .withColumn("z2_micro", expr(
        """CASE WHEN 2 * n1 * n2 * (2 * n1 * n2 - n) > 0 THEN
          |  (1000000 * (runs * n - 2 * n1 * n2 - n)
          |    * (runs * n - 2 * n1 * n2 - n) * (n - 1))
          |  div (2 * n1 * n2 * (2 * n1 * n2 - n))
          |END""".stripMargin))
      .withColumn("nonrandom",
        coalesce(col("z2_micro") > 3841459L, lit(false)))
  }

  private val runsTestSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
      |      AS day,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS tot
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, day, tot,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY tot ASC, day ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS nn
      |  FROM daily),
      |med AS (
      |  SELECT event_type,
      |    CAST(SUM(tot) + CASE WHEN MAX(nn) % 2 = 1 THEN SUM(tot)
      |      ELSE 0 END AS BIGINT) AS med2
      |  FROM r WHERE rn = (nn + 1) // 2 OR rn = (nn + 2) // 2
      |  GROUP BY 1),
      |signed AS (
      |  SELECT d.event_type, d.day,
      |    CASE WHEN 2 * d.tot > m.med2 THEN 1 ELSE 0 END AS sgn
      |  FROM daily d JOIN med m ON d.event_type = m.event_type
      |  WHERE 2 * d.tot <> m.med2),
      |runs AS (
      |  SELECT event_type, sgn,
      |    CASE WHEN LAG(sgn, 1) OVER (PARTITION BY event_type
      |        ORDER BY day) IS DISTINCT FROM sgn THEN 1 ELSE 0 END
      |      AS chg
      |  FROM signed),
      |g AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(sgn) AS BIGINT) AS n1,
      |    CAST(SUM(1 - sgn) AS BIGINT) AS n2,
      |    CAST(SUM(chg) AS BIGINT) AS runs
      |  FROM runs GROUP BY 1)
      |SELECT event_type, n, n1, n2, runs,
      |  CAST(CASE WHEN 2 * n1 * n2 * (2 * n1 * n2 - n) > 0 THEN
      |    (1000000 * (runs * n - 2 * n1 * n2 - n)
      |      * (runs * n - 2 * n1 * n2 - n) * (n - 1))
      |    // (2 * n1 * n2 * (2 * n1 * n2 - n))
      |  END AS BIGINT) AS z2_micro,
      |  COALESCE(CASE WHEN 2 * n1 * n2 * (2 * n1 * n2 - n) > 0 THEN
      |    (1000000 * (runs * n - 2 * n1 * n2 - n)
      |      * (runs * n - 2 * n1 * n2 - n) * (n - 1))
      |    // (2 * n1 * n2 * (2 * n1 * n2 - n)) > 3841459
      |  END, false) AS nonrandom
      |FROM g""".stripMargin

  /** Lagged cross-correlation — does one series LEAD another? For
    * every ordered pair of event types and every lag in [-3, 3]
    * hours, the integer covariance of hourly means
    * n·Σxy − Σx·Σy (positive ⇒ co-movement at that lag), plus each
    * pair's argmax lag — the lead-lag discovery pass before any
    * causal claim. Only hours PRESENT IN BOTH series at the shifted
    * alignment enter (the honest irregular-grid form).
    *
    * 100 TB posture: grids collapse once; the pair×lag join is
    * (type × type × 7) over the GRID, an equi-join on the shifted
    * hour index. */
  private val xcorrQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("hm", expr("hs div hc"))
      .withColumn("hi",
        (unix_timestamp(col("hour")) / 3600L).cast("long"))
      .select(col("event_type"), col("hi"), col("hm"))
      .localCheckpoint()
    val lags = array((-3 to 3).map(l => lit(l.toLong)): _*)
    val a = grid.select(col("event_type").as("ta"), col("hi"),
        col("hm").as("x"))
      .withColumn("lag", explode(lags))
      .withColumn("hj", col("hi") + col("lag"))
    val b = grid.select(col("event_type").as("tb"),
      col("hi").as("hj"), col("hm").as("y"))
    val cells = a.join(b, "hj")
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"), col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
      .withColumn("xcov", col("n") * col("sxy")
        - col("sx") * col("sy"))
    val pick = Window.partitionBy(col("ta"), col("tb"))
      .orderBy(col("xcov").desc, col("lag").asc)
    cells
      .withColumn("best", first(col("lag")).over(
        pick.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("ta"), col("tb"), col("lag"), col("n"), col("xcov"),
        (col("lag") === col("best")).as("is_best_lag"))
  }

  private val xcorrSql =
    """WITH grid AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hi,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |a AS (
      |  SELECT event_type AS ta, hi, hm AS x, l.lag, hi + l.lag AS hj
      |  FROM grid CROSS JOIN (VALUES (-3), (-2), (-1), (0), (1), (2),
      |    (3)) AS l(lag)),
      |cells AS (
      |  SELECT a.ta, b.event_type AS tb, CAST(a.lag AS BIGINT) AS lag,
      |    COUNT(*) AS n,
      |    CAST(SUM(a.x) AS BIGINT) AS sx,
      |    CAST(SUM(b.hm) AS BIGINT) AS sy,
      |    CAST(SUM(a.x * b.hm) AS BIGINT) AS sxy
      |  FROM a JOIN grid b ON a.hj = b.hi AND a.ta < b.event_type
      |  GROUP BY 1, 2, 3),
      |sc AS (
      |  SELECT *, n * sxy - sx * sy AS xcov FROM cells),
      |best AS (
      |  SELECT ta, tb, lag AS best FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY ta, tb
      |      ORDER BY xcov DESC, lag ASC) AS rk FROM sc)
      |  WHERE rk = 1)
      |SELECT sc.ta, sc.tb, sc.lag, sc.n,
      |  CAST(sc.xcov AS BIGINT) AS xcov,
      |  sc.lag = best.best AS is_best_lag
      |FROM sc JOIN best ON sc.ta = best.ta AND sc.tb = best.tb"""
      .stripMargin

  /** Motif discovery, SAX-style: the hourly series is discretized to
    * a 3-symbol alphabet by DELTA sign against a flat-band threshold
    * (u/d/f), and every 4-symbol word is counted per type — the most
    * frequent word is the series' dominant motif (ties: lexicographic
    * smallest). Top-3 words per type reported with counts.
    *
    * 100 TB posture: grid collapse once; symbolization is a lag
    * window, word assembly 3 more lags, the word count a
    * (type, word) rollup — all grid-domain. */
  private val motifQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("hm", expr("hs div hc"))
    val ordW = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val sym = grid
      .withColumn("d", col("hm") - lag(col("hm"), 1).over(ordW))
      .filter(col("d").isNotNull)
      .withColumn("sym",
        when(col("d") > 2L, "u").when(col("d") < -2L, "d")
          .otherwise("f"))
    val words = sym
      .withColumn("w", concat(col("sym"),
        lead(col("sym"), 1).over(ordW),
        lead(col("sym"), 2).over(ordW),
        lead(col("sym"), 3).over(ordW)))
      .filter(length(col("w")) === 4)
      .groupBy(col("event_type"), col("w"))
      .agg(count(lit(1)).as("n"))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("w").asc)
    words.withColumn("rk", row_number().over(pick))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("w").as("motif"),
        col("n"))
  }

  private val motifSql =
    """WITH grid AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |d AS (
      |  SELECT event_type, hour,
      |    hm - LAG(hm, 1) OVER (PARTITION BY event_type ORDER BY hour)
      |      AS d
      |  FROM grid),
      |sym AS (
      |  SELECT event_type, hour,
      |    CASE WHEN d > 2 THEN 'u' WHEN d < -2 THEN 'd'
      |         ELSE 'f' END AS sym
      |  FROM d WHERE d IS NOT NULL),
      |words AS (
      |  SELECT event_type,
      |    sym || LEAD(sym, 1) OVER ww || LEAD(sym, 2) OVER ww
      |      || LEAD(sym, 3) OVER ww AS w
      |  FROM sym
      |  WINDOW ww AS (PARTITION BY event_type ORDER BY hour)),
      |c AS (
      |  SELECT event_type, w, COUNT(*) AS n FROM words
      |  WHERE length(w) = 4 GROUP BY 1, 2),
      |p AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY n DESC, w ASC) AS rk
      |  FROM c)
      |SELECT event_type, CAST(rk AS INT) AS rk, w AS motif, n
      |FROM p WHERE rk <= 3""".stripMargin

  /** Survival analysis — the Nelson-Aalen CUMULATIVE HAZARD of
    * signup→purchase conversion (chosen over Kaplan-Meier because
    * H(t) = Σ d_k/n_k is a SUM of rationals — exact in per-step
    * micro floor-div, where KM's product is not): per user, the
    * first signup and first subsequent purchase; users who never
    * convert are right-censored at the observation horizon (max
    * event time). At each distinct conversion time t (in hours since
    * signup): d_t converts, n_t at risk (time-to-event ≥ t),
    * H_micro(t) running sum.
    *
    * 100 TB posture: user collapse in one shuffle; the risk-set
    * window runs over the DISTINCT EVENT-TIME domain (value-domain
    * discipline, like AUC). */
  private val hazardQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
    val horizon = ev.agg(max(col("ts")).cast("long").as("hz"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(col("ts").cast("long")).as("su"))
    // FIRST PURCHASE AT-OR-AFTER SIGNUP — a purchase predating the
    // signup is not a conversion (the spec's recount caught the
    // global-min spelling conflating the two)
    val firstConv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("long").as("pt"))
      .join(signup, "user_id")
      .filter(col("pt") >= col("su"))
      .groupBy(col("user_id")).agg(min(col("pt")).as("pu"))
    val perUser = signup.join(firstConv, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .withColumn("converted", col("pu").isNotNull)
      .withColumn("tte", expr(
        """CASE WHEN pu IS NOT NULL THEN (pu - su) div 3600
          |  ELSE (hz - su) div 3600 END""".stripMargin))
    val cells = perUser.groupBy(col("tte"))
      .agg(sum(when(col("converted"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("c"))
    val ordW = Window.orderBy(col("tte"))
    val cum = cells
      .withColumn("after", sum(col("c")).over(
        ordW.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("d") > 0L)
      .withColumn("h_step_micro", expr("(1000000 * d) div after"))
      .withColumn("hazard_micro", sum(col("h_step_micro")).over(
        ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.select(col("tte").as("hours_since_signup"),
      col("d").as("n_converted"), col("after").as("n_at_risk"),
      col("h_step_micro"), col("hazard_micro"))
  }

  private val hazardSql =
    """WITH hz AS (SELECT CAST(floor(epoch(MAX(ts))) AS BIGINT) AS hz
      |            FROM events),
      |su AS (
      |  SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS su
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |fc AS (
      |  SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS pu
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= su.su
      |  GROUP BY 1),
      |t AS (
      |  SELECT su.user_id,
      |    fc.pu IS NOT NULL AS converted,
      |    CASE WHEN fc.pu IS NOT NULL
      |      THEN (fc.pu - su.su) // 3600
      |      ELSE (hz.hz - su.su) // 3600 END AS tte
      |  FROM su LEFT JOIN fc ON su.user_id = fc.user_id
      |  CROSS JOIN hz),
      |cells AS (
      |  SELECT tte,
      |    CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
      |      AS d,
      |    COUNT(*) AS c
      |  FROM t GROUP BY 1),
      |cum AS (
      |  SELECT tte, d,
      |    CAST(SUM(c) OVER (ORDER BY tte
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS BIGINT) AS after
      |  FROM cells),
      |st AS (
      |  SELECT tte, d, after,
      |    (1000000 * d) // after AS h_step_micro
      |  FROM cum WHERE d > 0)
      |SELECT tte AS hours_since_signup, d AS n_converted,
      |  after AS n_at_risk, h_step_micro,
      |  CAST(SUM(h_step_micro) OVER (ORDER BY tte
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS hazard_micro
      |FROM st""".stripMargin

  /** Calendar heatmap — the activity matrix every ops dashboard
    * opens with: events bucketed by ISO day-of-week × hour-of-day,
    * with counts, exact unit-value sums, and each cell's share of
    * its weekday in micro. ISO weekday (1=Monday) is spelled
    * explicitly on both engines (Spark's dayofweek is
    * Sunday-based — the classic off-by-one trap, avoided via
    * weekday()+1 vs DuckDB's isodow).
    *
    * 100 TB posture: map-side bucket ids, one ≤168-key rollup, a
    * weekday-domain window for shares. */
  private val calHeatQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.events(s, dir)
      .select((weekday(col("ts")) + 1).cast("long").as("dow_iso"),
        hour(col("ts")).cast("long").as("hod"),
        floor(col("value")).cast("long").as("u"))
      .groupBy(col("dow_iso"), col("hod"))
      .agg(count(lit(1)).as("n"), sum(col("u")).as("sum_u"))
    val w = Window.partitionBy(col("dow_iso"))
    cells.withColumn("dow_share_micro",
      expr("(1000000 * n) div sum(n) over (partition by dow_iso)"))
  }

  private val calHeatSql =
    """WITH cells AS (
      |  SELECT CAST(isodow(ts) AS BIGINT) AS dow_iso,
      |    CAST(hour(ts) AS BIGINT) AS hod,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_u
      |  FROM events GROUP BY 1, 2)
      |SELECT dow_iso, hod, n, sum_u,
      |  (1000000 * n) // CAST(SUM(n) OVER (PARTITION BY dow_iso)
      |    AS BIGINT) AS dow_share_micro
      |FROM cells""".stripMargin

  /** Autocorrelation function at lags 1..6 hours per event type on
    * the hourly floor-mean grid — the multi-lag extension of
    * q_ts_autocorr (seasonality/memory discovery: which lags carry
    * signal). The grid may have holes (hours with no events); the
    * alignment is a self-JOIN on h = h + lag, so only genuinely
    * adjacent-at-that-lag pairs are compared (the q_ts_xcorr honest-
    * alignment discipline, never an index shift over a dense
    * assumption). ALL SIX lags come from ONE join: the grid fans out
    * map-side ×6 with (h+lag, lag, x) and joins the original once.
    * Moments are exact DECIMAL sums; r is ONE mirrored double
    * expression (the OLS/corr-matrix discipline).
    *
    * 100 TB posture: corpus → (type, hour) grid in one partial agg;
    * the ×6 fan-out and join run on the collapsed grid domain. */
  private val acfQ = (s: SparkSession, dir: String) => {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) div 3600").as("h"))
      .agg(sum(floor(col("value")).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("hm", expr("hs div hc"))
      .select(col("event_type"), col("h"), col("hm"))
    val shifted = grid
      .withColumn("lag", explode(array((1 to 6).map(lit(_)): _*)))
      .select(col("event_type"), (col("h") + col("lag")).as("h"),
        col("lag"), col("hm").as("x"))
    def m(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(27,0)"))
    grid.join(shifted, Seq("event_type", "h"))
      .select(col("event_type"), col("lag"), col("hm").as("y"), col("x"))
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n"), m(col("x")).as("sx"), m(col("y")).as("sy"),
        m(col("x") * col("x")).as("sxx"), m(col("y") * col("y")).as("syy"),
        m(col("x") * col("y")).as("sxy"))
      .filter(col("n") >= 3)
      .select(col("event_type"), col("lag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("r_acf"))
  }

  private val acfSql =
    """WITH grid AS (
      |  SELECT event_type,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS h,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS hm
      |  FROM events GROUP BY 1, 2),
      |sh AS (
      |  SELECT event_type, h + l AS h, l AS lag, hm AS x
      |  FROM grid CROSS JOIN (SELECT unnest([1,2,3,4,5,6]) AS l) ls),
      |p AS (
      |  SELECT g.event_type, s.lag, g.hm AS y, s.x
      |  FROM grid g
      |  JOIN sh s ON g.event_type = s.event_type AND g.h = s.h),
      |mo AS (
      |  SELECT event_type, lag, CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
      |    SUM(CAST(x AS DECIMAL(18,0))) AS sx,
      |    SUM(CAST(y AS DECIMAL(18,0))) AS sy,
      |    SUM(CAST(x*x AS DECIMAL(27,0))) AS sxx,
      |    SUM(CAST(y*y AS DECIMAL(27,0))) AS syy,
      |    SUM(CAST(x*y AS DECIMAL(27,0))) AS sxy
      |  FROM p GROUP BY 1, 2)
      |SELECT event_type, lag, CAST(n AS BIGINT) AS n,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r_acf
      |FROM mo WHERE n >= 3""".stripMargin

  /** M4 downsampling — the visualization-lossless reduction (Jugel
    * et al., VLDB'14): split each series' own time span into W
    * equal-width buckets and keep per bucket the FOUR extreme points
    * (first, last, min, max) — exactly what a W-pixel line chart
    * renders, the canonical companion to LTTB (q_ts_lttb) that is
    * error-free for min/max envelopes. Value domain is exact cents;
    * first/last use the OHLC row_number discipline with total-order
    * tiebreaks; the bucket cut ((st−mn)·W) div (mx−mn+1) maps the
    * span edge-inclusively in both engines.
    *
    * 100 TB posture: per-type bounds broadcast back (never a global
    * constant), then one (type, bucket)-keyed sort window + rollup —
    * the same cost class as OHLC resampling. */
  private val m4Q = (s: SparkSession, dir: String) => {
    val W = 50
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        col("ts").cast("long").as("st"),
        round(col("value") * 100).cast("long").as("v"))
    val bounds = ev.groupBy(col("event_type").as("bt"))
      .agg(min(col("st")).as("mn"), max(col("st")).as("mx"))
    val bucketed = ev
      .join(broadcast(bounds), col("event_type") === col("bt"))
      .withColumn("bucket",
        expr(s"((st - mn) * $W) div (mx - mn + 1)"))
    val asc = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("st").asc, col("event_id").asc)
    val desc = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("st").desc, col("event_id").desc)
    bucketed
      .withColumn("ra", row_number().over(asc))
      .withColumn("rd", row_number().over(desc))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max(when(col("ra") === 1, col("v"))).as("v_first"),
        max(when(col("rd") === 1, col("v"))).as("v_last"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"),
        min(col("st")).as("t_min"), max(col("st")).as("t_max"))
  }

  private val m4Sql =
    """WITH ev AS (
      |  SELECT event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS st,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |bounds AS (
      |  SELECT event_type AS bt, MIN(st) AS mn, MAX(st) AS mx
      |  FROM ev GROUP BY 1),
      |bk AS (
      |  SELECT ev.*, ((st - mn) * 50) // (mx - mn + 1) AS bucket
      |  FROM ev JOIN bounds ON ev.event_type = bounds.bt),
      |rk AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
      |      ORDER BY st ASC, event_id ASC) AS ra,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
      |      ORDER BY st DESC, event_id DESC) AS rd
      |  FROM bk)
      |SELECT event_type, bucket, COUNT(*) AS n,
      |  max(CASE WHEN ra = 1 THEN v END) AS v_first,
      |  max(CASE WHEN rd = 1 THEN v END) AS v_last,
      |  min(v) AS v_min, max(v) AS v_max,
      |  min(st) AS t_min, max(st) AS t_max
      |FROM rk GROUP BY 1, 2""".stripMargin

  /** Holt double-exponential smoothing (level + trend) per event
    * type on the daily-total series, α = β = ½ in exact integer
    * cents: lₜ = (yₜ + lₜ₋₁ + bₜ₋₁)/2, bₜ = (bₜ₋₁ + lₜ − lₜ₋₁)/2,
    * forecast = l + b. The recurrence is inherently sequential, so
    * each type's series collapses to ONE ordered array and the state
    * walk runs inside the `aggregate` higher-order function with a
    * (level, trend) struct accumulator — still whole-stage codegen,
    * no UDF, no driver loop. Both halvings use the SHIFT-floor form
    * (x + 10¹²) div 2 − 5·10¹¹ because a falling level makes the
    * trend numerator negative (Spark div truncates, DuckDB //
    * floors; the shift makes them identical). The oracle walks the
    * same recurrence through a WITH RECURSIVE step join.
    *
    * 100 TB posture: one (type, day) partial-agg collapse, one
    * type-keyed sort-collect — per-series state is 2 integers; a
    * series too long for one array is chunked by the same recurrence
    * applied per segment with carried state (documented swap). */
  private val holtQ = (s: SparkSession, dir: String) => {
    val K = 1000000000000L
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        array_sort(collect_list(struct(col("day"), col("y")))).as("sd"))
      .withColumn("ys", expr("transform(sd, p -> p.y)"))
      .withColumn("st", expr(
        s"""aggregate(slice(ys, 2, size(ys) - 1),
           |  named_struct('l', ys[0], 'b', 0L),
           |  (acc, y) -> named_struct(
           |    'l', (y + acc.l + acc.b + ${K}L) div 2 - ${K / 2}L,
           |    'b', (acc.b + ((y + acc.l + acc.b + ${K}L) div 2 - ${K / 2}L)
           |          - acc.l + ${K}L) div 2 - ${K / 2}L))""".stripMargin))
      .select(col("event_type"), col("n_days"),
        col("st.l").as("level_cents"), col("st.b").as("trend_cents"),
        (col("st.l") + col("st.b")).as("forecast_cents"))
  }

  private val holtSql =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |series AS (
      |  SELECT event_type, y, ROW_NUMBER() OVER (
      |    PARTITION BY event_type ORDER BY day) AS i
      |  FROM daily),
      |nd AS (SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1),
      |r(event_type, i, l, b) AS (
      |  SELECT event_type, i, y, CAST(0 AS BIGINT) FROM series WHERE i = 1
      |  UNION ALL
      |  SELECT s.event_type, s.i,
      |    (s.y + r.l + r.b + 1000000000000) // 2 - 500000000000,
      |    (r.b + ((s.y + r.l + r.b + 1000000000000) // 2 - 500000000000)
      |      - r.l + 1000000000000) // 2 - 500000000000
      |  FROM r JOIN series s
      |    ON s.event_type = r.event_type AND s.i = r.i + 1)
      |SELECT r.event_type, nd.n_days, r.l AS level_cents,
      |  r.b AS trend_cents, r.l + r.b AS forecast_cents
      |FROM r JOIN nd ON r.event_type = nd.event_type
      |WHERE r.i = nd.n_days""".stripMargin

  /** Moving-average crossover detection (the golden/death-cross
    * trading signal, and generally the trend-change alert): per
    * event type, the 3-day and 10-day trailing means of daily totals
    * cross. EXACT integer comparison — SMA3 > SMA10 ⟺ S3·10 > S10·3
    * (cross-multiplied sums, no division at all); a cross fires on
    * the first full-window day where today's relation differs from
    * yesterday's. Output: every crossover with direction.
    *
    * 100 TB posture: corpus → (type, day) grid in one partial agg;
    * the two trailing frames and the lag run on the grid. */
  private val smaCrossQ = (s: SparkSession, dir: String) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
    val ow = Window.partitionBy(col("event_type")).orderBy(col("day"))
    def trail(n: Int) = ow.rowsBetween(-(n - 1), 0)
    val sig = daily
      .withColumn("s3", sum(col("y")).over(trail(3)))
      .withColumn("c3", count(lit(1)).over(trail(3)))
      .withColumn("s10", sum(col("y")).over(trail(10)))
      .withColumn("c10", count(lit(1)).over(trail(10)))
      .filter(col("c10") === 10L)
      .withColumn("above", (col("s3") * 10L > col("s10") * 3L).cast("long"))
      .withColumn("prev_above", lag(col("above"), 1).over(ow))
    sig.filter(col("prev_above").isNotNull &&
        col("above") =!= col("prev_above"))
      .select(col("event_type"), col("day"),
        when(col("above") === 1L, lit("golden")).otherwise(lit("death"))
          .as("cross"),
        col("s3"), col("s10"))
  }

  private val smaCrossSql =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |f AS (
      |  SELECT event_type, day,
      |    CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS s3,
      |    CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS s10,
      |    COUNT(*) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS c10
      |  FROM daily),
      |g AS (
      |  SELECT event_type, day, s3, s10,
      |    CASE WHEN s3 * 10 > s10 * 3 THEN 1 ELSE 0 END AS above
      |  FROM f WHERE c10 = 10),
      |h AS (
      |  SELECT *, lag(above) OVER (PARTITION BY event_type
      |    ORDER BY day) AS prev_above
      |  FROM g)
      |SELECT event_type, day,
      |  CASE WHEN above = 1 THEN 'golden' ELSE 'death' END AS cross,
      |  s3, s10
      |FROM h WHERE prev_above IS NOT NULL AND above <> prev_above"""
      .stripMargin

  /** STL-lite additive decomposition per event type on the hourly
    * grid: trend = centered 25-hour moving mean (full windows only —
    * edge rows are excluded rather than padded), detrended = y −
    * trend, seasonal = per hour-of-day mean of the detrended series,
    * residual = detrended − seasonal. Entirely integer: the grid is
    * floor-mean cents, the trend mean is a nonneg floor-div, and the
    * SEASONAL mean uses the SHIFT-floor form (Σd + K·n) div n − K
    * because detrended values go negative (truncating div vs
    * flooring // — the Holt discipline). Output: the 24-cell
    * seasonal profile per type with residual mass, the table a
    * forecaster reads to split signal from noise.
    *
    * 100 TB posture: corpus → (type, hour) grid in one partial agg;
    * the trend window is one type-keyed sort; seasonal/residual
    * rollups run on the grid and hod domains. */
  private val stlQ = (s: SparkSession, dir: String) => {
    val K = 1000000L
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) div 3600").as("h"))
      .agg(sum(round(col("value") * 100).cast("long")).as("hs"),
        count(lit(1)).as("hc"))
      .withColumn("y", expr("hs div hc"))
    val ow = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-12, 12)
    val det = grid
      .withColumn("tsum", sum(col("y")).over(ow))
      .withColumn("tcnt", count(lit(1)).over(ow))
      .filter(col("tcnt") === 25L)
      .withColumn("trend", expr("tsum div 25"))
      .withColumn("d", col("y") - col("trend"))
      .withColumn("hod", col("h") % 24L)
    val seasonal = det.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
      .withColumn("seasonal_cents",
        expr(s"(sd + ${K}L * n) div n - ${K}L"))
    det.join(seasonal.select(col("event_type"), col("hod"),
        col("seasonal_cents")), Seq("event_type", "hod"))
      .withColumn("resid", col("d") - col("seasonal_cents"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"),
        max(col("seasonal_cents")).as("seasonal_cents"),
        sum(abs(col("resid"))).as("sum_abs_resid"),
        sum(abs(col("d"))).as("sum_abs_detrended"))
  }

  private val stlSql =
    """WITH grid AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |tr AS (
      |  SELECT event_type, h, y,
      |    CAST(SUM(y) OVER w AS BIGINT) AS tsum,
      |    COUNT(*) OVER w AS tcnt
      |  FROM grid
      |  WINDOW w AS (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
      |det AS (
      |  SELECT event_type, h, y - tsum // 25 AS d, h % 24 AS hod
      |  FROM tr WHERE tcnt = 25),
      |seas AS (
      |  SELECT event_type, hod, COUNT(*) AS n,
      |    (CAST(SUM(d) AS BIGINT) + 1000000 * COUNT(*)) // COUNT(*)
      |      - 1000000 AS seasonal_cents
      |  FROM det GROUP BY 1, 2)
      |SELECT det.event_type, det.hod, COUNT(*) AS n,
      |  MAX(seas.seasonal_cents) AS seasonal_cents,
      |  CAST(SUM(abs(det.d - seas.seasonal_cents)) AS BIGINT)
      |    AS sum_abs_resid,
      |  CAST(SUM(abs(det.d)) AS BIGINT) AS sum_abs_detrended
      |FROM det JOIN seas
      |  ON det.event_type = seas.event_type AND det.hod = seas.hod
      |GROUP BY 1, 2""".stripMargin

  /** Haar wavelet energy spectrum — which TIMESCALE carries the
    * series' variance? Per event type, the last 16 daily totals
    * (exact cents, data-relative window) run a 4-level unnormalized
    * Haar transform: level-k details are pairwise differences of the
    * previous level's pairwise sums, and Σd² per level is the energy
    * at scale 2^k days. Entirely integer (no √2 normalization — the
    * UNNORMALIZED transform is still orthogonal up to known
    * per-level constants, which a reader can divide out; the engine
    * never touches floats). The 1-based `element_at`/[i] indexing is
    * mirrored exactly in both engines.
    *
    * 100 TB posture: one (type, day) collapse + one type-keyed
    * sort-collect of a FIXED 16-row tail; the transform is map-side
    * array arithmetic. */
  private val haarQ = (s: SparkSession, dir: String) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
    val wd = Window.partitionBy(col("event_type"))
      .orderBy(col("day").desc)
    def lvl(src: String, n: Int, d: String, a: String) = Seq(
      d -> s"transform(sequence(1, $n), i -> element_at($src, 2*i-1) - element_at($src, 2*i))",
      a -> s"transform(sequence(1, $n), i -> element_at($src, 2*i-1) + element_at($src, 2*i))")
    val exprs = lvl("a0", 8, "d1", "a1") ++ lvl("a1", 4, "d2", "a2") ++
      lvl("a2", 2, "d3", "a3") ++ lvl("a3", 1, "d4", "a4")
    def energy(c: String) =
      expr(s"aggregate($c, 0L, (acc, x) -> acc + x * x)")
    val base = daily
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") <= 16)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        array_sort(collect_list(struct(col("day"), col("y")))).as("sd"))
      .filter(col("n") === 16L)
      .withColumn("a0", expr("transform(sd, p -> p.y)"))
    exprs.foldLeft(base) { case (df, (name, e)) =>
      df.withColumn(name, expr(e))
    }
      .select(col("event_type"),
        energy("d1").as("e1"), energy("d2").as("e2"),
        energy("d3").as("e3"), energy("d4").as("e4"),
        expr("element_at(a4, 1)").as("total_sum"))
  }

  private val haarSql =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |tail16 AS (
      |  SELECT event_type, day, y,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY day DESC) AS rn
      |  FROM daily),
      |arr AS (
      |  SELECT event_type, list(y ORDER BY day) AS a0
      |  FROM tail16 WHERE rn <= 16
      |  GROUP BY 1 HAVING COUNT(*) = 16),
      |lv AS (
      |  SELECT event_type,
      |    list_transform(range(1, 9), i -> a0[2*i-1] - a0[2*i]) AS d1,
      |    list_transform(range(1, 9), i -> a0[2*i-1] + a0[2*i]) AS a1
      |  FROM arr),
      |lv2 AS (
      |  SELECT *, list_transform(range(1, 5), i -> a1[2*i-1] - a1[2*i])
      |      AS d2,
      |    list_transform(range(1, 5), i -> a1[2*i-1] + a1[2*i]) AS a2
      |  FROM lv),
      |lv3 AS (
      |  SELECT *, list_transform(range(1, 3), i -> a2[2*i-1] - a2[2*i])
      |      AS d3,
      |    list_transform(range(1, 3), i -> a2[2*i-1] + a2[2*i]) AS a3
      |  FROM lv2),
      |lv4 AS (
      |  SELECT *, list_transform(range(1, 2), i -> a3[2*i-1] - a3[2*i])
      |      AS d4,
      |    list_transform(range(1, 2), i -> a3[2*i-1] + a3[2*i]) AS a4
      |  FROM lv3)
      |SELECT event_type,
      |  CAST(list_sum(list_transform(d1, x -> x*x)) AS BIGINT) AS e1,
      |  CAST(list_sum(list_transform(d2, x -> x*x)) AS BIGINT) AS e2,
      |  CAST(list_sum(list_transform(d3, x -> x*x)) AS BIGINT) AS e3,
      |  CAST(list_sum(list_transform(d4, x -> x*x)) AS BIGINT) AS e4,
      |  a4[1] AS total_sum
      |FROM lv4""".stripMargin

  /** Ingestion-outage detection — the data-freshness audit an ops
    * review runs on an event stream: per event type, inter-arrival
    * gaps (seconds, event_id tiebreak), the exact med2 median gap,
    * and every gap exceeding 6× the median (2·gap > 6·med2, the
    * cross-multiplied integer compare) reported as an outage with
    * its bounds and severity ratio. A healthy fixture reports few or
    * none — the spec plants a gap and proves detection.
    *
    * 100 TB posture: one type-keyed sort window builds gaps; the
    * median is the rank form on the same partition; outage rows are
    * the filtered survivors. */
  private val outageQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        col("ts").cast("long").as("sec"))
    val wo = Window.partitionBy(col("event_type"))
      .orderBy(col("sec"), col("event_id"))
    val gaps = ev
      .withColumn("prev", lag(col("sec"), 1).over(wo))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), col("prev").as("gap_start"),
        col("sec").as("gap_end"), (col("sec") - col("prev")).as("gap"))
    val wR = Window.partitionBy(col("event_type"))
      .orderBy(col("gap").asc, col("gap_start").asc, col("gap_end").asc)
    val wS = Window.partitionBy(col("event_type"))
    gaps
      .withColumn("rn", row_number().over(wR))
      .withColumn("n", count(lit(1)).over(wS))
      .withColumn("med2", sum(when(col("rn") === expr("(n + 1) div 2"),
        col("gap")).otherwise(0L)).over(wS) +
        sum(when(col("rn") === expr("(n + 2) div 2"), col("gap"))
          .otherwise(0L)).over(wS))
      .filter(col("gap") * 2L > col("med2") * 6L)
      .withColumn("severity_x10",
        expr("(10 * 2 * gap) div greatest(med2, 1)"))
      .select(col("event_type"), col("gap_start"), col("gap_end"),
        col("gap"), col("med2"), col("severity_x10"))
  }

  private[graft] val outageSql =
    """WITH ev AS (
      |  SELECT event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events),
      |g AS (
      |  SELECT event_type,
      |    lag(sec) OVER w AS gap_start, sec AS gap_end,
      |    sec - lag(sec) OVER w AS gap
      |  FROM ev
      |  WINDOW w AS (PARTITION BY event_type ORDER BY sec, event_id)),
      |gg AS (SELECT * FROM g WHERE gap IS NOT NULL),
      |rk AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY gap ASC, gap_start ASC, gap_end ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM gg),
      |md AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN gap ELSE 0 END)
      |      + SUM(CASE WHEN rn = (n + 2) // 2 THEN gap ELSE 0 END)
      |      AS BIGINT) AS med2
      |  FROM rk GROUP BY 1)
      |SELECT rk.event_type, rk.gap_start, rk.gap_end, rk.gap, md.med2,
      |  (10 * 2 * rk.gap) // greatest(md.med2, 1) AS severity_x10
      |FROM rk JOIN md ON rk.event_type = md.event_type
      |WHERE rk.gap * 2 > md.med2 * 6""".stripMargin

  /** Shewhart control chart with the Western-Electric runs rule —
    * the SPC kernel: per event type, daily mean cents charted
    * against CL = the series' own floor-mean and UCL/LCL = CL ±
    * 3·isqrt(variance) (integer, the Bollinger discipline), flagging
    * BOTH violation kinds: the 2σ warning zone (a point beyond
    * CL ± 2σ — the Western-Electric zone-A boundary; the fixture's
    * healthy series never crosses 3σ, so the audit charts the zone
    * that actually discriminates) and the runs rule (six consecutive
    * points on the same side of CL — drift that never crosses the
    * zones; detected with the gaps-and-islands constant on the sign
    * runs). Output: one row per violating day, tagged.
    *
    * 100 TB posture: (type, day) collapse, |type|-row limits
    * broadcast back, one type-keyed sort for the runs rule. */
  private val controlChartQ = (s: SparkSession, dir: String) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) div 86400").as("day"))
      .agg(expr("sum(CAST(round(value * 100) AS LONG))" +
        " div count(1)").as("y"))
    val lim = daily.groupBy(col("event_type").as("lt"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("cl", expr("sy div n"))
      .withColumn("sd", floor(sqrt(
        expr("(n * syy - sy * sy) div (n * n)").cast("double")))
        .cast("long"))
      .select(col("lt"), col("cl"), col("sd"))
    val charted = daily.join(broadcast(lim), col("event_type") === col("lt"))
      .withColumn("rule_zone",
        abs(col("y") - col("cl")) > lit(2L) * col("sd"))
      .withColumn("side", when(col("y") > col("cl"), 1L)
        .when(col("y") < col("cl"), -1L).otherwise(0L))
    val ow = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val runs = charted
      .withColumn("rn", row_number().over(ow).cast("long"))
      .withColumn("grp", col("rn") - row_number().over(
        Window.partitionBy(col("event_type"), col("side"))
          .orderBy(col("day"))).cast("long"))
    val runLens = Window.partitionBy(col("event_type"), col("side"),
      col("grp"))
    runs
      .withColumn("run_len", count(lit(1)).over(runLens))
      .withColumn("rule_run", col("side") =!= 0L && col("run_len") >= 6L)
      .filter(col("rule_zone") || col("rule_run"))
      .select(col("event_type"), col("day"), col("y"), col("cl"),
        col("sd"), col("rule_zone"), col("rule_run"))
  }

  private[graft] val controlChartSql =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |lim AS (
      |  SELECT event_type AS lt,
      |    CAST(SUM(y) AS BIGINT) // COUNT(*) AS cl,
      |    CAST(floor(sqrt(CAST((COUNT(*) * CAST(SUM(y*y) AS BIGINT)
      |      - CAST(SUM(y) AS BIGINT) * CAST(SUM(y) AS BIGINT))
      |      // (COUNT(*) * COUNT(*)) AS DOUBLE))) AS BIGINT) AS sd
      |  FROM daily GROUP BY 1),
      |ch AS (
      |  SELECT d.event_type, d.day, d.y, l.cl, l.sd,
      |    abs(d.y - l.cl) > 2 * l.sd AS rule_zone,
      |    CASE WHEN d.y > l.cl THEN 1
      |         WHEN d.y < l.cl THEN -1 ELSE 0 END AS side
      |  FROM daily d JOIN lim l ON d.event_type = l.lt),
      |rs AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
      |      - ROW_NUMBER() OVER (PARTITION BY event_type, side
      |          ORDER BY day) AS grp
      |  FROM ch),
      |rl AS (
      |  SELECT *, COUNT(*) OVER (PARTITION BY event_type, side, grp)
      |    AS run_len
      |  FROM rs)
      |SELECT event_type, day, y, cl, sd, rule_zone,
      |  side <> 0 AND run_len >= 6 AS rule_run
      |FROM rl WHERE rule_zone OR (side <> 0 AND run_len >= 6)"""
      .stripMargin

  /** Fano factor (index of dispersion) of hourly EVENT COUNTS per
    * type — the burstiness test for arrivals (the companion to
    * q_text_burstiness, which disperses term counts): F = σ²/μ over
    * the per-hour counts, exactly rational:
    * F_micro = 10⁶·(n·Σc² − S²) div (n·S). F ≈ 1 is Poisson; F > 1
    * is bursty traffic, F < 1 is throttled/paced — the one number
    * that tells an ingest planner whether hourly provisioning can
    * assume smooth arrivals. Hours with no events count as ZERO
    * cells via the per-type hour-span completion (a dense grid from
    * the type's own bounds — the gapfill discipline; skipping empty
    * hours would bias F down exactly when it matters).
    *
    * 100 TB posture: (type, hour) collapse, per-type bounds, one
    * |hours|-domain completion join, one moment rollup. */
  private val fanoQ = (s: SparkSession, dir: String) => {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) div 3600").as("h"))
      .agg(count(lit(1)).as("c"))
    val bounds = hourly.groupBy(col("event_type").as("bt"))
      .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
    val grid = bounds.select(col("bt"),
      explode(expr("sequence(mn, mx)")).as("h"))
    grid.join(hourly, col("bt") === col("event_type") &&
        grid("h") === hourly("h"), "left")
      .select(col("bt").as("etype"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
      .withColumn("fano_micro",
        expr("(1000000 * (n_hours * ss - s * s)) div (n_hours * s)"))
      .select(col("etype").as("event_type"), col("n_hours"),
        col("s").as("n_events"), col("fano_micro"))
  }

  private val fanoSql =
    """WITH hourly AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT event_type AS bt, MIN(h) AS mn, MAX(h) AS mx
      |  FROM hourly GROUP BY 1),
      |grid AS (
      |  SELECT bt, unnest(range(mn, mx + 1)) AS h FROM bounds),
      |fill AS (
      |  SELECT g.bt, COALESCE(hourly.c, 0) AS c
      |  FROM grid g LEFT JOIN hourly
      |    ON g.bt = hourly.event_type AND g.h = hourly.h),
      |mo AS (
      |  SELECT bt, COUNT(*) AS n_hours,
      |    CAST(SUM(c) AS BIGINT) AS s,
      |    CAST(SUM(c * c) AS BIGINT) AS ss
      |  FROM fill GROUP BY 1)
      |SELECT bt AS event_type, n_hours, s AS n_events,
      |  (1000000 * (n_hours * ss - s * s)) // (n_hours * s)
      |    AS fano_micro
      |FROM mo""".stripMargin

  /** Variance-ratio test (Lo–MacKinlay shape) — is the daily series
    * a random walk? Per event type, VR(4) = Var(4-day diffs) /
    * (4 · Var(1-day diffs)) on the COMMON window (rows where both
    * diffs exist), so the two moment sets share one n and the n²
    * factors CANCEL: VR_micro = (10⁶·D₄) div (4·D₁) with
    * Dₖ = n·Σdₖ² − Sₖ² over daily MEANS (the changepoint magnitude
    * discipline). VR ≈ 1 is a random walk; VR < 1 mean-reverts,
    * VR > 1 trends — the regime label a forecasting pipeline
    * branches on.
    *
    * Magnitude bound: 10⁶·D needs n·Σd² < 9·10¹²; daily-mean diffs
    * ≤ 10⁵ cents hold that to ~10³ grid days — decimate the grid or
    * drop to per-mille beyond.
    *
    * 100 TB posture: (type, day) collapse, two lags on one sort,
    * one moment rollup. */
  private val varianceRatioQ = (s: SparkSession, dir: String) => {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) div 86400").as("day"))
      .agg(expr("sum(CAST(round(value * 100) AS LONG)) div count(1)")
        .as("y"))
    val ow = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val diffs = daily
      .withColumn("d1", col("y") - lag(col("y"), 1).over(ow))
      .withColumn("d4", col("y") - lag(col("y"), 4).over(ow))
      .filter(col("d1").isNotNull && col("d4").isNotNull)
    val m = diffs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("d1")).as("s1"),
        sum(col("d1") * col("d1")).as("q1"),
        sum(col("d4")).as("s4"),
        sum(col("d4") * col("d4")).as("q4"))
      .filter(col("n") >= 2L)
    m.withColumn("dd1", expr("n * q1 - s1 * s1"))
      .withColumn("dd4", expr("n * q4 - s4 * s4"))
      .withColumn("vr_micro",
        when(col("dd1") > 0L, expr("(1000000 * dd4) div (4 * dd1)")))
      .select(col("event_type"), col("n"), col("dd1"), col("dd4"),
        col("vr_micro"))
  }

  private val varianceRatioSql =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |d AS (
      |  SELECT event_type,
      |    y - lag(y, 1) OVER w AS d1,
      |    y - lag(y, 4) OVER w AS d4
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(d1) AS BIGINT) AS s1,
      |    CAST(SUM(d1 * d1) AS BIGINT) AS q1,
      |    CAST(SUM(d4) AS BIGINT) AS s4,
      |    CAST(SUM(d4 * d4) AS BIGINT) AS q4
      |  FROM d WHERE d1 IS NOT NULL AND d4 IS NOT NULL
      |  GROUP BY 1)
      |SELECT event_type, n,
      |  n * q1 - s1 * s1 AS dd1,
      |  n * q4 - s4 * s4 AS dd4,
      |  CASE WHEN n * q1 - s1 * s1 > 0 THEN
      |    (1000000 * (n * q4 - s4 * s4))
      |      // (4 * (n * q1 - s1 * s1)) END AS vr_micro
      |FROM m WHERE n >= 2""".stripMargin

  /** Rolling 14-day correlation between the click and purchase daily
    * series — does engagement still track conversion, day by day?
    * (q_ts_xcorr gives the global lead-lag; this localizes the
    * relationship in time.) Exact DECIMAL moments in each trailing
    * window, r as ONE mirrored double expression; full windows only.
    *
    * 100 TB posture: two grid collapses joined on day (grid-domain),
    * one sort window. */
  private val rollingCorrQ = (s: SparkSession, dir: String) => {
    def daily(t: String, n: String) = Tables.events(s, dir)
      .filter(col("event_type") === t)
      .groupBy(expr("CAST(ts AS LONG) div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as(n))
    val j = daily("click", "x").join(daily("purchase", "y"), "day")
    val w = Window.orderBy(col("day")).rowsBetween(-13, 0)
    def m(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(27,0)")).over(w)
    j.withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", m(col("x"))).withColumn("sy", m(col("y")))
      .withColumn("sxx", m(col("x") * col("x")))
      .withColumn("syy", m(col("y") * col("y")))
      .withColumn("sxy", m(col("x") * col("y")))
      .filter(col("n") === 14L)
      .select(col("day"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
             .cast("double")))).as("r_14d"))
  }

  private val rollingCorrSql =
    """WITH cx AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |py AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |j AS (SELECT cx.day, x, y FROM cx JOIN py ON cx.day = py.day),
      |r AS (
      |  SELECT day,
      |    COUNT(*) OVER w AS n,
      |    SUM(CAST(x AS DECIMAL(27,0))) OVER w AS sx,
      |    SUM(CAST(y AS DECIMAL(27,0))) OVER w AS sy,
      |    SUM(CAST(x*x AS DECIMAL(27,0))) OVER w AS sxx,
      |    SUM(CAST(y*y AS DECIMAL(27,0))) OVER w AS syy,
      |    SUM(CAST(x*y AS DECIMAL(27,0))) OVER w AS sxy
      |  FROM j
      |  WINDOW w AS (ORDER BY day
      |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      |SELECT day,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r_14d
      |FROM r WHERE n = 14""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_ts_variance_ratio" -> Q(varianceRatioQ, Some(varianceRatioSql),
      "Lo-MacKinlay variance ratio VR(4): random-walk regime test, exact rational"),
    "q_ts_rolling_corr" -> Q(rollingCorrQ, Some(rollingCorrSql),
      "rolling 14-day click-purchase correlation, decimal moments, mirrored double"),
    "q_ts_fano" -> Q(fanoQ, Some(fanoSql),
      "Fano factor of hourly arrivals per type: exact rational, zero-hour completion"),
    "q_ts_control_chart" -> Q(controlChartQ, Some(controlChartSql),
      "Shewhart chart: 2-sigma zone rule + 6-run Western-Electric drift rule"),
    "q_ts_outages" -> Q(outageQ, Some(outageSql),
      "ingestion-outage audit: gaps > 6x the exact median inter-arrival"),
    "q_ts_haar" -> Q(haarQ, Some(haarSql),
      "Haar energy spectrum: 4-level integer wavelet on the 16-day tail"),
    "q_ts_stl" -> Q(stlQ, Some(stlSql),
      "STL-lite decomposition: integer trend/seasonal/residual split per type"),
    "q_ts_sma_cross" -> Q(smaCrossQ, Some(smaCrossSql),
      "SMA3/SMA10 crossover signals: cross-multiplied exact integer compare"),
    "q_ts_holt" -> Q(holtQ, Some(holtSql),
      "Holt level+trend smoothing: HOF state walk, shift-floor halvings, exact cents"),
    "q_ts_m4" -> Q(m4Q, Some(m4Sql),
      "M4 downsampling: first/last/min/max per equal-width bucket, exact cents"),
    "q_ts_acf" -> Q(acfQ, Some(acfSql),
      "ACF at lags 1-6h on the hourly grid: one fan-out join, honest alignment"),
    "q_ts_cal_heatmap" -> Q(calHeatQ, Some(calHeatSql),
      "ISO dow x hod activity matrix with per-weekday shares, 168-cell rollup"),
    "q_ts_hazard" -> Q(hazardQ, Some(hazardSql),
      "Nelson-Aalen cumulative conversion hazard with right-censoring, exact micro"),
    "q_ts_motif" -> Q(motifQ, Some(motifSql),
      "SAX-style motif discovery: 3-symbol delta alphabet, top-3 4-grams per type"),
    "q_ts_xcorr" -> Q(xcorrQ, Some(xcorrSql),
      "lagged cross-correlation over type pairs, integer covariance, argmax lag"),
    "q_ts_runs_test" -> Q(runsTestQ, Some(runsTestSql),
      "Wald-Wolfowitz runs test on daily totals: exact rational z-squared, chi-square cut"),
    "q_ts_seasonal_strength" -> Q(seasonalStrengthQ,
      Some(seasonalStrengthSql),
      "STL-style seasonality strength: 1 - SS_resid/SS_total vs the hod profile, micro"),
    "q_ts_bollinger" -> Q(bollingerQ, Some(bollingerSql),
      "Bollinger bands: trailing-14 mean +/- 2*isqrt(var), integer-exact, breakout flag"),
    "q_ts_lttb" -> Q(lttbQ, Some(lttbSql),
      "largest-triangle downsample (LTOB): integer cross-product areas, per-bucket argmax"),
    "q_ts_rsi" -> Q(rsiQ, Some(rsiSql),
      "RSI-14 on daily totals per type: trailing gain share in micro, grid windows"),
    "q_ts_theilsen" -> Q(theilSenQ, Some(theilSenSql),
      "Theil-Sen robust trend: median pairwise slope on the hourly grid, IEEE-stable order"),
    "q_ts_peaks" -> Q(peaksQ, Some(peaksSql),
      "strict local maxima above the per-type grid mean on the hourly grid"),
    "q_ts_vwap" -> Q(vwapQ, Some(vwapSql),
      "per-month VWAP in exact cents vs unweighted mean, pure partial aggregation"),
    "q_ts_changepoint" -> Q(changepointQ, Some(changepointSql),
      "per-type level-shift changepoint: integer BSS argmax over the hourly grid"),
    "q_ts_forecast_snaive" -> Q(snaiveQ, Some(snaiveSql),
      "seasonal-naive hour-of-day forecast with 7-day holdout, integer-exact MAE"),
    "q_ts_interp_linear" -> Q(interpQ, Some(interpSql),
      "linear interpolation onto the hourly grid: integer micro-cent rationals"),
    "q_ts_pop_delta" -> Q(popDeltaQ, Some(popDeltaSql),
      "day-over-day revenue delta per event type, exact rational micro-units"),
    "q_ts_markov" -> Q(markovQ, Some(markovSql),
      "per-user event-type Markov transition matrix with exact rational probabilities"),
    "q_ts_cusum" -> Q(cusumQ, Some(cusumSql),
      "CUSUM change-point scan per event type: integer micro-unit drift extremes"),
    "q_ts_rolling_median" -> Q(medianQ, Some(medianSql),
      "trailing 11-row exact median per series: the robust smoother twin of EWMA"),
    "q_ts_seasonal" -> Q(seasonalQ, Some(seasonalSql),
      "hour-of-day seasonal profile + top deseasonalized residuals"),
    "q_ts_ewma" -> Q(ewmaQ, Some(ewmaSql),
      "8-tap half-life EWMA per series: dyadic integer weights, one window pass"),
    "q_ts_anomaly" -> Q(anomalyQ, Some(anomalySql),
      "rolling z-score outliers: integer-exact (n·x−s1)² > 4(n·s2−s1²) trailing test"),
    "q_ts_moving_1h" -> Q(movingQ, Some(movingSql),
      "trailing 1-hour RANGE-frame count/sum per series (time-defined peers)"),
    "q_ts_mann_kendall" -> Q(mannKendallQ, Some(mannKendallSql),
      "Mann-Kendall trend test on the hourly grid: integer S + tie-corrected var18, one final z"),
    "q_ts_concurrency" -> Q(concurrencyQ, Some(concurrencySql),
      "sweep-line peak concurrency of one-hour activity intervals + first attainment time"),
    "q_ts_out_of_order" -> Q(outOfOrderQ, Some(outOfOrderSql),
      "ingest-order audit: late events vs the running event-time max, watermark sizing evidence"),
    "q_ts_gapfill" -> Q(gapfillQ, Some(gapfillSql),
      "hourly gap-fill per series: dense grid + LOCF interpolation"),
    "q_ts_resample_ohlc" -> Q(ohlcQ, Some(ohlcSql),
      "6-hour OHLC downsample per series, decimal-exact volume"))
}
