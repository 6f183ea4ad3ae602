package graft.streaming

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** SURVEY.md §2.9 — Structured Streaming over the `events` table
  * (absent in the reference — SkyhookDM is batch-only; north-star
  * scope via [local: PAPERS.md:9]).
  *
  * Each operator is a real `readStream → transform → writeStream`
  * pipeline: file source (the events parquet), AvailableNow trigger,
  * memory sink; the driver-facing fn runs the stream to completion and
  * returns the sink table, whose content must equal the equivalent
  * batch query — that equivalence IS the correctness statement (same
  * discipline as the reference's pushdown-vs-client comparison), and
  * the DuckDB oracles encode the batch semantics in SQL.
  *
  * Modes: windowed aggregations run in COMPLETE mode (an AvailableNow
  * run ends before the watermark passes the final windows, so APPEND
  * would withhold them); dedup+agg also COMPLETE; arbitrary state runs
  * in UPDATE mode (single input file ⇒ single micro-batch ⇒ one final
  * update per key).
  *
  * 100 TB posture: state is keyed on (window[, type]) / user_id /
  * event_id — all partitioned by key across executors via the state
  * store; watermarks bound state growth (declared on every windowed
  * query even where COMPLETE ignores them, since APPEND production
  * runs need them); no operator holds unbounded per-key history.
  */
object StreamOps extends QueryModule {

  private val sinkId = new AtomicInteger(0)

  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val objDir = s"$dir/events.parquet"
    // The file source needs an explicit schema: declare whatever the
    // fixture generation physically holds (nanos-as-long or micros
    // NTZ — probed from the footer), then normalize ts exactly like
    // Tables.events so batch oracles and watermarks see one shape.
    val reader = s.readStream.schema(Tables.eventsPhysicalSchema(s, dir))
      // INVARIANT the oracle comparisons rely on: the whole fixture is
      // ONE micro-batch (one events.parquet, AvailableNow, and this
      // ceiling far above the file count). Multi-batch input would let
      // the advancing watermark drop late rows relative to the batch
      // SQL oracles (dedup-within-watermark, stream-stream join) —
      // correct streaming semantics, but a different answer. Production
      // pipelines want that dropping; these driver-facing runs pin the
      // batch-equivalent case.
      .option("maxFilesPerTrigger", "1000000")
    // the file source only accepts directories: read the objectified
    // layout (events.parquet/ of part-files) directly, or glob the
    // single fixture file out of the sf dir
    val src =
      if (Files.isDirectory(java.nio.file.Paths.get(objDir)))
        reader.parquet(objDir)
      else
        reader.option("pathGlobFilter", "events.parquet").parquet(dir)
    Tables.normalizeTs(src)
  }

  /** Checkpoints live on tmpfs when available: the state-store commit
    * fsyncs per micro-batch, and for these driver-facing finite runs
    * (AvailableNow, memory sink) durability across machine restarts
    * buys nothing. A production writeStream would point this at
    * durable shared storage. */
  private def ckptDir(): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val dir =
      if (Files.isDirectory(shm) && Files.isWritable(shm))
        Files.createTempDirectory(shm, "graft-ckpt")
      else Files.createTempDirectory("graft-ckpt")
    ckptDirs.synchronized { ckptDirs += dir }
    dir.toString
  }

  // Checkpoint dirs are RAM-backed (tmpfs); clean them on JVM exit so
  // repeated bench/test runs don't accumulate state-store files in RAM.
  private val ckptDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
  sys.addShutdownHook {
    ckptDirs.synchronized(ckptDirs.toList).foreach { d =>
      try {
        import scala.jdk.CollectionConverters._
        Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists)
      } catch { case _: Throwable => }
    }
  }

  /** Run a streaming DataFrame to completion (AvailableNow) into a
    * memory sink and return the sink table.
    *
    * Every stateful query here runs on the RocksDB state store (r4
    * verdict #6): the default HDFS-backed provider keeps ALL state
    * keys on-heap per partition — fine at fixture scale, an
    * unbounded-key OOM at 100 TB where dedup/session/join state spans
    * hundreds of millions of keys. RocksDB keeps a bounded block cache
    * in memory and spills the key space to executor-local disk with
    * incremental checkpointing to the query's checkpoint location, so
    * state scales with disk, not heap. Stateless queries read no state
    * store and ignore the conf. */
  private def runToTable(s: SparkSession, out: DataFrame, mode: String): DataFrame = {
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val name = s"graft_sink_${sinkId.incrementAndGet()}"
    val ckpt = ckptDir()
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // Scale-tier diagnostics (r8 verdict #5): state-store growth ∝ keys
    // is the streaming family's 100 TB axis — report the checkpoint's
    // on-disk state size so tier sweeps can record it next to walls.
    if (sys.env.contains("SPARK_GRAFT_STATE_REPORT")) {
      def walk(f: java.io.File): (Long, Long) = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty)
        kids.foldLeft((0L, 0L)) { case ((b, n), k) =>
          if (k.isDirectory) { val (b2, n2) = walk(k); (b + b2, n + n2) }
          else (b + k.length(), n + 1)
        }
      }
      val st = new java.io.File(ckpt, "state")
      val (bytes, files) = walk(st)
      System.err.println(
        s"[stream-state] sink=$name state_bytes=$bytes state_files=$files ckpt=$ckpt")
    }
    s.table(name)
  }

  /** Streaming → parquet FILE SINK (exactly-once via the sink's
    * commit log, `_spark_metadata`): the stateless projection path a
    * production pipeline uses to land a curated stream as columnar
    * files. The read-back goes through the SAME metadata log (Spark's
    * file-sink readers only trust committed files), so the oracle
    * equality also proves no torn or duplicated batch output. APPEND
    * mode with no aggregation — the file sink does not support
    * COMPLETE — hence the map-only gate + projection shape. */
  private val fileSink = (s: SparkSession, dir: String) => {
    val out = "/tmp/graft_stream_sink_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_")
    // fresh sink per run: the file-sink log would otherwise dedupe
    // re-run batches and double-count across Verify invocations
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(new java.io.File(out))
    val q = eventsStream(s, dir)
      .filter(col("event_type") === "purchase" && col("value") > 50.0)
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckptDir())
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.read.parquet(out)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"),
        max(col("ts")).as("last_ts"))
  }

  private val fileSinkSql =
    """SELECT user_id, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  max(ts) AS last_ts
      |FROM events
      |WHERE event_type = 'purchase' AND value > 50.0
      |GROUP BY user_id""".stripMargin

  // Tumbling 1-day windows per event type.
  private val tumbling = (s: SparkSession, dir: String) => {
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
    runToTable(s, agg, "complete")
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  private val tumblingSql =
    """SELECT time_bucket(INTERVAL 1 DAY, ts) AS w_start,
      |  time_bucket(INTERVAL 1 DAY, ts) + INTERVAL 1 DAY AS w_end,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  // Sliding 2-day windows advancing 1 day (each event in 2 windows).
  private val sliding = (s: SparkSession, dir: String) => {
    val agg = eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(count(lit(1)).as("n"))
    runToTable(s, agg, "complete")
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("n"))
  }

  private val slidingSql =
    """WITH w AS (
      |  SELECT time_bucket(INTERVAL 1 DAY, ts) - k * INTERVAL 1 DAY AS w_start
      |  FROM events, (SELECT unnest(range(0, 2)) AS k)
      |  WHERE event_type = 'purchase')
      |SELECT w_start, w_start + INTERVAL 2 DAY AS w_end, COUNT(*) AS n
      |FROM w GROUP BY 1, 2""".stripMargin

  // Session windows: 4-hour inactivity gap per user.
  private val session = (s: SparkSession, dir: String) => {
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    runToTable(s, agg, "complete")
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))
  }

  private val sessionSql =
    """WITH ordered AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 4 HOUR OR
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |tagged AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM ordered)
      |SELECT min(ts) AS s_start, max(ts) + INTERVAL 4 HOUR AS s_end,
      |  user_id, COUNT(*) AS n_events
      |FROM tagged GROUP BY user_id, sid""".stripMargin

  // Stateful dedup by event_id, then aggregate.
  private val dedup = (s: SparkSession, dir: String) => {
    val agg = eventsStream(s, dir)
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    runToTable(s, agg, "complete")
  }

  private val dedupSql =
    """SELECT event_type, COUNT(*) AS n FROM (
      |  SELECT DISTINCT ON (event_id) event_id, event_type FROM events
      |  ORDER BY event_id) GROUP BY event_type""".stripMargin

  /** Watermark-bounded dedup: `dropDuplicatesWithinWatermark` keeps
    * dedup state only until the watermark passes each key's event time
    * + delay — the form whose state does NOT grow with total stream
    * length (plain dropDuplicates state is forever). Same answer as
    * exact dedup whenever true duplicates arrive within the delay.
    */
  private val dedupWm = (s: SparkSession, dir: String) => {
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    runToTable(s, agg, "complete")
  }

  /** Arbitrary state: per-user running totals via
    * flatMapGroupsWithState (cents as long for cross-engine exactness).
    */
  final case class Ev(user_id: Long, cents: Long)
  final case class UserTotals(user_id: Long, n_events: Long, total_cents: Long)

  private def statefulFn(user: Long, evs: Iterator[Ev],
      state: GroupState[UserTotals]): Iterator[UserTotals] = {
    val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0L))
    var n = prev.n_events; var c = prev.total_cents
    evs.foreach { e => n += 1; c += e.cents }
    val now = UserTotals(user, n, c)
    state.update(now)
    Iterator(now)
  }

  private val stateful = (s: SparkSession, dir: String) => {
    import s.implicits._
    val evs: Dataset[Ev] = eventsStream(s, dir)
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .as[Ev]
    val out = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(statefulFn)
    runToTable(s, out.toDF(), "update")
      // one input file = one micro-batch = one final update per user;
      // keep max(n_events) per user anyway so a multi-batch run (many
      // input files at scale) still yields the final state
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("total_cents"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.total_cents").as("total_cents"))
  }

  private val statefulSql =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM events GROUP BY user_id""".stripMargin

  /** Same running totals via transformWithState (Spark 4 arbitrary-
    * state v2: StatefulProcessor + typed ValueState, RocksDB-backed).
    * One class instance per task — a singleton would share one state
    * handle across partitions in-JVM. Shares the flatMapGroupsWithState
    * oracle: the two state APIs must agree on the answer.
    */
  final class TotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserTotals] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[UserTotals] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals]("totals",
        org.apache.spark.sql.Encoders.product[UserTotals],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(user, 0L, 0L)
      var n = prev.n_events; var c = prev.total_cents
      rows.foreach { e => n += 1; c += e.cents }
      val now = UserTotals(user, n, c)
      totals.update(now)
      Iterator(now)
    }
  }

  private val statefulTws = (s: SparkSession, dir: String) => {
    import s.implicits._
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(confKey)
    s.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs: Dataset[Ev] = eventsStream(s, dir)
        .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
        .as[Ev]
      val out = evs.groupByKey(_.user_id)
        .transformWithState(new TotalsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      runToTable(s, out.toDF(), "update")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("total_cents"))).as("m"))
        .select(col("user_id"), col("m.n_events").as("n_events"),
          col("m.total_cents").as("total_cents"))
    } finally prev match {
      case Some(v) => s.conf.set(confKey, v)
      case None    => s.conf.unset(confKey)
    }
  }

  final case class AnomEv(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, c: Long)
  final case class AnomRing(cents: Seq[Long])
  final case class AnomHit(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, c: Long, n_window: Long)

  /** STREAMING twin of the batch rolling z-score detector
    * (TimeSeries.q_ts_anomaly, same oracle): per user, each event is
    * tested against a ring buffer of its 10 most recent predecessors
    * held in flatMapGroupsWithState state — the buffer IS the whole
    * per-key state (≤10 longs), so state size is keys×10, not history.
    * The integer test is byte-for-byte the batch one:
    * (n·x − s1)² > 4·(n·s2 − s1²), and the final `value` column is
    * computed by the same Spark round() the batch plan uses. Events
    * sort by (ts, event_id) WITHIN each micro-batch group (bounded
    * by the batch, not the stream); the single-batch invariant
    * eventsStream documents makes that the full-series order here,
    * while a production multi-batch run would carry watermark-late
    * rows to the next trigger exactly like the dedup queries. */
  private val streamAnomaly = (s: SparkSession, dir: String) => {
    import s.implicits._
    val evs: Dataset[AnomEv] = eventsStream(s, dir)
      .filter(col("user_id") < 40)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .as[AnomEv]
    val flagged = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomRing, AnomHit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (user, rows, state: org.apache.spark.sql.streaming.GroupState[AnomRing]) =>
          var ring = if (state.exists) state.get.cents.toVector else Vector.empty[Long]
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomHit]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val n = ring.size.toLong
            if (n >= 5) {
              val s1 = ring.sum
              val s2 = ring.map(x => x * x).sum
              val lhs = n * e.c - s1
              if (lhs * lhs > 4L * (n * s2 - s1 * s1))
                out += AnomHit(user, e.event_id, e.ts, e.c, n)
            }
            ring = (ring :+ e.c).takeRight(10)
          }
          state.update(AnomRing(ring))
          out.iterator
      }
    runToTable(s, flagged.toDF(), "append")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("c") / 100.0, 2).as("value"),
        col("n_window"), lit(true).as("is_anomaly"))
  }

  /** STREAMING twin of the native Space-Saving aggregate
    * (Aggregates.q_agg_freq_items, same oracle): the
    * TypedImperativeAggregate runs INSIDE the streaming runtime as a
    * stateful complete-mode aggregate — per-micro-batch partials merge
    * into the state-store sketch, so a production stream maintains the
    * heavy-hitters summary continuously with cap-bounded state. Exact
    * regime (cap ≥ vocabulary) ⇒ batch-equal output. */
  private val streamFreqItems = (s: SparkSession, dir: String) => {
    graft.functions.GraftFunctions.register(s)
    val agg = eventsStream(s, dir)
      .agg(expr("freq_items_sketch(event_type, 64)").as("sk"))
    runToTable(s, agg, "complete")
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("event_type"), col("e.est").as("n"),
        col("e.err").as("err"))
  }

  /** STREAMING twin of the batch quantile sketch
    * (Aggregates.q_agg_quantile_sketch, same oracle): the native
    * TypedImperativeAggregate runs unmodified as a stateful streaming
    * aggregate — complete mode keeps one cap-bounded compactor stack
    * per type in the state store, each micro-batch merges partials
    * into it, and below cap the result is the exact multiset quantile
    * regardless of batch boundaries (the merge-order-invariance the
    * spec proves is exactly what makes the sketch stream-safe). */
  private val streamQuantile = (s: SparkSession, dir: String) => {
    graft.functions.GraftFunctions.register(s)
    val agg = eventsStream(s, dir)
      // same null gate as the batch twin: an all-NULL group must
      // emit no row (mirrors the oracle's WHERE value IS NOT NULL)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(floor(value) AS BIGINT)").as("v"))
      .groupBy(col("event_type"))
      .agg(expr(
        "quantile_sketch(v, 100000, '250000,500000,750000,900000')")
        .as("qs"))
    runToTable(s, agg, "complete")
      .select(col("event_type"), posexplode(col("qs")))
      .select(col("event_type"), col("pos"), col("col").as("q"))
  }

  final case class EwmaEv(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, c: Long)
  final case class EwmaRing(cents: Seq[Long])
  final case class EwmaOut(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, c: Long, ewma: Double)

  /** STREAMING twin of the batch 8-tap EWMA (TimeSeries.q_ts_ewma,
    * same oracle): per user the state is the ring of the 7 most recent
    * cents — the EXACT carry the batch lag-chain reads — so each event
    * scores num = c·128 + Σ ringᵢ·2^(6−i), den = 128 + Σ weights
    * present, in BIGINT, then the same two-step double division the
    * batch plan emits. State is keys×7 longs, independent of history
    * length: the posture every trailing-window feature wants at
    * 100 TB. Same single-batch ordering contract as the anomaly twin. */
  private val streamEwma = (s: SparkSession, dir: String) => {
    import s.implicits._
    val evs: Dataset[EwmaEv] = eventsStream(s, dir)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .as[EwmaEv]
    val scored = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaRing, EwmaOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (user, rows, state: org.apache.spark.sql.streaming.GroupState[EwmaRing]) =>
          // ring: most recent previous observation LAST
          var ring = if (state.exists) state.get.cents.toVector else Vector.empty[Long]
          val out = scala.collection.mutable.ArrayBuffer.empty[EwmaOut]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            var num = e.c * 128L
            var den = 128L
            // lag j = j-th most recent previous = ring(size - j)
            ring.reverseIterator.zipWithIndex.take(7).foreach { case (cj, i) =>
              val wgt = 1L << (6 - i) // j = i+1 → 2^(7-j)
              num += cj * wgt
              den += wgt
            }
            out += EwmaOut(user, e.event_id, e.ts, e.c,
              num.toDouble / den.toDouble / 100.0)
            ring = (ring :+ e.c).takeRight(7)
          }
          state.update(EwmaRing(ring))
          out.iterator
      }
    runToTable(s, scored.toDF(), "append")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("c") / 100.0, 2).as("value"), col("ewma"))
  }

  /** Stream-stream inner join: each purchase joined to the same user's
    * clicks in the preceding day. Both sides carry watermarks and the
    * join has a time-range condition — the two ingredients that let the
    * streaming runtime expire join state (a click older than 1 day +
    * watermark can never match a future purchase and is dropped from
    * the state store). State is keyed by user_id — partitioned across
    * executors, bounded by the range condition: the 100 TB posture.
    * AvailableNow over one input file = one micro-batch, so append mode
    * emits the complete join = the batch/oracle semantics.
    */
  private val streamJoin = (s: SparkSession, dir: String) => {
    val purchases = eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = eventsStream(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= expr("p_ts - INTERVAL 1 DAY") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("p_ts"), col("c_ts"))
    runToTable(s, joined, "append")
  }

  /** Stream-stream LEFT OUTER join: unmatched purchases emit
    * null-extended ONLY after the click-side watermark proves no
    * future click can land in their interval — that eviction happens
    * in the trailing no-data micro-batch AvailableNow runs after the
    * data drains. The purchase side is pinned to `ts < 2024-01-28`
    * (days before every fixture's stream end) so EVERY left row's
    * no-match deadline provably passes the final watermark — the
    * batch oracle and the streaming answer then agree exactly;
    * without the pin, rows near the stream end would stay withheld
    * in state (correct APPEND semantics, different answer). */
  private val streamJoinOuter = (s: SparkSession, dir: String) => {
    val purchases = eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
      // watermark BEFORE the cutoff filter: the watermark node must
      // see the full purchase stream (through 01-30) so the left
      // side's own watermark passes the cutoff — filtering first
      // would cap it at the cutoff and withhold the last hour's
      // unmatched rows forever
      .withWatermark("p_ts", "1 hour")
      .filter(col("p_ts") < lit("2024-01-28").cast("timestamp"))
    val clicks = eventsStream(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= expr("p_ts - INTERVAL 1 DAY") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("user_id"), col("p_id"), col("p_ts"), col("c_ts"))
    runToTable(s, joined, "append")
  }

  private val streamJoinOuterSql =
    """SELECT e.user_id, e.event_id AS p_id, e.ts AS p_ts, c.ts AS c_ts
      |FROM events e LEFT OUTER JOIN events c
      |  ON c.event_type = 'click' AND e.user_id = c.user_id
      |  AND c.ts >= e.ts - INTERVAL 1 DAY AND c.ts <= e.ts
      |WHERE e.event_type = 'purchase'
      |  AND e.ts < TIMESTAMP '2024-01-28 00:00:00'""".stripMargin

  /** FULL OUTER stream-stream join: null extension on BOTH sides, so
    * BOTH streams carry the cutoff pin (watermark node before the
    * cutoff filter, as in the left-outer case) — an unmatched click
    * needs the purchase-side watermark past its deadline and vice
    * versa. Interval [c_ts, c_ts + 1 DAY] ∋ p_ts, i.e. the same
    * purchase-after-click window seen from both sides. */
  private val streamJoinFullOuter = (s: SparkSession, dir: String) => {
    val cutoff = lit("2024-01-28").cast("timestamp")
    val purchases = eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
      .filter(col("p_ts") < cutoff)
    val clicks = eventsStream(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
      .filter(col("c_ts") < cutoff)
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= expr("c_ts + INTERVAL 1 DAY"),
      "full_outer")
      .select(coalesce(col("user_id"), col("c_user")).as("uid"),
        col("p_id"), col("c_id"))
    runToTable(s, joined, "append")
  }

  private val streamJoinFullOuterSql =
    """SELECT COALESCE(e.user_id, c.user_id) AS uid,
      |  e.event_id AS p_id, c.event_id AS c_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase'
      |      AND ts < TIMESTAMP '2024-01-28 00:00:00') e
      |FULL OUTER JOIN
      |     (SELECT * FROM events WHERE event_type = 'click'
      |      AND ts < TIMESTAMP '2024-01-28 00:00:00') c
      |  ON e.user_id = c.user_id
      |  AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 DAY""".stripMargin

  private val streamJoinSql =
    """SELECT p.user_id, p.ts AS p_ts, c.ts AS c_ts
      |FROM events p JOIN events c ON p.user_id = c.user_id
      |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND c.ts BETWEEN p.ts - INTERVAL 1 DAY AND p.ts""".stripMargin

  // ---- streaming curation: the continuous-ingest form of the
  // curation pipeline (gate → dedup → per-source stats) ----

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def documentsStream(s: SparkSession, dir: String): DataFrame = {
    val objDir = s"$dir/documents.parquet"
    val reader = s.readStream.schema(docsSchema)
      .option("maxFilesPerTrigger", "1000000") // single-batch pin, as above
    if (Files.isDirectory(java.nio.file.Paths.get(objDir)))
      reader.parquet(objDir) // objectified layout: a dir of part-files
    else
      reader.option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** Streaming curation: the C4-style gate (same thresholds as
    * q_text_filter_policy), exact dedup per (source, content-hash) via
    * streaming dropDuplicates state, then per-source corpus stats in
    * COMPLETE mode. Duplicate texts carry identical token counts, so
    * the aggregate is insensitive to which physical duplicate the
    * state store keeps — what makes the batch oracle exact. 100 TB
    * posture: the gate is stateless map work; dedup state is keyed on
    * the content hash (partitioned across executors — a corpus-wide
    * dedup's state is inherently proportional to distinct content,
    * exactly the reference's index discipline); the final agg carries
    * one row per source. */
  private val curate = (s: SparkSession, dir: String) => {
    val stopList = Seq("the", "a", "of", "to", "and", "in", "is")
      .map("'" + _ + "'").mkString(",")
    val gated = documentsStream(s, dir)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .withColumn("rep_ratio", expr(
        "array_max(transform(array_distinct(tk), t -> size(filter(tk, x -> x = t))))")
        / col("n_tok"))
      .withColumn("en_score",
        size(expr(s"filter(tk, t -> t IN ($stopList))")) / col("n_tok"))
      .filter(col("n_tok") >= 20 && col("n_tok") <= 90 &&
        col("rep_ratio") <= 0.2 && col("en_score") >= 0.05)
    val agg = gated
      .select(col("source"), md5(col("text")).as("h"), col("n_tok"))
      .dropDuplicates("source", "h")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("total_tokens"))
    runToTable(s, agg, "complete")
  }

  private val curateSql = {
    val list = Seq("the", "a", "of", "to", "and", "in", "is")
      .map("'" + _ + "'").mkString(",")
    s"""WITH t AS (SELECT source, text, string_split(text, ' ') AS tk FROM documents),
       |m AS (SELECT source, text, len(tk) AS n_tok,
       |  list_max(list_transform(list_distinct(tk),
       |    x -> len(list_filter(tk, y -> y = x)))) * 1.0 / len(tk) AS rep_ratio,
       |  len(list_filter(tk, x -> x IN ($list))) * 1.0 / len(tk) AS en_score
       |  FROM t),
       |gated AS (SELECT * FROM m
       |  WHERE n_tok BETWEEN 20 AND 90 AND rep_ratio <= 0.2 AND en_score >= 0.05),
       |ded AS (SELECT source, md5(text) AS h, MAX(n_tok) AS n_tok
       |        FROM gated GROUP BY 1, 2)
       |SELECT source, COUNT(*) AS n_kept,
       |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens
       |FROM ded GROUP BY source""".stripMargin
  }

  /** Stream-STATIC enrichment join — the lookup shape every ingest
    * pipeline runs (stream rows decorated with a dimension/profile
    * table): stateless, APPEND mode, no watermark needed; the static
    * side re-resolves per micro-batch (so a dimension refresh is
    * picked up at the next batch) and BROADCASTS, so the stream side
    * never shuffles. Here the profile is a per-user aggregate of the
    * same events table — the "historical context" enrichment. */
  private val streamStaticJoin = (s: SparkSession, dir: String) => {
    val profile = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hist"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("sum_hist"))
    val enriched = eventsStream(s, dir)
      .filter(col("event_id") < 2000)
      .join(broadcast(profile), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("n_hist"), col("sum_hist"))
    runToTable(s, enriched, "append")
  }

  private val streamStaticJoinSql =
    """WITH prof AS (
      |  SELECT user_id, COUNT(*) AS n_hist,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_hist
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, e.user_id, e.event_type, e.value,
      |  p.n_hist, p.sum_hist
      |FROM events e JOIN prof p ON e.user_id = p.user_id
      |WHERE e.event_id < 2000""".stripMargin

  final case class OutageEv(event_type: String, event_id: Long,
      sec: Long)
  final case class OutageSt(lastSec: Long, lastId: Long)
  final case class OutageGap(event_type: String, gap_start: Long,
      gap_end: Long, gap: Long)

  /** STREAMING twin of the ingestion-outage audit (q_ts_outages,
    * same oracle): per event type, flatMapGroupsWithState carries the
    * last-seen (sec, event_id) across micro-batches and emits every
    * inter-arrival gap; the 6×-median alert cut joins a BATCH-trained
    * med2 profile (the batch-profile → streaming-gate composition the
    * curation pipeline uses — an online stream can't know its median,
    * so the gate is trained offline and broadcast). State is two
    * longs per event type. */
  private val streamOutages = (s: SparkSession, dir: String) => {
    import s.implicits._
    val evs: Dataset[OutageEv] = eventsStream(s, dir)
      .select(col("event_type"), col("event_id"),
        col("ts").cast("long").as("sec"))
      .as[OutageEv]
    val gaps = evs.groupByKey(_.event_type)
      .flatMapGroupsWithState[OutageSt, OutageGap](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (t, rows, state: org.apache.spark.sql.streaming.GroupState[OutageSt]) =>
          var last = if (state.exists)
            Some((state.get.lastSec, state.get.lastId)) else None
          val out = scala.collection.mutable.ArrayBuffer.empty[OutageGap]
          rows.toSeq.sortBy(e => (e.sec, e.event_id)).foreach { e =>
            last.foreach { case (ps, _) =>
              out += OutageGap(t, ps, e.sec, e.sec - ps)
            }
            last = Some((e.sec, e.event_id))
          }
          last.foreach { case (ls, li) => state.update(OutageSt(ls, li)) }
          out.iterator
      }
    // batch-trained med2 per type (the offline profile the gate uses)
    val ev = graft.Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        col("ts").cast("long").as("sec"))
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("sec"), col("event_id"))
    val bg = ev.withColumn("prev", lag(col("sec"), 1).over(wo))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), (col("sec") - col("prev")).as("gap"),
        col("prev").as("gs"), col("sec").as("ge"))
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("gap").asc, col("gs").asc, col("ge").asc)
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val med = bg
      .withColumn("rn", row_number().over(wR))
      .withColumn("n", count(lit(1)).over(wS))
      .groupBy(col("event_type"))
      .agg((sum(when(col("rn") === expr("(n + 1) div 2"), col("gap"))
          .otherwise(0L))
        + sum(when(col("rn") === expr("(n + 2) div 2"), col("gap"))
          .otherwise(0L))).as("med2"))
    runToTable(s, gaps.toDF(), "append")
      .join(broadcast(med), "event_type")
      .filter(col("gap") * 2L > col("med2") * 6L)
      .withColumn("severity_x10",
        expr("(10 * 2 * gap) div greatest(med2, 1)"))
      .select(col("event_type"), col("gap_start"), col("gap_end"),
        col("gap"), col("med2"), col("severity_x10"))
  }

  /** STREAMING twin of the Shewhart control chart
    * (q_ts_control_chart, same oracle): the daily floor-mean chart
    * is MAINTAINED as a complete-mode streaming aggregate ((type,
    * day) sums + counts in the state store — the tumbling-window
    * discipline), and the zone/runs rules evaluate on the
    * materialized chart exactly as in batch. This is how a live SPC
    * dashboard actually runs: the stream keeps the per-cell moments
    * current; rule evaluation is a view over them. */
  private val streamControlChart = (s: SparkSession, dir: String) => {
    val agg = eventsStream(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) div 86400").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("sc"),
        count(lit(1)).as("cc"))
    val daily = runToTable(s, agg, "complete")
      .withColumn("y", expr("sc div cc"))
      .select(col("event_type"), col("day"), col("y"))
    val lim = daily.groupBy(col("event_type").as("lt"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("cl", expr("sy div n"))
      .withColumn("sd", floor(sqrt(
        expr("(n * syy - sy * sy) div (n * n)").cast("double")))
        .cast("long"))
      .select(col("lt"), col("cl"), col("sd"))
    val charted = daily
      .join(broadcast(lim), col("event_type") === col("lt"))
      .withColumn("rule_zone",
        abs(col("y") - col("cl")) > lit(2L) * col("sd"))
      .withColumn("side", when(col("y") > col("cl"), 1L)
        .when(col("y") < col("cl"), -1L).otherwise(0L))
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val runs = charted
      .withColumn("rn", row_number().over(ow).cast("long"))
      .withColumn("grp", col("rn") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("side"))
          .orderBy(col("day"))).cast("long"))
    val runLens = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("side"), col("grp"))
    runs
      .withColumn("run_len", count(lit(1)).over(runLens))
      .withColumn("rule_run", col("side") =!= 0L && col("run_len") >= 6L)
      .filter(col("rule_zone") || col("rule_run"))
      .select(col("event_type"), col("day"), col("y"), col("cl"),
        col("sd"), col("rule_zone"), col("rule_run"))
  }

  override val queries: Map[String, Q] = Map(
    "q_stream_control_chart" -> Q(streamControlChart,
      Some(graft.operators.TimeSeries.controlChartSql),
      "streaming SPC chart: complete-mode daily moments, batch-equal rules"),
    "q_stream_outages" -> Q(streamOutages,
      Some(graft.operators.TimeSeries.outageSql),
      "streaming outage alerts: 2-long state per type, batch-trained median gate"),
    "q_stream_ewma" -> Q(streamEwma,
      Some(graft.operators.TimeSeries.ewmaSql),
      "streaming 8-tap EWMA: 7-deep ring state, shares the batch oracle"),
    "q_stream_freq_items" -> Q(streamFreqItems,
      Some(graft.operators.Aggregates.freqItemsSql),
      "native Space-Saving sketch as a stateful streaming aggregate, batch-equal"),
    "q_stream_quantile" -> Q(streamQuantile,
      Some(graft.operators.Aggregates.quantileSketchSql),
      "native quantile sketch as a stateful streaming aggregate, batch-equal below cap"),
    "q_stream_anomaly" -> Q(streamAnomaly,
      Some(graft.operators.TimeSeries.anomalySql),
      "streaming rolling z-score detector: 10-deep ring-buffer state, batch-equal"),
    "q_stream_static_join" -> Q(streamStaticJoin, Some(streamStaticJoinSql),
      "stream-static broadcast enrichment join (append, stateless)"),
    "q_stream_file_sink" -> Q(fileSink, Some(fileSinkSql),
      "exactly-once parquet file sink: commit-log read-back == batch"),
    "q_stream_curate" -> Q(curate, Some(curateSql),
      "streaming curation: gate -> stateful dedup -> per-source stats"),
    "q_stream_join" -> Q(streamJoin, Some(streamJoinSql),
      "stream-stream inner join (watermarked, time-range state expiry)"),
    "q_stream_join_outer" -> Q(streamJoinOuter, Some(streamJoinOuterSql),
      "stream-stream LEFT OUTER join: watermark-evicted null extension"),
    "q_stream_join_full_outer" -> Q(streamJoinFullOuter,
      Some(streamJoinFullOuterSql),
      "stream-stream FULL OUTER join: both sides watermark-evicted"),
    "q_stream_dedup_wm" -> Q(dedupWm, Some(dedupSql),
      "dropDuplicatesWithinWatermark: state bounded by watermark delay"),
    "q_stream_tumbling" -> Q(tumbling, Some(tumblingSql),
      "tumbling 1-day windows per type (readStream->complete->memory)"),
    "q_stream_sliding" -> Q(sliding, Some(slidingSql),
      "sliding 2d/1d windows over purchases"),
    "q_stream_session" -> Q(session, Some(sessionSql),
      "session windows, 4h gap per user"),
    "q_stream_dedup" -> Q(dedup, Some(dedupSql),
      "stateful dropDuplicates(event_id) + aggregate"),
    "q_stream_stateful" -> Q(stateful, Some(statefulSql),
      "flatMapGroupsWithState running per-user totals"),
    "q_stream_stateful_tws" -> Q(statefulTws, Some(statefulSql),
      "transformWithState (arbitrary-state v2) per-user totals"))
}
