package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark drops late rows in append mode across micro-batches") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    // batch 1: two on-time rows in the 10:00 window
    mem.addData((ts("2024-01-01 10:01:00"), "a"), (ts("2024-01-01 10:05:00"), "a"))
    q.processAllAvailable()
    // batch 2: advance the watermark far past the 10:00 window
    mem.addData((ts("2024-01-01 11:00:00"), "a"))
    q.processAllAvailable()
    // batch 3: a LATE row for the closed 10:00 window — must be dropped
    mem.addData((ts("2024-01-01 10:02:00"), "a"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_test").collect()
      .map(r => (r.getStruct(0).getTimestamp(0).toString, r.getLong(2)))
    // the emitted 10:00 window must count 2 (late row excluded)
    assert(out.contains(("2024-01-01 10:00:00.0", 2L)), out.mkString(", "))
    assert(!out.contains(("2024-01-01 10:00:00.0", 3L)))
  }

  test("dropDuplicates dedups across micro-batches") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v").dropDuplicates("id")
      .writeStream.format("memory").queryName("dd_test")
      .outputMode("append").start()
    mem.addData((1L, "x"), (2L, "y"), (1L, "x2"))
    q.processAllAvailable()
    mem.addData((2L, "y2"), (3L, "z")) // 2 is a cross-batch duplicate
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd_test").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)), ids.mkString(","))
  }

  test("session window merges events within gap, splits beyond it") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "uid")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("uid"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sess_test")
      .outputMode("complete").start()
    mem.addData(
      (ts("2024-01-01 09:00:00"), 7L), (ts("2024-01-01 09:20:00"), 7L),
      (ts("2024-01-01 09:35:00"), 7L), // chains: still one session
      (ts("2024-01-01 12:00:00"), 7L)) // > 30min gap: new session
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_test").collect()
    assert(rows.length == 2, rows.mkString(", "))
    assert(rows.map(_.getLong(2)).sorted.sameElements(Array(1L, 3L)))
  }

  test("stream-stream join equals the batch range join") {
    val streamed = run("q_stream_join").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    val ev = Tables.events(spark, sf)
    val batch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
      .join(ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts")),
        col("user_id") === col("c_user") &&
          col("c_ts") >= expr("p_ts - INTERVAL 1 DAY") &&
          col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("p_ts"), col("c_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("driver-facing stream queries equal their batch equivalents") {
    val streamed = run("q_stream_stateful").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}
