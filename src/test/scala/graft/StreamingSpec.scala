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

  test("APPEND mode: late rows drop past the watermark; open windows withheld") {
    // Two files = two micro-batches (maxFilesPerTrigger=1). Batch 1
    // carries window-A rows (10:00, 10:05) plus an 11:00 row that
    // advances the watermark to 10:55. Batch 2 plants a LATE 10:02 row
    // (behind the watermark -> must be dropped, NOT added to window A)
    // and a 12:00 row pushing the watermark to 11:55, which finalizes
    // window [11:00,11:10) but leaves [12:00,12:10) open (withheld).
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    val in = s"$dir/in"; new java.io.File(in).mkdirs()
    def writeFile(name: String, rows: Seq[(Timestamp, String)], modTime: Long): Unit = {
      val stage = s"$dir/stage_$name"
      spark.createDataFrame(rows).toDF("ts", "k")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(in, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(modTime)
    }
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")
    val base = System.currentTimeMillis()
    val emitted = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]

    // one AvailableNow cycle per file against the SAME checkpoint: the
    // second run restarts from the commit log with the watermark the
    // first run established (exactly how a scheduled incremental
    // pipeline consumes a growing directory)
    def runCycle(): Unit = {
      val agg = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType))))
        .parquet(in)
        .withWatermark("ts", "5 minutes")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted.synchronized { emitted ++= df.collect() }
          ()
        }
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeFile("f1.parquet",
      Seq((t("10:00"), "a"), (t("10:05"), "b"), (t("11:00"), "c")), base - 60000)
    runCycle()
    writeFile("f2.parquet",
      Seq((t("10:02"), "LATE"), (t("12:00"), "d")), base)
    runCycle()

    val out = emitted.map { r =>
      r.getStruct(0).getTimestamp(0).toString.stripSuffix(".0") -> r.getLong(1)
    }.toMap
    // window A emitted with ONLY the two on-time rows - the planted
    // late row did not resurrect it
    assert(out.get("2024-01-01 10:00:00").contains(2L), out.toString)
    // the 11:00 window finalized once the watermark passed its end
    assert(out.get("2024-01-01 11:00:00").contains(1L), out.toString)
    // the 12:00 window is still open -> APPEND withholds it
    assert(!out.contains("2024-01-01 12:00:00"), out.toString)
  }

  test("parquet sink: append stream materializes files that read back exactly") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-psink").toString
    val out = s"$dir/out"
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
    // stream the events table through a parquet APPEND sink
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("props",
          org.apache.spark.sql.types.StringType))))
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
    val q = stream.writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = purchases.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }
}
