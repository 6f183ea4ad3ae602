package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Diagnostic: where does the bench streaming query's time go?
  * Prints per-batch durationMs from query progress. Not driver-facing. */
object StreamLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.minBatchesToRetain", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = Tables.eventsPhysicalSchema(spark, sfDir)

    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val evDir = s"$sfDir/events.parquet"
      val rdr = spark.readStream.schema(schema)
      val src =
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(evDir)))
          rdr.parquet(evDir)
        else rdr.option("pathGlobFilter", "events.parquet").parquet(sfDir)
      val agg = Tables.normalizeTs(src)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "slab").toString
      val q = agg.writeStream.format("memory").queryName(s"slab$i")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"run $i total=$total%.3f s")
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId}: " + p.durationMs.toString)
      }
    }
    spark.stop()
  }
}
