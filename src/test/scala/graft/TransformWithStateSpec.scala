package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** transformWithState (Spark 4 arbitrary-state v2, SURVEY §2.9) —
  * per-key ValueState with the new StatefulProcessor API. Requires the
  * RocksDB state store provider.
  */
// a CLASS, not an object: every task must deserialize its own instance
// (a singleton would share one state handle across partitions in-JVM)
class RunningMax extends StatefulProcessor[Long, (Long, Double), (Long, Double)] {
  @transient private var maxSeen: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    maxSeen = getHandle.getValueState[Double]("maxSeen",
      Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Double)] = {
    val prev = if (maxSeen.exists()) maxSeen.get() else Double.NegativeInfinity
    val m = rows.foldLeft(prev)((acc, r) => math.max(acc, r._2))
    maxSeen.update(m)
    Iterator((key, m))
  }
}

class TransformWithStateSpec extends SparkSpec {

  test("transformWithState keeps per-key ValueState across micro-batches") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double)]
      val out = mem.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningMax, TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user", "running_max")
        .writeStream.format("memory").queryName("tws_test")
        .outputMode("update")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-tws").toString)
        .start()
      mem.addData((1L, 5.0), (1L, 3.0), (2L, 7.0))
      q.processAllAvailable()
      mem.addData((1L, 9.0), (2L, 1.0)) // user 2's max must survive
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_test").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      // batch 1 updates: (1,5),(2,7); batch 2 updates: (1,9),(2,7 again)
      assert(rows.contains((1L, 5.0)) && rows.contains((1L, 9.0)))
      assert(rows.count(_ == (2L, 7.0)) == 2, rows.mkString(","))
    } finally {
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
