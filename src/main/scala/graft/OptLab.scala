package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r9 optimization-round diagnostic (not part of the driver contract):
  * per-stage breakdown of one or more headline queries. A listener
  * records each completed stage's task-time / CPU / shuffle volume so
  * a hot query's cost lands on the operator that owns it (guide §1
  * empirical loop, §7.1 stage view — no UI in this sandbox, so the
  * listener IS the stage page). Usage:
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.OptLab <sfDir> q1 q2 ...
  */
object OptLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.shuffle.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.minBatchesToRetain", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(name: String, tasks: Int, runMs: Long, cpuMs: Long,
                  shR: Long, shW: Long, inB: Long, wallMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(0L)
        stages.add(St(si.name.takeWhile(_ != '\n').take(70), si.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead, wall))
      }
    })

    val dataDir =
      if (sys.env.contains("SPARK_GRAFT_SKIP_LAYOUT")) sfDir
      else Bench.objectify(spark, sfDir)

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, dataDir)
        .write.mode("overwrite").format("noop").save()

    names.foreach { n =>
      run(n) // warmup (mirrors Bench: codegen/broadcast/shared-cache warm)
      Thread.sleep(200)
      stages.clear()
      val t0 = System.nanoTime()
      run(n)
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq
      println(f"%n== $n wall=$wall%.3f s  stages=${ss.size}  " +
        f"sumTaskRun=${ss.map(_.runMs).sum / 1e3}%.2f s  " +
        f"sumTaskCpu=${ss.map(_.cpuMs).sum / 1e3}%.2f s ==")
      println(f"${"stageWall"}%9s ${"taskRun"}%8s ${"taskCpu"}%8s ${"tasks"}%5s " +
        f"${"input"}%9s ${"shRead"}%9s ${"shWrite"}%9s  name")
      ss.sortBy(-_.runMs).take(22).foreach { s =>
        println(f"${s.wallMs / 1e3}%9.3f ${s.runMs / 1e3}%8.2f ${s.cpuMs / 1e3}%8.2f " +
          f"${s.tasks}%5d ${s.inB / 1048576.0}%8.1fM ${s.shR / 1048576.0}%8.1fM " +
          f"${s.shW / 1048576.0}%8.1fM  ${s.name}")
      }
    }
    spark.stop()
  }
}
