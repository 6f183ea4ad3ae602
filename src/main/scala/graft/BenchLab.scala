package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic harness (not part of the driver contract): splits each
  * headline query's wall time into plan (analysis+optimization+physical
  * planning) vs execute (job run through the noop sink), over several
  * repetitions, to show where the sub-second floor lives at bench
  * scale. Usage mirrors Bench; args = query subset. */
object BenchLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dataDir =
      if (sys.env.get("SPARK_GRAFT_OBJECTIFY").contains("false")) sfDir
      else Bench.objectify(spark, sfDir)

    // SPARK_GRAFT_OBJSTORE=true: route Tables.* through graft-objects
    // (the Bench queries_obj path) for plan/perf diagnosis.
    if (sys.env.get("SPARK_GRAFT_OBJSTORE").contains("true")) {
      val root = java.nio.file.Files.createTempDirectory("graft-lab-objs").toString
      graft.sources.ObjectStoreIngest.ingest(spark, sfDir, root)
      Tables.objectStoreRoot = Some(root)
    }

    val names =
      (if (args.nonEmpty) Bench.headline.filter(args.contains) else Bench.headline)
        .filter(SparkEntry.queries.contains)

    if (sys.env.get("SPARK_GRAFT_DECIMAL_LAB").contains("true")) {
      import org.apache.spark.sql.functions._
      val li = Tables.lineitem(spark, dataDir)
      def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        df.write.mode("overwrite").format("noop").save() // warm
        val runs = (1 to 3).map { _ =>
          val t = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t) / 1e9
        }
        println(f"$tag%-12s median=${runs.sorted.apply(1)}%.3f")
      }
      time("decimal") {
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("s1"),
            sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("s2"))
      }
      time("longcents") {
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg((sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("s1"),
            (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("s2"))
      }
      spark.stop(); return
    }

    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("true")) {
      args.filter(SparkEntry.queries.contains).foreach { n =>
        println(s"========== $n ==========")
        println(SparkEntry.queries(n)(spark, dataDir)
          .queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Exchange") || l.contains("Join") ||
            l.contains("Scan") || l.contains("Aggregate"))
          .map(_.trim.take(160))
          .mkString("\n"))
      }
      spark.stop(); return
    }

    def once(name: String): (Double, Double) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dataDir)
      df.queryExecution.executedPlan // force planning
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }

    names.foreach(once) // warmup
    System.gc()
    names.foreach { n =>
      val runs = (1 to 3).map(_ => once(n))
      val plan = runs.map(_._1).min
      val exec = runs.map(_._2).min
      println(f"$n%-28s plan=$plan%7.3f  exec=$exec%7.3f  (min of 3)")
    }
    spark.stop()
  }
}
