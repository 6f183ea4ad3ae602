package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

/** Full-registry scale screen (r8 verdict #4 — made a standing,
  * driver-parseable per-round artifact). The r8 round's one manual
  * full-registry pass at sf1 caught five real scale defects that
  * fixture-scale correctness could not (HOF/one-partition cosine
  * sites, an ANSI overflow, a corpus×corpus join); this main makes
  * that pass reproducible and machine-readable.
  *
  * For every registered query (FixtureDiagnostic rows excluded unless
  * SPARK_GRAFT_ALLOW_DIAG=1 — running a documented quadratic baseline
  * at a decade tier measures nothing) it runs the plan through the
  * noop sink at a REFERENCE scale and a TARGET scale and emits one
  * JSON object per query plus a summary:
  *
  *   {"query":..., "ref_sec":..., "tgt_sec":..., "ratio":...,
  *    "status":"ok"|"flagged"|"failed"|"timeout"}
  *
  * A row is FLAGGED super-linear when tgt_sec > RATIO_MAX ×
  * max(ref_sec, FLOOR_SEC): with a 10× data step, linear cost is ≤10×
  * wall; RATIO_MAX = 30 allows 3× occupancy/scheduling slack (the
  * BlockingGateSpec constant), and FLOOR_SEC keeps sub-floor
  * reference rows (where wall is all fixed overhead) from flagging on
  * noise. A per-query watchdog cancels runaway plans so one quadratic
  * row cannot hang the screen.
  *
  * Usage: Screen <refSfDir> <tgtSfDir> <outJson> [query...]
  */
object Screen {
  private val RATIO_MAX =
    sys.env.getOrElse("SPARK_GRAFT_SCREEN_RATIO", "30.0").toDouble
  private val FLOOR_SEC = 0.5
  private val TIMEOUT_SEC =
    sys.env.getOrElse("SPARK_GRAFT_SCREEN_TIMEOUT", "600").toLong

  def main(args: Array[String]): Unit = {
    val Array(refDir, tgtDir, outJson) = args.take(3)
    val subset = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val allowDiag = sys.env.contains("SPARK_GRAFT_ALLOW_DIAG")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => subset.isEmpty || subset(n))
      .filter(n => allowDiag ||
        !SparkEntry.scaleClass(n).startsWith("fixture_diagnostic"))

    val pool = Executors.newSingleThreadExecutor()

    /** One timed pass through the noop sink, watchdogged: on timeout
      * the query's job group is cancelled and the row marked. */
    def timed(name: String, dir: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      val fut = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          spark.sparkContext.setJobGroup(name, name,
            interruptOnCancel = true)
          try SparkEntry.queries(name)(spark, dir)
            .write.mode("overwrite").format("noop").save()
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try {
        fut.get(TIMEOUT_SEC, TimeUnit.SECONDS)
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          fut.cancel(true)
          Left("timeout")
        case e: Throwable =>
          Left(Option(e.getCause).getOrElse(e).getMessage match {
            case null => e.toString.take(160)
            case m => m.replaceAll("[\"\\n\\r\\t]", " ").take(160)
          })
      }
    }

    val rows = names.map { name =>
      val ref = timed(name, refDir)
      val tgt = ref match {
        case Right(_) => timed(name, tgtDir)
        case Left(_) => Left("skipped: ref failed")
      }
      val (status, ratio) = (ref, tgt) match {
        case (Right(r), Right(t)) =>
          val ratio = t / math.max(r, FLOOR_SEC)
          (if (ratio > RATIO_MAX) "flagged" else "ok", ratio)
        case (_, Left("timeout")) => ("timeout", -1.0)
        case _ => ("failed", -1.0)
      }
      val refS = ref.map(r => f"$r%.3f").getOrElse("null")
      val tgtS = tgt.map(t => f"$t%.3f").getOrElse("null")
      val err = (ref.left.toSeq ++ tgt.left.toSeq).headOption
        .map(m => s""","err":"$m"""").getOrElse("")
      System.err.println(s"[screen] $name ref=$refS tgt=$tgtS $status")
      f"""{"query":"$name","ref_sec":$refS,"tgt_sec":$tgtS,"ratio":${if (ratio < 0) "null" else f"$ratio%.2f"},"status":"$status"$err}"""
    }
    pool.shutdownNow()

    val flagged = rows.count(_.contains("\"flagged\""))
    val failed = rows.count(r =>
      r.contains("\"failed\"") || r.contains("\"timeout\""))
    val out =
      s"""{"ref":"$refDir","tgt":"$tgtDir","ratio_max":$RATIO_MAX,
         |"n_queries":${rows.size},"n_flagged":$flagged,"n_failed":$failed,
         |"rows":[
         |${rows.mkString(",\n")}
         |]}""".stripMargin
    Files.writeString(Paths.get(outJson), out + "\n")
    println(s"""{"screen":"$outJson","n_queries":${rows.size},""" +
      s""""n_flagged":$flagged,"n_failed":$failed}""")
    spark.stop()
  }
}
