ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "skyhookdbcephspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// r8 verdict #1: the driver parses the bench JSON line out of `sbt
// "runMain graft.Bench"` stdout. With fork=true sbt's default
// LoggedOutput prefixes every forked-process line with "[info] ", so
// the line never parsed ("parsed": null two rounds running).
// StdoutOutput inherits the forked process's stdout/stderr into sbt's
// own streams unprefixed — the JSON line reaches the driver raw.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap: cap at 16g regardless of SPARK_DRIVER_MEM. Nothing here needs
// more at test scale, and big heaps ONLY hurt: >31g drops compressed
// oops (every pointer doubles — hash/shuffle-heavy queries slow 2-3×,
// measured), and G1's young gen scales with the heap, pushing multi-
// hundred-ms pauses into query timings (the round-1 driver bench ran
// at ~90g and lost 15 s to exactly this). The pause target keeps young
// collections short even at 16g.
val heapCap: String = {
  val m = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
  "^(\\d+)[gG]$".r.findFirstMatchIn(m) match {
    case Some(g) if g.group(1).toInt > 16 => "16g"
    case _ => m
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$heapCap",
  // Fixed-size heap: without -Xms, G1 starts at ~2g and grows only
  // under pressure, so a long multi-query run spends seconds in
  // young-gen thrash + resize full GCs before the heap reaches its
  // working size (measured: 53 young pauses / 11 s across one bench
  // run at the default initial heap; stable with -Xms=-Xmx).
  s"-Xms$heapCap",
  "-XX:MaxGCPauseMillis=50",
)
