package graft

import java.nio.file.Files

import graft.sources.{GraftBranches, GraftVersions}
import org.apache.spark.sql.functions._

/** Branch refs over the versioned object store: fork-point pinning,
  * two-way isolation, atomic merge, ref lifecycle. */
class GraftBranchesSpec extends SparkSpec {

  private def freshTable(tag: String): String = {
    val root = Files.createTempDirectory(s"graft-branch-$tag").toString
    s"$root/t"
  }

  private def write(n0: Long, n1: Long, path: String, mode: String): Unit = {
    val s = spark
    import s.implicits._
    (n0 until n1).map(i => (i, s"row$i")).toDF("id", "v")
      .repartition(1)
      .write.format("graft-objects").mode(mode).save(path)
  }

  test("branch pins the fork point; both directions stay isolated until merge") {
    val t = freshTable("iso")
    write(0, 100, t, "overwrite")
    val base = GraftBranches.create(t, "exp")
    assert(base >= 1)
    assert(GraftBranches.list(t) == Seq("exp" -> base))

    GraftBranches.append(
      spark.range(100, 130).selectExpr("id", "concat('row', id) AS v"),
      t, "exp")
    write(500, 510, t, "append") // main moves past the fork point

    val branchIds = GraftBranches.read(spark, t, "exp")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(branchIds == (0L until 130L).toSet,
      "branch = frozen base + overlay, blind to main's later commit")
    val mainIds = spark.read.format("graft-objects").load(t)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(mainIds == ((0L until 100L) ++ (500L until 510L)).toSet,
      "main must not see branch overlay before merge")

    val v = GraftBranches.merge(t, "exp")
    assert(v == GraftVersions.currentVersion(t))
    val merged = spark.read.format("graft-objects").load(t)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(merged == ((0L until 130L) ++ (500L until 510L)).toSet)
    assert(!GraftBranches.exists(t, "exp"), "merge consumes the ref")
    // merge is one commit: pre-merge state is still time-travelable
    val preMerge = spark.read.format("graft-objects").load(s"$t@v${v - 1}")
      .count()
    assert(preMerge == 110, "snapshot just before the merge commit")
  }

  test("lifecycle guards: no fork of an empty table, no double create, empty merge") {
    val t = freshTable("guard")
    intercept[IllegalArgumentException] {
      GraftBranches.create(t, "exp") // nothing committed yet
    }
    write(0, 10, t, "overwrite")
    GraftBranches.create(t, "exp")
    intercept[IllegalArgumentException] {
      GraftBranches.create(t, "exp")
    }
    intercept[IllegalArgumentException] {
      GraftBranches.create(t, "../escape")
    }
    // merging an empty overlay commits nothing and drops the ref
    val before = GraftVersions.currentVersion(t)
    assert(GraftBranches.merge(t, "exp") == before)
    assert(!GraftBranches.exists(t, "exp"))
    // a dropped name is reusable
    GraftBranches.create(t, "exp")
    GraftBranches.drop(t, "exp")
    assert(GraftBranches.list(t).isEmpty)
  }

  test("concurrent merges serialize under the table lock: no lost objects") {
    val t = freshTable("conc")
    write(0, 20, t, "overwrite")
    GraftBranches.create(t, "b1")
    GraftBranches.create(t, "b2")
    GraftBranches.append(
      spark.range(100, 120).selectExpr("id", "concat('row', id) AS v"), t, "b1")
    GraftBranches.append(
      spark.range(200, 220).selectExpr("id", "concat('row', id) AS v"), t, "b2")
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(2)
    val fs = Seq("b1", "b2").map(n =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        override def call(): Int = GraftBranches.merge(t, n)
      }))
    val versions = fs.map(_.get())
    pool.shutdown()
    assert(versions.toSet.size == 2, "each merge mints its own version")
    val ids = spark.read.format("graft-objects").load(t)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids == ((0L until 20L) ++ (100L until 120L) ++ (200L until 220L)).toSet,
      "both merges must land in full — no lost update, no clobbered seq")
  }

  test("vacuum past the fork point: branch read refuses loudly, never partial") {
    val t = freshTable("vac")
    write(0, 10, t, "overwrite")
    GraftBranches.create(t, "old")
    write(0, 10, t, "overwrite") // v2 archives v1's content
    GraftVersions.vacuum(t, GraftVersions.currentVersion(t))
    val e = intercept[Exception] {
      GraftBranches.read(spark, t, "old").count()
    }
    assert(Option(e.getMessage).exists(m =>
      m.toLowerCase.contains("vacuum") || m.toLowerCase.contains("version")),
      s"expected a loud vacuum/version refusal, got: ${e.getMessage}")
  }

  test("branch overlay is a real table: footer stats prune reads on the branch view") {
    val t = freshTable("stats")
    write(0, 50, t, "overwrite")
    GraftBranches.create(t, "b")
    GraftBranches.append(
      spark.range(1000, 1050).selectExpr("id", "concat('row', id) AS v"),
      t, "b")
    // a selective filter over the branch view answers from both layers
    val hits = GraftBranches.read(spark, t, "b")
      .filter(col("id") >= 1040 || col("id") < 5)
      .count()
    assert(hits == 15)
  }
}
