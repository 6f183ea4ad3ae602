package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}

import graft.sources.{DeleteVectors, GraftObjectTable, ObjectStoreMaintenance}

/** Merge-on-read DELETE through deletion vectors: sidecar mechanics,
  * untouched data objects, exact time travel, fold-on-second-delete,
  * self-invalidation after rewrites, and footer-fast-path fallbacks. */
class DeletionVectorSpec extends SparkSpec {

  private def freshTable(tag: String, n: Long = 200): String = {
    val dir = Files.createTempDirectory(s"graft-dv-$tag").toString + "/t"
    spark.range(0, n).selectExpr("id", "id * 2 AS v",
      "concat('r', id) AS s")
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(dir)
    dir
  }

  private def objState(dir: String): Map[String, (Long, Long)] =
    GraftObjectTable.listObjects(dir).map { p =>
      val f = new File(p)
      f.getName -> (f.length(), f.lastModified())
    }.toMap

  test("MoR delete: rows gone, data objects byte-identical, DV sidecars exist") {
    val dir = freshTable("basic")
    val before = objState(dir)
    val (rm, dvd, rows) = ObjectStoreMaintenance.deleteMoR(dir,
      Array(LessThanOrEqual("id", 49L)))
    assert(rm == 0 && dvd == 4 && rows == 50)
    // live object files untouched (same bytes), DVs present
    assert(objState(dir) == before)
    GraftObjectTable.listObjects(dir).foreach { p =>
      assert(DeleteVectors.hasValid(p), p)
    }
    val got = spark.read.format("graft-objects").load(dir)
    assert(got.count() == 150)
    assert(got.agg(min(col("id"))).collect().head.getLong(0) == 50L)
  }

  test("time travel reads the pre-delete snapshot in full") {
    val dir = freshTable("tt")
    val v0 = graft.sources.GraftVersions.currentVersion(dir)
    ObjectStoreMaintenance.deleteMoR(dir, Array(GreaterThan("id", 99L)))
    assert(spark.read.format("graft-objects").load(dir).count() == 100)
    val old = spark.read.format("graft-objects").load(s"$dir@v$v0")
    assert(old.count() == 200, "snapshot before the delete is full")
  }

  test("second delete folds: one DV generation, intermediate snapshot exact") {
    val dir = freshTable("fold")
    val (_, _, r1) = ObjectStoreMaintenance.deleteMoR(dir,
      Array(LessThanOrEqual("id", 19L)))
    val v1 = graft.sources.GraftVersions.currentVersion(dir)
    val (_, _, r2) = ObjectStoreMaintenance.deleteMoR(dir,
      Array(GreaterThan("id", 179L)))
    assert(r1 == 20 && r2 == 20)
    assert(spark.read.format("graft-objects").load(dir).count() == 160)
    // the fold rewrote live bytes; each object carries at most the new DV
    GraftObjectTable.listObjects(dir).foreach { p =>
      val dv = DeleteVectors.read(p)
      assert(dv.isDefined, "second-generation DV present")
    }
    // snapshot between the two deletes: first delete applied only
    val mid = spark.read.format("graft-objects").load(s"$dir@v$v1")
    assert(mid.count() == 180)
    assert(mid.agg(min(col("id")), max(col("id"))).collect().head
      .toSeq == Seq(20L, 199L))
  }

  test("compaction folds DVs in; stale sidecars self-invalidate") {
    val dir = freshTable("compact")
    ObjectStoreMaintenance.deleteMoR(dir, Array(LessThanOrEqual("id", 99L)))
    ObjectStoreMaintenance.compact(spark, dir, 2)
    assert(spark.read.format("graft-objects").load(dir).count() == 100)
    // whatever DV files remain must be stale for the new objects
    GraftObjectTable.listObjects(dir).foreach { p =>
      assert(!DeleteVectors.hasValid(p), s"stale DV still valid for $p")
    }
  }

  test("overwrite with byte-identical data does not resurrect stale DVs") {
    val dir = freshTable("resurrect")
    ObjectStoreMaintenance.deleteMoR(dir, Array(LessThanOrEqual("id", 99L)))
    assert(spark.read.format("graft-objects").load(dir).count() == 100)
    // overwrite with the SAME deterministic data: objects re-created
    // byte-identical under the same names — the (length, mtime)
    // fingerprint must still kill the old DVs
    spark.range(0, 200).selectExpr("id", "id * 2 AS v",
      "concat('r', id) AS s")
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(dir)
    assert(spark.read.format("graft-objects").load(dir).count() == 200,
      "stale DV resurrected against the rewritten table")
    GraftObjectTable.listObjects(dir).foreach { p =>
      assert(!DeleteVectors.hasValid(p), s"stale DV still valid: $p")
    }
  }

  test("footer fast paths fall back: pushed COUNT and LIMIT stay exact") {
    val dir = freshTable("fastpath")
    ObjectStoreMaintenance.deleteMoR(dir, Array(LessThanOrEqual("id", 149L)))
    // footer-answered COUNT(*) would say 200; the DV guard must refuse
    val n = spark.read.format("graft-objects").load(dir)
      .agg(count(lit(1))).collect().head.getLong(0)
    assert(n == 50)
    // LIMIT selection over footer counts would under-select objects
    assert(spark.read.format("graft-objects").load(dir)
      .limit(50).count() == 50)
    assert(spark.read.format("graft-objects").load(dir)
      .orderBy(col("id")).limit(10).collect().map(_.getLong(0)).toSeq ==
      (150L until 160L).toSeq)
  }

  test("CoW DELETE on a DV'd object treats DV'd rows as already gone") {
    val dir = freshTable("cow")
    ObjectStoreMaintenance.deleteMoR(dir, Array(LessThanOrEqual("id", 49L)))
    // CoW path (negated survivor scan) must not resurrect DV'd rows
    ObjectStoreMaintenance.deleteMoR(dir, Array(GreaterThan("id", 189L)))
    val ids = spark.read.format("graft-objects").load(dir)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.head == 50L && ids.last == 189L && ids.length == 140)
  }

  test("MoR update: DV-delete + one appended object, bytes untouched, snapshots exact") {
    val dir = freshTable("upd")
    val v0 = graft.sources.GraftVersions.currentVersion(dir)
    val before = objState(dir)
    val (rows, newObj) = ObjectStoreMaintenance.updateMoR(dir,
      Array(LessThanOrEqual("id", 49L)), Map("s" -> "REDACTED"))
    assert(rows == 50L && newObj != null)
    // pre-existing objects byte-identical; exactly one object added
    val after = objState(dir)
    assert(before.forall { case (k, v) => after.get(k).contains(v) })
    assert(after.size == before.size + 1 && after.contains(newObj))
    val got = spark.read.format("graft-objects").load(dir)
    assert(got.count() == 200)
    assert(got.filter(col("s") === "REDACTED").count() == 50)
    assert(got.filter(col("id") <= 49L && col("s") =!= "REDACTED")
      .count() == 0)
    // untouched rows keep their values
    assert(got.filter(col("id") === 150L).select("s").collect()
      .head.getString(0) == "r150")
    // snapshot before the update: original values, no new object rows
    val old = spark.read.format("graft-objects").load(s"$dir@v$v0")
    assert(old.count() == 200)
    assert(old.filter(col("s") === "REDACTED").count() == 0)
  }

  test("CALL update_mor drives MoR update from SQL") {
    val root = Files.createTempDirectory("graft-dv-upd-proc").toString
    spark.conf.set("spark.sql.catalog.gdvu", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdvu.root", root)
    val path = s"$root/main/t"
    spark.range(0, 80).selectExpr("id", "id * 5 AS v")
      .repartition(2)
      .write.format("graft-objects").mode("overwrite").save(path)
    val r = spark.sql(
      "CALL gdvu.system.update_mor('t', 'id >= 70', 'v', '-1')")
      .collect().head
    assert(r.getLong(0) == 10L, "rows_updated")
    val got = spark.read.format("graft-objects").load(path)
    assert(got.filter(col("v") === -1L).count() == 10)
    assert(got.count() == 80)
  }

  test("concurrent MoR deletes serialize under the table lock: no lost update") {
    val dir = freshTable("conc", 400)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // two writers over OVERLAPPING ranges racing on the same objects:
    // the lock serializes them; the second must see the first's DVs
    // (fold) and the union of deletions must be exact
    val f1 = Future(ObjectStoreMaintenance.deleteMoR(dir,
      Array(LessThanOrEqual("id", 149L))))
    val f2 = Future(ObjectStoreMaintenance.deleteMoR(dir,
      Array(GreaterThan("id", 249L))))
    val (r1, r2) = (Await.result(f1, 120.seconds),
      Await.result(f2, 120.seconds))
    assert(r1._3 == 150L && r2._3 == 150L)
    val got = spark.read.format("graft-objects").load(dir)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (150L to 249L).toSeq,
      "concurrent MoR deletes lost or resurrected rows")
  }

  test("CALL delete_mor drives MoR from SQL") {
    val root = Files.createTempDirectory("graft-dv-proc").toString
    spark.conf.set("spark.sql.catalog.gdv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdv.root", root)
    val path = s"$root/main/t"
    spark.range(0, 100).selectExpr("id", "id * 3 AS v")
      .repartition(2)
      .write.format("graft-objects").mode("overwrite").save(path)
    val r = spark.sql("CALL gdv.system.delete_mor('t', 'id < 30')")
      .collect().head
    assert(r.getLong(2) == 30L, "rows_deleted")
    assert(spark.read.format("graft-objects").load(path).count() == 70)
  }
}
