package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.LessThanOrEqual

import graft.sources.{DeleteVectors, GraftObjectTable, GraftVersions, ObjectStoreMaintenance}

/** Computed-expression merge-on-read UPDATE: `SET x = f(row)` without
  * rewriting any data object — DV + one appended object, one commit. */
class UpdateMoRExprSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-umx-$tag").toString + "/t"
    spark.range(0, 200).selectExpr("id", "id * 10 AS v",
      "concat('r', id % 3) AS s")
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(dir)
    dir
  }

  private def objState(dir: String): Map[String, (Long, Long)] =
    GraftObjectTable.listObjects(dir).map { p =>
      val f = new File(p)
      f.getName -> (f.length(), f.lastModified())
    }.toMap

  test("computed SET over pre-images: exact, objects untouched, one commit") {
    val dir = fresh("basic")
    val before = objState(dir)
    val v0 = GraftVersions.currentVersion(dir)
    val (n, obj) = ObjectStoreMaintenance.updateMoRExpr(spark, dir,
      Array(LessThanOrEqual("id", 49L)),
      Map("v" -> "v * 2 + id", "s" -> "concat(s, '-upd')"))
    assert(n == 50 && obj != null)
    // pre-existing data objects byte-identical; exactly one new object
    val after = objState(dir)
    before.foreach { case (name, st) => assert(after(name) == st, name) }
    assert(after.size == before.size + 1)
    // every matched row carries the computed values; others untouched
    val got = spark.read.format("graft-objects").load(dir)
    assert(got.count() == 200)
    got.filter(col("id") <= 49).collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id * 10 * 2 + id)
      assert(r.getString(2) == s"r${id % 3}-upd")
    }
    got.filter(col("id") > 49).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(0) * 10)
    }
    // one commit: version advanced once; snapshot before is pristine
    assert(GraftVersions.currentVersion(dir) == v0 + 1)
    val old = spark.read.format("graft-objects").load(s"$dir@v$v0")
    assert(old.filter(col("id") <= 49)
      .filter(col("v") =!= col("id") * 10).count() == 0)
    // DVs present on touched objects
    assert(GraftObjectTable.listObjects(dir)
      .exists(DeleteVectors.hasValid))
  }

  test("nondeterministic assignments are refused") {
    val dir = fresh("nondet")
    val e = intercept[IllegalArgumentException] {
      ObjectStoreMaintenance.updateMoRExpr(spark, dir,
        Array(LessThanOrEqual("id", 9L)), Map("v" -> "cast(rand() * 10 as bigint)"))
    }
    assert(e.getMessage.contains("deterministic"))
  }

  test("analyzer coercion: assignment casts to the column's type") {
    val dir = fresh("coerce")
    // int literal into a BIGINT column — the analyzer-resolved Cast
    val (n, _) = ObjectStoreMaintenance.updateMoRExpr(spark, dir,
      Array(LessThanOrEqual("id", 4L)), Map("v" -> "7"))
    assert(n == 5)
    val got = spark.read.format("graft-objects").load(dir)
      .filter(col("id") <= 4).select(col("v"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(7L))
  }
}
