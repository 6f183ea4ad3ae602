package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftObjectTable, ObjectFormat}

/** SQL UPDATE / MERGE / predicate-fallback DELETE through the graft
  * catalog — Spark's group-based row-level rewrite over the object
  * store. The load-bearing claim is OBJECT-GRANULAR copy-on-write:
  * objects whose footer stats exclude the condition keep their exact
  * bytes; only objects that can hold matches are swapped.
  */
class RowLevelOpsSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-rowlevel").toString
    spark.conf.set("spark.sql.catalog.graftrl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftrl.root", r)
    r
  }

  private def build(table: String): String = {
    val dir = s"$root/main/$table"
    Tables.orders(spark, sf)
      .repartitionByRange(4, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite").save(dir)
    dir
  }

  private def bytesOf(dir: String): Map[String, Seq[Byte]] =
    GraftObjectTable.listObjects(dir)
      .map(p => p -> Files.readAllBytes(new File(p).toPath).toSeq).toMap

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("UPDATE rewrites only objects whose stats admit a match") {
    val dir = build("rl_upd")
    val before = bytesOf(dir)
    // all four objects are o_orderkey-ranged (sf0.001 keys span
    // 0..~1500); this cutoff hits only the first object
    val cutoff = 300L
    val untouchable = before.keys.filter { p =>
      val f = ObjectFormat.readFooter(p)
      !ObjectFormat.mightMatch(
        org.apache.spark.sql.sources.LessThan("o_orderkey", cutoff), f)
    }
    assert(untouchable.nonEmpty, "fixture must have provably-unaffected objects")

    spark.sql(s"""UPDATE graftrl.main.rl_upd SET o_orderstatus = 'U'
                 |WHERE o_orderkey < $cutoff""".stripMargin)

    val after = bytesOf(dir)
    untouchable.foreach { p =>
      assert(after.get(p).contains(before(p)),
        s"provably-unaffected object rewritten: $p")
    }
    val expected = Tables.orders(spark, sf).withColumn("o_orderstatus",
      when(col("o_orderkey") < cutoff, lit("U")).otherwise(col("o_orderstatus")))
    sameRows(spark.table("graftrl.main.rl_upd"), expected)
  }

  test("MERGE: matched rows updated, unmatched source rows inserted") {
    build("rl_mrg")
    Tables.orders(spark, sf).filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey").as("k"))
      .union(spark.range(1, 3).select((-col("id")).cast("long").as("k")))
      .createOrReplaceTempView("rl_merge_src")
    spark.sql("""MERGE INTO graftrl.main.rl_mrg t USING rl_merge_src s
                |ON t.o_orderkey = s.k
                |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M'
                |WHEN NOT MATCHED THEN INSERT
                |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                |   o_orderdate, o_orderpriority)
                |  VALUES (s.k, 0, 'N', 0.0,
                |          TIMESTAMP '1995-01-01 00:00:00', '9-MERGED')""".stripMargin)
    val t = spark.table("graftrl.main.rl_mrg")
    val base = Tables.orders(spark, sf)
    assert(t.count() === base.count() + 2)
    assert(t.filter(col("o_orderstatus") === "M").count() ===
      base.filter(col("o_orderkey") % 100 === 0).count())
    assert(t.filter(col("o_orderstatus") === "N").count() === 2)
    // untouched rows carry their original status
    assert(t.filter(col("o_orderkey") % 100 =!= 0 && col("o_orderkey") > 0)
      .except(base.filter(col("o_orderkey") % 100 =!= 0)).isEmpty)
  }

  test("DELETE outside the storage-evaluable set falls back to copy-on-write") {
    build("rl_del")
    // LIKE '%URGENT' -> StringEndsWith: canDeleteWhere refuses, Spark
    // plans the group-based DELETE instead of erroring
    spark.sql("DELETE FROM graftrl.main.rl_del WHERE o_orderpriority LIKE '%URGENT'")
    val t = spark.table("graftrl.main.rl_del")
    assert(t.filter(col("o_orderpriority").endsWith("URGENT")).count() === 0)
    val expected = Tables.orders(spark, sf)
      .filter(!col("o_orderpriority").endsWith("URGENT"))
    sameRows(t, expected)
  }

  test("UPDATE matching nothing anywhere leaves every object's bytes intact") {
    val dir = build("rl_noop")
    val before = bytesOf(dir)
    spark.sql("UPDATE graftrl.main.rl_noop SET o_orderstatus = 'Z' WHERE o_orderkey < 0")
    assert(bytesOf(dir) === before)
  }

  test("runtime group filter: stats-blind predicate rewrites only objects " +
      "with actual matches") {
    val dir = build("rl_rgf")
    val before = bytesOf(dir)
    // pick one key from ONE object; express the match through a string
    // function footer stats can't evaluate, so stats pruning is blind
    // and only the runtime group filter (the matched rows' _object set)
    // can narrow the rewrite
    val target = ObjectFormat.readFooter(before.keys.min)
      .stats("o_orderkey").max.asInstanceOf[Number].longValue()
    spark.sql(s"""UPDATE graftrl.main.rl_rgf SET o_orderstatus = 'R'
                 |WHERE length(CAST(o_orderkey AS STRING)) =
                 |      length('$target')
                 |  AND CAST(o_orderkey AS STRING) = '$target'""".stripMargin)
    val after = bytesOf(dir)
    val untouched = before.keys.filter(p => after.get(p).contains(before(p)))
    assert(untouched.size === before.size - 1,
      s"exactly one object should be rewritten; untouched=${untouched.size} " +
        s"of ${before.size}")
    val expected = Tables.orders(spark, sf).withColumn("o_orderstatus",
      when(col("o_orderkey") === target, lit("R"))
        .otherwise(col("o_orderstatus")))
    sameRows(spark.table("graftrl.main.rl_rgf"), expected)
  }
}
