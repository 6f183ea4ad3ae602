package graft

import graft.functions.{GraftFunctions, GraftLayout, ZOrderLong}
import graft.sources.{GraftObjectTable, ObjectFormat}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

/** Z-ordered object layout (SURVEY §2.11): bit-interleaved composite
  * key → range-sharded objects ≈ hyper-rectangles of the key space →
  * per-column footer min/max prune on EVERY clustered dimension, not
  * just the leading one. The expression itself is codegen'd and must
  * agree bit-for-bit with the interpreted reference model.
  */
class ZOrderSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def grid =
    spark.range(0, 10000).select(
      (col("id") % 100).as("x"),
      expr("id DIV 100").as("y"),
      col("id").as("v"))

  test("zorder_long matches the interpreted model and preserves the curve") {
    GraftFunctions.register(spark)
    val rows = grid.limit(500)
      .select(col("x"), col("y"),
        call_function("zorder_long", col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      val expect = ZOrderLong.interleave(Array(
        r.getLong(0) ^ Long.MinValue, r.getLong(1) ^ Long.MinValue))
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](2), expect),
        s"codegen z mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // the curve interleaves from the MSB: binary sort order groups
    // spatial quadrants — (1,1) sorts before (0,99) for 100x100 keys
    def z(x: Long, y: Long) =
      ZOrderLong.interleave(Array(x ^ Long.MinValue, y ^ Long.MinValue))
    assert(java.util.Arrays.compareUnsigned(z(1, 1), z(0, 99)) < 0)
    assert(java.util.Arrays.compareUnsigned(z(2, 3), z(50, 50)) < 0)
  }

  test("z-ordered layout prunes on BOTH dimensions; linear on one") {
    val dir = tmp("graft-zorder")
    val zTgt = s"$dir/zordered"; val linTgt = s"$dir/linear"

    GraftLayout.zorderWrite(grid, zTgt, Seq("x", "y"), 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.format("graft-objects").mode("overwrite").save(linTgt)

    def survivors(tgt: String, colName: String, v: Long): Int =
      GraftObjectTable.listObjects(tgt).map(ObjectFormat.readFooter)
        .count(ObjectFormat.mightMatch(EqualTo(colName, v), _))

    // 16 objects over a 100x100 grid ≈ 4x4 quadrants: a point filter
    // on either dimension intersects ~one quadrant row/column (~4) —
    // sampled range boundaries straddle quadrant edges, so allow up
    // to half; the linear layout below reads ALL 16 for the same
    // second-dimension filter
    assert(survivors(zTgt, "x", 5L) <= 8,
      s"x=5 should hit ~4/16 z-ordered objects, got ${survivors(zTgt, "x", 5L)}")
    assert(survivors(zTgt, "y", 5L) <= 8,
      s"y=5 should hit ~4/16 z-ordered objects, got ${survivors(zTgt, "y", 5L)}")
    // the linear layout is tight on x only — y spans every object
    assert(survivors(linTgt, "x", 5L) <= 2)
    assert(survivors(linTgt, "y", 5L) == 16,
      "a linear sort cannot prune the second dimension")

    // correctness through the pruned scan
    val back = spark.read.format("graft-objects").load(zTgt)
    assert(back.filter(col("x") === 5L && col("y") === 5L)
      .select("v").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq == Seq(505L))
    assert(back.filter(col("y") === 7L).count() == 100)
  }

  test("null keys sort to the curve origin and round-trip") {
    val dir = tmp("graft-zordernull"); val tgt = s"$dir/t"
    val df = spark.range(0, 100).select(
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).as("x"),
      (col("id") % 7).as("y"),
      col("id").as("v"))
    GraftLayout.zorderWrite(df, tgt, Seq("x", "y"), 4)
    val back = spark.read.format("graft-objects").load(tgt)
    assert(back.count() == 100)
    assert(back.filter(col("x").isNull).count() == 10)
  }

  test("string dimension: prefix code preserves order, both dims prune") {
    GraftFunctions.register(spark)
    // prefix code is order-preserving on the string's binary order
    val coded = spark.range(0, 200)
      .select(concat(lit("k"), lpad(col("id") % 100, 2, "0")).as("s"))
      .distinct()
      .select(col("s"), call_function("zorder_prefix", col("s")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    coded.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a < b, "prefix code must be strictly " +
        "increasing over distinct short strings")
      case _ =>
    }
    // (long, string) z-layout: filters on the STRING dimension prune
    val dir = tmp("graft-zorderstr"); val zTgt = s"$dir/z"
    val g = spark.range(0, 10000).select(
      (col("id") % 100).as("x"),
      concat(lit("k"), lpad(expr("id DIV 100"), 2, "0")).as("s"),
      col("id").as("v"))
    GraftLayout.zorderWrite(g, zTgt, Seq("x", "s"), 16)
    def survivors(colName: String, f: org.apache.spark.sql.sources.Filter): Int =
      GraftObjectTable.listObjects(zTgt).map(ObjectFormat.readFooter)
        .count(ObjectFormat.mightMatch(f, _))
    assert(survivors("x", EqualTo("x", 5L)) <= 8,
      "x=5 should prune most z-ordered objects")
    assert(survivors("s", EqualTo("s", "k05")) <= 8,
      "s='k05' should prune most z-ordered objects (string footer bounds)")
    // correctness through the pruned scan
    val back = spark.read.format("graft-objects").load(zTgt)
    assert(back.filter(col("s") === "k07").count() == 100)
    assert(back.filter(col("x") === 5L && col("s") === "k05")
      .select("v").collect().map(_.getLong(0)).toSeq == Seq(505L))
  }
}
