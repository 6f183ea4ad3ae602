package graft

import java.io.{DataInputStream, DataOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{GraftObjectTable, ObjectFormat}

/** Codec v6: null-free columnar segments drop their presence bytes
  * and store fixed-width values little-endian, so the vectorized
  * reader bulk-memcpys them into `OnHeapColumnVector`s (r8 verdict
  * #6 — the per-value decode loop was the sf10 scan-row constant).
  * These tests pin the on-disk layout, the null/filter/DV slow paths,
  * and genuine-v5 back-compat (a hand-built v5 body must still read
  * through both routes). */
class CodecV6Spec extends SparkSpec {

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-v6-$tag").toString + "/t"

  /** All-non-null fixture: every fixed-width column is bulk-eligible. */
  private def dense = spark.range(0, 2000).selectExpr(
    "id",
    "CAST(id % 97 AS INT) AS i",
    "CAST(id AS DOUBLE) / 7 AS d",
    "CAST(id % 13 AS FLOAT) AS f",
    "timestamp_micros(id * 1000000) AS ts",
    "concat('s', id % 31) AS s")

  /** Same shape with nulls threaded through — the presence-byte path. */
  private def sparse = spark.range(0, 2000).selectExpr(
    "id",
    "CASE WHEN id % 7 = 0 THEN NULL ELSE CAST(id % 97 AS INT) END AS i",
    "CASE WHEN id % 11 = 0 THEN NULL ELSE CAST(id AS DOUBLE) / 7 END AS d",
    "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('s', id % 31) END AS s")

  test("null-free v6 segments omit presence bytes and size exactly") {
    val dir = fresh("layout")
    dense.coalesce(1).write.format("graft-objects")
      .mode("overwrite").save(dir)
    val obj = GraftObjectTable.listObjects(dir).head
    val in = new DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(obj))))
    try {
      assert(in.readInt() == ObjectFormat.Magic)
      assert(in.readInt() == ObjectFormat.Version)
      in.readUTF(); in.readInt() // ddl, bodyLen
      assert(in.readByte().toInt == ObjectFormat.LayoutColumnar)
      val rows = in.readInt()
      assert(rows == 2000)
      val nCols = in.readInt()
      val lens = Array.fill(nCols)(in.readInt())
      // id BIGINT: 4-byte null-count header + 8 bytes/row, NO presence
      assert(lens(0) == 4 + 8 * rows, s"id segment ${lens(0)}")
      assert(lens(1) == 4 + 4 * rows, s"i segment ${lens(1)}")
      assert(lens(2) == 4 + 8 * rows, s"d segment ${lens(2)}")
      assert(lens(3) == 4 + 4 * rows, s"f segment ${lens(3)}")
      assert(lens(4) == 4 + 8 * rows, s"ts segment ${lens(4)}")
      // null-count headers: 0 for every dense column
      assert(in.readInt() == 0) // id's header is the first segment byte
    } finally in.close()
  }

  test("bulk fast path is value-exact against the source frame") {
    val dir = fresh("bulk")
    dense.repartition(3).write.format("graft-objects")
      .mode("overwrite").save(dir)
    val got = spark.read.format("graft-objects").load(dir)
    assert(got.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "dense primitive scan must take the vectorized route")
    assert(got.exceptAll(dense).count() == 0 &&
      dense.exceptAll(got).count() == 0)
    // aggregate over the bulk-filled columns: catches endianness slips
    // a set-compare could mask (e.g. reversed doubles that collide).
    // Double/float aggregates use order-independent min/max — sum over
    // doubles varies in the last ulp with partition boundaries.
    val agg = got.agg(sum("id"), min("d"), max("d"), max("f"),
      max("ts"), min("i")).collect().head
    val exp = dense.agg(sum("id"), min("d"), max("d"), max("f"),
      max("ts"), min("i")).collect().head
    assert(agg == exp)
  }

  test("nulls, pushed filters, and DV drops all take the exact slow path") {
    val dir = fresh("slow")
    sparse.repartition(2).write.format("graft-objects")
      .mode("overwrite").save(dir)
    val got = spark.read.format("graft-objects").load(dir)
      .filter(col("id") % 3L === 0L)
    val exp = sparse.filter(col("id") % 3L === 0L)
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
    // MoR delete punches a DV → kept < rowCount inside v6 segments
    graft.sources.ObjectStoreMaintenance.deleteMoR(dir,
      Array(org.apache.spark.sql.sources.LessThan("id", 100L)))
    val after = spark.read.format("graft-objects").load(dir)
    val expAfter = sparse.filter(col("id") >= 100L)
    assert(after.exceptAll(expAfter).count() == 0 &&
      expAfter.exceptAll(after).count() == 0)
    // pushed comparison on a bulk-eligible column after the DV
    assert(after.filter(col("d") > 100.0).count() ==
      expAfter.filter(col("d") > 100.0).count())
  }

  test("a genuine v5 columnar body (presence-always, big-endian) still reads") {
    val dir = fresh("v5")
    sparse.select("id", "d", "s").coalesce(1)
      .write.format("graft-objects").mode("overwrite").save(dir)
    val obj = GraftObjectTable.listObjects(dir).head
    val before = Files.size(Paths.get(obj))
    // Transform the v6 object into the exact v5 on-disk shape:
    // re-add presence bytes, flip fixed-width values to big-endian,
    // version byte 5; footer bytes (layout-independent) copied as-is.
    rewriteToV5(obj)
    assert(Files.size(Paths.get(obj)) > before,
      "v5 re-added presence bytes for the null-free columns")
    // vectorized route (all-primitive projection) over the v5 object
    val got = spark.read.format("graft-objects").load(dir)
    val exp = sparse.select("id", "d", "s")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
    // row route too (nested-free but force it through a pushed LIMIT)
    val lim = spark.read.format("graft-objects").load(dir).limit(2000)
    assert(lim.exceptAll(exp).count() == 0)
  }

  test("mixed v5/v6 objects in one table scan exactly") {
    val dir = fresh("mixed")
    sparse.select("id", "d", "s").coalesce(1)
      .write.format("graft-objects").mode("overwrite").save(dir)
    // second object appended at v6; first rewritten to v5 by the same
    // transform as above, exercised through the public read only
    val first = GraftObjectTable.listObjects(dir).head
    rewriteToV5(first)
    sparse.select("id", "d", "s").selectExpr(
      "id + 10000 AS id", "d", "s").coalesce(1)
      .write.format("graft-objects").mode("append").save(dir)
    val got = spark.read.format("graft-objects").load(dir)
    val exp = sparse.select("id", "d", "s").unionAll(
      sparse.selectExpr("id + 10000 AS id", "d", "s"))
    assert(got.count() == 4000)
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
  }

  /** The v6→v5 transform from the back-compat test, reusable. */
  private def rewriteToV5(obj: String): Unit = {
    val bytes = Files.readAllBytes(Paths.get(obj))
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == ObjectFormat.Magic)
    require(in.readInt() == ObjectFormat.Version)
    val ddl = in.readUTF()
    in.readInt()
    require(in.readByte().toInt == ObjectFormat.LayoutColumnar)
    val rows = in.readInt()
    val nCols = in.readInt()
    val lens = Array.fill(nCols)(in.readInt())
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val segs = Array.tabulate(nCols) { c =>
      val nullCount = in.readInt()
      val pres =
        if (nullCount > 0) { val p = new Array[Byte](rows); in.readFully(p); p }
        else Array.fill[Byte](rows)(1)
      val valBytes = new Array[Byte](
        lens(c) - 4 - (if (nullCount > 0) rows else 0))
      in.readFully(valBytes)
      val w = schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.TimestampType => 8
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DateType => 4
        case _ => -1
      }
      if (w > 0) {
        var p = 0
        while (p < valBytes.length) {
          var a = 0; var b = w - 1
          while (a < b) {
            val t = valBytes(p + a)
            valBytes(p + a) = valBytes(p + b); valBytes(p + b) = t
            a += 1; b -= 1
          }
          p += w
        }
      }
      (pres, valBytes)
    }
    val tail = new Array[Byte](in.available())
    in.readFully(tail)
    val bodyOut = new java.io.ByteArrayOutputStream()
    val bo = new DataOutputStream(bodyOut)
    bo.writeByte(ObjectFormat.LayoutColumnar)
    bo.writeInt(rows); bo.writeInt(nCols)
    segs.foreach { case (p, v) => bo.writeInt(p.length + v.length) }
    segs.foreach { case (p, v) => bo.write(p); bo.write(v) }
    bo.flush()
    val out = new DataOutputStream(new FileOutputStream(obj))
    out.writeInt(ObjectFormat.Magic); out.writeInt(5)
    out.writeUTF(ddl)
    out.writeInt(bodyOut.size())
    bodyOut.writeTo(out)
    out.write(tail)
    out.close()
  }
}
