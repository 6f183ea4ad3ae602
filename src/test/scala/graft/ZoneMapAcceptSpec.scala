package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.sources.{GraftObjectTable, ObjectFormat, ObjectStoreMaintenance}

/** Zone-map FULL-ACCEPT (`ObjectFormat.provenForAll`): when footer
  * stats prove a pushed filter TRUE for every row of an object, the
  * readers drop it from row-level evaluation — which keeps the v6
  * bulk fill engaged on broad range scans (a 99%-selective
  * `shipdate <= cutoff` otherwise forces EVERY object through the
  * per-row path for the one boundary object's sake). The traps pinned
  * here: 3VL (a null row fails the filter, so a column with nulls is
  * never provable), and negated DELETE-survivor scans (proven-TRUE
  * means no survivors, not skip-the-check). */
class ZoneMapAcceptSpec extends SparkSpec {

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-zm-$tag").toString + "/t"

  private def ranged(dir: String, withNulls: Boolean = false): Unit = {
    val v = if (withNulls)
      "CASE WHEN id % 500 = 0 THEN NULL ELSE id * 2 END AS v"
    else "id * 2 AS v"
    spark.range(0, 4000).selectExpr("id", v, "concat('g', id % 7) AS g")
      .repartitionByRange(4, col("id"))
      .write.format("graft-objects").mode("overwrite").save(dir)
  }

  test("provenForAll: proofs and refusals against a real footer") {
    val dir = fresh("unit")
    ranged(dir, withNulls = true)
    val objs = GraftObjectTable.listObjects(dir)
    val f = ObjectFormat.readFooter(
      objs.minBy(p => ObjectFormat.readFooter(p)
        .stats("id").min.asInstanceOf[Long]))
    val idMax = f.stats("id").max.asInstanceOf[Long]
    val idMin = f.stats("id").min.asInstanceOf[Long]
    assert(ObjectFormat.provenForAll(LessThanOrEqual("id", idMax), f))
    assert(ObjectFormat.provenForAll(GreaterThanOrEqual("id", idMin), f))
    assert(!ObjectFormat.provenForAll(LessThan("id", idMax), f),
      "max itself violates strict <")
    assert(ObjectFormat.provenForAll(IsNotNull("id"), f))
    // v has nulls in this object → NO comparison is provable (3VL)
    assert(f.stats("v").nullCount > 0, "fixture must thread nulls into v")
    assert(!ObjectFormat.provenForAll(
      LessThanOrEqual("v", Long.MaxValue), f))
    assert(!ObjectFormat.provenForAll(IsNotNull("v"), f))
    // connectives
    assert(ObjectFormat.provenForAll(
      And(LessThanOrEqual("id", idMax), IsNotNull("id")), f))
    assert(ObjectFormat.provenForAll(
      Or(LessThan("v", 0L), GreaterThanOrEqual("id", idMin)), f))
    assert(ObjectFormat.provenForAll(
      Not(GreaterThan("id", idMax)), f))
    assert(!ObjectFormat.provenForAll(
      Not(EqualTo("id", idMin)), f), "idMin is in range — not refutable")
    assert(ObjectFormat.provenForAll(
      Not(EqualTo("id", idMax + 1)), f), "out of range and null-free")
    // absent column (schema evolution) → conservative false
    assert(!ObjectFormat.provenForAll(IsNotNull("nope"), f))
  }

  test("broad range scan stays exact across full-accept and boundary objects") {
    val dir = fresh("broad")
    ranged(dir)
    val src = spark.range(0, 4000).selectExpr("id", "id * 2 AS v",
      "concat('g', id % 7) AS g")
    // cutoff mid-way through the last object: 3 objects full-accept,
    // 1 residual-filters
    val got = spark.read.format("graft-objects").load(dir)
      .filter(col("id") <= 3456L)
    val exp = src.filter(col("id") <= 3456L)
    assert(got.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(got.count() == 3457)
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
    // aggregate over a bulk-filled column under the accepted filter
    assert(got.agg(sum("v")).collect().head.getLong(0) ==
      exp.agg(sum("v")).collect().head.getLong(0))
  }

  test("3VL: nulls in the filter column are dropped even when the range covers all") {
    val dir = fresh("nulls")
    ranged(dir, withNulls = true)
    // the value range would prove v <= MaxValue everywhere — but v has
    // nulls, and a null row must NOT be emitted
    val got = spark.read.format("graft-objects").load(dir)
      .filter(col("v") <= Long.MaxValue)
    assert(got.count() == 4000 - 8, "8 null rows (id % 500 = 0) dropped")
    // and explicitly: IsNotNull over the nullable column
    assert(spark.read.format("graft-objects").load(dir)
      .filter(col("v").isNotNull).count() == 3992)
  }

  test("negated DELETE-survivor scan never skips a proven filter") {
    val dir = fresh("neg")
    ranged(dir)
    // predicate TRUE for every row of object 1 (ids 1000-1999 live in
    // the second range partition): copy-on-write delete must remove
    // ALL its rows, not "skip the check and keep them"
    ObjectStoreMaintenance.deleteMoR(dir,
      Array(And(GreaterThanOrEqual("id", 0L), LessThan("id", 2000L))))
    val got = spark.read.format("graft-objects").load(dir)
    assert(got.count() == 2000)
    assert(got.agg(min("id")).collect().head.getLong(0) == 2000L)
  }
}
