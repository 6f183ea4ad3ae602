package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftObjectTable, ObjectFormat}

/** ALTER TABLE schema evolution on the object store. Bodies are
  * positional in their OWN header schema and readers map columns to
  * the table schema by name, so ADD/DROP COLUMN are sidecar-only
  * metadata operations and RENAME is a per-object header patch (no
  * body decode, CRC untouched). Mixed-generation tables — objects
  * written before and after the ALTER — must read coherently.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-evolve").toString
    spark.conf.set("spark.sql.catalog.gevo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gevo.root", r)
    r
  }

  private def build(table: String): String = {
    val dir = s"$root/main/$table"
    Tables.nation(spark, sf)
      .repartitionByRange(2, col("n_nationkey"))
      .write.format("graft-objects").mode("overwrite").save(dir)
    dir
  }

  test("ADD COLUMN: old objects read null, new inserts carry values, " +
      "mixed generations aggregate correctly") {
    val dir = build("ev_add")
    val nOld = spark.table("gevo.main.ev_add").count()
    spark.sql("ALTER TABLE gevo.main.ev_add ADD COLUMN score DOUBLE")
    // old generation serves null for the new column
    val t = spark.table("gevo.main.ev_add")
    assert(t.columns.contains("score"))
    assert(t.filter(col("score").isNull).count() === nOld)
    // new generation writes real values
    spark.sql(
      "INSERT INTO gevo.main.ev_add VALUES (900, 'NATION_X', 0, 2.5)")
    val t2 = spark.table("gevo.main.ev_add")
    assert(t2.count() === nOld + 1)
    assert(t2.filter(col("score") === 2.5).count() === 1)
    // aggregate pushdown stays honest across generations:
    // COUNT(score) counts only the new generation's non-nulls
    val cnt = t2.agg(count(col("score"))).collect()(0).getLong(0)
    assert(cnt === 1L)
    // filters on the evolved column never drop old-generation rows
    assert(t2.filter(col("score").isNull || col("score") > 0).count()
      === nOld + 1)
  }

  test("DROP COLUMN: column disappears; remaining data intact") {
    build("ev_drop")
    val before = spark.table("gevo.main.ev_drop")
      .select(col("n_nationkey"), col("n_name")).collect().toSet
    spark.sql("ALTER TABLE gevo.main.ev_drop DROP COLUMN n_regionkey")
    val t = spark.table("gevo.main.ev_drop")
    assert(!t.columns.contains("n_regionkey"))
    assert(t.select(col("n_nationkey"), col("n_name")).collect().toSet
      === before)
  }

  test("RENAME COLUMN: header patch only — bodies and CRC survive, " +
      "data reads under the new name") {
    val dir = build("ev_ren")
    val before = spark.table("gevo.main.ev_ren")
      .select(col("n_nationkey"), col("n_regionkey")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    spark.sql(
      "ALTER TABLE gevo.main.ev_ren RENAME COLUMN n_regionkey TO region_id")
    val t = spark.table("gevo.main.ev_ren")
    assert(t.columns.contains("region_id") &&
      !t.columns.contains("n_regionkey"))
    assert(t.select(col("n_nationkey"), col("region_id")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet === before)
    // integrity scrub still passes: the patch never touched bodies
    GraftObjectTable.listObjects(dir).foreach { obj =>
      assert(ObjectFormat.verifyObject(obj), s"CRC broken by rename: $obj")
    }
    // footer stats now keyed by the new name (pruning follows the rename)
    GraftObjectTable.listObjects(dir).foreach { obj =>
      val f = ObjectFormat.readFooter(obj)
      assert(f.stats.contains("region_id") && !f.stats.contains("n_regionkey"))
    }
  }

  test("evolved filters prune safely: predicate on an added column " +
      "keeps old-generation objects (conservative stats)") {
    build("ev_prune")
    spark.sql("ALTER TABLE gevo.main.ev_prune ADD COLUMN grade BIGINT")
    spark.sql(
      "INSERT INTO gevo.main.ev_prune VALUES (901, 'NATION_Y', 1, 7)")
    // IS NULL must return every old-generation row
    val nOld = Tables.nation(spark, sf).count()
    assert(spark.table("gevo.main.ev_prune")
      .filter(col("grade").isNull).count() === nOld)
    // equality on the new column finds exactly the new row
    val hit = spark.table("gevo.main.ev_prune")
      .filter(col("grade") === 7).collect()
    assert(hit.length === 1 && hit(0).getAs[String]("n_name") === "NATION_Y")
  }

  test("non-widening type changes are refused; widening now lands") {
    build("ev_refuse")
    // round 6: int->bigint is a SUPPORTED lossless widening
    // (TypeWideningSpec owns the full contract); anything else —
    // narrowing, cross-kind — still refuses
    spark.sql(
      "ALTER TABLE gevo.main.ev_refuse ALTER COLUMN n_nationkey TYPE BIGINT")
    assert(spark.table("gevo.main.ev_refuse").schema("n_nationkey")
      .dataType == org.apache.spark.sql.types.LongType)
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE gevo.main.ev_refuse ALTER COLUMN n_nationkey TYPE INT")
    }
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE gevo.main.ev_refuse ALTER COLUMN n_name TYPE BIGINT")
    }
  }
}
