package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Type-widening schema evolution (ALTER COLUMN TYPE): older objects
  * keep their narrow physical encoding; readers upcast at decode on
  * both routes; pushdown crosses generations exactly. */
class TypeWideningSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-widen").toString
    spark.conf.set("spark.sql.catalog.gwiden", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gwiden.root", r)
    r
  }

  test("int->bigint: both generations read, filters cross the boundary") {
    root
    spark.sql("CREATE TABLE gwiden.main.w (k BIGINT, v INT, f FLOAT) " +
      "USING `graft-objects`")
    spark.range(0, 100).selectExpr("id AS k", "CAST(id * 2 AS INT) AS v",
      "CAST(id AS FLOAT) AS f")
      .repartition(2)
      .writeTo("gwiden.main.w").append()
    spark.sql("ALTER TABLE gwiden.main.w ALTER COLUMN v TYPE BIGINT")
    spark.sql("ALTER TABLE gwiden.main.w ALTER COLUMN f TYPE DOUBLE")
    // post-ALTER appends carry the wide encoding — including values a
    // 32-bit int cannot hold
    spark.range(100, 150).selectExpr("id AS k",
      "id * 2 + 10000000000 AS v", "CAST(id AS DOUBLE) AS f")
      .repartition(1)
      .writeTo("gwiden.main.w").append()
    val t = spark.table("gwiden.main.w")
    assert(t.schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(t.count() == 150)
    // values from the NARROW generation arrive upcast
    assert(t.filter(col("k") === 7L).select(col("v"), col("f"))
      .collect().head == org.apache.spark.sql.Row(14L, 7.0d))
    // aggregate across both generations
    assert(t.agg(sum(col("v"))).collect().head.getLong(0) ==
      (0L until 100L).map(_ * 2).sum +
        (100L until 150L).map(_ * 2 + 10000000000L).sum)
    // filter pushdown crossing the generation boundary: long literal
    // against rows physically stored as int
    assert(t.filter(col("v") <= 50L).count() == 26)
    assert(t.filter(col("v") > 10000000000L).count() == 50)
    // vectorized route serves the widened column (columnar default)
    val plan = t.select(col("v")).queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      "widened column must stay on the vectorized route")
  }

  test("narrowing and cross-kind changes are refused") {
    root
    spark.sql("CREATE TABLE gwiden.main.n (a BIGINT, b STRING) " +
      "USING `graft-objects`")
    // Spark's analyzer refuses non-upcast changes before the catalog
    // even sees them (NOT_SUPPORTED_CHANGE_COLUMN); the catalog's own
    // widenable() gate backstops programmatic TableChange callers
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE gwiden.main.n ALTER COLUMN a TYPE INT")
    }
    assert(e1.getMessage.toLowerCase.contains("not supported") ||
      e1.getMessage.contains("widening"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gwiden.main.n ALTER COLUMN b TYPE BIGINT")
    }
    assert(e2.getMessage.toLowerCase.contains("not supported") ||
      e2.getMessage.contains("widening"))
    // the catalog gate itself, driven directly: bigint -> double is an
    // upcast Spark permits but the PHYSICAL codec cannot serve
    // losslessly from 8-byte integer bodies — refused with the
    // widening message
    val cat = spark.sessionState.catalogManager.catalog("gwiden")
      .asInstanceOf[graft.sources.GraftCatalog]
    val e3 = intercept[IllegalArgumentException] {
      cat.alterTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("main"), "n"),
        org.apache.spark.sql.connector.catalog.TableChange.updateColumnType(
          Array("a"), org.apache.spark.sql.types.DoubleType))
    }
    assert(e3.getMessage.contains("widening"))
  }

  test("MoR delete and time travel survive a widened column") {
    root
    spark.sql("CREATE TABLE gwiden.main.m (k BIGINT, v INT) " +
      "USING `graft-objects`")
    spark.range(0, 60).selectExpr("id AS k", "CAST(id AS INT) AS v")
      .repartition(1).writeTo("gwiden.main.m").append()
    spark.sql("ALTER TABLE gwiden.main.m ALTER COLUMN v TYPE BIGINT")
    val dir = s"$root/main/m"
    val v0 = graft.sources.GraftVersions.currentVersion(dir)
    graft.sources.ObjectStoreMaintenance.deleteMoR(dir,
      Array(org.apache.spark.sql.sources.LessThanOrEqual("v", 9L)))
    assert(spark.table("gwiden.main.m").count() == 50)
    assert(spark.table("gwiden.main.m")
      .agg(min(col("v"))).collect().head.getLong(0) == 10L)
    val old = spark.read.format("graft-objects").load(s"$dir@v$v0")
    assert(old.count() == 60)
  }
}
