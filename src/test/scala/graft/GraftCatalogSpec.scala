package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The graft TableCatalog + object-level SQL DELETE. One catalog per
  * JVM (Spark caches catalog instances by name after first resolution,
  * so the root conf is set exactly once); each test uses its own
  * namespace under the shared root.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-catalog-spec").toString
    spark.conf.set("spark.sql.catalog.gtest", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtest.root", r)
    r
  }

  private def mkTable(ns: String, name: String): String = {
    val path = s"$root/$ns/$name"
    Tables.lineitem(spark, sf)
      .repartitionByRange(4, col("l_orderkey"))
      .write.format("graft-objects").mode("overwrite").save(path)
    path
  }

  test("catalog resolves tables for SELECT with pushdown intact") {
    mkTable("sel", "lineitem")
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM gtest.sel.lineitem WHERE l_quantity > 45")
      .collect()(0).getLong(0)
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 45).count()
    assert(n == expect)
  }

  test("DELETE removes exactly the matching rows; NULL predicates survive") {
    mkTable("del", "lineitem")
    val before = Tables.lineitem(spark, sf).count()
    val matching = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 30).count()
    spark.sql("DELETE FROM gtest.del.lineitem WHERE l_quantity > 30.0")
    val after = spark.sql("SELECT COUNT(*) AS n FROM gtest.del.lineitem")
      .collect()(0).getLong(0)
    assert(after == before - matching)
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM gtest.del.lineitem WHERE l_quantity > 30.0")
      .collect()(0).getLong(0) == 0)
  }

  test("DELETE is object-level: pruned objects stay byte-identical, covered objects unlink") {
    val path = mkTable("objlevel", "lineitem")
    val objs = graft.sources.GraftObjectTable.listObjects(path)
    assert(objs.size == 4)
    // range-partitioned on l_orderkey: delete everything in the first
    // object's key range -> that object unlinks whole; the last
    // object's stats prune it from the rewrite entirely
    val footers = objs.map(o => o -> graft.sources.ObjectFormat.readFooter(o))
    val lastObj = objs.last
    val lastBytes = Files.readAllBytes(new File(lastObj).toPath)
    val firstMax = footers.head._2.stats("l_orderkey")
      .max.asInstanceOf[Number].longValue()
    spark.sql(
      s"DELETE FROM gtest.objlevel.lineitem WHERE l_orderkey <= $firstMax")
    val remaining = graft.sources.GraftObjectTable.listObjects(path)
    assert(remaining.size == 3, s"first object must unlink whole: $remaining")
    assert(Files.readAllBytes(new File(lastObj).toPath).sameElements(lastBytes),
      "stats-pruned object must not be rewritten")
    // survivors correct
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") > firstMax).count()
    assert(spark.sql("SELECT COUNT(*) AS n FROM gtest.objlevel.lineitem")
      .collect()(0).getLong(0) == expect)
  }

  test("DELETE with a non-metadata predicate falls back to row-level rewrite") {
    // Predicates outside the storage-evaluable set can't be answered by
    // object unlinking alone; with SupportsRowLevelOperations the plan
    // falls back to the copy-on-write rewrite instead of being refused.
    mkTable("refuse", "lineitem")
    val before = spark.sql("SELECT COUNT(*) AS n FROM gtest.refuse.lineitem")
      .collect()(0).getLong(0)
    // no-op predicate: nothing matches, row count must be unchanged
    spark.sql(
      "DELETE FROM gtest.refuse.lineitem WHERE length(l_returnflag) > 99")
    val after = spark.sql("SELECT COUNT(*) AS n FROM gtest.refuse.lineitem")
      .collect()(0).getLong(0)
    assert(after == before)
    // a real expression predicate deletes exactly the matching rows
    val expect = spark.sql(
      """SELECT COUNT(*) AS n FROM gtest.refuse.lineitem
        |WHERE NOT (l_orderkey % 7 = 0)""".stripMargin).collect()(0).getLong(0)
    spark.sql("DELETE FROM gtest.refuse.lineitem WHERE l_orderkey % 7 = 0")
    val left = spark.sql("SELECT COUNT(*) AS n FROM gtest.refuse.lineitem")
      .collect()(0).getLong(0)
    assert(left == expect, s"row-level delete: expected $expect rows, got $left")
  }

  test("TRUNCATE TABLE empties via the delete path; table stays queryable") {
    val path = mkTable("trunc", "lineitem")
    val before = spark.sql("SELECT COUNT(*) AS n FROM gtest.trunc.lineitem")
      .collect()(0).getLong(0)
    val v = graft.sources.GraftVersions.currentVersion(path)
    spark.sql("TRUNCATE TABLE gtest.trunc.lineitem")
    assert(graft.sources.GraftObjectTable.listObjects(path).isEmpty,
      "truncate must unlink every object")
    // TruncatableTable is VERSIONED: the pre-truncate generation stays
    // time-travelable from the archive
    assert(spark.read.format("graft-objects").load(s"$path@v$v")
      .count() == before, "pre-truncate snapshot must survive")
    // schema still resolves (sidecar written on the fly is absent here,
    // but the catalog table was created by a path write; re-insert works)
    spark.sql(
      "INSERT INTO gtest.trunc.lineitem SELECT * FROM gtest.del.lineitem LIMIT 5")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gtest.trunc.lineitem")
      .collect()(0).getLong(0) == 5)
  }

  test("create/list/rename/drop lifecycle; schema sidecar serves empty tables") {
    spark.sql(
      "CREATE TABLE gtest.life.t1 (k BIGINT, v STRING) USING `graft-objects`")
    assert(spark.sql("SELECT * FROM gtest.life.t1").count() == 0)
    spark.sql("INSERT INTO gtest.life.t1 VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT * FROM gtest.life.t1").count() == 2)
    val listed = spark.sql("SHOW TABLES IN gtest.life").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("t1"))
    // RENAME TO takes a catalog-relative multipart name
    spark.sql("ALTER TABLE gtest.life.t1 RENAME TO life.t2")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gtest.life.t2")
      .collect()(0).getLong(0) == 2)
    // object files re-prefixed to the new table name
    val objs = graft.sources.GraftObjectTable.listObjects(s"$root/life/t2")
    assert(objs.nonEmpty && objs.forall(new File(_).getName.startsWith("t2.")))
    spark.sql("DROP TABLE gtest.life.t2")
    assert(!new File(s"$root/life/t2").exists())
  }

  test("namespace DDL: CREATE/SHOW/DROP NAMESPACE manage pool dirs") {
    spark.sql("CREATE NAMESPACE gtest.pool_a")
    spark.sql("CREATE NAMESPACE gtest.pool_b")
    val listed = spark.sql("SHOW NAMESPACES IN gtest").collect()
      .map(_.getString(0)).toSet
    assert(listed.contains("pool_a") && listed.contains("pool_b"))
    spark.sql(
      "CREATE TABLE gtest.pool_a.t (k BIGINT) USING `graft-objects`")
    spark.sql("INSERT INTO gtest.pool_a.t VALUES (7)")
    assert(spark.sql("SELECT * FROM gtest.pool_a.t").count() == 1)
    // a table dir is not listed as a namespace
    val nested = spark.sql("SHOW NAMESPACES IN gtest.pool_a").collect()
    assert(nested.isEmpty)
    // non-empty namespace refuses plain DROP, cascades on request
    intercept[Exception] { spark.sql("DROP NAMESPACE gtest.pool_a") }
    spark.sql("DROP NAMESPACE gtest.pool_a CASCADE")
    spark.sql("DROP NAMESPACE gtest.pool_b")
    val after = spark.sql("SHOW NAMESPACES IN gtest").collect()
      .map(_.getString(0)).toSet
    assert(!after.contains("pool_a") && !after.contains("pool_b"))
  }

  test("DROP NAMESPACE CASCADE recurses into nested namespaces") {
    spark.sql("CREATE NAMESPACE gtest.deep")
    spark.sql("CREATE NAMESPACE gtest.deep.inner")
    spark.sql(
      "CREATE TABLE gtest.deep.inner.t (k BIGINT) USING `graft-objects`")
    spark.sql("INSERT INTO gtest.deep.inner.t VALUES (3)")
    // plain DROP refuses: the namespace holds a nested namespace even
    // though it holds no direct tables
    intercept[Exception] { spark.sql("DROP NAMESPACE gtest.deep") }
    spark.sql("DROP NAMESPACE gtest.deep CASCADE")
    assert(!new File(s"$root/deep").exists(),
      "cascade must remove nested namespaces and their tables")
  }
}
