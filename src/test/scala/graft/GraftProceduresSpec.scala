package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** SQL CALL surface (ProcedureCatalog): the full branch lifecycle and
  * the retention/version verbs driven from SQL text alone. */
class GraftProceduresSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-proc-spec").toString
    spark.conf.set("spark.sql.catalog.gproc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gproc.root", r)
    r
  }

  private def mkTable(ns: String, name: String): String = {
    val path = s"$root/$ns/$name"
    spark.range(0, 50).selectExpr("id", "concat('row', id) AS v")
      .repartition(1)
      .write.format("graft-objects").mode("overwrite").save(path)
    path
  }

  test("CALL drives the whole branch lifecycle from SQL") {
    mkTable("br", "t")
    val created = spark.sql(
      "CALL gproc.system.create_branch('br.t', 'exp')").collect()
    assert(created.head.getString(0) == "exp" && created.head.getInt(1) >= 1)

    val listed = spark.sql(
      "CALL gproc.system.list_branches('br.t')").collect()
    assert(listed.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("exp", created.head.getInt(1))))

    // append to the branch through the programmatic API, main via SQL
    graft.sources.GraftBranches.append(
      spark.range(100, 120).selectExpr("id", "concat('row', id) AS v"),
      s"$root/br/t", "exp")
    val v0 = spark.sql("CALL gproc.system.table_version('br.t')")
      .collect().head.getInt(0)

    val merged = spark.sql(
      "CALL gproc.system.merge_branch('br.t', 'exp')").collect()
    assert(merged.head.getInt(0) == v0 + 1, "merge mints one version")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gproc.br.t")
      .collect().head.getLong(0) == 70)
    assert(spark.sql("CALL gproc.system.list_branches('br.t')").isEmpty)
  }

  test("CALL drop_branch reports whether a ref existed; vacuum_table records the floor") {
    mkTable("vc", "t")
    spark.sql("CALL gproc.system.create_branch('vc.t', 'tmp')")
    assert(spark.sql("CALL gproc.system.drop_branch('vc.t', 'tmp')")
      .collect().head.getBoolean(0))
    assert(!spark.sql("CALL gproc.system.drop_branch('vc.t', 'tmp')")
      .collect().head.getBoolean(0), "second drop finds nothing")

    val v = spark.sql("CALL gproc.system.table_version('vc.t')")
      .collect().head.getInt(0)
    val swept = spark.sql(s"CALL gproc.system.vacuum_table('vc.t', $v)")
      .collect().head.getInt(0)
    assert(swept == v)
  }

  test("procedures are namespaced and discoverable; unknown names refuse") {
    mkTable("ns", "t")
    val e = intercept[Exception] {
      spark.sql("CALL gproc.system.no_such_proc('ns.t')").collect()
    }
    assert(e.getMessage != null)
  }
}
