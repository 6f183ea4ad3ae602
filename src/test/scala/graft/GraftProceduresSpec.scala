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

  test("CALL compact_table merges small objects; scrub_table reports clean CRCs") {
    val path = s"$root/mt/t"
    spark.range(0, 200).selectExpr("id", "concat('row', id) AS v")
      .repartition(8)
      .write.format("graft-objects").mode("overwrite").save(path)
    val c = spark.sql("CALL gproc.system.compact_table('mt.t', 2)")
      .collect().head
    assert(c.getInt(0) == 8 && c.getInt(1) == 2,
      s"expected 8 -> 2 objects, got ${c.getInt(0)} -> ${c.getInt(1)}")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gproc.mt.t")
      .collect().head.getLong(0) == 200, "compaction preserves rows")
    val s0 = spark.sql("CALL gproc.system.scrub_table('mt.t')").collect().head
    assert(s0.getInt(0) == 2 && s0.getInt(1) == 2 && s0.getInt(2) == 0)
    // corrupt a body byte: the scrub must catch exactly that object
    val obj = graft.sources.GraftObjectTable.listObjects(path).head
    val raf = new java.io.RandomAccessFile(obj, "rw")
    raf.seek(60); val b = raf.read(); raf.seek(60); raf.write(b ^ 0xff)
    raf.close()
    val s1 = spark.sql("CALL gproc.system.scrub_table('mt.t')").collect().head
    assert(s1.getInt(2) == 1, "tampered body must fail the CRC scrub")
  }

  test("CALL zorder_table relays out the curve; both dimensions prune") {
    val path = s"$root/zo/t"
    spark.range(0, 10000).selectExpr(
      "id % 100 AS x",
      "concat('k', lpad(CAST(id DIV 100 AS STRING), 2, '0')) AS s",
      "id AS v")
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(path)
    val r = spark.sql(
      "CALL gproc.system.zorder_table('zo.t', 'x, s', 16)").collect().head
    assert(r.getInt(0) == 4 && r.getInt(1) == 16)
    assert(r.getString(2) == "x,s")
    // rows preserved, both dimensions now prune via footers
    assert(spark.sql("SELECT COUNT(*) FROM gproc.zo.t")
      .collect().head.getLong(0) == 10000)
    import org.apache.spark.sql.sources.EqualTo
    def survivors(f: org.apache.spark.sql.sources.Filter): Int =
      graft.sources.GraftObjectTable.listObjects(path)
        .map(graft.sources.ObjectFormat.readFooter)
        .count(graft.sources.ObjectFormat.mightMatch(f, _))
    assert(survivors(EqualTo("x", 5L)) <= 8, "long dim prunes")
    assert(survivors(EqualTo("s", "k05")) <= 8, "string dim prunes")
    // the pre-zorder generation stays time-travelable
    val hist = spark.sql("CALL gproc.system.table_version('zo.t')")
      .collect().head.getInt(0)
    assert(hist >= 2)
  }

  test("procedures are namespaced and discoverable; unknown names refuse") {
    mkTable("ns", "t")
    val e = intercept[Exception] {
      spark.sql("CALL gproc.system.no_such_proc('ns.t')").collect()
    }
    assert(e.getMessage != null)
  }
}
