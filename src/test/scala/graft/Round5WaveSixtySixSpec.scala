package graft

import java.nio.file.Files

/** Round-5 sixty-sixth wave: Katz centrality, table_health
  * procedure. */
class Round5WaveSixtySixSpec extends SparkSpec {

  test("katz: attenuated path-count recount via adjacency rounds") {
    val rows = run("q_graph_katz").collect()
    assert(rows.length == 25)
    val edges = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .join(Tables.supplier(spark, sf),
        org.apache.spark.sql.functions.expr("l_suppkey = s_suppkey"))
      .filter(org.apache.spark.sql.functions.expr(
        "c_nationkey <> s_nationkey"))
      .selectExpr("least(c_nationkey, s_nationkey) AS a",
        "greatest(c_nationkey, s_nationkey) AS b")
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
    val adj: Map[Int, Seq[Int]] = (edges ++ edges.map(_.swap))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSeq }
    val names = Tables.nation(spark, sf)
      .selectExpr("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    var x: Map[Int, Long] = names.map(_._1 -> 1000000L).toMap
    var katz: Map[Int, Long] = names.map(_._1 -> 0L).toMap
    for (_ <- 1 to 4) {
      val xs = x
      x = names.map { case (n, _) =>
        n -> adj.getOrElse(n, Seq.empty[Int]).map(xs).sum / 2
      }.toMap
      katz = katz.map { case (n, k) => n -> (k + x(n)) }
    }
    rows.foreach { r =>
      val key = names.find(_._2 == r.getString(0)).get._1
      assert(r.getLong(r.fieldIndex("katz_micro")) == katz(key),
        r.getString(0))
    }
  }

  test("table_health: counts, sizes and small-file share from footers") {
    val root = Files.createTempDirectory("graft-health").toString
    spark.conf.set("spark.sql.catalog.ghlth",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ghlth.root", root)
    Tables.customer(spark, sf).repartition(5)
      .write.format("graft-objects").mode("overwrite")
      .save(s"$root/hs/customer")
    val r = spark.sql(
      "CALL ghlth.system.table_health('hs.customer', 1000000)")
      .collect().head
    assert(r.getInt(r.fieldIndex("n_objects")) == 5)
    assert(r.getLong(r.fieldIndex("n_rows")) ==
      Tables.customer(spark, sf).count())
    val tot = r.getLong(r.fieldIndex("total_bytes"))
    val mn = r.getLong(r.fieldIndex("min_bytes"))
    val mx = r.getLong(r.fieldIndex("max_bytes"))
    val avg = r.getLong(r.fieldIndex("avg_bytes"))
    assert(mn > 0 && mn <= avg && avg <= mx && tot >= mx)
    assert(avg == tot / 5)
    val nSmall = r.getInt(r.fieldIndex("n_small"))
    assert(r.getLong(r.fieldIndex("small_share_micro")) ==
      1000000L * nSmall / 5)
    // fixture objects are tiny: with a 1MB threshold all are small
    assert(nSmall == 5)
    assert(r.getInt(r.fieldIndex("n_with_dv")) == 0)
  }
}
