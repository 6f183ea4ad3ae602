package graft

import org.apache.spark.sql.functions._

/** Round-5 fifteenth wave: automatic MV substitution (optimizer rule)
  * and bounded-round weighted label propagation. */
class Round5WaveFifteenSpec extends SparkSpec {

  private def leafNames(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.name()
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.relation.table.name()
    }

  test("mv rewrite: plan reads the MV table, result equals the base agg") {
    val df = run("q_src_mv_rewrite") // eager: computes inside its window
    val rewritten = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // the query records its own optimized-plan leaves (it computes
    // eagerly inside the scoped registration window, then unregisters)
    val leaves = operators.MvRewriteRun.lastLeaves
    assert(leaves.nonEmpty && leaves.forall(n =>
      n.contains("docs_mvrw") && !n.contains("docs_mvrw_base")),
      s"optimized plan must scan the MV, not the base (got $leaves)")
    // ground truth from a plain scan — the window is closed, so no
    // conf fiddling is needed: the rule cannot fire here
    val direct = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rewritten == direct, "substituted result equals the scan result")
  }

  test("mv rewrite: window closes — a later base aggregate is NOT rewritten") {
    run("q_src_mv_rewrite").collect()
    // after the query returns, the registration window is closed: the
    // exact same aggregate shape must scan the base again
    val base = spark.read.format("graft-objects")
      .option("agg.pushdown", "false")
      .load(spark.conf.get("spark.sql.catalog.graft.root") +
        "/main/docs_mvrw_base")
    val same = base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    assert(leafNames(same).forall(_.contains("docs_mvrw_base")),
      "a post-window aggregate must scan the base, not the stale MV")
  }

  test("mv rewrite: declines on a shape mismatch") {
    // open a registration window explicitly (the scoped discipline)
    val baseName = operators.Sources.registerDocsMv(spark, sf)
    spark.conf.set(graft.plans.MvRewrite.ConfKey, "true")
    try {
      val base = spark.read.format("graft-objects")
        .option("agg.pushdown", "false")
        .load(spark.conf.get("spark.sql.catalog.graft.root") +
          "/main/docs_mvrw_base")
      // control: the exact shape IS rewritten inside the window
      val exact = base.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      assert(leafNames(exact).forall(n =>
        n.contains("docs_mvrw") && !n.contains("docs_mvrw_base")),
        "in-window exact shape must be substituted")
      // same alias, different function input => signature mismatch
      val wrong = base.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_chars"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      assert(leafNames(wrong).forall(_.contains("docs_mvrw_base")),
        "mismatched aggregate must keep scanning the base")
      // a filter between agg and scan also declines
      val filtered = base.filter(col("n_chars") > 100).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      assert(leafNames(filtered).forall(_.contains("docs_mvrw_base")),
        "filtered aggregate must keep scanning the base")
    } finally {
      spark.conf.set(graft.plans.MvRewrite.ConfKey, "false")
      graft.plans.MvRewrite.unregisterMv(baseName)
    }
  }

  test("labelprop: matches an independent 3-round synchronous reference") {
    val rows = run("q_graph_labelprop").collect()
    assert(rows.length == 25)
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference LPA over the collected weighted edge list
    val und = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(least(col("c_nationkey"), col("s_nationkey"))
          .cast("long").as("a"),
        greatest(col("c_nationkey"), col("s_nationkey"))
          .cast("long").as("b"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sym = und.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    var lab = (0L until 25L).map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      val next = sym.groupBy(_._1).map { case (u, es) =>
        val mass = es.groupBy(e => lab(e._2))
          .map { case (l, xs) => l -> xs.map(_._3).sum }
        u -> mass.toSeq.minBy { case (l, m) => (-m, l) }._1
      }
      lab = lab.map { case (n, own) => n -> next.getOrElse(n, own) }
    }
    val names = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    lab.foreach { case (n, l) => assert(got(names(n)) == l) }
    // community sizes are consistent with the label assignment
    val sizes = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
    val counted = rows.groupBy(_.getLong(1)).map { case (k, v) => k -> v.length.toLong }
    assert(sizes == counted)
    assert(sizes.size >= 1 && sizes.values.sum == 25L)
  }
}
