package graft

/** Round-5 fifty-seventh wave: clustering coefficients, conductance,
  * next-word suggestions. */
class Round5WaveFiftySevenSpec extends SparkSpec {

  private lazy val edges: Set[(Int, Int)] = Tables.lineitem(spark, sf)
    .join(Tables.orders(spark, sf),
      org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
    .join(Tables.customer(spark, sf),
      org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
    .join(Tables.supplier(spark, sf),
      org.apache.spark.sql.functions.expr("l_suppkey = s_suppkey"))
    .filter(org.apache.spark.sql.functions.expr("c_nationkey <> s_nationkey"))
    .selectExpr("least(c_nationkey, s_nationkey) AS a",
      "greatest(c_nationkey, s_nationkey) AS b")
    .distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  test("clustering: local coefficients recount; transitivity consistent") {
    val rows = run("q_graph_clustering_coef").collect()
    assert(rows.nonEmpty)
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    var triTotal = 0L
    rows.foreach { r =>
      val n = r.getInt(0)
      val nbrs = adj.getOrElse(n, Set.empty)
      assert(r.getLong(r.fieldIndex("deg")) == nbrs.size.toLong)
      val tri = nbrs.toSeq.combinations(2)
        .count(p => edges.contains((math.min(p(0), p(1)),
          math.max(p(0), p(1))))).toLong
      assert(r.getLong(r.fieldIndex("n_tri")) == tri, n)
      triTotal += tri
      if (nbrs.size >= 2) {
        val exp = (1000000L * 2 * tri) /
          (nbrs.size.toLong * (nbrs.size - 1))
        assert(r.getLong(r.fieldIndex("local_cc_micro")) == exp, n)
        assert(exp <= 1000000L)
      } else assert(r.isNullAt(r.fieldIndex("local_cc_micro")))
    }
    // global transitivity = 3*closed / wedges, recomputed
    val wedges = adj.values.map(s =>
      s.size.toLong * (s.size - 1) / 2).sum
    val expTrans = (1000000L * triTotal) / wedges
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("transitivity_micro")) == expTrans)
    }
  }

  test("conductance: phi in [0, 1e6]; cut/vol recount per community") {
    val rows = run("q_graph_conductance").collect()
    assert(rows.length >= 2, "thresholded partition must be non-trivial")
    val tvol = rows.map(_.getLong(rows.head.fieldIndex("vol"))).sum
    rows.foreach { r =>
      val vol = r.getLong(r.fieldIndex("vol"))
      val cut = r.getLong(r.fieldIndex("cut"))
      if (vol > 0 && tvol - vol > 0) {
        val phi = r.getLong(r.fieldIndex("conductance_micro"))
        assert(phi == (1000000L * cut) / math.min(vol, tvol - vol))
        assert(phi >= 0L)
      } else assert(r.isNullAt(r.fieldIndex("conductance_micro")))
      assert(cut <= vol || vol == 0)
    }
    // community sizes partition the 25 nations
    assert(rows.map(_.getLong(rows.head.fieldIndex("comm_size"))).sum == 25L)
  }

  test("autocomplete: suggestions are the true top bigram successors") {
    val rows = run("q_text_autocomplete").collect()
    assert(rows.nonEmpty)
    val bigrams = Tables.documents(spark, sf)
      .selectExpr("split(text, ' ') AS tk").collect()
      .flatMap(_.getSeq[String](0).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val byW1 = bigrams.groupBy(_._1._1)
    rows.groupBy(_.getString(0)).foreach { case (w1, rs) =>
      val successors = byW1(w1).toSeq
        .map { case ((_, w2), c) => (w2, c) }
        .sortBy { case (w2, c) => (-c, w2) }
      val expected = successors.take(3)
      val got = rs.sortBy(_.getInt(1))
        .map(r => (r.getString(r.fieldIndex("suggestion")),
          r.getLong(r.fieldIndex("cnt"))))
      assert(got.toSeq == expected, w1)
      rs.foreach(r => assert(r.getLong(r.fieldIndex("n_candidates")) ==
        successors.size.toLong))
    }
  }
}
