package graft

/** Round-5 fiftieth wave: Heaps vocabulary growth, reciprocity,
  * inter-purchase intervals. */
class Round5WaveFiftySpec extends SparkSpec {

  test("heaps: monotone growth, exact final checkpoint, concave TTR") {
    val rows = run("q_text_heaps").collect().sortBy(_.getInt(0))
    assert(rows.length == 8)
    // tokens and vocab are non-decreasing in j
    Seq("n_docs", "tokens", "vocab").foreach { c =>
      rows.map(_.getLong(rows.head.fieldIndex(c))).sliding(2).foreach {
        case Array(x, y) => assert(x <= y, c); case _ =>
      }
    }
    // final checkpoint covers the whole corpus exactly
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(text, ' ') AS toks").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val last = rows.last
    assert(last.getLong(last.fieldIndex("n_docs")) == docs.length.toLong)
    assert(last.getLong(last.fieldIndex("tokens")) ==
      docs.map(_._2.size.toLong).sum)
    assert(last.getLong(last.fieldIndex("vocab")) ==
      docs.flatMap(_._2).distinct.length.toLong)
    // TTR falls as the corpus grows (Heaps: vocab grows sublinearly)
    val ttrs = rows.map(_.getLong(rows.head.fieldIndex("ttr_micro")))
    assert(ttrs.head >= ttrs.last)
    // midpoint recount: vocab at j=4 equals the distinct terms of the
    // first half of the corpus in doc_id order
    val mid = rows(3)
    val cut = mid.getLong(mid.fieldIndex("n_docs")).toInt
    val firstHalf = docs.sortBy(_._1).take(cut)
    assert(mid.getLong(mid.fieldIndex("vocab")) ==
      firstHalf.flatMap(_._2).distinct.length.toLong)
    assert(mid.getLong(mid.fieldIndex("tokens")) ==
      firstHalf.map(_._2.size.toLong).sum)
  }

  test("reciprocity: matches a scala recount of the directed edge set") {
    val rows = run("q_graph_reciprocity").collect()
    assert(rows.length == 1)
    val r = rows.head
    val edges = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .join(Tables.supplier(spark, sf),
        org.apache.spark.sql.functions.expr("l_suppkey = s_suppkey"))
      .filter(org.apache.spark.sql.functions.expr(
        "c_nationkey <> s_nationkey"))
      .selectExpr("c_nationkey AS src", "s_nationkey AS dst")
      .distinct().collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    val nRec = edges.count(e => edges.contains(e.swap)).toLong
    assert(r.getLong(r.fieldIndex("n_directed")) == edges.size.toLong)
    assert(r.getLong(r.fieldIndex("n_reciprocal")) == nRec)
    assert(r.getLong(r.fieldIndex("reciprocity_micro")) ==
      1000000L * nRec / edges.size)
  }

  test("interpurchase: med2/p90 recount per segment") {
    val rows = run("q_win_interpurchase").collect()
    assert(rows.length == 5)
    val orders = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("c_mktsegment", "o_custkey",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400 AS day",
        "o_orderkey").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val gaps = orders.groupBy(_._2).toSeq.flatMap { case (_, os) =>
      val sorted = os.sortBy(o => (o._3, o._4))
      sorted.sliding(2).filter(_.length == 2)
        .map(p => (p(1)._1, p(1)._3 - p(0)._3))
    }.groupBy(_._1)
    rows.foreach { r =>
      val seg = r.getString(0)
      val gs = gaps(seg).map(_._2).sorted
      val n = gs.length
      assert(r.getLong(r.fieldIndex("n_gaps")) == n.toLong)
      val med2 = gs((n + 1) / 2 - 1) + gs((n + 2) / 2 - 1)
      assert(r.getLong(r.fieldIndex("med2_days")) == med2, seg)
      val p90 = gs.zipWithIndex
        .find { case (_, i) => (i + 1) * 10 >= 9 * n }.get._1
      assert(r.getLong(r.fieldIndex("p90_days")) == p90, seg)
      assert(r.getLong(r.fieldIndex("max_days")) == gs.max)
    }
  }
}
