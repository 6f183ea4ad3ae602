package graft

import org.apache.spark.sql.functions._

/** Round-5 twenty-seventh wave: SCC by closure squaring, NDCG@5,
  * Rand index / purity. */
class Round5WaveTwentySevenSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("scc: labels match a Floyd-Warshall closure recount") {
    val rows = run("q_graph_scc").collect()
    assert(rows.length == 25)
    // rebuild the thresholded directed edge set
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cNat = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val sNat = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val weighted = li.map { case (ok, sk) => (cNat(ord(ok)), sNat(sk)) }
      .filter(e => e._1 != e._2)
      .groupBy(identity).map { case (e, xs) => e -> xs.length.toLong }
    val tw = weighted.values.sum; val ne = weighted.size.toLong
    val kept = weighted.filter { case (_, w) => w * ne >= tw }.keys.toSet
    // Floyd-Warshall boolean closure over the 25-node domain
    val reach = Array.tabulate(25, 25)((i, j) =>
      i == j || kept((i.toLong, j.toLong)))
    for (k <- 0 until 25; i <- 0 until 25; j <- 0 until 25)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    rows.foreach { r =>
      val v = r.getLong(r.fieldIndex("node")).toInt
      val peers = (0 until 25).filter(u => reach(v)(u) && reach(u)(v))
      assert(r.getLong(r.fieldIndex("scc_label")) == peers.min.toLong, s"node $v")
      assert(r.getLong(r.fieldIndex("scc_size")) == peers.length.toLong)
    }
    // partition sanity: same-label nodes report the same size
    rows.groupBy(_.getLong(rows.head.fieldIndex("scc_label")))
      .foreach { case (_, g) =>
        assert(g.map(_.getLong(g.head.fieldIndex("scc_size"))).distinct.length == 1)
      }
  }

  test("ndcg: micro scores match a literal-discount recount") {
    val rows = run("q_eval_ndcg").collect()
    assert(rows.nonEmpty)
    val disc = Seq(1000000L, 630929L, 500000L, 430676L, 386852L)
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.min(4L, r.getLong(2) / 250L)))
    rows.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      val ds = docs.filter(_._1 == src)
      val retrieved = ds.sortBy(d => (md5hex(s"rank-v1:${d._2}"), d._2))
        .take(5).map(_._3)
      val ideal = ds.sortBy(d => (-d._3, d._2)).take(5).map(_._3)
      val dcg = retrieved.zip(disc).map { case (rel, w) => rel * w }.sum
      val idcg = ideal.zip(disc).map { case (rel, w) => rel * w }.sum
      assert(r.getLong(r.fieldIndex("dcg_micro")) == dcg, src)
      assert(r.getLong(r.fieldIndex("idcg_micro")) == idcg, src)
      if (idcg > 0)
        assert(r.getLong(r.fieldIndex("ndcg_micro")) ==
          1000000L * dcg / idcg)
    }
  }

  test("rand index: pair-count identity matches a brute recount") {
    val r = run("q_eval_rand_index").collect().head
    val e = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map { x =>
        val v = x.getSeq[Float](1)
        val b = (if (v(0) >= 0f) 2 else 0) + (if (v(1) >= 0f) 1 else 0)
        (x.getInt(0), b)
      }
    val n = e.length.toLong
    // brute pairwise agreement count
    var agree = 0L
    for (i <- e.indices; j <- (i + 1) until e.length) {
      val sameL = e(i)._1 == e(j)._1; val sameB = e(i)._2 == e(j)._2
      if (sameL == sameB) agree += 1
    }
    val totalPairs = n * (n - 1) / 2
    assert(r.getLong(r.fieldIndex("n")) == n)
    assert(r.getLong(r.fieldIndex("total_pairs")) == totalPairs)
    assert(r.getLong(r.fieldIndex("rand_micro")) ==
      1000000L * agree / totalPairs)
    val purity = e.groupBy(_._2).values
      .map(g => g.groupBy(_._1).values.map(_.length).max.toLong).sum
    assert(r.getLong(r.fieldIndex("purity_micro")) ==
      1000000L * purity / n)
  }
}
