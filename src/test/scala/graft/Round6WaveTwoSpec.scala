package graft

import org.apache.spark.sql.functions._

/** Round-6 second wave: k-means, Zipf octaves, node similarity,
  * out-of-order audit, RLE layout advisor. */
class Round6WaveTwoSpec extends SparkSpec {

  test("kmeans: deterministic, exhaustive membership, inertia recounts") {
    val rows = run("q_sim_kmeans").collect()
    assert(rows.nonEmpty && rows.map(_.getInt(0)).distinct.length == rows.length)
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.embeddings(spark, sf).count(),
      "every vector belongs to exactly one cluster")
    // a second run is bit-identical (deterministic seeds + rounds)
    val again = run("q_sim_kmeans").collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
    rows.foreach { r => assert(r.getLong(2) >= 0L && r.getLong(1) >= 1L) }
  }

  test("zipf: octave masses cover the corpus, ranks partition correctly") {
    val rows = run("q_text_zipf").collect()
    assert(rows.nonEmpty)
    val totalMass = rows.map(_.getLong(2)).sum
    val tokenCount = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(totalMass == tokenCount, "octave masses sum to the token count")
    // octave k holds at most 2^k words (ranks [2^k, 2^{k+1}))
    rows.foreach { r =>
      val k = r.getLong(0); val nw = r.getLong(1)
      assert(k >= 0 && nw <= (1L << k), s"octave $k holds $nw words")
    }
    // octave 0 is exactly the single top-ranked word
    val o0 = rows.find(_.getLong(0) == 0L).get
    assert(o0.getLong(1) == 1L)
  }

  test("node_sim: cosine in [-1,1], recounts on one pair") {
    val rows = run("q_graph_node_sim").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0))
    // independent recount of the first pair from the raw edge list
    val r0 = rows.minBy(r => (r.getLong(0), r.getLong(1)))
    val (x, y) = (r0.getLong(0), r0.getLong(1))
    val edges = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), expr("l_orderkey = o_orderkey"))
      .join(Tables.customer(spark, sf), expr("o_custkey = c_custkey"))
      .join(Tables.supplier(spark, sf), expr("l_suppkey = s_suppkey"))
      .filter(expr("c_nationkey <> s_nationkey"))
      .groupBy(least(col("c_nationkey"), col("s_nationkey"))
          .cast("long").as("a"),
        greatest(col("c_nationkey"), col("s_nationkey"))
          .cast("long").as("b"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val adj = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      .groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => e._2 -> e._3).toMap }
    val ax = adj(x); val ay = adj(y)
    val dot = ax.keySet.intersect(ay.keySet).toSeq
      .map(k => ax(k) * ay(k)).sum
    assert(r0.getLong(2) == dot, "dot product recount")
    val cos = BigDecimal(dot.toDouble /
      (math.sqrt(ax.values.map(v => v * v).sum.toDouble) *
        math.sqrt(ay.values.map(v => v * v).sum.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r0.getDouble(3) - cos) < 1e-9)
  }

  test("out_of_order: violations recount against a scala running max") {
    val rows = run("q_ts_out_of_order").collect()
    assert(rows.nonEmpty)
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("ts").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val evs = byType(r.getString(0)).sortBy(_._2)
      var mx = Long.MinValue
      var late = 0L; var worst = 0L
      evs.foreach { case (_, _, sec) =>
        if (mx > sec) { late += 1; worst = math.max(worst, mx - sec) }
        mx = math.max(mx, sec)
      }
      assert(r.getLong(1) == evs.length)
      assert(r.getLong(2) == late, s"${r.getString(0)} late count")
      assert(r.getLong(3) == worst, s"${r.getString(0)} max lateness")
      assert(r.getLong(4) == 1000000L * late / evs.length)
    }
  }

  test("rle advice: run counts bounded and consistent with distinct counts") {
    val rows = run("q_src_rle_advice").collect()
    assert(rows.length == 4)
    val n = rows.head.getLong(2)
    rows.foreach { r =>
      val runs = r.getLong(1)
      assert(runs >= 1L && runs <= n)
      assert(r.getLong(3) == 1000000L * runs / n)
    }
    // low-cardinality columns must compress far better than a key-ish one
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("l_returnflag") < m("l_suppkey"))
    assert(m("l_linestatus") < m("l_suppkey"))
  }

  test("quantile sketch query agrees with Spark's exact percentile") {
    graft.functions.GraftFunctions.register(spark)
    val medians = run("q_agg_quantile_sketch").collect()
      .filter(_.getInt(1) == 1) // pos 1 = P50
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(floor(value) AS BIGINT)").as("v"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(v, 0.5)").as("p50"))
      .collect().foreach { r =>
        // rank definitions differ by at most one order statistic
        val sk = medians(r.getString(0))
        assert(math.abs(sk - r.getDouble(1)) <= math.abs(r.getDouble(1)) * 0.05 + 2.0)
      }
  }
}
