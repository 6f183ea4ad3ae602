package graft

import org.apache.spark.sql.functions._

/** Round-5 thirty-seventh wave: grid spatial join, HITS. */
class Round5WaveThirtySevenSpec extends SparkSpec {

  test("spatial: grid plan equals brute pairwise Chebyshev counts") {
    val rows = run("q_join_spatial_grid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pts = Tables.events(spark, sf).select("event_id", "user_id", "value")
      .collect().map { r =>
        (r.getLong(0), math.floor(r.getDouble(2) * 100d).toLong % 1000L,
          r.getLong(1) % 1000L)
      }
    val brute = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (ia, xa, ya) = pts(i); val (ib, xb, yb) = pts(j)
      val cheb = math.max(math.abs(xa - xb), math.abs(ya - yb))
      if (cheb <= 2 && ia != ib) brute(cheb) += 1
    }
    assert(rows == brute.toMap, s"got $rows expected $brute")
    assert(rows.values.sum > 0, "fixture produces nearby pairs")
  }

  test("hits: 3-iteration integer recount matches; scores normalized") {
    val rows = run("q_graph_hits").collect()
    assert(rows.length == 25)
    // rebuild the weighted directed edges
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cNat = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val sNat = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val edges = li.map { case (ok, sk) => (cNat(ord(ok)), sNat(sk)) }
      .filter(e => e._1 != e._2)
      .groupBy(identity).map { case (e, xs) => e -> xs.length.toLong }
    val nodes = (0L until 25L).toSeq
    var h = nodes.map(_ => 1000000L).toArray
    var a = nodes.map(_ => 1000000L).toArray
    for (_ <- 1 to 3) {
      val aRaw = nodes.map(n => edges.collect {
        case ((s, d), w) if d == n => h(s.toInt) * w
      }.sum).toArray
      val aMax = aRaw.max
      a = aRaw.map(s => 1000000L * s / aMax)
      val hRaw = nodes.map(n => edges.collect {
        case ((s, d), w) if s == n => a(d.toInt) * w
      }.sum).toArray
      val hMax = hRaw.max
      h = hRaw.map(s => 1000000L * s / hMax)
    }
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("nation")).toInt
      assert(r.getLong(r.fieldIndex("hub_micro")) == h(n), s"hub $n")
      assert(r.getLong(r.fieldIndex("auth_micro")) == a(n), s"auth $n")
    }
    assert(h.max == 1000000L && a.max == 1000000L, "L-inf normalized")
  }
}
