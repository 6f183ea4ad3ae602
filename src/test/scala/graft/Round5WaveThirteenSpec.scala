package graft

import org.apache.spark.sql.functions._

/** Round-5 thirteenth wave: skyline, bounded k-core peel, ordered
  * LISTAGG. Exactness is the DuckDB oracle; these pin the semantics
  * against independent recomputation on the sf0.001 fixture. */
class Round5WaveThirteenSpec extends SparkSpec {

  test("skyline: exactly the non-dominated distinct (price, size) pairs") {
    val out = run("q_agg_skyline").collect()
      .map(r => (math.round(r.getDouble(r.fieldIndex("price")) * 100),
        r.getInt(r.fieldIndex("size")))).toSet
    // independent quadratic recomputation over the distinct pairs
    val pts = Tables.part(spark, sf)
      .groupBy(round(col("p_retailprice") * 100).cast("long").as("p"),
        col("p_size").as("z"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val expected = pts.filter { case (p, z) =>
      !pts.exists { case (bp, bz) =>
        bp <= p && bz >= z && (bp < p || bz > z)
      }
    }.toSet
    assert(out == expected, "staircase window == quadratic dominance")
    assert(out.size < pts.length, "frontier is a strict subset")
    // staircase property: price asc => size strictly increasing
    val stair = out.toSeq.sortBy(_._1).map(_._2)
    assert(stair == stair.sorted && stair.distinct == stair)
  }

  test("kcore: matches an independent reference peel of the same graph") {
    val rows = run("q_graph_kcore").collect()
    assert(rows.length == 25)
    val inCore = rows.filter(_.getBoolean(1)).map(_.getString(0)).toSet
    assert(inCore.nonEmpty && inCore.size < 25,
      "fixture exercises both the in-core and peeled paths")
    // reference peel over the collected thresholded edge list
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
    val tw = und.map(_._3).sum
    val ne = und.length.toLong
    val edges = und.filter { case (_, _, w) => w * ne >= 2L * tw }
      .map { case (a, b, _) => (a, b) }
    var alive = (0L until 25L).toSet
    for (_ <- 1 to 4) {
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      alive = alive.filter(n => deg.getOrElse(n, 0) >= 2)
    }
    val names = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(inCore == alive.map(names), "peel membership matches reference")
    // survivor degrees are counted within the surviving subgraph
    val degRef = edges.filter(e => alive(e._1) && alive(e._2))
      .flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    rows.filter(_.getBoolean(1)).foreach { r =>
      val node = names.collectFirst {
        case (k, v) if v == r.getString(0) => k
      }.get
      assert(r.getLong(2) == degRef.getOrElse(node, 0L))
    }
  }

  test("listagg: deterministic order, same multiset under both orderings") {
    val rows = run("q_agg_listagg").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_nations"))
      val alpha = r.getString(r.fieldIndex("nations_alpha")).split(",").toSeq
      val byPop = r.getString(r.fieldIndex("nations_by_pop")).split(",").toSeq
      assert(alpha.length == n && byPop.length == n)
      assert(alpha == alpha.sorted, "alpha list is sorted")
      assert(alpha.sorted == byPop.sorted, "same multiset, different order")
    }
  }
}
