package graft

import org.apache.spark.sql.functions._

/** Round-5 forty-fifth wave: M4 downsampling, harmonic closeness,
  * encoding-integrity audit. */
class Round5WaveFortyFiveSpec extends SparkSpec {

  test("m4: per-bucket envelope invariants and full coverage") {
    val rows = run("q_ts_m4").collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n"))).sum == total)
    rows.foreach { r =>
      val vmin = r.getLong(r.fieldIndex("v_min"))
      val vmax = r.getLong(r.fieldIndex("v_max"))
      val vf = r.getLong(r.fieldIndex("v_first"))
      val vl = r.getLong(r.fieldIndex("v_last"))
      assert(vmin <= vmax)
      assert(vf >= vmin && vf <= vmax)
      assert(vl >= vmin && vl <= vmax)
      assert(r.getLong(r.fieldIndex("t_min")) <=
        r.getLong(r.fieldIndex("t_max")))
      val b = r.getLong(r.fieldIndex("bucket"))
      assert(b >= 0L && b < 50L)
    }
    // buckets within a type are disjoint in time: t ranges ordered
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(rs.head.fieldIndex("bucket")))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getLong(x.fieldIndex("t_max")) <
            y.getLong(y.fieldIndex("t_min")) + 3600 * 24 * 365) // sanity
          assert(x.getLong(x.fieldIndex("t_max")) <=
            y.getLong(y.fieldIndex("t_min")) ||
            x.getLong(x.fieldIndex("t_max")) <
              y.getLong(y.fieldIndex("t_max")))
        case _ =>
      }
    }
  }

  test("closeness: matches a scala BFS recount, bounded at 6 hops") {
    val rows = run("q_graph_closeness").collect()
    assert(rows.nonEmpty)
    // rebuild the undirected adjacency from the same joins
    val edges = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), expr("l_orderkey = o_orderkey"))
      .join(Tables.customer(spark, sf), expr("o_custkey = c_custkey"))
      .join(Tables.supplier(spark, sf), expr("l_suppkey = s_suppkey"))
      .filter(expr("c_nationkey <> s_nationkey"))
      .selectExpr("least(c_nationkey, s_nationkey) AS a",
        "greatest(c_nationkey, s_nationkey) AS b")
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    rows.foreach { r =>
      val src = r.getInt(0)
      // BFS to depth 6
      var dist = Map(src -> 0)
      var frontier = Set(src)
      for (d <- 1 to 6) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filterNot(dist.contains)
        dist ++= frontier.map(_ -> d)
      }
      val reach = dist - src
      assert(r.getLong(r.fieldIndex("n_reached")) == reach.size.toLong, src)
      assert(r.getLong(r.fieldIndex("harmonic_micro")) ==
        reach.values.map(d => 1000000L / d).sum, src)
    }
  }

  test("mojibake: clean corpus reports zeros; planted corruption is detected") {
    val rows = run("q_text_mojibake").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_replacement")) == 0L)
      assert(r.getLong(r.fieldIndex("n_control")) == 0L)
      assert(r.getLong(r.fieldIndex("non_ascii_chars")) == 0L)
      assert(r.getLong(r.fieldIndex("non_ascii_micro")) == 0L)
      assert(r.getLong(r.fieldIndex("total_chars")) > 0L)
    }
    // plant corruption through the same flag expressions
    val sess = spark
    import sess.implicits._
    val planted = Seq(
      ("s", "clean ascii text"),
      ("s", "bad � replacement"),
      ("s", "ctrl \u0001 byte"),
      ("s", "café non-ascii")).toDF("source", "text")
    val flags = planted.select(
      col("text").contains("�").cast("long").as("has_repl"),
      col("text").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")
        .cast("long").as("has_ctrl"),
      length(regexp_replace(col("text"), "[\\x00-\\x7F]", ""))
        .cast("long").as("non_ascii"))
      .collect()
    assert(flags.map(_.getLong(0)).toSeq == Seq(0L, 1L, 0L, 0L))
    assert(flags.map(_.getLong(1)).toSeq == Seq(0L, 0L, 1L, 0L))
    // U+FFFD is itself non-ASCII, so the replacement row counts too
    assert(flags.map(_.getLong(2)).toSeq == Seq(0L, 1L, 0L, 1L))
  }
}
