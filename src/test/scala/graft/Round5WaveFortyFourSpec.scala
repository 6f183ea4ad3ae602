package graft

/** Round-5 forty-fourth wave: Simpson diversity, degree
  * assortativity, multi-lag ACF. */
class Round5WaveFortyFourSpec extends SparkSpec {

  test("simpson: matches a pair-collision recount per nation") {
    val rows = run("q_agg_simpson").collect()
    assert(rows.nonEmpty)
    val byNation = Tables.customer(spark, sf)
      .selectExpr("c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
    rows.foreach { r =>
      val nk = r.getInt(0)
      val counts = byNation(nk).groupBy(_._2).map(_._2.size.toLong).toSeq
      val n = counts.sum
      assert(r.getLong(r.fieldIndex("n")) == n)
      assert(r.getLong(r.fieldIndex("n_cats")) == counts.size.toLong)
      if (n >= 2) {
        val dnum = counts.map(c => c * (c - 1)).sum
        val exp = 1000000L - (1000000L * dnum) / (n * (n - 1))
        assert(r.getLong(r.fieldIndex("simpson_micro")) == exp, nk)
        // diversity is a probability
        assert(exp >= 0L && exp <= 1000000L)
      } else assert(r.isNullAt(r.fieldIndex("simpson_micro")))
    }
  }

  test("assortativity: bounded in [-1, 1] micro and symmetric-marginal recount") {
    val rows = run("q_graph_assortativity").collect()
    assert(rows.length == 1)
    val r = rows.head
    val m = r.getLong(r.fieldIndex("m"))
    val sk = r.getLong(r.fieldIndex("sk"))
    val skk = r.getLong(r.fieldIndex("skk"))
    val sxy = r.getLong(r.fieldIndex("sxy"))
    // both orientations included: edge-end count is even
    assert(m % 2 == 0 && m > 0)
    // Cauchy-Schwarz with equal marginals: |m*sxy - sk^2| <= m*skk - sk^2
    val den = m * skk - sk * sk
    val num = m * sxy - sk * sk
    assert(math.abs(num) <= den)
    if (den > 0) {
      val a = r.getLong(r.fieldIndex("assort_micro"))
      assert(a >= -1000000L && a <= 1000000L)
      assert(a == (1000000L * (num + den)) / den - 1000000L)
    }
  }

  test("acf: lag-1 agrees with a scala recount on one type; six lags present") {
    val rows = run("q_ts_acf").collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).toSet == (1 to 6).toSet)
    }
    // recount lag-1 r for 'click' from the grid
    val grid = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS LONG) div 3600 AS h",
        "CAST(floor(value) AS LONG) AS fv")
      .collect().filter(_.getString(0) == "click")
      .groupBy(_.getLong(1)).map { case (h, xs) =>
        h -> xs.map(_.getLong(2)).sum / xs.size
      }
    val pairs = grid.toSeq.flatMap { case (h, y) =>
      grid.get(h - 1).map(x => (x, y))
    }
    if (pairs.size >= 3) {
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val exp = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      val got = byType("click").find(_.getInt(1) == 1).get
      assert(math.abs(got.getDouble(got.fieldIndex("r_acf")) - exp) < 1e-9)
    }
  }
}
