package graft

/** Round-5 sixtieth wave: control chart, cosine histogram. */
class Round5WaveSixtySpec extends SparkSpec {

  test("control chart: every flagged day violates its claimed rule") {
    val rows = run("q_ts_control_chart").collect()
    assert(rows.nonEmpty, "the tuned zones must fire on the fixture")
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS LONG) div 86400 AS day",
        "CAST(round(value * 100) AS LONG) AS c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (d, ys) => (d, ys.map(_._3).sum / ys.size) }
      }
    rows.foreach { r =>
      val t = r.getString(0)
      val series = daily(t)
      val n = series.length.toLong
      val sy = series.map(_._2).sum
      val syy = series.map(x => x._2 * x._2).sum
      val cl = sy / n
      val sd = math.sqrt(((n * syy - sy * sy) / (n * n)).toDouble).toLong
      assert(r.getLong(r.fieldIndex("cl")) == cl, t)
      assert(r.getLong(r.fieldIndex("sd")) == sd, t)
      val day = r.getLong(1); val y = r.getLong(r.fieldIndex("y"))
      assert(series.find(_._1 == day).get._2 == y)
      val zone = r.getBoolean(r.fieldIndex("rule_zone"))
      val runR = r.getBoolean(r.fieldIndex("rule_run"))
      assert(zone || runR)
      if (zone) assert(math.abs(y - cl) > 2 * sd, s"$t $day zone")
      if (runR) {
        // the day sits inside a >=6-day same-side run
        def side(v: Long): Int =
          if (v > cl) 1 else if (v < cl) -1 else 0
        val s0 = side(y)
        assert(s0 != 0)
        val idx = series.indexWhere(_._1 == day)
        var lo = idx; var hi = idx
        while (lo > 0 && side(series(lo - 1)._2) == s0) lo -= 1
        while (hi < series.length - 1 && side(series(hi + 1)._2) == s0)
          hi += 1
        assert(hi - lo + 1 >= 6, s"$t $day run")
      }
    }
  }

  test("cos histogram: bins partition all pairs; means inside bin bounds") {
    val rows = run("q_vec_cos_histogram").collect()
    assert(rows.nonEmpty)
    val nVec = Tables.embeddings(spark, sf).count()
    val expPairs = nVec * (nVec - 1) / 2
    assert(rows.map(_.getLong(rows.head.fieldIndex("n"))).sum == expPairs)
    rows.foreach { r =>
      val bin = r.getLong(0)
      assert(bin >= 0L && bin <= 19L)
      val lo = bin / 10.0 - 1.0
      val hi = lo + 0.1
      val m = r.getDouble(r.fieldIndex("mean_cos"))
      // rounding to 6dp can push a boundary value epsilon outside
      assert(m >= lo - 1e-6 && m <= (if (bin == 19L) 1.0 else hi) + 1e-6,
        s"bin $bin mean $m")
    }
    // a healthy random embedding space is not collapsed at cos~1
    val top = rows.find(_.getLong(0) == 19L)
      .map(_.getLong(rows.head.fieldIndex("n"))).getOrElse(0L)
    assert(top < expPairs / 2, "space reads as collapsed")
  }
}
