package graft

/** Round-5 forty-ninth wave: SMA crossover, eccentricity/diameter,
  * Cohen's d. */
class Round5WaveFortyNineSpec extends SparkSpec {

  private lazy val daily: Map[String, Seq[(Long, Long)]] =
    Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS LONG) div 86400 AS day",
        "CAST(round(value * 100) AS LONG) AS c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (d, ys) => (d, ys.map(_._3).sum) }
      }

  test("sma_cross: every reported cross is a genuine relation flip") {
    val rows = run("q_ts_sma_cross").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0); val day = r.getLong(1)
      val series = daily(t)
      val idx = series.indexWhere(_._1 == day)
      assert(idx >= 9, "cross before a full 10-day window")
      def sums(i: Int): (Long, Long) = (
        series.slice(i - 2, i + 1).map(_._2).sum,
        series.slice(i - 9, i + 1).map(_._2).sum)
      val (s3, s10) = sums(idx)
      assert(r.getLong(r.fieldIndex("s3")) == s3)
      assert(r.getLong(r.fieldIndex("s10")) == s10)
      val above = s3 * 10 > s10 * 3
      assert(r.getString(r.fieldIndex("cross")) ==
        (if (above) "golden" else "death"))
      // previous full-window day had the opposite relation
      val (p3, p10) = sums(idx - 1)
      assert((p3 * 10 > p10 * 3) != above, s"$t $day not a flip")
    }
  }

  test("eccentricity: consistent with closeness reach; flags coherent") {
    val rows = run("q_graph_eccentricity").collect()
    assert(rows.length == 25)
    val dia = rows.head.getInt(rows.head.fieldIndex("diameter"))
    val rad = rows.head.getInt(rows.head.fieldIndex("radius"))
    assert(rad >= 1 && rad <= dia && dia < 6,
      "horizon must not bind on the dense trade graph")
    assert(dia <= 2 * rad) // metric space triangle bound
    rows.foreach { r =>
      val e = r.getInt(r.fieldIndex("ecc"))
      assert(e >= rad && e <= dia)
      assert(r.getBoolean(r.fieldIndex("is_center")) == (e == rad))
      assert(r.getBoolean(r.fieldIndex("is_periphery")) == (e == dia))
    }
    assert(rows.exists(_.getBoolean(rows.head.fieldIndex("is_center"))))
    assert(rows.exists(_.getBoolean(rows.head.fieldIndex("is_periphery"))))
  }

  test("cohens_d: matches a scala recount of the staged expression") {
    val rows = run("q_eval_cohens_d").collect()
    assert(rows.length == 5)
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id % 2 = 0",
        "CAST(round(value * 100) AS LONG)").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val (as, bs) = ev(t).partition(_._2)
      val na = as.size.toLong; val nb = bs.size.toLong
      assert(r.getLong(r.fieldIndex("na")) == na)
      assert(r.getLong(r.fieldIndex("nb")) == nb)
      val sa = BigInt(as.map(_._3).sum); val sb = BigInt(bs.map(_._3).sum)
      val qa = as.map(x => BigInt(x._3) * BigInt(x._3)).sum
      val qb = bs.map(x => BigInt(x._3) * BigInt(x._3)).sum
      val va = (BigInt(na) * qa - sa * sa).toDouble / (na * (na - 1)).toDouble
      val vb = (BigInt(nb) * qb - sb * sb).toDouble / (nb * (nb - 1)).toDouble
      val pooled = ((na - 1).toDouble * va + (nb - 1).toDouble * vb) /
        (na + nb - 2).toDouble
      val d = (sa.toDouble / na.toDouble - sb.toDouble / nb.toDouble) /
        math.sqrt(pooled)
      val got = r.getDouble(r.fieldIndex("cohens_d"))
      assert(math.abs(got - d) < 1e-9, t)
      // parity assignment on synthetic data: effect should be small
      assert(math.abs(got) < 0.5, s"$t suspicious effect $got")
    }
  }
}
