package graft

/** Round-5 forty-seventh wave: t-closeness, Holt smoothing,
  * edit-distance join. */
class Round5WaveFortySevenSpec extends SparkSpec {

  test("tcloseness: variational-distance recount with zero-cell completion") {
    val rows = run("q_priv_tcloseness").collect()
    assert(rows.nonEmpty)
    val base = Tables.customer(spark, sf)
      .selectExpr("c_nationkey", "CAST(floor(c_acctbal / 2000) AS LONG)",
        "c_mktsegment").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val nn = base.length.toLong
    val global = base.groupBy(_._3).map { case (s, v) => s -> v.size.toLong }
    rows.foreach { r =>
      val key = (r.getInt(0), r.getLong(1))
      val cls = base.filter(x => (x._1, x._2) == key)
      val n = cls.length.toLong
      assert(r.getLong(r.fieldIndex("n")) == n)
      val inCls = cls.groupBy(_._3).map { case (s, v) => s -> v.size.toLong }
      // sum over the FULL global segment domain (zero cells complete)
      val emd = global.map { case (seg, gi) =>
        math.abs(inCls.getOrElse(seg, 0L) * nn - gi * n)
      }.sum
      assert(r.getLong(r.fieldIndex("emd_num")) == emd, key)
      val t = (1000000L * emd) / (2 * n * nn)
      assert(r.getLong(r.fieldIndex("t_micro")) == t)
      assert(t >= 0L && t <= 1000000L)
      assert(r.getBoolean(r.fieldIndex("viol_t")) == (t > 300000L))
    }
  }

  test("holt: state walk matches a scala recount of the recurrence") {
    val rows = run("q_ts_holt").collect()
    assert(rows.length == 5)
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS LONG) div 86400 AS day",
        "CAST(round(value * 100) AS LONG) AS c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (_, ys) => ys.map(_._3).sum }
      }
    def half(x: Long): Long = (x + 1000000000000L) / 2 - 500000000000L
    rows.foreach { r =>
      val t = r.getString(0)
      val ys = daily(t)
      var l = ys.head; var b = 0L
      ys.tail.foreach { y =>
        val l2 = half(y + l + b)
        b = half(b + l2 - l)
        l = l2
      }
      assert(r.getLong(r.fieldIndex("n_days")) == ys.length.toLong, t)
      assert(r.getLong(r.fieldIndex("level_cents")) == l, t)
      assert(r.getLong(r.fieldIndex("trend_cents")) == b, t)
      assert(r.getLong(r.fieldIndex("forecast_cents")) == l + b, t)
    }
  }

  test("editdist: blocking is lossless vs a quadratic scan; sources found") {
    val rows = run("q_join_editdist").collect()
    assert(rows.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val probes = cust.filter(_._1 % 50 == 0).map { case (k, name) =>
      val pos = (10 + k % 8).toInt // 1-based
      val dig = (name(pos - 1) - '0' + 1) % 10
      (k, name.substring(0, pos - 1) + dig + name.substring(pos))
    }
    val brute = (for {
      (pid, pname) <- probes
      (ck, cname) <- cust
      d = lev(pname, cname) if d <= 1
    } yield (pid, ck, d.toLong)).toSet
    val got = rows.map(r => (r.getLong(r.fieldIndex("probe_id")),
      r.getLong(r.fieldIndex("c_custkey")),
      r.getLong(r.fieldIndex("dist")))).toSet
    assert(got == brute)
    // every probe rediscovers its corrupted source at distance exactly 1
    probes.foreach { case (pid, _) =>
      assert(got.contains((pid, pid, 1L)), s"probe $pid lost its source")
    }
  }
}
