package graft

/** Round-5 fifty-fifth wave: Haar energy, Neyman allocation, growth
  * accounting. */
class Round5WaveFiftyFiveSpec extends SparkSpec {

  private lazy val daily: Map[String, Seq[Long]] =
    Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS LONG) div 86400 AS day",
        "CAST(round(value * 100) AS LONG) AS c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (_, ys) => ys.map(_._3).sum }
      }

  test("haar: energies match a scala transform; Parseval-style identity") {
    val rows = run("q_ts_haar").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val t = r.getString(0)
      val ys = daily(t).takeRight(16)
      assert(ys.length == 16)
      def step(a: Seq[Long]): (Seq[Long], Seq[Long]) = (
        a.grouped(2).map(p => p(0) - p(1)).toSeq,
        a.grouped(2).map(p => p(0) + p(1)).toSeq)
      val (d1, a1) = step(ys); val (d2, a2) = step(a1)
      val (d3, a3) = step(a2); val (d4, a4) = step(a3)
      def e(d: Seq[Long]) = d.map(x => x * x).sum
      assert(r.getLong(r.fieldIndex("e1")) == e(d1), t)
      assert(r.getLong(r.fieldIndex("e2")) == e(d2), t)
      assert(r.getLong(r.fieldIndex("e3")) == e(d3), t)
      assert(r.getLong(r.fieldIndex("e4")) == e(d4), t)
      assert(r.getLong(r.fieldIndex("total_sum")) == ys.sum, t)
      // unnormalized-Haar Parseval: 16*sum(x^2) =
      //   8*e1 + 4*e2 + 2*e3 + e4 + a4^2
      val lhs = 16L * ys.map(x => x * x).sum
      val rhs = 8 * e(d1) + 4 * e(d2) + 2 * e(d3) + e(d4) +
        a4.head * a4.head
      assert(lhs == rhs, s"$t Parseval")
    }
  }

  test("neyman: allocation proportional to N*sigma, budget respected") {
    val rows = run("q_sample_neyman").collect()
    assert(rows.length == 5)
    val byType = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val weights = rows.map { r =>
      val t = r.getString(0)
      val xs = byType(t).map(_._2)
      val n = xs.length.toLong
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val v = (n * sxx - sx * sx) / (n * n)
      val sd = math.sqrt(v.toDouble).toLong
      assert(r.getLong(r.fieldIndex("sd_cents")) == sd, t)
      assert(r.getLong(r.fieldIndex("weight")) == n * sd, t)
      t -> (n * sd)
    }.toMap
    val wtot = weights.values.sum
    rows.foreach { r =>
      val exp = 1000L * weights(r.getString(0)) / wtot
      assert(r.getLong(r.fieldIndex("alloc_n")) == exp)
    }
    // flooring never exceeds the budget
    assert(rows.map(_.getLong(rows.head.fieldIndex("alloc_n"))).sum <= 1000L)
  }

  test("growth: active = new + retained + resurrected; churn recount") {
    val rows = run("q_win_growth_accounting").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_active")) ==
        r.getLong(r.fieldIndex("n_new")) +
          r.getLong(r.fieldIndex("n_retained")) +
          r.getLong(r.fieldIndex("n_resurrected")))
    }
    // scala recount of the transition states
    val uw = Tables.events(spark, sf)
      .selectExpr("user_id", "(CAST(ts AS LONG) div 86400 + 3) div 7 AS w")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byUser = uw.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).toSet }
    val firsts = byUser.map { case (u, ws) => u -> ws.min }
    val maxW = uw.map(_._2).max
    rows.foreach { r =>
      val w = r.getLong(0)
      val active = byUser.filter(_._2.contains(w)).keySet
      assert(r.getLong(r.fieldIndex("n_active")) == active.size.toLong)
      val nNew = active.count(firsts(_) == w).toLong
      val nRet = active.count(u => firsts(u) < w && byUser(u)(w - 1)).toLong
      val nRes = active.count(u => firsts(u) < w && !byUser(u)(w - 1)).toLong
      assert(r.getLong(r.fieldIndex("n_new")) == nNew, w)
      assert(r.getLong(r.fieldIndex("n_retained")) == nRet, w)
      assert(r.getLong(r.fieldIndex("n_resurrected")) == nRes, w)
      val churn = if (w > uw.map(_._2).min && w <= maxW)
        byUser.count { case (_, ws) => ws.contains(w - 1) && !ws.contains(w) }
      else if (w <= maxW)
        byUser.count { case (_, ws) => ws.contains(w - 1) && !ws.contains(w) }
      else 0
      assert(r.getLong(r.fieldIndex("n_churned_in")) == churn.toLong, w)
    }
  }
}
