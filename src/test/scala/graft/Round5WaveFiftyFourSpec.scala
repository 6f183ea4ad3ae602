package graft

/** Round-5 fifty-fourth wave: ECE, revenue Gini, linear multi-touch
  * attribution. */
class Round5WaveFiftyFourSpec extends SparkSpec {

  test("ece: weighted mean of calibration gaps, bounded by max gap") {
    val rows = run("q_eval_ece").collect()
    assert(rows.length == 1)
    val r = rows.head
    val ece = r.getLong(r.fieldIndex("ece_micro"))
    val maxGap = r.getLong(r.fieldIndex("max_gap_micro"))
    assert(ece >= 0L && ece <= maxGap)
    assert(maxGap <= 1000000L)
    assert(r.getLong(r.fieldIndex("n_total")) ==
      Tables.documents(spark, sf).count())
    // cross-check against the calibration table the ECE summarizes
    val cal = run("q_eval_calibration").collect()
    val wsum = cal.map(c => c.getLong(c.fieldIndex("n")) *
      math.abs(c.getLong(c.fieldIndex("gap_micro")))).sum
    val n = cal.map(_.getLong(cal.head.fieldIndex("n"))).sum
    assert(ece == wsum / n)
  }

  test("gini: rank-form recount per segment, bounded in [0, 1)") {
    val rows = run("q_agg_revenue_gini").collect()
    assert(rows.length == 5)
    val rev = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("c_mktsegment", "c_custkey",
        "CAST(round(o_totalprice * 100) AS LONG) AS cents").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      .groupBy(x => (x._1, x._2))
      .map { case ((seg, ck), xs) => (seg, ck, xs.map(_._3).sum) }
      .toSeq.groupBy(_._1)
    rows.foreach { r =>
      val seg = r.getString(0)
      val xs = rev(seg).sortBy(x => (x._3, x._2)).map(_._3)
      val n = xs.length.toLong
      val sx = xs.sum
      val num = xs.zipWithIndex.map { case (x, i) =>
        (2L * (i + 1) - n - 1) * x
      }.sum
      assert(r.getLong(r.fieldIndex("n")) == n, seg)
      assert(r.getLong(r.fieldIndex("sx")) == sx, seg)
      // num is internal-only since r9 (DECIMAL(38,0) — not BIGINT-
      // representable at sf10); the local recount IS the witness.
      val bp = r.getLong(r.fieldIndex("gini_bp"))
      assert(bp == (10000L * num) / (n * sx), seg)
      assert(bp >= 0L && bp < 10000L)
    }
  }

  test("attribution_linear: credits conserve purchase value per purchase") {
    val rows = run("q_win_attribution_linear").collect()
    assert(rows.nonEmpty)
    val channels = rows.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("view", "click", "none")))
    // conservation: total credit ~= total purchase value (each purchase
    // loses < k micro-cents to flooring)
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(ts AS LONG) AS sec", "CAST(round(value * 100) AS LONG)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .filter(e => Set("view", "click", "purchase")(e._3))
    val purchases = ev.filter(_._3 == "purchase")
    val touches = ev.filter(_._3 != "purchase")
    val totalValueMicro = purchases.map(p => p._5 * 1000000L).sum
    val totalCredit = rows
      .map(_.getLong(rows.head.fieldIndex("credit_microcents"))).sum
    assert(totalCredit <= totalValueMicro)
    assert(totalValueMicro - totalCredit < purchases.length.toLong * 200L)
    // recount one purchase's split exactly
    val byUser = touches.groupBy(_._1)
    val sample = purchases.take(50)
    val expected = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    sample.foreach { p =>
      val ts = byUser.getOrElse(p._1, Array.empty)
        .filter(t => t._4 < p._4 && t._4 >= p._4 - 259200L)
      if (ts.isEmpty) expected("none") += p._5 * 1000000L
      else {
        val k = ts.length.toLong
        ts.groupBy(_._3).foreach { case (ch, g) =>
          expected(ch) += (p._5 * 1000000L * g.length) / k
        }
      }
    }
    // the full-corpus totals dominate the sampled ones per channel
    expected.foreach { case (ch, credit) =>
      val row = rows.find(_.getString(0) == ch)
      assert(row.isDefined, ch)
      assert(row.get.getLong(row.get.fieldIndex("credit_microcents"))
        >= credit, ch)
    }
  }
}
