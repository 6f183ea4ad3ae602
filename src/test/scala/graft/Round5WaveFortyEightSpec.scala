package graft

/** Round-5 forty-eighth wave: binary quantization recall, daily
  * streaks, winsorized mean. */
class Round5WaveFortyEightSpec extends SparkSpec {

  test("binary: hamming recount via packed sign words on one pair") {
    val rows = run("q_vec_binary").collect()
    assert(rows.length == 10)
    val ov = rows.head.getLong(rows.head.fieldIndex("overlap10"))
    assert(ov >= 0L && ov <= 10L)
    // recount hamming for the rank-1 binary hit against vec 0
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000000L).toLong >= 0L)).toMap
    val top = rows.minBy(_.getInt(0))
    val bid = top.getLong(top.fieldIndex("bin_id"))
    val expHam = vecs(0L).zip(vecs(bid)).count { case (a, b) => a != b }
    assert(top.getLong(top.fieldIndex("bin_hamming")) == expHam.toLong)
    // hamming column is non-decreasing with rank; dots non-increasing
    val sorted = rows.sortBy(_.getInt(0))
    sorted.map(_.getLong(top.fieldIndex("bin_hamming"))).sliding(2)
      .foreach { case Array(x, y) => assert(x <= y); case _ => }
    sorted.map(_.getLong(top.fieldIndex("full_dot_full"))).sliding(2)
      .foreach { case Array(x, y) => assert(x >= y); case _ => }
  }

  test("streak: islands recount; lengths partition active days") {
    val rows = run("q_win_streak").collect()
    assert(rows.nonEmpty)
    val byUser = Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS LONG) div 86400 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .distinct.groupBy(_._1)
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val u = r.getLong(0)
      val days = byUser(u).map(_._2).sorted
      // fold recount of consecutive-day runs
      var streaks = List.empty[Long]
      var cur = 0L; var prev = Long.MinValue
      days.foreach { d =>
        if (d == prev + 1) cur += 1 else { if (cur > 0) streaks ::= cur; cur = 1 }
        prev = d
      }
      if (cur > 0) streaks ::= cur
      assert(r.getLong(r.fieldIndex("n_active_days")) == days.length.toLong)
      assert(r.getLong(r.fieldIndex("longest_streak")) == streaks.max, u)
      assert(r.getLong(r.fieldIndex("n_streaks")) == streaks.length.toLong)
    }
  }

  test("winsorized: bounds are exact P5/P95 disc; clipped mean between bounds") {
    val rows = run("q_agg_winsorized").collect()
    assert(rows.length == 5)
    val byType = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG) AS vc")
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val vs = byType(t).map(_._2).sorted
      val n = vs.length.toLong
      assert(r.getLong(r.fieldIndex("n")) == n)
      // percentile-disc: smallest value whose cum*20 >= (q-mult)*n
      def disc(mult: Long): Long = {
        var cum = 0L
        vs.foreach { v => cum += 1; if (cum * 20 >= mult * n) return v }
        vs.last
      }
      // group equal values: cum must be counted per VALUE, not per row —
      // recount on the collapsed domain
      val dom = vs.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (v, g) => (v, g.size.toLong) }
      def discDom(mult: Long): Long = {
        var cum = 0L
        dom.foreach { case (v, c) =>
          cum += c; if (cum * 20 >= mult * n) return v }
        dom.last._1
      }
      val p5 = discDom(1); val p95 = discDom(19)
      assert(r.getLong(r.fieldIndex("p5_cents")) == p5, t)
      assert(r.getLong(r.fieldIndex("p95_cents")) == p95, t)
      val wins = vs.map(v => math.max(math.min(v, p95), p5))
      assert(r.getLong(r.fieldIndex("wins_mean_cents")) == wins.sum / n)
      assert(r.getLong(r.fieldIndex("raw_mean_cents")) == vs.sum / n)
      val wm = r.getLong(r.fieldIndex("wins_mean_cents"))
      assert(wm >= p5 && wm <= p95)
    }
  }
}
