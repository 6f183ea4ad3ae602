package graft

/** Round-5 fifty-third wave: temporal split, trimmed mean, PR curve. */
class Round5WaveFiftyThreeSpec extends SparkSpec {

  private lazy val events: Seq[(String, Long, Long)] =
    Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "CAST(ts AS LONG)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("time_split: cutoff is the exact P80 second; overlap measured") {
    val rows = run("q_sample_time_split").collect()
    assert(rows.length == 5)
    val secs = events.map(_._3).sorted
    val n = secs.length
    // P80 disc on the value domain
    val dom = secs.groupBy(identity).toSeq.sortBy(_._1)
    var cum = 0L; var cutoff = Long.MaxValue
    dom.foreach { case (v, g) =>
      cum += g.size
      if (cum * 5 >= 4L * n && cutoff == Long.MaxValue) cutoff = v
    }
    rows.foreach { r =>
      val t = r.getString(0)
      val es = events.filter(_._1 == t)
      val train = es.filter(_._3 < cutoff); val test = es.filter(_._3 >= cutoff)
      assert(r.getLong(r.fieldIndex("n_train")) == train.size.toLong, t)
      assert(r.getLong(r.fieldIndex("n_test")) == test.size.toLong, t)
      val trainU = train.map(_._2).toSet; val testU = test.map(_._2).toSet
      val users = (trainU ++ testU).size.toLong
      val overlap = (trainU & testU).size.toLong
      assert(r.getLong(r.fieldIndex("n_users")) == users, t)
      assert(r.getLong(r.fieldIndex("n_overlap_users")) == overlap, t)
      assert(r.getLong(r.fieldIndex("overlap_micro")) ==
        1000000L * overlap / users, t)
    }
    // the split is roughly 80/20 overall
    val tr = rows.map(_.getLong(rows.head.fieldIndex("n_train"))).sum
    val te = rows.map(_.getLong(rows.head.fieldIndex("n_test"))).sum
    assert(tr + te == n.toLong)
    assert(tr >= 3L * te, s"split $tr/$te not ~80/20")
  }

  test("trimmed: rank-overlap trim matches a sorted-slice recount") {
    val rows = run("q_agg_trimmed_mean").collect()
    assert(rows.length == 5)
    val byType = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val vs = byType(t).map(_._2).sorted
      val n = vs.length
      val lo = n / 10; val hi = n - n / 10
      val kept = vs.slice(lo, hi) // ranks lo+1..hi, 0-indexed slice
      assert(r.getLong(r.fieldIndex("n")) == n.toLong)
      assert(r.getLong(r.fieldIndex("n_kept")) == kept.length.toLong, t)
      assert(r.getLong(r.fieldIndex("trimmed_mean_cents")) ==
        kept.sum / kept.length, t)
      assert(r.getLong(r.fieldIndex("raw_mean_cents")) == vs.sum / n, t)
    }
  }

  test("pr_curve: monotone recall, confusion counts recount at one cut") {
    val rows = run("q_eval_pr_curve").collect().sortBy(_.getInt(0))
    assert(rows.length == 5)
    // higher j => lower cut => recall non-decreasing
    val recalls = rows.map(_.getLong(rows.head.fieldIndex("recall_micro")))
    recalls.sliding(2).foreach { case Array(x, y) => assert(x <= y); case _ => }
    val cuts = rows.map(_.getLong(rows.head.fieldIndex("cut")))
    cuts.sliding(2).foreach { case Array(x, y) => assert(x >= y); case _ => }
    // j=5 cut is the minimum score => everything classified positive
    val last = rows.last
    assert(last.getLong(last.fieldIndex("recall_micro")) == 1000000L)
    // recount confusion at the middle cut
    val docs = Tables.documents(spark, sf)
      .selectExpr("n_chars", "lang = 'en'").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val mid = rows(2)
    val cut = mid.getLong(mid.fieldIndex("cut"))
    val tp = docs.count(d => d._1 >= cut && d._2).toLong
    val fp = docs.count(d => d._1 >= cut && !d._2).toLong
    val fn = docs.count(d => d._1 < cut && d._2).toLong
    assert(mid.getLong(mid.fieldIndex("tp")) == tp)
    assert(mid.getLong(mid.fieldIndex("fp")) == fp)
    assert(mid.getLong(mid.fieldIndex("fn")) == fn)
    assert(mid.getLong(mid.fieldIndex("f1_micro")) ==
      1000000L * 2 * tp / (2 * tp + fp + fn))
  }
}
