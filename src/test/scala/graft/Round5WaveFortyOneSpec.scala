package graft

import org.apache.spark.sql.functions._

/** Round-5 forty-first wave: Brier score, cohort LTV, calendar
  * heatmap. */
class Round5WaveFortyOneSpec extends SparkSpec {

  test("brier: mean squared probability error matches a recount") {
    val rows = run("q_eval_brier").collect()
    val docs = Tables.documents(spark, sf)
      .select("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0),
        math.min(1000000L, 1000000L * r.getLong(1) / 1000L),
        if (r.getString(2) == "en") 1000000L else 0L))
    rows.foreach { r =>
      val src = r.getString(0)
      val d = docs.filter(_._1 == src)
      val se = d.map(x => (x._2 - x._3) * (x._2 - x._3)).sum
      assert(r.getLong(r.fieldIndex("n")) == d.length.toLong)
      assert(r.getLong(r.fieldIndex("brier_micro")) ==
        se / (d.length * 1000000L), src)
      assert(r.getLong(r.fieldIndex("brier_micro")) <= 1000000L)
    }
  }

  test("ltv: cumulative per-user value matches a recount") {
    val rows = run("q_agg_cohort_ltv").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime / 1000L,
        math.floor(r.getDouble(3) * 100d).toLong))
    val su = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val cohortOf = su.map { case (u, s) => u -> s / 604800L }
    val sizes = cohortOf.groupBy(_._2)
      .map { case (c, xs) => c -> xs.size.toLong }
    val cells = ev.filter(e => e._2 == "purchase" && su.contains(e._1)
        && e._3 >= su(e._1))
      .map(e => ((cohortOf(e._1), (e._3 - su(e._1)) / 604800L), e._4))
      .filter(_._1._2 <= 3L)
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    rows.foreach { r =>
      val c = r.getLong(0); val a = r.getLong(1)
      assert(r.getLong(r.fieldIndex("n_users")) == sizes(c))
      assert(r.getLong(r.fieldIndex("rev_centi")) == cells((c, a)))
      val cum = cells.filter(x => x._1._1 == c && x._1._2 <= a)
        .values.sum
      assert(r.getLong(r.fieldIndex("cum_centi")) == cum)
      assert(r.getLong(r.fieldIndex("ltv_centi_per_user")) ==
        cum / sizes(c))
    }
    // LTV is nondecreasing with age within a cohort
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val byAge = g.sortBy(_.getLong(1))
        .map(_.getLong(g.head.fieldIndex("cum_centi")))
      assert(byAge.zip(byAge.tail).forall { case (x, y) => y >= x })
    }
  }

  test("calendar heatmap: ISO weekday cells match a recount") {
    val rows = run("q_ts_cal_heatmap").collect()
    val ev = Tables.events(spark, sf).select("ts", "value").collect()
      .map { r =>
        val inst = java.time.Instant.ofEpochMilli(r.getTimestamp(0).getTime)
          .atZone(java.time.ZoneOffset.UTC)
        (inst.getDayOfWeek.getValue.toLong, inst.getHour.toLong,
          math.floor(r.getDouble(1)).toLong)
      }
    val cells = ev.groupBy(e => (e._1, e._2))
    assert(rows.length == cells.size) // only populated cells appear
    val dowTot = ev.groupBy(_._1).map { case (d, xs) => d -> xs.length.toLong }
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val mine = cells(key)
      assert(r.getLong(r.fieldIndex("n")) == mine.length.toLong)
      assert(r.getLong(r.fieldIndex("sum_u")) == mine.map(_._3).sum)
      assert(r.getLong(r.fieldIndex("dow_share_micro")) ==
        1000000L * mine.length / dowTot(key._1))
    }
  }
}
