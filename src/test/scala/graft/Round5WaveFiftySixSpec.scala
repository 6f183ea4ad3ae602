package graft

import org.apache.spark.sql.functions._

/** Round-5 fifty-sixth wave: dedup ROI report, outage detection. */
class Round5WaveFiftySixSpec extends SparkSpec {

  test("savings: tiers nest (near <= exact <= total); exact recount") {
    val rows = run("q_dedup_savings").collect()
    assert(rows.length == 1)
    val r = rows.head
    val nDocs = r.getLong(r.fieldIndex("n_docs"))
    val nExact = r.getLong(r.fieldIndex("n_exact"))
    val nNear = r.getLong(r.fieldIndex("n_near"))
    assert(nNear <= nExact && nExact <= nDocs)
    val tc = r.getLong(r.fieldIndex("total_chars"))
    val ec = r.getLong(r.fieldIndex("exact_chars"))
    val nc = r.getLong(r.fieldIndex("near_chars"))
    assert(nc <= ec && ec <= tc)
    // exact-tier recount from md5 groups
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "md5(text) AS h",
        "CAST(length(text) AS LONG) AS chars").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(nDocs == docs.length.toLong)
    assert(tc == docs.map(_._3).sum)
    val groups = docs.groupBy(_._2)
    assert(nExact == groups.size.toLong)
    assert(ec == groups.values.map(_.map(_._3).max).sum)
    assert(r.getLong(r.fieldIndex("exact_savings_micro")) ==
      1000000L * (tc - ec) / tc)
    assert(r.getLong(r.fieldIndex("near_savings_micro")) ==
      1000000L * (tc - nc) / tc)
    // the fixture plants duplicates: savings must be non-trivial
    assert(nExact < nDocs || nNear < nExact)
  }

  test("outages: every reported gap clears the 6x-median cut; planted gap found") {
    val rows = run("q_ts_outages").collect()
    val gaps = Tables.events(spark, sf)
      .selectExpr("event_type", "event_id", "CAST(ts AS LONG) AS sec")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      .groupBy(_._1).map { case (t, xs) =>
        val sorted = xs.sortBy(e => (e._3, e._2))
        t -> sorted.sliding(2).filter(_.length == 2)
          .map(p => (p(0)._3, p(1)._3, p(1)._3 - p(0)._3)).toSeq
      }
    rows.foreach { r =>
      val t = r.getString(0)
      val gs = gaps(t).map(_._3).sorted
      val n = gs.length
      val med2 = gs((n + 1) / 2 - 1) + gs((n + 2) / 2 - 1)
      assert(r.getLong(r.fieldIndex("med2")) == med2, t)
      val gap = r.getLong(r.fieldIndex("gap"))
      assert(gap * 2 > med2 * 6, s"$t reported a non-outage")
      assert(r.getLong(r.fieldIndex("severity_x10")) ==
        (10L * 2 * gap) / math.max(med2, 1L))
    }
    // completeness: reported set == recount of the same cut
    val expected = gaps.flatMap { case (t, gs) =>
      val sorted = gs.map(_._3).sorted
      val n = sorted.length
      val med2 = sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1)
      gs.filter(_._3 * 2 > med2 * 6).map(g => (t, g._1, g._2))
    }.toSet
    val got = rows.map(r => (r.getString(0),
      r.getLong(r.fieldIndex("gap_start")),
      r.getLong(r.fieldIndex("gap_end")))).toSet
    assert(got == expected)
    // plant a 100x-median outage through the same expressions
    val sess = spark
    import sess.implicits._
    val base = (1 to 50).map(i => ("t", i.toLong, i * 100L)) :+
      (("t", 51L, 50 * 100L + 10000L))
    val ev = base.toDF("event_type", "event_id", "sec")
    val planted = ev.withColumn("prev",
        lag(col("sec"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("sec"), col("event_id"))))
      .filter(col("prev").isNotNull)
      .withColumn("gap", col("sec") - col("prev"))
      .collect()
    val pg = planted.map(_.getLong(planted.head.fieldIndex("gap"))).sorted
    val pmed2 = pg((pg.length + 1) / 2 - 1) + pg((pg.length + 2) / 2 - 1)
    assert(pg.max * 2 > pmed2 * 6, "planted outage must clear the cut")
  }
}
