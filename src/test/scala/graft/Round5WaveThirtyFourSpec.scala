package graft

import org.apache.spark.sql.functions._

/** Round-5 thirty-fourth wave: drift gate, Bollinger bands,
  * ratio-to-report, change-feed-over-MoR hardening. */
class Round5WaveThirtyFourSpec extends SparkSpec {

  test("drift: chi-square vs reference matches a recount") {
    val rows = run("q_dq_drift").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("source", "n_chars")
      .collect().map(r => (r.getString(0),
        math.min(9L, r.getLong(1) / 200L)))
    val refSrc = docs.map(_._1).min
    val refBins = docs.filter(_._1 == refSrc).groupBy(_._2)
      .map { case (b, xs) => b -> xs.length.toLong }
    val nRef = refBins.values.sum
    rows.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      assert(src != refSrc, "reference never scores itself")
      val mine = docs.filter(_._1 == src).groupBy(_._2)
        .map { case (b, xs) => b -> xs.length.toLong }
      val nCand = mine.values.sum
      val chi2 = mine.map { case (b, obs) =>
        val refS = refBins.getOrElse(b, 0L) + 1L
        val d = nRef * obs - refS * nCand
        1000000L * d * d / (nRef * refS * nCand)
      }.sum
      assert(r.getLong(r.fieldIndex("n_cand")) == nCand, src)
      assert(r.getLong(r.fieldIndex("chi2_micro")) == chi2, src)
      assert(r.getBoolean(r.fieldIndex("drift_flag")) ==
        (chi2 > 16919000L))
    }
  }

  test("bollinger: bands match an isqrt recount") {
    val rows = run("q_ts_bollinger").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select("event_type", "ts", "value")
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime / 86400000L,
        math.floor(r.getDouble(2)).toLong))
    rows.foreach { r =>
      val t = r.getString(0)
      val grid = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (d, xs) => (d, xs.map(_._3).sum) }.sortBy(_._1)
      val day = r.getTimestamp(r.fieldIndex("day")).getTime / 86400000L
      val i = grid.indexWhere(_._1 == day)
      assert(i >= 13)
      val win = grid.slice(i - 13, i + 1).map(_._2)
      val s1 = win.sum; val s2 = win.map(x => x * x).sum
      val ma = s1 / 14; val v = (14 * s2 - s1 * s1) / 196
      val sd = math.floor(math.sqrt(v.toDouble)).toLong
      assert(r.getLong(r.fieldIndex("ma")) == ma)
      assert(r.getLong(r.fieldIndex("var_unit2")) == v)
      assert(r.getLong(r.fieldIndex("band_lo")) == ma - 2 * sd)
      assert(r.getLong(r.fieldIndex("band_hi")) == ma + 2 * sd)
      val tot = grid(i)._2
      assert(r.getBoolean(r.fieldIndex("breakout")) ==
        (tot > ma + 2 * sd || tot < ma - 2 * sd))
    }
  }

  test("ratio to report: shares match an exact-cents recount") {
    val rows = run("q_win_ratio_to_report").collect()
    assert(rows.length == 25)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(g.head.fieldIndex("rk"))).sorted.toSeq ==
        Seq(1, 2, 3, 4, 5))
      // ranks descend by cents
      val byRk = g.sortBy(_.getInt(g.head.fieldIndex("rk")))
      val cents = byRk.map(_.getLong(byRk.head.fieldIndex("cents")))
      assert(cents.zip(cents.tail).forall { case (a, b) => a >= b })
    }
    // share identities hold
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("seg_share_micro")) >=
        r.getLong(r.fieldIndex("tot_share_micro")))
    }
  }

  test("change feed over an MoR delete: net effect equals the row deletes") {
    import org.apache.spark.sql.sources.LessThanOrEqual
    import graft.sources.ObjectStoreMaintenance
    val dir = java.nio.file.Files.createTempDirectory("graft-dv-feed")
      .toString + "/t"
    spark.range(0, 100).selectExpr("id", "id * 2 AS v")
      .repartition(2)
      .write.format("graft-objects").mode("overwrite").save(dir)
    val v0 = graft.sources.GraftVersions.currentVersion(dir)
    ObjectStoreMaintenance.deleteMoR(dir, Array(LessThanOrEqual("id", 29L)))
    val v1 = graft.sources.GraftVersions.currentVersion(dir)
    // the rw commit streams pre-image deletes + post-image (DV-applied)
    // inserts; the NET change must be exactly the 30 deleted rows
    val feed = graft.sources.GraftVersions.changes(spark, dir, v0, v1)
    val byType = feed.groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("delete", 0L)
      - byType.getOrElse("insert", 0L) == 30L,
      s"net feed effect: $byType")
    // and the deleted ids net out to exactly 0..29
    val net = feed.groupBy(col("id"))
      .agg(sum(when(col("_change_type") === "delete", 1L)
        .otherwise(-1L)).as("d"))
      .filter(col("d") > 0L)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(net.toSeq == (0L to 29L).toSeq)
  }
}
