package graft

import org.apache.spark.sql.functions._

/** Round-6 fifth wave: equi-depth bins, holdout n-gram coverage,
  * Mann–Kendall trend test. */
class Round6WaveFiveSpec extends SparkSpec {

  test("quantile bins: equi-depth masses, ordered disjoint ranges") {
    val rows = run("q_agg_quantile_bins").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      val byBin = rs.sortBy(_.getLong(1))
      assert(byBin.map(_.getLong(1)).toSeq == (0L until byBin.length))
      val total = byBin.map(_.getLong(2)).sum
      // equi-depth: every bin holds 15–35% of the mass (exact-quartile
      // boundaries put ~25% in each; duplicates skew a little)
      byBin.foreach { b =>
        val share = b.getLong(2).toDouble / total
        assert(share > 0.10 && share < 0.45, s"$et bin ${b.getLong(1)} $share")
        assert(b.getLong(3) <= b.getLong(4)) // min <= max
      }
      // ranges are ordered across bins
      byBin.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(3))
        case _ =>
      }
    }
  }

  test("ngram coverage: bounds hold, recounts on one language") {
    val rows = run("q_text_ngram_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "covered <= eval shingles")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
      assert(r.getLong(4) == 1000000L * r.getLong(3) / r.getLong(2))
    }
    // spot recount: total eval docs match the deterministic holdout
    val evalDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 19 === 0).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == evalDocs(r.getString(0))))
  }

  test("mann-kendall: S recounts on one type; z flags match sign") {
    val rows = run("q_ts_mann_kendall").collect()
    assert(rows.nonEmpty)
    val r0 = rows.minBy(_.getString(0))
    val grid = Tables.events(spark, sf)
      .filter(col("event_type") === r0.getString(0))
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(expr("sum(CAST(floor(value) AS BIGINT)) div count(1)").as("y"))
      .orderBy(col("h"))
      .collect().map(_.getLong(1))
    var sStat = 0L
    for (i <- grid.indices; j <- (i + 1) until grid.length)
      sStat += java.lang.Long.signum(grid(j) - grid(i))
    assert(r0.getLong(2) == sStat, "S statistic recount")
    assert(r0.getLong(1) == grid.length)
    // variance positive, z sign agrees with S
    assert(r0.getLong(3) > 0L)
    assert(math.signum(r0.getDouble(4)) == math.signum(sStat.toDouble) ||
      sStat == 0L)
  }
}
