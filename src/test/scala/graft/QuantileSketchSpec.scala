package graft

import org.apache.spark.sql.functions._

/** Native KLL-style quantile sketch: exact below cap, merge-order
  * invariant, bounded rank error in the collapse regime. */
class QuantileSketchSpec extends SparkSpec {

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int,
      pm: String): Array[Long] = {
    graft.functions.GraftFunctions.register(spark)
    df.agg(expr(s"quantile_sketch(v, $cap, '$pm')").as("qs"))
      .select(col("qs")).collect().head
      .getSeq[Long](0).toArray
  }

  test("exact below cap: equals the integer-exact rank quantile") {
    val vals = (1L to 5000L).map(i => (i * 37) % 1000)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("v")
    val got = sketch(df.repartition(7), 100000, "250000,500000,900000")
    val sorted = vals.sorted
    def exact(pm: Long): Long =
      sorted((math.max(1L, (pm * vals.length + 999999L) / 1000000L) - 1L).toInt)
    assert(got.toSeq == Seq(exact(250000), exact(500000), exact(900000)))
  }

  test("merge-order invariance below cap: any partitioning, same result") {
    val vals = (1L to 3000L).map(i => (i * i) % 7919)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("v")
    val a = sketch(df.repartition(1), 4096, "500000")
    val b = sketch(df.repartition(13), 4096, "500000")
    val c = sketch(df.repartition(32), 4096, "500000")
    assert(a.toSeq == b.toSeq && b.toSeq == c.toSeq)
  }

  test("collapse regime: bounded rank error at cap 64 over 10k values") {
    val n = 10000
    val vals = (1 to n).map(i => ((i * 2654435761L) % 100000))
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("v")
    val got = sketch(df.repartition(8), 64, "500000")
    val sorted = vals.sorted
    val trueRank = sorted.count(_ <= got(0))
    // deterministic compaction: error ≤ ~levels·N/cap; generous 2000
    assert(math.abs(trueRank - n / 2) <= 2000,
      s"median rank off by ${math.abs(trueRank - n / 2)}")
  }

  test("nulls are ignored; per-group exactness via the registry query") {
    val rows = run("q_agg_quantile_sketch").collect()
    assert(rows.length > 0 && rows.length % 4 == 0)
    // recount one group end-to-end
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (et, rs) =>
      val vs = Tables.events(spark, sf)
        .filter(col("event_type") === et && col("value").isNotNull)
        .select(expr("CAST(floor(value) AS BIGINT)"))
        .collect().map(_.getLong(0)).sorted
      val pms = Map(0 -> 250000L, 1 -> 500000L, 2 -> 750000L, 3 -> 900000L)
      rs.foreach { r =>
        val pm = pms(r.getInt(1))
        val target = math.max(1L, (pm * vs.length + 999999L) / 1000000L)
        assert(r.getLong(2) == vs((target - 1).toInt), s"$et pos ${r.getInt(1)}")
      }
    }
  }
}
