package graft

import org.apache.spark.sql.functions._

/** Round-6 third wave: source TV divergence, the quantile-band gate,
  * and the streaming quantile twin. */
class Round6WaveThreeSpec extends SparkSpec {

  test("source divergence: symmetric-free pairs, TV bounds, self-check") {
    val rows = run("q_text_source_divergence").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv2 = r.getLong(3)
      // 0 ≤ TV ≤ 1 ⇒ 0 ≤ tv2_micro ≤ 2e6 (floor-div slack below 0 none)
      assert(tv2 >= 0L && tv2 <= 2000000L, s"tv2 $tv2")
      assert(r.getString(0) < r.getString(1), "canonical pair order")
    }
    // recount one pair against scala unigram distributions
    val r0 = rows.minBy(r => (r.getString(0), r.getString(1)))
    val (sa, sb) = (r0.getString(0), r0.getString(1))
    def dist(src: String): Map[String, Long] = {
      val counts = Tables.documents(spark, sf)
        .filter(col("source") === src)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val n = counts.map(_._2).sum
      counts.map { case (w, c) => w -> 1000000L * c / n }.toMap
    }
    val (pa, pb) = (dist(sa), dist(sb))
    val smin = pa.keySet.intersect(pb.keySet).toSeq
      .map(w => math.min(pa(w), pb(w))).sum
    assert(r0.getLong(3) == pa.values.sum + pb.values.sum - 2 * smin)
  }

  test("quantile gate: band is exact P05/P95, classification recounts") {
    val rows = run("q_agg_quantile_gate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val vs = Tables.events(spark, sf)
        .filter(col("event_type") === et)
        .select(expr("CAST(floor(value) AS BIGINT)"))
        .collect().map(_.getLong(0))
      val sorted = vs.sorted
      def q(pm: Long) =
        sorted((math.max(1L, (pm * vs.length + 999999L) / 1000000L) - 1).toInt)
      assert(r.getLong(4) == q(50000L), s"$et p05")
      assert(r.getLong(5) == q(950000L), s"$et p95")
      assert(r.getLong(2) == vs.count(_ < r.getLong(4)), s"$et below")
      assert(r.getLong(3) == vs.count(_ > r.getLong(5)), s"$et above")
      // a [P05,P95] gate keeps ~90% — sanity band
      assert(r.getLong(6) >= 850000L && r.getLong(6) <= 960000L)
    }
  }

  test("streaming quantile twin equals the batch sketch row-for-row") {
    val batch = run("q_agg_quantile_sketch").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val stream = run("q_stream_quantile").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(batch == stream)
  }
}
