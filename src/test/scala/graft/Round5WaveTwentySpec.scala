package graft

import org.apache.spark.sql.functions._

/** Round-5 twentieth wave: Benford first-digit audit and
  * query-by-image pHash search. */
class Round5WaveTwentySpec extends SparkSpec {

  test("benford: digits partition the table, deviations exact") {
    val rows = run("q_agg_benford").collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "every row lands in exactly one digit bucket")
    val benford = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
      8 -> 51153L, 9 -> 45757L)
    rows.foreach { r =>
      val d = r.getInt(0); val n = r.getLong(1)
      val freq = r.getLong(2)
      assert(d >= 1 && d <= 9)
      assert(freq == 1000000L * n / total)
      assert(r.getInt(3).toLong == benford(d))
      assert(r.getLong(4) == math.abs(freq - benford(d)))
    }
  }

  test("phash search: exact hamming rank against an independent recount") {
    val rows = run("q_mm_phash_search").collect()
    assert(rows.length == 5)
    // recompute every hash with the SAME decode kernel but rank
    // independently (search plan: scan + TakeOrdered; this: full sort)
    val hashes = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => id -> graft.operators.Multimodal.aHashBmp(
        graft.operators.Multimodal.synthBmpPattern(id)))
      .toMap
    val qh = hashes(0L)
    val expected = hashes.toSeq.filter(_._1 != 0L)
      .map { case (id, h) => (id, java.lang.Long.bitCount(h ^ qh)) }
      .sortBy { case (id, d) => (d, id) }.take(5)
    val got = rows.map(r => (r.getLong(0), r.getInt(1))).toSeq
      .sortBy { case (id, d) => (d, id) }
    assert(got == expected)
    // the fixture must exercise a non-trivial ranking (not all zero)
    assert(expected.map(_._2).distinct.length >= 2 ||
      expected.forall(_._2 == 0))
  }
}
