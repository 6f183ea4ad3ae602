package graft

/** Round-8 rows: seeded-strip spatial join (the sf1-feasible quadratic
  * oracle) and the zipf(2)-key skew pair (salted vs AQE routes). */
class Round8SkewStripSpec extends SparkSpec {

  test("strip spatial: grid plan equals brute recount on the seeded strips") {
    val rows = run("q_join_spatial_grid_strip").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pts = Tables.events(spark, sf).select("event_id", "user_id", "value")
      .collect().map { r =>
        val px = math.floor(r.getDouble(2) * 100d).toLong % 1000L
        val py = r.getLong(1) % 1000L + (r.getLong(1) / 10000000L) * 1000L
        (r.getLong(0), px, py)
      }
      .filter { case (_, px, _) => (px / 40L) % 10L == 7L }
    val brute = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (ia, xa, ya) = pts(i); val (ib, xb, yb) = pts(j)
      val cheb = math.max(math.abs(xa - xb), math.abs(ya - yb))
      if (cheb <= 2 && ia != ib) brute(cheb) += 1
    }
    assert(rows == brute.toMap, s"got $rows expected $brute")
    assert(pts.nonEmpty, "seeded strips hold fixture points")
  }

  test("zipf skew pair: salted and AQE routes agree; key 1 is the hot key") {
    val salted = run("q_skew_zipf_salted_join").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val aqe = run("q_skew_zipf_aqe_join").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val shuffled = run("q_skew_zipf_shuffle_join").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(salted == aqe, "salting must be result-transparent")
    assert(salted == shuffled, "forced-shuffle route must be result-transparent")
    val total = salted.values.map(_._1).sum
    val hot = salted(1L)._1
    // zkey = D div (u+1): key 1 covers u+1 in (D/2, D] — half the rows
    assert(hot * 2 >= total * 9 / 10 && hot * 2 <= total * 11 / 10,
      s"zipf(2) hot key should carry ~50% of rows: $hot of $total")
    // every key's n_events equals its dim-side key_total (same derivation)
    salted.foreach { case (k, (n, _, keyTotal)) =>
      assert(n == keyTotal, s"key $k: joined count $n != dim total $keyTotal")
    }
  }
}
