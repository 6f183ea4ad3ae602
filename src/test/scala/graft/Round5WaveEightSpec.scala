package graft

/** Round-5 eighth wave: KWIC concordance, windowed co-occurrence, MAD
  * robust outliers, kNN neighbor graph. Exactness is the DuckDB
  * oracle; these pin the structural invariants. */
class Round5WaveEightSpec extends SparkSpec {

  test("kwic: every window contains the term, 3..5 tokens, position sane") {
    val rows = run("q_text_kwic").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ctx = r.getString(r.fieldIndex("context")).split(" ")
      assert(ctx.contains("spark"), "window must contain the keyword")
      assert(ctx.length >= 3 && ctx.length <= 5,
        s"±2 window is 3..5 tokens, got ${ctx.length}")
      assert(r.getInt(r.fieldIndex("pos")) >= 0)
    }
  }

  test("cooccur: top-20 by count, support gate, canonical pair order") {
    val rows = run("q_text_cooccur").collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(rows.head.fieldIndex("c")))
    assert(counts.forall(_ >= 10), "min-support gate")
    assert(counts.toSeq == counts.toSeq.sorted.reverse, "count-ordered")
    rows.foreach { r =>
      assert(r.getString(r.fieldIndex("w1")) <= r.getString(r.fieldIndex("w2")),
        "unordered pairs are canonicalized")
    }
  }

  test("mad outliers: scaled medians consistent, outliers are a small tail") {
    val rows = run("q_agg_mad_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n"))
      val med2 = r.getLong(r.fieldIndex("med2"))
      val mad4 = r.getLong(r.fieldIndex("mad4"))
      val out = r.getLong(r.fieldIndex("n_outliers"))
      assert(med2 >= 0 && med2 <= 2L * 56100, "median within the cents range")
      assert(mad4 >= 0)
      assert(out >= 0 && out * 10 < n,
        s"robust cut should flag a tail, not ${out} of $n")
    }
  }

  test("knn graph: 3 distinct neighbors each, reciprocity in [0,3], some symmetry") {
    val rows = run("q_sim_knn_graph").collect()
    assert(rows.length == 500)
    var mutualTotal = 0L
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("vec_id"))
      val nbs = Seq("nb1", "nb2", "nb3").map(c => r.getLong(r.fieldIndex(c)))
      assert(nbs.distinct.length == 3, "three distinct neighbors")
      assert(!nbs.contains(id), "no self loops")
      val m = r.getLong(r.fieldIndex("n_mutual"))
      assert(m >= 0 && m <= 3)
      mutualTotal += m
    }
    assert(mutualTotal > 0, "a cosine kNN graph always has some mutual edges")
  }
}
