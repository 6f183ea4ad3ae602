package graft

/** Round-5 sixth wave: bounded BFS / Bellman-Ford over the trade
  * graph, Markov transitions, CUSUM drift scan, higher moments,
  * greedy bigram-LM decoding, MaxSim late interaction. Exactness is
  * the DuckDB oracle; these pin the structural invariants. */
class Round5WaveSixSpec extends SparkSpec {

  test("bfs: source at 0 hops, all distances within the round bound") {
    val rows = run("q_graph_bfs_hops").collect()
    assert(rows.length == 25)
    val hops = rows.flatMap { r =>
      val i = r.fieldIndex("hops")
      if (r.isNullAt(i)) None
      else Some(r.getLong(r.fieldIndex("node")) -> r.getLong(i))
    }.toMap
    assert(hops(0L) == 0L, "source distance")
    assert(hops.values.forall(d => d >= 0 && d <= 6))
    assert(hops.count(_._2 == 0L) == 1, "only the source is at 0")
  }

  test("bellman-ford: cost 0 at source, bounded by 1e6 per BFS hop") {
    val bf = run("q_graph_bellman_ford").collect()
      .flatMap { r =>
        val i = r.fieldIndex("min_cost")
        if (r.isNullAt(i)) None
        else Some(r.getLong(r.fieldIndex("node")) -> r.getLong(i))
      }.toMap
    val hops = run("q_graph_bfs_hops").collect()
      .flatMap { r =>
        val i = r.fieldIndex("hops")
        if (r.isNullAt(i)) None
        else Some(r.getLong(r.fieldIndex("node")) -> r.getLong(i))
      }.toMap
    assert(bf(0L) == 0L)
    assert(bf.keySet == hops.keySet, "same reachable set within 6 rounds")
    hops.foreach { case (n, h) =>
      assert(bf(n) <= 1000000L * h,
        s"node $n: a min-cost route can't beat every edge costing 1e6")
    }
  }

  test("markov: rational rows normalize to ~1e6 per source, rnk 1 is argmax") {
    val rows = run("q_ts_markov").collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (src, rs) =>
      val total = rs.map(_.getLong(rs.head.fieldIndex("p_micro"))).sum
      assert(total <= 1000000L && total > 1000000L - rs.length,
        s"$src: floor-division rows must sum to 1e6 minus < |dsts|")
      val byRank = rs.sortBy(_.getInt(rs.head.fieldIndex("rnk")))
      val counts = byRank.map(_.getLong(rs.head.fieldIndex("c")))
      assert(counts.toSeq == counts.toSeq.sorted.reverse, s"$src: rnk follows count")
    }
  }

  test("cusum: peak is the absolute extreme, bounds ordered") {
    val rows = run("q_ts_cusum").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sMax = r.getLong(r.fieldIndex("s_max"))
      val sMin = r.getLong(r.fieldIndex("s_min"))
      val peak = r.getLong(r.fieldIndex("peak_s"))
      assert(sMin <= sMax)
      assert(math.abs(peak) == math.max(math.abs(sMax), math.abs(sMin)),
        "peak row carries the max |S|")
      assert(r.getLong(r.fieldIndex("n")) > 0)
    }
  }

  test("skew/kurt: near-uniform quantity has ~0 skew, platykurtic tail") {
    val rows = run("q_agg_skew_kurt").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("variance")) > 0)
      val sk = r.getDouble(r.fieldIndex("skewness"))
      val ku = r.getDouble(r.fieldIndex("kurtosis_excess"))
      // quantity is drawn ~uniform on 1..50: skew ≈ 0, excess ≈ -1.2
      assert(math.abs(sk) < 0.5, s"skew $sk")
      assert(ku > -2.0 && ku < 1.0, s"excess kurtosis $ku")
    }
  }

  test("lm generate: consecutive steps from 0, deterministic greedy walk") {
    val rows = run("q_text_lm_generate").collect()
      .map(r => r.getInt(r.fieldIndex("step")) -> r.getString(r.fieldIndex("tok")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (0 until rows.length))
    assert(rows.forall(_._2.nonEmpty))
    // greedy decoding is a function: re-running yields identical output
    val again = run("q_text_lm_generate").collect()
      .map(r => r.getInt(r.fieldIndex("step")) -> r.getString(r.fieldIndex("tok")))
      .sortBy(_._1)
    assert(rows.toSeq == again.toSeq)
  }

  test("maxsim: every doc scored against all 3 query tokens, score in [-3, 3]") {
    val rows = run("q_sim_maxsim").collect()
    assert(rows.length == 10, "one row per label group")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_terms")) == 3L)
      val sc = r.getDouble(r.fieldIndex("maxsim"))
      assert(sc >= -3.0 && sc <= 3.0 + 1e-9, s"score $sc")
    }
  }
}
