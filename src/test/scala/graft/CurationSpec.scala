package graft

import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private def executedPlan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("repetition: fractions in [0,1], keep consistent with thresholds") {
    val rows = run("q_text_repetition").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val wr = r.getDouble(1); val t2 = r.getDouble(2); val d3 = r.getDouble(3)
      assert(wr >= 0 && wr <= 1 && t2 >= 0 && t2 <= 1 && d3 >= 0 && d3 <= 1)
      assert(r.getBoolean(4) == (wr <= 0.6 && t2 <= 0.05))
    }
  }

  test("repetition plan: profile built in two keyed aggregations, no extra corpus scan") {
    // one scan of documents feeds the whole query (the three gram sizes
    // come out of ONE flatten, not three explodes over three scans)
    val plan = executedPlan("q_text_repetition")
    val scans = "documents".r.findAllIn(plan.toLowerCase).size
    assert("Scan".r.findAllIn(plan).size <= 2, s"unexpected extra scans:\n${plan.take(600)}")
    assert(scans >= 1)
  }

  test("decontam: benchmark docs excluded, hits broadcast-joined") {
    val out = run("q_text_decontam")
    assert(out.filter(col("doc_id") % 97 === 0).count() == 0)
    // eval-set gram list must arrive by broadcast, never a corpus
    // shuffle on the gram key
    val plan = executedPlan("q_text_decontam")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast gram join:\n${plan.take(600)}")
    // a contaminated doc really shares a trigram with the bench set
    val contaminated = out.filter(col("contaminated")).count()
    val clean = out.filter(!col("contaminated")).count()
    assert(contaminated + clean == out.count())
  }

  test("pii: planted classes detected exactly; redaction shortens flagged docs only") {
    val rows = run("q_text_pii").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 7 == 0) 1L else 0L), s"emails doc $id")
      assert(r.getLong(2) == (if (id % 11 == 0) 1L else 0L), s"phones doc $id")
      assert(r.getLong(3) == (if (id % 13 == 0) 1L else 0L), s"ips doc $id")
      assert(r.getBoolean(5) == (id % 7 == 0 || id % 11 == 0 || id % 13 == 0))
    }
  }

  test("pii plan: map-only, zero exchanges") {
    val plan = executedPlan("q_text_pii")
    assert(!plan.contains("Exchange"), s"PII scan must not shuffle:\n${plan.take(600)}")
  }

  test("canonical: one representative per cluster, the longest member") {
    val canon = run("q_dedup_canonical").collect()
    val clusters = run("q_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2)
    assert(canon.length == byCluster.size, "one row per cluster")
    val nChars = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    canon.foreach { r =>
      val cid = r.getLong(0); val keep = r.getLong(1)
      val members = byCluster(cid).map(_._1)
      assert(members.contains(keep))
      assert(r.getLong(3) == members.length, "n_members")
      // the kept doc maximizes (n_chars, -doc_id) over the cluster
      val best = members.maxBy(d => (nChars(d), -d))
      assert(keep == best, s"cluster $cid kept $keep expected $best")
    }
  }

  test("semantic dedup: kept iff component minimum; planted triples clustered") {
    val out = run("q_sim_semantic_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.nonEmpty)
    out.foreach { case (vec, cid, kept) =>
      assert(cid <= vec)
      assert(kept == (vec == cid))
    }
    // every planted triple {q, q+10000 exact clone, q+20000 perturbed
    // near-clone} lands in one cluster labeled q, with only q kept
    val byId = out.map(t => t._1 -> t).toMap
    (0L until 20L).foreach { q =>
      Seq(q, q + 10000, q + 20000).foreach { v =>
        assert(byId.contains(v), s"vector $v missing from semantic dedup output")
        assert(byId(v)._2 == q, s"vector $v labeled ${byId(v)._2}, expected $q")
        assert(byId(v)._3 == (v == q))
      }
    }
  }

  test("semantic dedup edges: banded equi-join plan, never an all-pairs scan") {
    val plan = graft.operators.Curation.semanticEdges(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"edge generation must be an equi-join on the band key:\n${plan.take(800)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"expected a hash-keyed join on (band, value):\n${plan.take(800)}")
  }

  test("semantic dedup recall precondition: planted pairs within band-guarantee hamming") {
    // The 4×4-bit band split guarantees candidate generation for pairs
    // at bucket hamming ≤ 3 (pigeonhole). Assert every planted pair is
    // inside that envelope — the condition that makes the banded edge
    // set EXACTLY reproduce the all-pairs oracle on this fixture.
    import graft.functions.VectorOps
    val e = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 20)
      .withColumn("b0", VectorOps.rhpBucket(col("embedding"), 64, 16))
      .withColumn("pe", transform(col("embedding"), (x, i) =>
        when(i < 8, x * lit(1.5f)).otherwise(x)))
      .withColumn("b2", VectorOps.rhpBucket(col("pe"), 64, 16))
      .select(col("vec_id"), col("b0"), col("b2")).collect()
    assert(e.length == 20)
    var nonZero = 0
    e.foreach { r =>
      val ham = java.lang.Long.bitCount(r.getLong(1) ^ r.getLong(2))
      assert(ham <= 3, s"vec ${r.getLong(0)}: near-clone hamming $ham breaks the band guarantee")
      if (ham > 0) nonZero += 1
    }
    // the perturbation must actually move buckets for some vectors —
    // otherwise the test only proves hash equality, not the band path
    assert(nonZero >= 3, s"only $nonZero perturbed buckets differ; band path not exercised")
  }

  test("lm_score probe joins on salted gram keys (Zipf-skew spread)") {
    val plan = run("q_text_lm_score").queryExecution.executedPlan.toString
    // both probe joins must carry the salt in their equi-key list so a
    // hot gram spans LmSalt reducers instead of one
    val joinKeyLines = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("prev")).toSeq
    assert(joinKeyLines.nonEmpty, s"no gram joins found:\n${plan.take(600)}")
    joinKeyLines.foreach { l =>
      assert(l.contains("salt"), s"gram join missing salt key: $l")
    }
  }

  test("weighted mix: quotas honored per source, hash-deterministic") {
    val out = run("q_sample_weighted_mix")
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, n) =>
      val quota = src match {
        case "src0" | "src1" | "src2" => 10L
        case "src3" | "src4"          => 5L
        case _                        => 2L
      }
      assert(n <= quota, s"$src over quota: $n > $quota")
    }
    // deterministic: two runs produce the identical selection
    val a = out.collect().map(_.getLong(2)).sorted.toSeq
    val b = run("q_sample_weighted_mix").collect().map(_.getLong(2)).sorted.toSeq
    assert(a == b)
  }

  test("weighted mix plan: single exchange (the stratum window), no global sort") {
    val plan = executedPlan("q_sample_weighted_mix")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected one stratum exchange (+AQE read), got $exchanges:\n${plan.take(600)}")
  }
}
