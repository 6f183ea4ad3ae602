package graft

import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("token counts: ws tokens == regex tokens on space-delimited soup") {
    val rows = run("q_text_tokens").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"doc ${r.getLong(0)}")
      assert(r.getInt(3) == r.getLong(4), "n_chars metadata mismatch")
    }
  }

  test("tf/df: df <= tf_global and df <= corpus size") {
    val n = Tables.documents(spark, sf).count()
    run("q_text_tf").collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(2) <= n)
    }
  }

  test("tfidf: 3 ranked terms per doc, scores non-increasing") {
    val byDoc = run("q_text_tfidf").collect().groupBy(_.getLong(0))
    assert(byDoc.size == 20)
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      val scores = sorted.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("quality score components stay in [0,1]") {
    run("q_text_quality").collect().foreach { r =>
      val score = r.getDouble(r.fieldIndex("quality_score"))
      assert(score >= 0.0 && score <= 1.0)
      val stop = r.getDouble(r.fieldIndex("stop_ratio"))
      assert(stop >= 0.0 && stop <= 1.0)
    }
  }

  test("inverted index covers the whole vocabulary, postings sum to token count") {
    val idx = run("q_text_inverted_index").collect()
    val totalPostings = idx.map(_.getLong(2)).sum
    val totalTokens = Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(totalPostings == totalTokens)
  }

  test("fingerprint: identical docs would collide (hash is content-pure)") {
    // same text --> same fingerprint: verify by fingerprinting a
    // self-unioned corpus and checking per-doc stability
    val fp1 = run("q_text_fingerprint").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fp2 = run("q_text_fingerprint").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp1 == fp2)
  }

  test("chunking: windows cover every token, overlap = stride, no shuffle") {
    val df = run("q_text_chunk")
    val rows = df.collect()
    // chunk 0 exists for every doc and the first chunk starts at token 1
    val docs = Tables.documents(spark, sf)
    assert(rows.count(_.getLong(1) == 0L) == docs.count())
    // total chunk tokens == sum over docs of ceil-style coverage:
    // every token is in 1 or 2 windows; verify per-doc token coverage
    // for one doc: reconstruct chunk starts
    val one = rows.filter(_.getLong(0) == rows.head.getLong(0))
      .sortBy(_.getLong(1))
    one.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == i.toLong) // contiguous chunk ids
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "chunking must be map-only")
  }

  test("vocab/OOV: rates in [0,1], vocab words score zero OOV") {
    val rows = run("q_text_vocab_oov").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val rate = r.getDouble(r.fieldIndex("oov_rate"))
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getLong(r.fieldIndex("n_oov")) <=
        r.getLong(r.fieldIndex("n_tokens")))
    }
    // some docs must actually contain OOV tokens for the op to be real
    assert(rows.exists(_.getLong(rows.head.fieldIndex("n_oov")) > 0))
  }

  test("curation pipeline: composition equals stagewise manual result") {
    val rows = run("q_pipeline_curate").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // recompute stagewise with independent DataFrame code
    val kept = run("q_text_filter_policy").filter(col("keep"))
      .select("doc_id")
    val canon = Tables.documents(spark, sf)
      .groupBy(md5(col("text"))).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val expect = kept.join(canon, Seq("doc_id"))
      .join(Tables.embeddings(spark, sf), col("doc_id") === col("vec_id"))
      .groupBy(col("label")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows == expect)
    assert(rows.values.sum > 0)
  }

  test("filter policy: every doc judged, reasons consistent with signals") {
    val df = run("q_text_filter_policy")
    val rows = df.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val nTok = r.getLong(r.fieldIndex("n_tok"))
      val keep = r.getBoolean(r.fieldIndex("keep"))
      val reason = r.getString(r.fieldIndex("reason"))
      assert(keep == (reason == "ok"))
      if (reason == "too_short") assert(nTok < 20)
      if (reason == "too_long") assert(nTok > 90)
      if (reason == "ok") assert(nTok >= 20 && nTok <= 90)
    }
    // the gate must actually drop something and keep something
    assert(rows.exists(_.getBoolean(rows.head.fieldIndex("keep"))))
    assert(rows.exists(!_.getBoolean(rows.head.fieldIndex("keep"))))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "policy gate must be map-only")
  }

  test("indexed BM25: scores only stored posting rows, no corpus scan, equals rebuild path") {
    val df = run("q_text_bm25_indexed")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftObjectScan"),
      s"must read the stored index:\n${plan.take(600)}")
    // retrieval cost ∝ posting lists: the documents table (and hence
    // tokenize/explode/df aggregation) must be absent from the plan
    assert(!plan.contains("documents"),
      "indexed BM25 must not scan the documents table")
    assert(!plan.toLowerCase.contains("explode"),
      "indexed BM25 must not re-tokenize at query time")
    // term-IN probes reach the postings scan as pushed filters (the
    // postings objects are term-ranged, so footer min/max prunes)
    assert(plan.contains("PushedFilters: [In(term") ||
      plan.contains("In(term,"),
      s"term probe must push into the postings scan:\n${plan.take(1200)}")
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val ref = run("q_text_bm25_topk").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == ref, "stored-index BM25 must equal the corpus-rebuild path")
  }

  test("sequence packing: bins partition the corpus, budget respected at starts") {
    val rows = run("q_text_pack_sequences").collect()
    val totalDocs = rows.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
    // within each shard, bins are contiguous 0..maxBin (streaming fill
    // never skips a bin: each bin ends only when the next doc starts
    // past its boundary)
    rows.groupBy(_.getString(0)).foreach { case (shard, rs) =>
      val bins = rs.map(_.getLong(rs.head.fieldIndex("bin"))).sorted
      assert(bins.head == 0L, s"shard $shard first bin ${bins.head}")
      assert(bins.toSet == (0L to bins.last).toSet,
        s"shard $shard has gaps: ${bins.mkString(",")}")
    }
  }
}
