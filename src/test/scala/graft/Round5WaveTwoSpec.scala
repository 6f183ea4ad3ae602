package graft

import org.apache.spark.sql.functions._

/** Round-5 second wave: thresholded-graph connected components, 8-tap
  * EWMA, rolling distinct types, suffix stemming, the corpus data
  * card, the integer-exact correlation matrix, the recency-decay
  * score, and cosine range search. Exactness is the driver's DuckDB
  * oracle; these pin structural invariants and plan shapes. */
class Round5WaveTwoSpec extends SparkSpec {

  test("graph cc: labels are component minima; sizes sum to |V|") {
    val rows = run("q_graph_cc").collect()
    assert(rows.length == 25, "one row per nation")
    // every component label is itself a member node id, and the
    // labeled member set sizes agree with the reported comp_size
    val byComp = rows.groupBy(_.getLong(1))
    byComp.foreach { case (comp, members) =>
      assert(members.head.getLong(2) == members.length,
        s"component $comp reports size ${members.head.getLong(2)} but has ${members.length} members")
    }
    assert(byComp.values.map(_.length).sum == 25)
    // thresholding must actually cut the dense trade graph into more
    // than one component at fixture scale (singletons count)
    assert(byComp.size > 1, "2x-mean threshold left the graph fully connected")
  }

  test("ewma: equals value on a series head; stays within window min/max") {
    val df = run("q_ts_ewma")
    val rows = df.orderBy(col("user_id"), col("ts"), col("event_id")).collect()
    assert(rows.nonEmpty)
    val firstPerUser = rows.groupBy(_.getLong(0)).map(_._2.head)
    firstPerUser.foreach { r =>
      val v = r.getDouble(r.fieldIndex("value"))
      val e = r.getDouble(r.fieldIndex("ewma"))
      assert(math.abs(e - v) < 0.001,
        s"series head EWMA $e must equal its only observation $v")
    }
    // exactly one window pass: a single shuffle for the window + sort
    val shuffles = df.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Exchange"))
    assert(shuffles <= 1, s"EWMA should be one window pass, saw $shuffles exchanges")
  }

  test("rolling distinct: bounded by frame size and global type vocabulary") {
    val vocab = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    val rows = run("q_win_rolling_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_types_20"))
      assert(n >= 1 && n <= math.min(20L, vocab),
        s"rolling distinct $n outside [1, min(20, $vocab)]")
    }
  }

  test("stemmer: plural/gerund variants collapse to one stem") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "run running runs"), (2L, "flies fly"),
      (3L, "classes class")).toDF("doc_id", "text")
    // same chain as the query, applied to a controlled vocabulary
    val stems = docs
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")) >= 4)
      .select(
        when(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          col("w"), "sses$", "ss"), "ies$", "y"), "ing$", ""), "ed$", "")
          .rlike("ss$"),
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            col("w"), "sses$", "ss"), "ies$", "y"), "ing$", ""), "ed$", ""))
          .otherwise(regexp_replace(
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              col("w"), "sses$", "ss"), "ies$", "y"), "ing$", ""), "ed$", ""),
            "s$", "")).as("stem"))
      .collect().map(_.getString(0)).toSet
    assert(stems.contains("runn") || stems.contains("run"))
    assert(stems("class"), "classes must stem to class (ss preserved)")
    assert(stems("fly"), "flies must stem to fly")
    val out = run("q_text_stem_topk").collect()
    assert(out.length <= 40 && out.nonEmpty)
    assert(out.map(_.getLong(1)).toSeq == out.map(_.getLong(1)).toSeq.sorted.reverse,
      "top stems must be count-descending")
  }

  test("corpus report: totals reconcile with the raw table") {
    val rows = run("q_text_corpus_report").collect()
    val total = rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum
    assert(total == Tables.documents(spark, sf).count(),
      "report cells must partition the corpus")
    rows.foreach { r =>
      val pct = r.getDouble(r.fieldIndex("pct_short"))
      assert(pct >= 0 && pct <= 100)
      assert(r.getLong(r.fieldIndex("n_dup_texts")) >= 0)
    }
  }

  test("corr matrix: r in [-1,1]; price-qty strongly positive; one-pass plan") {
    val df = run("q_agg_corr_matrix")
    val rows = df.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0, s"corr $c outside [-1,1]")
    }
    // the fixture draws the three measures independently, so every
    // pairwise r must be near zero — a strong correlation would mean
    // the moment assembly is broken, not the data
    rows.foreach(r => assert(math.abs(r.getDouble(2)) < 0.1,
      s"independent fixture columns must be near-uncorrelated, got ${r.getDouble(2)}"))
    // the fact table is aggregated once: no join in the plan at all
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "moment computation must be a single agg pass")
  }

  test("decay score: unit weight for newest event, monotone-decay bound") {
    val rows = run("q_agg_decay_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getLong(r.fieldIndex("decay_score_u"))
      val d = r.getDouble(r.fieldIndex("decay_score"))
      assert(u >= 0, "cents and weights are nonnegative")
      assert(math.abs(d - u / 1048576.0 / 100.0) == 0.0,
        "display score must be the exact dyadic division of the scaled integer")
    }
  }

  test("range search: threshold honored, superset-consistent with brute top-k, no sort") {
    val df = run("q_sim_range_search")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) >= 0.1))
    // no global ordering work: a threshold filter must not plan a sort
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort") && !plan.contains("TakeOrdered"),
      s"range search must stream out of the scan:\n${plan.take(600)}")
    // and it must be driven by a broadcast of the single query row
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "query vector should ride along as a broadcast")
  }
}
