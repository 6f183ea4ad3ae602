package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Physical-plan audit for the headline queries (SURVEY §4 discipline:
  * "iterate until it's the plan you'd want, not the first one that
  * passed"). Prints, per query: shuffle count, broadcast join count,
  * whether parquet filter pushdown engaged, and whole-stage-codegen
  * presence. Run: sbt "runMain graft.PlanAudit [sfDir]".
  */
object PlanAudit {

  // Descends into finalized AQE stages (QueryStageExec is a leaf whose
  // real subtree hangs off .plan, not .children).
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: collectAll(a.executedPlan)
    case q: QueryStageExec => p +: collectAll(q.plan)
    case _ => p +: p.children.flatMap(collectAll)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // headline set + the round-3 additions (auditable batch queries)
    val extras = Seq(
      "q_text_repetition", "q_text_decontam", "q_text_pii",
      "q_dedup_canonical", "q_sim_semantic_dedup", "q_sample_weighted_mix",
      "q_tpch_q4", "q_tpch_q10", "q_tpch_q12", "q_tpch_q14",
      "q_win_pct_rank", "q_mm_resize",
      "q_dedup_incremental", "q_src_clustered_join",
      "q_src_objstore_agg_filtered", "q_src_zorder",
      "q_text_lm_score", "q_src_orc_roundtrip", "q_src_time_travel",
      "q_src_changes_since", "q_dedup_incremental_versioned",
      // round-4 additions
      "q_src_clustered_join_bucketed", "q_src_changes_rows",
      "q_mm_phash_near", "q_text_langid_confusion",
      "q_ts_resample_ohlc", "q_src_constraint_gate",
      "q_sim_ann_ivfpq", "q_dedup_fuzzy_names", "q_ts_moving_1h",
      "q_src_index_incremental", "q_mm_audio_features",
      "q_join_scd2", "q_agg_hll_union", "q_win_funnel",
      "q_agg_histogram", "q_sim_ann_ivfpq_residual",
      "q_src_mv_incremental", "q_src_partitioned_write",
      "q_win_seq_pattern", "q_agg_mode", "q_sim_knn_classify",
      "q_sample_train_test_split", "q_stream_cdc_apply",
      // round-5 additions
      "q_graph_triangles", "q_ts_anomaly", "q_win_retention",
      "q_dedup_cross_source_overlap", "q_sim_ann_recall",
      // round-5 waves 2/3
      "q_graph_cc", "q_ts_ewma", "q_win_rolling_distinct",
      "q_text_stem_topk", "q_text_corpus_report", "q_agg_corr_matrix",
      "q_agg_decay_score", "q_sim_range_search", "q_win_gap_islands",
      "q_ts_seasonal", "q_agg_gini", "q_join_interval_overlap",
      "q_src_branch_merge", "q_agg_freq_items")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else (Bench.headline ++ extras).distinct
    println(f"${"query"}%-28s shuffles broadcasts pushdown codegen")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect() // execute THIS QueryExecution so AQE finalizes it
        val plan = df.queryExecution.executedPlan
        val nodes = collectAll(plan)
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
        val bcasts = nodes.count(n => n.isInstanceOf[BroadcastHashJoinExec] ||
          n.isInstanceOf[BroadcastNestedLoopJoinExec])
        val planStr = plan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan.toString
          case p => p.toString
        }
        val pushed = planStr.contains("PushedFilters: [") &&
          !planStr.replaceAll("PushedFilters: \\[\\]", "").isEmpty &&
          planStr.contains("PushedFilters: [I") || planStr.contains("PushedFilters: [G") ||
          planStr.contains("PushedFilters: [E") || planStr.contains("PushedFilters: [L") ||
          planStr.contains("PushedFilters: [N")
        val codegen = planStr.contains("*(")
        println(f"$name%-28s $shuffles%8d $bcasts%10d ${if (pushed) "yes" else "-"}%8s ${if (codegen) "yes" else "-"}%7s")
      } catch { case e: Throwable =>
        println(f"$name%-28s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
