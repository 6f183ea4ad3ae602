#!/usr/bin/env python3
"""DuckDB baseline timings for the headline oracle queries.

Usage: python3 tools/duck_bench.py <sfDir> [oracle_sql.json path]
Times each headline oracle SQL in DuckDB (1 warmup + 3 timed runs,
minimum — same methodology as graft.Bench) over views on
<sfDir>/*.parquet. This is the BASELINE.md 'numbers to beat'.
"""
import statistics
import sys, os, json, time

import duckdb

HEADLINE = [
    "q1_agg", "q_agg_global", "q_scan_project_filter",
    "q_agg_group_multi", "q_agg_rollup",
    "q_join_q3", "q_join_q5", "q_join_asof",
    "q_win_running_sum", "q_win_topk_per_group",
    "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_simhash",
    "q_sim_topk_brute", "q_sim_topk_brute_native",
    "q_text_tfidf", "q_stream_tumbling",
    # round-3/4 capability rows (mirror graft.Bench.headline)
    "q_src_objstore_agg_filtered", "q_src_clustered_join_bucketed",
    "q_src_time_travel", "q_text_lm_score", "q_text_langid_confusion",
    # round-4 additions (mirror graft.Bench.headline)
    "q_sim_ann_pq", "q_text_bm25_topk", "q_graph_pagerank",
    "q_text_chunk_dedup", "q_ts_gapfill",
    # round-5 stored-index twins (mirror graft.Bench.headline). NOTE:
    # their oracle SQL is the full-rebuild pipeline (DuckDB has no
    # stored index to read), so the per-query pair is rebuild-vs-read —
    # compare them against the rebuild rows, not each other.
    "q_sim_ann_pq_indexed", "q_text_bm25_indexed",
    # round-5 capability families (mirror graft.Bench.headline)
    "q_graph_triangles", "q_ts_anomaly",
    "q_win_retention", "q_agg_copurchase",
    # round-5 wave 2/3 (mirror graft.Bench.headline)
    "q_agg_freq_items", "q_agg_corr_matrix",
    "q_ts_ewma", "q_win_gap_islands",
    # round-5 waves 6-8 (mirror graft.Bench.headline)
    "q_sim_knn_graph", "q_graph_bellman_ford",
    "q_agg_mad_outliers", "q_text_cooccur",
    # round-5 waves 13-17 (mirror graft.Bench.headline)
    "q_agg_skyline", "q_graph_labelprop",
    "q_sim_mmr", "q_text_ngram_novelty",
    # round-5 waves 18-25 (mirror graft.Bench.headline)
    "q_vec_dim_profile", "q_vec_matryoshka",
    "q_text_boilerplate", "q_text_rake",
    "q_eval_auc", "q_eval_ab_test",
    "q_win_rfm", "q_ts_changepoint", "q_ts_vwap",
    # round-5 waves 26-42 (mirror graft.Bench.headline)
    "q_dedup_er_entities", "q_graph_hits",
    "q_join_spatial_grid", "q_ts_theilsen",
    "q_sample_dedup_aware_split", "q_ts_hazard",
    "q_agg_dau_mau", "q_win_interval_merge",
    # round-5 waves 43-53 (mirror graft.Bench.headline)
    "q_dedup_lsh_tuning", "q_join_editdist", "q_text_heaps",
    "q_graph_closeness", "q_vec_sq8", "q_ts_stl",
    # round-6 additions (mirror graft.Bench.headline)
    "q_agg_quantile_sketch", "q_sim_kmeans", "q_text_zipf",
    "q_graph_node_sim", "q_ts_out_of_order", "q_src_rle_advice",
    # round-7 additions (mirror graft.Bench.headline). NOTE: the
    # scaled-graph / ANN-graph oracles are full unrolled-CTE rebuilds
    # (DuckDB re-derives the edge list / re-trains the IVF each run),
    # so these pairs are rebuild-vs-query like the stored-index twins.
    "q_graph_pagerank_scaled", "q_graph_labelprop_scaled",
    "q_graph_kcore_scaled", "q_sim_knn_graph_ann",
    "q_join_spatial_grid_scaled", "q_sim_ann_recall_clustered",
    # round-8 additions (mirror graft.Bench.headline)
    "q_join_spatial_grid_strip", "q_skew_zipf_salted_join",
]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    with open(oracle_path) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out, total = {}, 0.0
    for name in HEADLINE:
        if name not in oracles:
            continue
        sql = oracles[name]
        con.execute(sql).fetchall()  # warmup
        runs = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            runs.append(time.time() - t0)
        dt = min(runs)
        out[name] = round(dt, 4)
        total += dt
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 4),
                      "unit": "sec", "queries": out, "sf": sf_dir}))

if __name__ == "__main__":
    main()
