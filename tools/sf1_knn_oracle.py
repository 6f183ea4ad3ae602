#!/usr/bin/env python3
"""Memory-bounded DuckDB rebuild of q_sim_knn_graph_ann for the sf1 sweep.

The registered oracle (Similarity.scala knnGraphAnnSql) is a single
WITH-chain; at sf1 (20k vectors) its re-rank stage windows ~11M
candidate rows while still CARRYING both 64-dim embedding lists, and
the monolithic MATERIALIZED CTEs pin everything at once — DuckDB
exhausted 100 GiB in the r7 sweep. This tool rebuilds the SAME
computation (same md5 seeds, same two quantized-mean Lloyd rounds,
same NProbe/round(.,6)/tiebreak contract) but STAGED:

  * each CTE becomes an on-disk temp table (duckdb file db +
    temp_directory, memory_limit enforced);
  * the candidate re-rank computes the dot product FIRST, drops the
    lists, then windows — and runs in qid-batches (qid % B), so peak
    memory is one batch of (qid, nb, cos) triples.

Usage: python3 tools/sf1_knn_oracle.py <sfDir> <sparkOutDir> [B]
  <sparkOutDir> = graft.Verify output dir holding
  q_sim_knn_graph_ann/*.parquet. Exits 0 on exact match.

Constants NPROBE=4 and K=3 mirror Similarity.scala (NProbe, top-3).
Any drift between this script and the Scala/registered-SQL pair shows
up as a mismatch against the Spark dump — it cannot false-pass.
"""
import sys, os, math, tempfile

import duckdb

NPROBE = 4
K = 3


def main():
    sf_dir, spark_dir = sys.argv[1], sys.argv[2]
    batches = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    scratch = tempfile.mkdtemp(prefix="knn_oracle_", dir="/tmp")
    con = duckdb.connect(os.path.join(scratch, "stage.duckdb"))
    con.execute(f"SET temp_directory='{scratch}/spill'")
    con.execute("SET memory_limit='24GB'")
    con.execute("SET threads=16")

    emb = os.path.join(sf_dir, "embeddings.parquet")
    glob = emb + "/*.parquet" if os.path.isdir(emb) else emb
    con.execute(f"CREATE VIEW embeddings AS SELECT vec_id, embedding "
                f"FROM read_parquet('{glob}')")
    n = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    ncells = math.ceil(math.sqrt(n))
    print(f"[knn-oracle] n={n} ncells={ncells} batches={batches}")

    # --- stage the training chain (mirrors knnGraphAnnSql CTE-by-CTE) ---
    con.execute("""CREATE TABLE ev AS
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN unnest(range(1, len(embedding)+1)) AS t(i)""")
    con.execute("""CREATE TABLE en AS
      SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ev GROUP BY 1""")
    con.execute("""CREATE TABLE lv AS
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings""")
    con.execute(f"""CREATE TABLE c0 AS
      WITH seeds AS (
        SELECT row_number() OVER (
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
          vec_id
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT {ncells})
      SELECT s.cell, ev.pos, ev.v AS m
      FROM seeds s JOIN ev ON s.vec_id = ev.vec_id""")

    def assign(rnd, cent):
        con.execute(f"""CREATE TABLE cn{rnd} AS
          SELECT cell, sqrt(SUM(m * m)) AS nrm FROM {cent} GROUP BY 1""")
        con.execute(f"""CREATE TABLE assign{rnd} AS
          WITH dot AS (
            SELECT ev.vec_id, c.cell, SUM(ev.v * c.m) AS d
            FROM ev JOIN {cent} c ON ev.pos = c.pos GROUP BY 1, 2)
          SELECT vec_id, cell FROM (
            SELECT d.vec_id, d.cell, row_number() OVER (
              PARTITION BY d.vec_id
              ORDER BY d.d / (en.nrm * cn{rnd}.nrm) DESC, d.cell ASC) AS rn
            FROM dot d JOIN en ON d.vec_id = en.vec_id
            JOIN cn{rnd} ON d.cell = cn{rnd}.cell)
          WHERE rn = 1""")

    def recompute(rnd, frm):
        con.execute(f"""CREATE TABLE c{rnd} AS
          SELECT a.cell, ev.pos,
            CAST(SUM(CAST(round(ev.v * 1e6) AS BIGINT)) AS DOUBLE)
              / 1e6 / COUNT(*) AS m
          FROM {frm} a JOIN ev ON a.vec_id = ev.vec_id
          GROUP BY 1, 2""")

    assign(0, "c0")
    recompute(1, "assign0")
    assign(1, "c1")
    recompute(2, "assign1")
    assign(2, "c2")
    print("[knn-oracle] training staged")

    con.execute(f"""CREATE TABLE qcells AS
      WITH qdot AS (
        SELECT ev.vec_id AS qid, c.cell, SUM(ev.v * c.m) AS d
        FROM ev JOIN c2 c ON ev.pos = c.pos GROUP BY 1, 2)
      SELECT qid, cell FROM (
        SELECT q.qid, q.cell, row_number() OVER (
          PARTITION BY q.qid
          ORDER BY q.d / (en.nrm * cn2.nrm) DESC, q.cell ASC) AS pr
        FROM qdot q JOIN en ON q.qid = en.vec_id
        JOIN cn2 ON q.cell = cn2.cell)
      WHERE pr <= {NPROBE}""")

    # --- batched re-rank: dot first, lists dropped, then window ---
    con.execute("CREATE TABLE edges (qid BIGINT, nb BIGINT, rnk BIGINT)")
    for b in range(batches):
        con.execute(f"""INSERT INTO edges
          WITH cand AS (
            SELECT qc.qid, a.vec_id
            FROM qcells qc JOIN assign2 a ON qc.cell = a.cell
            WHERE a.vec_id <> qc.qid AND qc.qid % {batches} = {b}),
          scored AS (
            SELECT cand.qid, cand.vec_id AS nb,
              round(list_dot_product(q.e, c.e) / (eq.nrm * ec.nrm), 6)
                AS cos
            FROM cand
            JOIN lv q ON cand.qid = q.vec_id
            JOIN lv c ON cand.vec_id = c.vec_id
            JOIN en eq ON cand.qid = eq.vec_id
            JOIN en ec ON cand.vec_id = ec.vec_id)
          SELECT qid, nb, rnk FROM (
            SELECT qid, nb, row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, nb ASC) AS rnk
            FROM scored)
          WHERE rnk <= {K}""")
    print("[knn-oracle] edges built:",
          con.execute("SELECT COUNT(*) FROM edges").fetchone()[0])

    con.execute("""CREATE TABLE result AS
      WITH m AS (
        SELECT e.qid, COUNT(*) AS n_mutual
        FROM edges e JOIN edges r ON r.qid = e.nb AND r.nb = e.qid
        GROUP BY 1),
      p AS (
        SELECT e.qid,
          MAX(CASE WHEN e.rnk = 1 THEN e.nb END) AS nb1,
          MAX(CASE WHEN e.rnk = 2 THEN e.nb END) AS nb2,
          MAX(CASE WHEN e.rnk = 3 THEN e.nb END) AS nb3,
          COALESCE(MAX(m.n_mutual), 0) AS n_mutual
        FROM edges e LEFT JOIN m ON m.qid = e.qid
        GROUP BY 1)
      SELECT emb.vec_id, p.nb1, p.nb2, p.nb3,
        COALESCE(p.n_mutual, 0) AS n_mutual
      FROM embeddings emb LEFT JOIN p ON p.qid = emb.vec_id""")

    # --- compare against the Spark dump (canonical order both sides) ---
    spark_glob = os.path.join(spark_dir, "q_sim_knn_graph_ann", "*.parquet")
    diff = con.execute(f"""
      WITH s AS (SELECT * FROM read_parquet('{spark_glob}')),
      o AS (SELECT * FROM result)
      SELECT
        (SELECT COUNT(*) FROM s) AS spark_rows,
        (SELECT COUNT(*) FROM o) AS oracle_rows,
        (SELECT COUNT(*) FROM (SELECT * FROM s EXCEPT SELECT * FROM o))
          AS only_spark,
        (SELECT COUNT(*) FROM (SELECT * FROM o EXCEPT SELECT * FROM s))
          AS only_oracle""").fetchone()
    print(f"[knn-oracle] spark_rows={diff[0]} oracle_rows={diff[1]} "
          f"only_spark={diff[2]} only_oracle={diff[3]}")
    ok = diff[0] == diff[1] and diff[2] == 0 and diff[3] == 0
    print("[knn-oracle]", "EXACT" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
