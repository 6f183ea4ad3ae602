package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 — similarity search over embeddings (north-star).
  *
  * Three tiers:
  * 1. Brute-force top-k for one query vector — the exactness baseline.
  *    The query row rides along as a broadcast cross join (never a
  *    driver-side collect), cosine is a codegen'd double fold
  *    (VectorOps), and top-k compiles to TakeOrderedAndProject —
  *    per-partition k-heaps merged at the driver (k rows per
  *    partition cross the wire, not the data). This IS the REPOSE
  *    local-topk-then-merge pattern [local: PAPERS.md:5], natively.
  * 2. Batch top-k per query — Q queries × N candidates via broadcast
  *    of the (small) query side, ranked by a window per query.
  * 3. LSH-bucketed ANN — random-hyperplane sign buckets (VectorOps
  *    .rhpBucket); search only candidates whose bucket is within
  *    hamming ≤ `Probe` of the query's bucket (multiprobe), then exact
  *    re-rank. At 100 TB the bucket column is precomputed at ingest and
  *    the bucket equi-join replaces the full scan; the fraction of data
  *    touched drops to ~C(nBits,≤probe)/2^nBits.
  */
object Similarity extends QueryModule {

  private val Dim = 64
  private val NBits = 16
  private val Probe = 3 // multiprobe hamming radius over bucket bits

  /** Codegen cosine (CosineSimilarity — bit-identical to the HOF fold
    * by its documented contract + CosineExprSpec). Every hot cosine in
    * this module routes here since the r9 optimization round: the
    * interpreted `aggregate`+`zip_with` fold is a measured 40× penalty
    * (the q_sim_knn_graph lesson), and the bench's largest CPU sink was
    * assignCells evaluating that fold once per (vector × centroid).
    * Registration is idempotent and runs at plan-build time, where a
    * session is always active. */
  private def cosNative(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    graft.functions.GraftFunctions.register(SparkSession.active)
    call_function("cosine_sim", a, b)
  }

  private def cosRounded(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    round(cosNative(a, b), 6)

  /** The deliberately-interpreted fold, kept ONLY for the documented
    * brute/native bench pair (q_sim_topk_brute vs _native measures the
    * HOF-vs-codegen gap; swapping the baseline would erase the row's
    * meaning). */
  private def cosRoundedHof(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    round(VectorOps.cosine(a, b), 6)

  // 1. Brute-force cosine top-10 for the vec_id=0 query vector.
  // Deliberately the INTERPRETED fold: this row is the baseline half
  // of the brute/native bench pair (see cosRoundedHof).
  private val bruteQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), cosRoundedHof(col("embedding"), col("qe")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
  }

  private val bruteSql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |scored AS (
      |  SELECT vec_id,
      |    round(
      |      list_sum(list_transform(range(1, len(embedding)+1),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(range(1, len(embedding)+1),
      |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |           i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))), 6) AS cos
      |  FROM embeddings, q WHERE vec_id <> 0)
      |SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin

  /** MMR (maximal marginal relevance) diversified rerank — the
    * standard two-stage retrieval shape: a cheap recall stage (here the
    * brute top-20; at 100 TB the ANN index) hands a SMALL candidate set
    * to a greedy rerank that trades relevance against redundancy:
    * pick₁ = argmax rel, pickᵣ = argmax 0.7·rel − 0.3·max_{s∈picked}
    * sim(c, s) ([pub: Carbonell & Goldstein, SIGIR 1998]).
    *
    * Determinism: rel and every pairwise sim are the 6-dp-rounded
    * cosine (the engine-parity discipline of every sim query); the
    * MMR score is then two IEEE multiplies and a subtract in the same
    * shape on both engines, so the argmax and its (score desc, vec_id
    * asc) tie-break can never diverge. Each greedy round is a
    * candidates⋈picked broadcast probe + one 20-row TakeOrdered — the
    * corpus is touched exactly once, in the recall stage. */
  private val mmrQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val cands = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("embedding"),
        cosRounded(col("embedding"), col("qe")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(20)
      .localCheckpoint()
    var sel = cands.orderBy(col("rel").desc, col("vec_id").asc).limit(1)
      .withColumn("mmr_rank", lit(1))
    for (r <- 2 to 5) {
      val selE = sel.select(col("vec_id").as("s_id"),
        col("embedding").as("s_emb"))
      val maxsim = cands
        .join(sel.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .crossJoin(broadcast(selE))
        .select(col("vec_id"), col("rel"), col("embedding"),
          cosRounded(col("embedding"), col("s_emb")).as("sim"))
        .groupBy(col("vec_id")).agg(max(col("sim")).as("maxsim"))
      val pick = cands.join(maxsim, "vec_id")
        .withColumn("score",
          lit(0.7) * col("rel") - lit(0.3) * col("maxsim"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("embedding"), col("rel"))
        .withColumn("mmr_rank", lit(r))
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel.select(col("mmr_rank"), col("vec_id"), col("rel"))
  }

  /** Matryoshka-truncation evaluation (the MRL question: how much
    * retrieval quality survives cutting the embedding in half?): the
    * brute top-10 under the FULL 64-dim cosine beside the top-10 under
    * the FIRST-32-dims cosine, joined by rank, plus overlap@10 — the
    * eval every embedding-compression decision reads first. Both
    * scores are the 6-dp-rounded cosine; the truncated score slices
    * the SAME stored vector (no re-embedding), which is exactly the
    * production MRL deployment shape.
    *
    * 100 TB posture: one broadcast-query scan computing both scores,
    * two TakeOrdered top-10s (never a global sort), a 10-row rank
    * join and a 1-row overlap broadcast. */
  private val matryoshkaQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val scored = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        cosRounded(col("embedding"), col("qe")).as("cos_full"),
        cosRounded(slice(col("embedding"), 1, 32), slice(col("qe"), 1, 32))
          .as("cos_half"))
    def top10(c: String, alias: String): DataFrame = {
      val t = scored.select(col("vec_id"), col(c))
        .orderBy(col(c).desc, col("vec_id").asc).limit(10)
      val w = Window.orderBy(col(c).desc, col("vec_id").asc)
      t.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("vec_id").as(s"${alias}_id"),
          col(c).as(s"${alias}_cos"))
    }
    val f = top10("cos_full", "full")
    val h = top10("cos_half", "half")
    val ov = f.select(col("full_id").as("vec_id"))
      .join(h.select(col("half_id").as("vec_id")), "vec_id")
      .agg(count(lit(1)).as("overlap10"))
    f.join(h, "rank").crossJoin(broadcast(ov))
  }

  /** Embedding out-of-distribution detection — the embedding-quality
    * gate a training pipeline runs before trusting a batch of vectors:
    * per label, the 5 vectors FARTHEST from their own label centroid
    * (mislabeled/corrupt-embedding candidates). Everything is integer:
    * components floor to micro-units, the centroid is the floor-div
    * per-dimension mean, the distance is the exact Σdiff² in those
    * units (|diff| ≤ 2·10⁶ over 64 dims ⇒ ≤ 2.6·10¹⁴, far inside
    * BIGINT) — so the ranking is bit-stable in both engines.
    *
    * 100 TB posture: one (label, dim) partial-agg collapse builds the
    * centroids (|labels|·dim rows), which broadcast back onto a
    * map-side distance pass; the only corpus-sized exchange is the
    * per-label top-5 rank, which the §4.2(c) bounded-heap operator
    * replaces when the window becomes the bottleneck. */
  private val oodQ = (s: SparkSession, dir: String) => {
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "ev")))
      .select(col("vec_id"), col("label"), col("pos"),
        floor(col("ev").cast("double") * 1000000L).cast("long").as("vm"))
    val cent = v.groupBy(col("label"), col("pos"))
      .agg(expr("sum(vm) div count(1)").as("cm"))
    val dist = v.join(broadcast(cent), Seq("label", "pos"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum((col("vm") - col("cm")) * (col("vm") - col("cm")))
        .as("dist2"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("dist2").desc, col("vec_id").asc)
    dist.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("label"), col("rnk"), col("vec_id"), col("dist2"))
  }

  private val oodSql =
    """WITH v AS (
      |  SELECT vec_id, label, i AS pos,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
      |      AS vm
      |  FROM embeddings CROSS JOIN
      |    unnest(range(1, len(embedding) + 1)) AS t(i)),
      |cent AS (
      |  SELECT label, pos, CAST(SUM(vm) // COUNT(*) AS BIGINT) AS cm
      |  FROM v GROUP BY 1, 2),
      |d AS (
      |  SELECT v.label, v.vec_id,
      |    CAST(SUM((v.vm - c.cm) * (v.vm - c.cm)) AS BIGINT) AS dist2
      |  FROM v JOIN cent c ON v.label = c.label AND v.pos = c.pos
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT label, vec_id, dist2, row_number() OVER (
      |    PARTITION BY label ORDER BY dist2 DESC, vec_id ASC) AS rnk
      |  FROM d)
      |SELECT label, rnk, vec_id, dist2 FROM r WHERE rnk <= 5""".stripMargin

  /** Per-dimension embedding profile — the batch-QA table an embedding
    * pipeline checks before indexing: for every dimension, n, the
    * exact linear micro moments (Σv, Σ|v|, min/max), the quadratic
    * moment in CENTI units (Σvc², vc = floor(100·v): |vc| ≤ a few
    * hundred keeps Σvc² inside BIGINT to ~10¹⁴ rows — the micro form
    * would overflow at 2·10⁶ rows, the exact silent-wrap trap the
    * BM25 advice item documented), and two flags: DEAD (floor-div
    * variance below 1 centi² = 10⁻⁴ — a truncation/projection bug
    * shows up here first) and DOMINANT (mean |v| above 0.5 — a
    * normalization bug). Divisions are floor-divs mirrored in both
    * engines, so the flags are bit-stable.
    *
    * 100 TB posture: one posexplode + one |dim|-key partial-agg
    * shuffle; every statistic merges associatively. */
  private val dimProfileQ = (s: SparkSession, dir: String) => {
    Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("pos", "ev")))
      .select(col("pos"),
        floor(col("ev").cast("double") * 1000000L).cast("long").as("vm"),
        floor(col("ev").cast("double") * 100L).cast("long").as("vc"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("vm")).as("s1_micro"),
        sum(col("vc") * col("vc")).as("s2_centi"),
        min(col("vm")).as("min_micro"),
        max(col("vm")).as("max_micro"),
        sum(abs(col("vm"))).as("sabs_micro"))
      // dead: floor-div variance in centi² below 1 (= 1e-4 in units²)
      .withColumn("dead",
        expr("s2_centi div n - (s1_micro div (n * 10000)) " +
          "* (s1_micro div (n * 10000)) < 1"))
      // dominant: mean |v| > 0.5  <=>  2*sabs > n*10^6
      .withColumn("dominant",
        lit(2L) * col("sabs_micro") > col("n") * lit(1000000L))
  }

  private val dimProfileSql =
    """WITH v AS (
      |  SELECT i - 1 AS pos,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
      |      AS vm,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 100) AS BIGINT)
      |      AS vc
      |  FROM embeddings CROSS JOIN
      |    unnest(range(1, len(embedding) + 1)) AS t(i)),
      |a AS (
      |  SELECT pos, COUNT(*) AS n,
      |    CAST(SUM(vm) AS BIGINT) AS s1_micro,
      |    CAST(SUM(vc * vc) AS BIGINT) AS s2_centi,
      |    MIN(vm) AS min_micro, MAX(vm) AS max_micro,
      |    CAST(SUM(abs(vm)) AS BIGINT) AS sabs_micro
      |  FROM v GROUP BY 1)
      |SELECT pos, n, s1_micro, s2_centi, min_micro, max_micro,
      |  sabs_micro,
      |  (s2_centi // n - (s1_micro // (n * 10000))
      |    * (s1_micro // (n * 10000)) < 1) AS dead,
      |  (2 * sabs_micro > n * 1000000) AS dominant
      |FROM a""".stripMargin

  /** Semi-hard triplet mining (FaceNet's recipe — the metric-learning
    * constructor [[graft.operators.Sampling]]'s random negatives stop
    * short of): per anchor, the POSITIVE is its nearest same-label
    * vector, and the NEGATIVE is the most-similar different-label
    * vector that is still FARTHER than the positive
    * (sim_neg < sim_pos) — close enough to carry gradient, not so
    * close it's wrong. Cosines rounded to 6 dp (the suite-wide
    * argmax-stability contract); ties break by vec_id; anchors with
    * no semi-hard negative report NULLs.
    *
    * 100 TB posture: anchors broadcast, ONE codegen cosine pass over
    * the corpus, two anchor-keyed rank windows; at scale the
    * candidate pass rides the ANN index (bucket-adjacent candidates
    * only), selection unchanged. */
  private val tripletQ = (s: SparkSession, dir: String) => {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
    val anchors = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("aid"), col("embedding").as("ae"),
        col("label").as("alabel"))
    val scored = e.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("aid"))
      .select(col("aid"), col("alabel"), col("vec_id"), col("label"),
        cosRounded(col("embedding"), col("ae")).as("cos"))
    val rkW = Window.partitionBy(col("aid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val pos = scored.filter(col("label") === col("alabel"))
      .withColumn("rk", row_number().over(rkW)).filter(col("rk") === 1)
      .select(col("aid"), col("vec_id").as("pos_id"),
        col("cos").as("sim_pos"))
    val neg = scored.filter(col("label") =!= col("alabel"))
      .join(broadcast(pos.select(col("aid"), col("sim_pos"))), "aid")
      .filter(col("cos") < col("sim_pos"))
      .withColumn("rk", row_number().over(rkW)).filter(col("rk") === 1)
      .select(col("aid"), col("vec_id").as("neg_id"),
        col("cos").as("sim_neg"))
    pos.join(neg, Seq("aid"), "left")
  }

  private def tripletSql: String = {
    def cosE(x: String, y: String): String =
      s"""round(
         |  list_sum(list_transform(range(1, len($x)+1),
         |    i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))
         |  / (sqrt(list_sum(list_transform(range(1, len($x)+1),
         |       i -> CAST($x[i] AS DOUBLE) * CAST($x[i] AS DOUBLE))))
         |   * sqrt(list_sum(list_transform(range(1, len($y)+1),
         |       i -> CAST($y[i] AS DOUBLE) * CAST($y[i] AS DOUBLE))))),
         |  6)""".stripMargin
    s"""WITH a AS (
       |  SELECT vec_id AS aid, embedding AS ae, label AS alabel
       |  FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT a.aid, a.alabel, e.vec_id, e.label,
       |    ${cosE("e.embedding", "a.ae")} AS cos
       |  FROM embeddings e CROSS JOIN a WHERE e.vec_id <> a.aid),
       |pos AS (
       |  SELECT aid, vec_id AS pos_id, cos AS sim_pos
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY aid
       |          ORDER BY cos DESC, vec_id ASC) AS rk
       |        FROM scored WHERE label = alabel)
       |  WHERE rk = 1),
       |neg AS (
       |  SELECT aid, vec_id AS neg_id, cos AS sim_neg
       |  FROM (SELECT s.*, ROW_NUMBER() OVER (PARTITION BY s.aid
       |          ORDER BY s.cos DESC, s.vec_id ASC) AS rk
       |        FROM scored s JOIN pos p ON s.aid = p.aid
       |        WHERE s.label <> s.alabel AND s.cos < p.sim_pos)
       |  WHERE rk = 1)
       |SELECT pos.aid, pos.pos_id, pos.sim_pos, neg.neg_id,
       |  neg.sim_neg
       |FROM pos LEFT JOIN neg ON pos.aid = neg.aid""".stripMargin
  }

  private def matryoshkaSql: String = {
    def cosE(x: String, y: String): String =
      s"""round(
         |      list_sum(list_transform(range(1, len($x)+1),
         |        i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(range(1, len($x)+1),
         |           i -> CAST($x[i] AS DOUBLE) * CAST($x[i] AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(range(1, len($y)+1),
         |           i -> CAST($y[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))))
         |      , 6)""".stripMargin
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |s AS (
       |  SELECT vec_id,
       |    ${cosE("embedding", "qe")} AS cos_full,
       |    ${cosE("embedding[1:32]", "qe[1:32]")} AS cos_half
       |  FROM embeddings, q WHERE vec_id <> 0),
       |f AS (
       |  SELECT vec_id AS full_id, cos_full, row_number() OVER (
       |    ORDER BY cos_full DESC, vec_id ASC) AS rank
       |  FROM s ORDER BY cos_full DESC, vec_id ASC LIMIT 10),
       |h AS (
       |  SELECT vec_id AS half_id, cos_half, row_number() OVER (
       |    ORDER BY cos_half DESC, vec_id ASC) AS rank
       |  FROM s ORDER BY cos_half DESC, vec_id ASC LIMIT 10),
       |ov AS (SELECT COUNT(*) AS overlap10
       |       FROM f JOIN h ON f.full_id = h.half_id)
       |SELECT f.rank, f.full_id, f.cos_full AS full_cos,
       |  h.half_id, h.cos_half AS half_cos, ov.overlap10
       |FROM f JOIN h ON f.rank = h.rank, ov""".stripMargin
  }

  private def mmrSql: String = {
    def cosE(x: String, y: String): String =
      s"""round(
         |      list_sum(list_transform(range(1, len($x)+1),
         |        i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(range(1, len($x)+1),
         |           i -> CAST($x[i] AS DOUBLE) * CAST($x[i] AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(range(1, len($y)+1),
         |           i -> CAST($y[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))))
         |      , 6)""".stripMargin
    def roundCte(r: Int): String =
      s"""sel$r AS MATERIALIZED (
         |  SELECT * FROM sel${r - 1}
         |  UNION ALL
         |  (SELECT c.vec_id, c.rel, $r AS mmr_rank FROM cand c
         |   JOIN (SELECT ca, MAX(sim) AS ms FROM pairs
         |         WHERE cb IN (SELECT vec_id FROM sel${r - 1})
         |         GROUP BY ca) m ON c.vec_id = m.ca
         |   WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
         |   ORDER BY 0.7 * c.rel - 0.3 * m.ms DESC, c.vec_id ASC
         |   LIMIT 1))""".stripMargin
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT vec_id, embedding,
       |    ${cosE("embedding", "qe")} AS rel
       |  FROM embeddings, q WHERE vec_id <> 0),
       |cand AS MATERIALIZED (
       |  SELECT vec_id, embedding, rel FROM scored
       |  ORDER BY rel DESC, vec_id ASC LIMIT 20),
       |pairs AS MATERIALIZED (
       |  SELECT a.vec_id AS ca, b.vec_id AS cb,
       |    ${cosE("a.embedding", "b.embedding")} AS sim
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
       |sel1 AS MATERIALIZED (
       |  SELECT vec_id, rel, 1 AS mmr_rank FROM cand
       |  ORDER BY rel DESC, vec_id ASC LIMIT 1),
       |${(2 to 5).map(roundCte).mkString(",\n")}
       |SELECT mmr_rank, vec_id, rel FROM sel5""".stripMargin
  }

  // 2. Top-3 neighbors for each of the first 5 query vectors.
  private val perQueryQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cands = e.filter(col("vec_id") >= 5)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
  }

  private val perQuerySql =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT qid, e.vec_id,
      |    round(
      |      list_sum(list_transform(range(1, len(e.embedding)+1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
      |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |           i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))), 6) AS cos
      |  FROM embeddings e, q WHERE e.vec_id >= 5)
      |SELECT qid, vec_id, cos, rnk FROM (
      |  SELECT qid, vec_id, cos, row_number() OVER (
      |    PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM scored) WHERE rnk <= 3""".stripMargin

  /** All bit-masks of popcount ≤ radius over nBits — the multiprobe
    * offsets. C(16,0..3) = 697 masks; XOR is a bijection per query, so
    * probe buckets are distinct and no candidate is produced twice. */
  private def probeMasks(nBits: Int, radius: Int): Seq[Long] =
    (0 until (1 << nBits))
      .filter(m => java.lang.Integer.bitCount(m) <= radius)
      .map(_.toLong)

  /** 3. ANN: multiprobe LSH as a genuine EQUI-join: each query explodes
    * into its ≤ C(nBits,≤Probe) probe buckets (qbucket XOR mask), and
    * candidates come from a broadcast hash join on the bucket value —
    * identical semantics to `hamming(bucket, qbucket) <= Probe`, but
    * the plan is a hash join keyed on the precomputed bucket column,
    * NOT a nested-loop scan of the corpus: at 100 TB the scan touches
    * only the probed buckets' rows (~697/2^16 of the space).
    * Self included — a vector always lands in its own bucket (mask 0),
    * so self-retrieval at rank 1 is the invariant the spec checks.
    * Not SQL-expressible (bucket constants live engine-side) →
    * driver rows-only; recall + plan-shape checks in SimilaritySpec.
    */
  private val annQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", VectorOps.rhpBucket(col("embedding"), Dim, NBits))
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bucket").as("qbucket"))
      .withColumn("mask", explode(typedLit(probeMasks(NBits, Probe))))
      .select(col("qid"), col("qe"),
        col("qbucket").bitwiseXOR(col("mask")).as("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(probes), Seq("bucket"))
      .select(col("qid"), col("vec_id"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
  }

  /** 4. IVF (inverted-file) ANN — the second scale path beside LSH.
    *
    * Train: pick `NCells` seed centroids deterministically (the vectors
    * with the smallest xxhash64(vec_id) — a seeded pseudo-random sample
    * that compiles to TakeOrderedAndProject, never a global sort), then
    * run `LloydIters` k-means rounds: assign every vector to its
    * max-cosine centroid MAP-SIDE (fold over a broadcast centroid
    * array — see assignCells; the corpus is never shuffled), recompute
    * each centroid as the element-wise mean of its cell (posexplode →
    * groupBy(cell, pos) with map-side partials, so the exchange carries
    * ~tasks × cells×dim partial rows, not the corpus). Search: each
    * query probes its `NProbe` nearest cells;
    * candidates come from a broadcast equi-join on cell id, so the scan
    * touches ~NProbe/NCells of the corpus; exact cosine re-ranks.
    *
    * 100 TB: centroids are ~sqrt(N) rows — still broadcastable; the
    * cell id is precomputed at ingest (a single map pass) and the
    * per-query probe join prunes to the probed cells. Not
    * SQL-expressible (iterative training) → rows-only; recall and
    * self-retrieval invariants live in SimilaritySpec.
    */
  private val NCells = 16
  private val NProbe = 4
  private val LloydIters = 2

  /** Cell assignment is MAP-SIDE: the (≤ NCells) centroids collapse to
    * a single array row, broadcast, and each vector computes its
    * argmax-cosine cell with a fold over that array — no groupBy, no
    * shuffle of the corpus, ever. (The r1 form crossJoined ×NCells then
    * groupBy(vec_id)'d the corpus WITH embeddings as payload — at
    * 100 TB that shuffles the dataset once per Lloyd round.) Ties break
    * to the smallest cell: the array is sorted by cell and the fold
    * keeps the first maximum (same rule as the old max_by struct).
    */
  private def assignCells(data: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(data.sparkSession)
    val centsArr = cents
      .agg(array_sort(collect_list(struct(col("cell"), col("centroid"))))
        .as("cents"))
    // passes through any extra input columns (e.g. PQ codes for the
    // combined IVF-PQ layout) alongside the assigned cell. r9: the
    // argmax fold is the native cosine_argmax_cell expression (one
    // fused loop per row over the sorted cell array — first strict
    // maximum wins, ties to the smallest cell, exactly the old
    // aggregate() fold's semantics; CellArgmaxSpec pins it).
    val keep = data.columns.toSeq
    data.crossJoin(broadcast(centsArr))
      .select(keep.map(col) :+
        call_function("cosine_argmax_cell",
          col("embedding"), col("cents")).as("cell"): _*)
  }

  /** Deterministic IVF training: seeded sample → `LloydIters` k-means
    * rounds; returns the (cell, centroid) table. Exchanges carry only
    * cells×dim partials — the corpus is never shuffled. */
  private def trainIvf(e: DataFrame, nCells: Int = NCells): DataFrame = {
    // deterministic seed sample → cells 0..nCells-1 (row_number runs on
    // nCells rows post-limit, not the corpus). Seed key is md5 of the
    // id string — a seeded pseudo-random order BOTH engines can
    // compute, which is what lets ivfSql rebuild the whole training
    // run (r4: xxhash64 has no DuckDB counterpart and kept this query
    // rows-only). nCells defaults to the fixture constant; the
    // ANN-blocked graph passes ceil(√N) — the IVF contract that keeps
    // candidate volume ~N^1.5 instead of N².
    val wSeed = Window.orderBy(col("hk"), col("vec_id"))
    var cents = e.withColumn("hk", md5(col("vec_id").cast("string")))
      .orderBy(col("hk"), col("vec_id")).limit(nCells)
      .withColumn("cell", row_number().over(wSeed) - 1)
      .select(col("cell"), col("embedding").cast("array<double>").as("centroid"))
    for (_ <- 0 until LloydIters) {
      cents = assignCells(e, cents)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        // order-INSENSITIVE mean: float inputs quantized to 1e-6 and
        // summed as longs (exact, commutative), so centroids — and the
        // downstream cell assignment — are bit-stable across runs and
        // partitionings (double-avg accumulation order is not)
        .agg((sum(round(col("v").cast("double") * 1e6).cast("long"))
          .cast("double") / 1e6 / count(lit(1))).as("m"))
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x("m")).as("centroid"))
        .localCheckpoint()
    }
    cents
  }

  /** IVF train+search over an arbitrary corpus; returns the ranked
    * top-5 (qid, vec_id, cos, rnk) per query. Shared by the standard
    * query and the planted-duplicate oracle variant. */
  private def ivfRanked(e: DataFrame, queries: DataFrame): DataFrame = {
    val cents = trainIvf(e)
    val data = assignCells(e, cents)
    val qcells = queries
      .crossJoin(broadcast(cents))
      .withColumn("qc", cosNative(col("qe"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("qc").desc, col("cell").asc)))
      .filter(col("pr") <= NProbe)
      .select(col("qid"), col("qe"), col("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    data.join(broadcast(qcells), Seq("cell"))
      .select(col("qid"), col("vec_id"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
  }

  private val ivfQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    ivfRanked(e, e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe")))
  }

  /** 5. Product quantization (PQ) ANN — the third scale path: where
    * LSH prunes by bucket and IVF by cell, PQ compresses every vector
    * to `PqSub` one-byte codes (here 4-bit: `PqK`=16 centroids per
    * subspace) so the WHOLE corpus can be scanned in cache-resident
    * form — 64 float dims become 8 small ints, a 32× shrink. Train:
    * per subspace, k-means over the 8-dim slices (same md5-seeded
    * deterministic sample and 1e-6-quantized long-sum means as IVF, so
    * both engines derive bit-identical codebooks). Encode: per vector
    * per subspace, the argmin-L2 codebook cell — MAP-SIDE via a
    * broadcast codebook fold, corpus never shuffled. Search (ADC —
    * asymmetric distance computation): each query precomputes a
    * `PqSub`×`PqK` distance table to the codebook; a vector's
    * approximate distance is the sum of `PqSub` table lookups at its
    * codes — one map pass over codes, no per-vector float math.
    *
    * 100 TB posture: codes are computed at ingest (one map pass, like
    * the stored LSH bucket / IVF cell columns); the ADC scan touches
    * only the code column (8 ints/vector), the dt tables ride the
    * broadcast, and the final top-k is a per-query window whose input
    * a real deployment would pre-prune per partition (the bounded-heap
    * trick Sampling's `_scalable` twin proves); composing PQ inside
    * IVF cells (IVF-PQ) = applying this scan after the cell probe
    * join. Training exchanges carry subs×cells×dim partials only.
    *
    * Exactness: codebooks agree bit-for-bit across engines (quantized
    * means); distances are 8-term double sums whose cross-engine
    * accumulation-order risk is the same negligible boundary case
    * ivfSql documents; ranks compare on ROUNDED distance with vec_id
    * tiebreaks so sub-1e-6 drift cannot reorder. */
  private val PqSub = 8
  private val PqSubDim = Dim / PqSub
  private val PqK = 16
  private val PqLloyd = 2

  /** Codebook rows (sub, cell, spos, m) collapsed to ONE broadcastable
    * row: array of (sub, cell, centroid[PqSubDim]) sorted by
    * (sub, cell) — the fold order that makes argmin ties break to the
    * smallest cell. */
  private def pqCbArr(cb: DataFrame): DataFrame =
    cb.groupBy(col("sub"), col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("spos"), col("m")))),
        x => x("m")).as("centroid"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cell"),
        col("centroid")))).as("cb"))

  /** Squared-L2 from a vector's sub-slice to a codebook centroid,
    * as a SQL-expr fragment over lambda vars `s`/`c`. */
  private def pqDistExpr(vecCol: String): String =
    s"""aggregate(zip_with(slice($vecCol, c.sub * $PqSubDim + 1, $PqSubDim),
       |  c.centroid, (a, b) -> (cast(a as double) - b) * (cast(a as double) - b)),
       |  cast(0 as double), (x, y) -> x + y)""".stripMargin

  /** Encode map-side: per subspace, fold the broadcast codebook to the
    * argmin-L2 cell (strict < keeps the first = smallest cell on
    * ties). No shuffle — the corpus streams past once. r9: the fold is
    * the native pq_encode_codes expression (one fused loop per row);
    * the four-deep interpreted HOF nest it replaces dispatched boxed
    * lambdas per (subspace × cell × dimension) — see PqEncodeCodes'
    * bit-identity contract and PqEncodeSpec. */
  private def pqEncode(e: DataFrame, cb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(e.sparkSession)
    // passes through extra input columns (e.g. the IVF cell for the
    // residual IVF-PQ layout), like assignCells
    val keep = e.columns.toSeq
    e.crossJoin(broadcast(pqCbArr(cb)))
      .withColumn("codes", call_function("pq_encode_codes",
        col("embedding"), col("cb"), lit(PqSub), lit(PqSubDim)))
      .select(keep.map(col) :+ col("codes"): _*)
  }

  /** Per-subspace k-means: deterministic seeds (the PqK smallest
    * md5(vec_id) vectors donate all their slices), then PqLloyd rounds
    * of map-side encode + quantized-long-mean recompute. The recompute
    * explodes slices FROM the encoded rows (no join back), so the only
    * exchange per round carries subs×cells×spos partials. */
  private def trainPq(e: DataFrame): DataFrame = {
    val wSeed = Window.orderBy(col("hk"), col("vec_id"))
    var cb = e.withColumn("hk", md5(col("vec_id").cast("string")))
      .orderBy(col("hk"), col("vec_id")).limit(PqK)
      .withColumn("cell", row_number().over(wSeed) - 1)
      .select(col("cell"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .select((col("pos") / PqSubDim).cast("int").as("sub"), col("cell"),
        (col("pos") % PqSubDim).as("spos"), col("v").as("m"))
    for (_ <- 0 until PqLloyd) {
      cb = pqEncode(e, cb)
        .select(col("codes"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
        .select((col("pos") / PqSubDim).cast("int").as("sub"),
          (col("pos") % PqSubDim).as("spos"), col("v"),
          element_at(col("codes"),
            (col("pos") / PqSubDim).cast("int") + 1).as("cell"))
        .groupBy(col("sub"), col("cell"), col("spos"))
        .agg((sum(round(col("v") * 1e6).cast("long"))
          .cast("double") / 1e6 / count(lit(1))).as("m"))
        .localCheckpoint()
    }
    cb
  }

  /** ADC search over already-encoded codes: broadcast per-query
    * distance tables (as a lookup map keyed sub*PqK+cell), one map
    * pass over the corpus codes summing PqSub lookups, rank per query
    * on the ROUNDED distance. Shared by the train-at-query-time path
    * and the stored-index path — only WHERE `codes`/`cb` come from
    * differs. */
  private def pqAdcScan(codes: DataFrame, cb: DataFrame,
                        queries: DataFrame): DataFrame = {
    val qdt = queries.crossJoin(broadcast(pqCbArr(cb)))
      .withColumn("dt", expr(
        s"""map_from_entries(transform(cb, c ->
           |  struct(c.sub * $PqK + c.cell, ${pqDistExpr("qe")})))"""
          .stripMargin))
      .select(col("qid"), col("dt"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    codes.crossJoin(broadcast(qdt))
      .withColumn("adist", round(expr(
        s"""aggregate(sequence(0, ${PqSub - 1}), cast(0 as double),
           |  (acc, s) -> acc +
           |    element_at(dt, s * $PqK + element_at(codes, s + 1)))"""
          .stripMargin), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("vec_id"), col("adist"), col("rnk"))
  }

  private def pqAdcRanked(e: DataFrame, queries: DataFrame): DataFrame = {
    val cb = trainPq(e)
    pqAdcScan(pqEncode(e, cb).select(col("vec_id"), col("codes")), cb, queries)
  }

  private val pqQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    pqAdcRanked(e, e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe")))
  }

  /** Full DuckDB oracle: the whole PQ pipeline is SQL-expressible with
    * `sub` as one extra grouping key — seed slices, PqLloyd unrolled
    * assign/recompute rounds (quantized-long-sum means ⇒ codebooks
    * match Spark bit-for-bit), final encode, per-query distance
    * tables, the 8-lookup ADC sum, and the top-5 window on rounded
    * distance. Mirrors trainPq/pqEncode/pqAdcRanked structurally. */
  private def pqSql: String = {
    def assignCte(n: Int): String =
      s"""dist$n AS (
         |  SELECT sv.vec_id, sv.sub, c.cell,
         |    SUM((sv.v - c.m) * (sv.v - c.m)) AS d
         |  FROM sv JOIN cb$n c ON sv.sub = c.sub AND sv.spos = c.spos
         |  GROUP BY 1, 2, 3),
         |asg$n AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell, row_number() OVER (
         |      PARTITION BY vec_id, sub ORDER BY d ASC, cell ASC) AS rn
         |    FROM dist$n) WHERE rn = 1)""".stripMargin
    def recomputeCte(n: Int): String =
      s"""cb${n + 1} AS (
         |  SELECT a.sub, a.cell, sv.spos,
         |    CAST(SUM(CAST(round(sv.v * 1e6) AS BIGINT)) AS DOUBLE)
         |      / 1e6 / COUNT(*) AS m
         |  FROM asg$n a JOIN sv
         |    ON a.vec_id = sv.vec_id AND a.sub = sv.sub
         |  GROUP BY 1, 2, 3)""".stripMargin
    s"""WITH sv AS (
       |  SELECT vec_id, CAST((i - 1) // $PqSubDim AS INT) AS sub,
       |    (i - 1) % $PqSubDim AS spos, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings
       |  CROSS JOIN unnest(range(1, len(embedding)+1)) AS t(i)),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
       |    vec_id
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqK),
       |cb0 AS (
       |  SELECT sv.sub, s.cell, sv.spos, sv.v AS m
       |  FROM seeds s JOIN sv ON s.vec_id = sv.vec_id),
       |${assignCte(0)},
       |${recomputeCte(0)},
       |${assignCte(1)},
       |${recomputeCte(1)},
       |${assignCte(2)},
       |qdt AS (
       |  SELECT sv.vec_id AS qid, sv.sub, c.cell,
       |    SUM((sv.v - c.m) * (sv.v - c.m)) AS d
       |  FROM sv JOIN cb2 c ON sv.sub = c.sub AND sv.spos = c.spos
       |  WHERE sv.vec_id < 20 GROUP BY 1, 2, 3),
       |adist AS (
       |  SELECT q.qid, a.vec_id, round(SUM(q.d), 6) AS adist
       |  FROM asg2 a JOIN qdt q ON a.sub = q.sub AND a.cell = q.cell
       |  GROUP BY 1, 2)
       |SELECT qid, vec_id, adist, rnk FROM (
       |  SELECT qid, vec_id, adist, row_number() OVER (
       |    PARTITION BY qid ORDER BY adist ASC, vec_id ASC) AS rnk
       |  FROM adist) WHERE rnk <= 5""".stripMargin
  }

  /** 6. IVF-PQ — the two scale paths COMPOSED, the production ANN
    * layout (coarse inverted cells prune WHICH vectors to score, PQ
    * codes make scoring them cheap): corpus rows carry both a cell id
    * and 8 PQ codes from ONE map pass (assignCells chains after
    * pqEncode — both are broadcast folds); a query probes its NProbe
    * nearest cells and ADC-scores ONLY candidates in those cells.
    * This variant scores raw-vector codebooks (IVF-PQ-flat); the
    * residual-encoding refinement would train PQ on (x − centroid)
    * with the same machinery. At 100 TB both columns are materialized
    * at ingest and the scan touches NProbe/NCells of the corpus, 8
    * bytes per vector. */
  private val ivfpqQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qs = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cents = trainIvf(e)
    val cb = trainPq(e)
    val enc = assignCells(pqEncode(e, cb), cents)
      .select(col("vec_id"), col("cell"), col("codes"))
    val qcells = qs.crossJoin(broadcast(cents))
      .withColumn("qc", cosNative(col("qe"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("qc").desc, col("cell").asc)))
      .filter(col("pr") <= NProbe)
      .select(col("qid"), col("cell"))
    val qdt = qs.crossJoin(broadcast(pqCbArr(cb)))
      .withColumn("dt", expr(
        s"""map_from_entries(transform(cb, c ->
           |  struct(c.sub * $PqK + c.cell, ${pqDistExpr("qe")})))"""
          .stripMargin))
      .select(col("qid"), col("dt"))
    val probes = qcells.join(qdt, "qid")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    enc.join(broadcast(probes), Seq("cell"))
      .withColumn("adist", round(expr(
        s"""aggregate(sequence(0, ${PqSub - 1}), cast(0 as double),
           |  (acc, s) -> acc +
           |    element_at(dt, s * $PqK + element_at(codes, s + 1)))"""
          .stripMargin), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("vec_id"), col("adist"), col("rnk"))
  }

  /** 8. k-NN classification — the application layer on top of vector
    * search: each query vector takes the majority label of its 5
    * nearest corpus neighbors (exact cosine here; at scale the
    * neighbor set comes from any of the ANN paths above — the vote is
    * the same). Vote ties break to the smaller label; neighbor ties
    * to the smaller vec_id — fully deterministic cross-engine. */
  private val knnClassifyQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qs = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wN = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val wV = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("label").asc)
    e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("label"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .withColumn("rnk", row_number().over(wN))
      .filter(col("rnk") <= 5)
      .groupBy(col("qid"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wV))
      .filter(col("vr") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("votes"))
  }

  private val knnClassifySql =
    """WITH qs AS (
      |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
      |  WHERE vec_id < 20),
      |scored AS (
      |  SELECT qs.qid, e.vec_id, e.label,
      |    round(
      |      list_sum(list_transform(range(1, len(e.embedding)+1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qs.qe[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
      |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(range(1, len(qs.qe)+1),
      |           i -> CAST(qs.qe[i] AS DOUBLE) * CAST(qs.qe[i] AS DOUBLE))))),
      |      6) AS cos
      |  FROM embeddings e CROSS JOIN qs WHERE e.vec_id <> qs.qid),
      |top5 AS (
      |  SELECT qid, label FROM (
      |    SELECT qid, label, row_number() OVER (
      |      PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |    FROM scored) WHERE rnk <= 5),
      |votes AS (
      |  SELECT qid, label, COUNT(*) AS votes FROM top5 GROUP BY 1, 2)
      |SELECT qid, label AS pred_label, votes FROM (
      |  SELECT qid, label, votes, row_number() OVER (
      |    PARTITION BY qid ORDER BY votes DESC, label ASC) AS vr
      |  FROM votes) WHERE vr = 1""".stripMargin

  /** 7. RESIDUAL IVF-PQ — the true FAISS encoding: PQ codebooks are
    * trained on the RESIDUALS (x − centroid of x's cell), which are
    * far more compressible than raw vectors (the coarse quantizer has
    * already removed the cell mean), and each query builds a distance
    * table PER PROBED CELL from its own residual (qe − centroid).
    * Everything stays map-side over broadcast centroids/codebooks:
    * residual derivation, PQ training explodes, encoding, and the
    * per-(query, cell) ADC tables (NProbe×|queries| rows). */
  private def ivfResiduals(e: DataFrame, cents: DataFrame): DataFrame = {
    val centsArr = cents
      .agg(array_sort(collect_list(struct(col("cell"), col("centroid"))))
        .as("cents"))
    assignCells(e.select(col("vec_id"), col("embedding")), cents)
      .crossJoin(broadcast(centsArr))
      .withColumn("rv", expr(
        """zip_with(cast(embedding as array<double>),
          |  filter(cents, c -> c.cell = cell)[0].centroid,
          |  (a, b) -> a - b)""".stripMargin))
      .select(col("vec_id"), col("rv").as("embedding"), col("cell"))
  }

  private val ivfpqResidualQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qs = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cents = trainIvf(e)
    val resid = ivfResiduals(e, cents) // vec_id, residual embedding, cell
    val cb = trainPq(resid.select(col("vec_id"), col("embedding")))
    val enc = pqEncode(resid, cb)
      .select(col("vec_id"), col("cell"), col("codes"))
    val centsArr = cents
      .agg(array_sort(collect_list(struct(col("cell"), col("centroid"))))
        .as("cents"))
    // probe cells per query, then one distance table per (query, cell)
    // from the query's residual AGAINST THAT CELL
    val qcells = qs.crossJoin(broadcast(cents))
      .withColumn("qc", cosNative(col("qe"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("qc").desc, col("cell").asc)))
      .filter(col("pr") <= NProbe)
      .select(col("qid"), col("qe"), col("cell"))
    val qdt = qcells.crossJoin(broadcast(centsArr))
      .withColumn("qrv", expr(
        """zip_with(cast(qe as array<double>),
          |  filter(cents, c -> c.cell = cell)[0].centroid,
          |  (a, b) -> a - b)""".stripMargin))
      .crossJoin(broadcast(pqCbArr(cb)))
      .withColumn("dt", expr(
        s"""map_from_entries(transform(cb, c ->
           |  struct(c.sub * $PqK + c.cell, ${pqDistExpr("qrv")})))"""
          .stripMargin))
      .select(col("qid"), col("cell"), col("dt"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    enc.join(broadcast(qdt), Seq("cell"))
      .withColumn("adist", round(expr(
        s"""aggregate(sequence(0, ${PqSub - 1}), cast(0 as double),
           |  (acc, s) -> acc +
           |    element_at(dt, s * $PqK + element_at(codes, s + 1)))"""
          .stripMargin), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("vec_id"), col("adist"), col("rnk"))
  }

  /** Residual oracle: the IVF chain unchanged; the PQ chain runs over
    * `rsv` (per-dimension residuals from the final cell assignment),
    * and the ADC tables key on (query, probed cell, subspace, code)
    * since each probed cell has its own query residual. */
  private def ivfpqResidualSql: String = {
    def pAssign(n: Int): String =
      s"""pdist$n AS (
         |  SELECT rsv.vec_id, rsv.sub, c.cell,
         |    SUM((rsv.v - c.m) * (rsv.v - c.m)) AS d
         |  FROM rsv JOIN pcb$n c ON rsv.sub = c.sub AND rsv.spos = c.spos
         |  GROUP BY 1, 2, 3),
         |pasg$n AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell, row_number() OVER (
         |      PARTITION BY vec_id, sub ORDER BY d ASC, cell ASC) AS rn
         |    FROM pdist$n) WHERE rn = 1)""".stripMargin
    def pRecompute(n: Int): String =
      s"""pcb${n + 1} AS (
         |  SELECT a.sub, a.cell, rsv.spos,
         |    CAST(SUM(CAST(round(rsv.v * 1e6) AS BIGINT)) AS DOUBLE)
         |      / 1e6 / COUNT(*) AS m
         |  FROM pasg$n a JOIN rsv
         |    ON a.vec_id = rsv.vec_id AND a.sub = rsv.sub
         |  GROUP BY 1, 2, 3)""".stripMargin
    def iAssign(n: Int, centSrc: String): String =
      s"""cn$n AS (SELECT cell, sqrt(SUM(m * m)) AS nrm
         |  FROM $centSrc GROUP BY 1),
         |dot$n AS (
         |  SELECT ev.vec_id, c.cell, SUM(ev.v * c.m) AS d
         |  FROM ev JOIN $centSrc c ON ev.pos = c.pos GROUP BY 1, 2),
         |assign$n AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT d.vec_id, d.cell, row_number() OVER (
         |      PARTITION BY d.vec_id
         |      ORDER BY d.d / (en.nrm * cn$n.nrm) DESC, d.cell ASC) AS rn
         |    FROM dot$n d JOIN en ON d.vec_id = en.vec_id
         |    JOIN cn$n ON d.cell = cn$n.cell)
         |  WHERE rn = 1)""".stripMargin
    def iRecompute(n: Int, fromAssign: String): String =
      s"""c$n AS (
         |  SELECT a.cell, ev.pos,
         |    CAST(SUM(CAST(round(ev.v * 1e6) AS BIGINT)) AS DOUBLE)
         |      / 1e6 / COUNT(*) AS m
         |  FROM $fromAssign a JOIN ev ON a.vec_id = ev.vec_id
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH ev AS (
       |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings
       |  CROSS JOIN unnest(range(1, len(embedding)+1)) AS t(i)),
       |en AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ev GROUP BY 1),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
       |    vec_id
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $NCells),
       |c0 AS (
       |  SELECT s.cell, ev.pos, ev.v AS m
       |  FROM seeds s JOIN ev ON s.vec_id = ev.vec_id),
       |${iAssign(0, "c0")},
       |${iRecompute(1, "assign0")},
       |${iAssign(1, "c1")},
       |${iRecompute(2, "assign1")},
       |${iAssign(2, "c2")},
       |qdot AS (
       |  SELECT ev.vec_id AS qid, c.cell, SUM(ev.v * c.m) AS d
       |  FROM ev JOIN c2 c ON ev.pos = c.pos
       |  WHERE ev.vec_id < 20 GROUP BY 1, 2),
       |qcells AS (
       |  SELECT qid, cell FROM (
       |    SELECT q.qid, q.cell, row_number() OVER (
       |      PARTITION BY q.qid
       |      ORDER BY q.d / (en.nrm * cn2.nrm) DESC, q.cell ASC) AS pr
       |    FROM qdot q JOIN en ON q.qid = en.vec_id
       |    JOIN cn2 ON q.cell = cn2.cell)
       |  WHERE pr <= $NProbe),
       |rsv AS (
       |  SELECT ev.vec_id, CAST((ev.pos - 1) // $PqSubDim AS INT) AS sub,
       |    (ev.pos - 1) % $PqSubDim AS spos, ev.v - c.m AS v
       |  FROM ev JOIN assign2 a ON ev.vec_id = a.vec_id
       |  JOIN c2 c ON c.cell = a.cell AND c.pos = ev.pos),
       |pseeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
       |    vec_id
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqK),
       |pcb0 AS (
       |  SELECT rsv.sub, s.cell, rsv.spos, rsv.v AS m
       |  FROM pseeds s JOIN rsv ON s.vec_id = rsv.vec_id),
       |${pAssign(0)},
       |${pRecompute(0)},
       |${pAssign(1)},
       |${pRecompute(1)},
       |${pAssign(2)},
       |qrv AS (
       |  SELECT ev.vec_id AS qid, qc.cell AS pcell,
       |    CAST((ev.pos - 1) // $PqSubDim AS INT) AS sub,
       |    (ev.pos - 1) % $PqSubDim AS spos, ev.v - c.m AS v
       |  FROM ev JOIN qcells qc ON ev.vec_id = qc.qid
       |  JOIN c2 c ON c.cell = qc.cell AND c.pos = ev.pos),
       |qdt AS (
       |  SELECT q.qid, q.pcell, q.sub, c.cell,
       |    SUM((q.v - c.m) * (q.v - c.m)) AS d
       |  FROM qrv q JOIN pcb2 c ON q.sub = c.sub AND q.spos = c.spos
       |  GROUP BY 1, 2, 3, 4),
       |cand AS (
       |  SELECT qc.qid, a.vec_id, qc.cell
       |  FROM qcells qc JOIN assign2 a ON qc.cell = a.cell),
       |adist AS (
       |  SELECT cd.qid, cd.vec_id, round(SUM(q.d), 6) AS adist
       |  FROM cand cd
       |  JOIN pasg2 a ON a.vec_id = cd.vec_id
       |  JOIN qdt q ON q.qid = cd.qid AND q.pcell = cd.cell
       |    AND q.sub = a.sub AND q.cell = a.cell
       |  GROUP BY 1, 2)
       |SELECT qid, vec_id, adist, rnk FROM (
       |  SELECT qid, vec_id, adist, row_number() OVER (
       |    PARTITION BY qid ORDER BY adist ASC, vec_id ASC) AS rnk
       |  FROM adist) WHERE rnk <= 5""".stripMargin
  }

  /** Composed oracle: the ivfSql training chain (cells + corpus
    * assignment + query probe cells) and the pqSql training chain
    * (codebooks + corpus codes + query distance tables, CTEs prefixed
    * `p`) side by side, then candidates = probed cells and ADC over
    * candidates only. */
  private def ivfpqSql: String = {
    def iAssign(n: Int, centSrc: String): String =
      s"""cn$n AS (SELECT cell, sqrt(SUM(m * m)) AS nrm
         |  FROM $centSrc GROUP BY 1),
         |dot$n AS (
         |  SELECT ev.vec_id, c.cell, SUM(ev.v * c.m) AS d
         |  FROM ev JOIN $centSrc c ON ev.pos = c.pos GROUP BY 1, 2),
         |assign$n AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT d.vec_id, d.cell, row_number() OVER (
         |      PARTITION BY d.vec_id
         |      ORDER BY d.d / (en.nrm * cn$n.nrm) DESC, d.cell ASC) AS rn
         |    FROM dot$n d JOIN en ON d.vec_id = en.vec_id
         |    JOIN cn$n ON d.cell = cn$n.cell)
         |  WHERE rn = 1)""".stripMargin
    def iRecompute(n: Int, fromAssign: String): String =
      s"""c$n AS (
         |  SELECT a.cell, ev.pos,
         |    CAST(SUM(CAST(round(ev.v * 1e6) AS BIGINT)) AS DOUBLE)
         |      / 1e6 / COUNT(*) AS m
         |  FROM $fromAssign a JOIN ev ON a.vec_id = ev.vec_id
         |  GROUP BY 1, 2)""".stripMargin
    def pAssign(n: Int): String =
      s"""pdist$n AS (
         |  SELECT sv.vec_id, sv.sub, c.cell,
         |    SUM((sv.v - c.m) * (sv.v - c.m)) AS d
         |  FROM sv JOIN pcb$n c ON sv.sub = c.sub AND sv.spos = c.spos
         |  GROUP BY 1, 2, 3),
         |pasg$n AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell, row_number() OVER (
         |      PARTITION BY vec_id, sub ORDER BY d ASC, cell ASC) AS rn
         |    FROM pdist$n) WHERE rn = 1)""".stripMargin
    def pRecompute(n: Int): String =
      s"""pcb${n + 1} AS (
         |  SELECT a.sub, a.cell, sv.spos,
         |    CAST(SUM(CAST(round(sv.v * 1e6) AS BIGINT)) AS DOUBLE)
         |      / 1e6 / COUNT(*) AS m
         |  FROM pasg$n a JOIN sv
         |    ON a.vec_id = sv.vec_id AND a.sub = sv.sub
         |  GROUP BY 1, 2, 3)""".stripMargin
    s"""WITH ev AS (
       |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings
       |  CROSS JOIN unnest(range(1, len(embedding)+1)) AS t(i)),
       |en AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ev GROUP BY 1),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
       |    vec_id
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $NCells),
       |c0 AS (
       |  SELECT s.cell, ev.pos, ev.v AS m
       |  FROM seeds s JOIN ev ON s.vec_id = ev.vec_id),
       |${iAssign(0, "c0")},
       |${iRecompute(1, "assign0")},
       |${iAssign(1, "c1")},
       |${iRecompute(2, "assign1")},
       |${iAssign(2, "c2")},
       |qdot AS (
       |  SELECT ev.vec_id AS qid, c.cell, SUM(ev.v * c.m) AS d
       |  FROM ev JOIN c2 c ON ev.pos = c.pos
       |  WHERE ev.vec_id < 20 GROUP BY 1, 2),
       |qcells AS (
       |  SELECT qid, cell FROM (
       |    SELECT q.qid, q.cell, row_number() OVER (
       |      PARTITION BY q.qid
       |      ORDER BY q.d / (en.nrm * cn2.nrm) DESC, q.cell ASC) AS pr
       |    FROM qdot q JOIN en ON q.qid = en.vec_id
       |    JOIN cn2 ON q.cell = cn2.cell)
       |  WHERE pr <= $NProbe),
       |sv AS (
       |  SELECT vec_id, CAST((pos - 1) // $PqSubDim AS INT) AS sub,
       |    (pos - 1) % $PqSubDim AS spos, v
       |  FROM ev),
       |pseeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
       |    vec_id
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqK),
       |pcb0 AS (
       |  SELECT sv.sub, s.cell, sv.spos, sv.v AS m
       |  FROM pseeds s JOIN sv ON s.vec_id = sv.vec_id),
       |${pAssign(0)},
       |${pRecompute(0)},
       |${pAssign(1)},
       |${pRecompute(1)},
       |${pAssign(2)},
       |qdt AS (
       |  SELECT sv.vec_id AS qid, sv.sub, c.cell,
       |    SUM((sv.v - c.m) * (sv.v - c.m)) AS d
       |  FROM sv JOIN pcb2 c ON sv.sub = c.sub AND sv.spos = c.spos
       |  WHERE sv.vec_id < 20 GROUP BY 1, 2, 3),
       |cand AS (
       |  SELECT qc.qid, a.vec_id
       |  FROM qcells qc JOIN assign2 a ON qc.cell = a.cell),
       |adist AS (
       |  SELECT c.qid, c.vec_id, round(SUM(q.d), 6) AS adist
       |  FROM cand c
       |  JOIN pasg2 a ON a.vec_id = c.vec_id
       |  JOIN qdt q ON q.qid = c.qid
       |    AND q.sub = a.sub AND q.cell = a.cell
       |  GROUP BY 1, 2)
       |SELECT qid, vec_id, adist, rnk FROM (
       |  SELECT qid, vec_id, adist, row_number() OVER (
       |    PARTITION BY qid ORDER BY adist ASC, vec_id ASC) AS rnk
       |  FROM adist) WHERE rnk <= 5""".stripMargin
  }

  /** Full DuckDB oracle for the multiprobe-LSH ANN query (r4 — this
    * was the suite's last rows-only batch query): the ±1 hyperplane
    * sign matrix is deterministic (seeded), so the oracle carries it —
    * and the 697 probe masks — as VALUES literals (the generated-SQL
    * pattern simhashSql established) and rebuilds bucket assignment,
    * probe expansion, the bucket equi-join, exact cosine, and the
    * top-5 window from first principles. Sign-boundary float risk is
    * negligible: projections are O(1)-magnitude sums of 64 products;
    * a cross-engine summation-order flip would need |proj| ≲ 1e-12. */
  private def annLshSql: String = {
    val signs = VectorOps.signsFor(Dim, NBits, 42L)
    val signRows = (for (k <- 0 until NBits; d <- 0 until Dim)
      yield s"($k,${d + 1},${signs(k)(d).toInt})").mkString(",")
    val maskRows = probeMasks(NBits, Probe).map(m => s"($m)").mkString(",")
    s"""WITH signs(plane, dim, sgn) AS (VALUES $signRows),
       |masks(m) AS (VALUES $maskRows),
       |proj AS (
       |  SELECT e.vec_id, s.plane,
       |    SUM(s.sgn * CAST(e.embedding[s.dim] AS DOUBLE)) AS p
       |  FROM embeddings e, signs s GROUP BY 1, 2),
       |b AS (
       |  SELECT vec_id,
       |    CAST(SUM(CASE WHEN p > 0 THEN CAST(power(2, plane) AS BIGINT)
       |             ELSE 0 END) AS BIGINT) AS bucket
       |  FROM proj GROUP BY 1),
       |probes AS (
       |  SELECT q.vec_id AS qid, xor(q.bucket, m.m) AS bucket
       |  FROM b q, masks m WHERE q.vec_id < 20),
       |cand AS (
       |  SELECT p.qid, c.vec_id FROM probes p JOIN b c USING (bucket)),
       |scored AS (
       |  SELECT cand.qid, cand.vec_id,
       |    round(
       |      list_sum(list_transform(range(1, len(a.embedding)+1),
       |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1),
       |           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
       |       * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1),
       |           i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))),
       |      6) AS cos
       |  FROM cand
       |  JOIN embeddings a ON cand.qid = a.vec_id
       |  JOIN embeddings c ON cand.vec_id = c.vec_id)
       |SELECT qid, vec_id, cos, rnk FROM (
       |  SELECT qid, vec_id, cos, row_number() OVER (
       |    PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5""".stripMargin
  }

  /** Full DuckDB oracle for the IVF ANN query (r4 — with md5 seeding
    * both engines share, the ENTIRE training run is SQL-expressible):
    * seed sample by md5 order, both Lloyd rounds UNROLLED as CTE
    * chains (assignment = argmax cosine with ties to the smallest
    * cell = one window rank; recomputation = the same 1e-6-quantized
    * long-sum mean the Spark side uses, so centroids agree exactly),
    * then probe-cell selection, the cell equi-join, exact cosine
    * rerank, and the top-5 window. Generated per Lloyd round from one
    * template — the SQL mirrors trainIvf/assignCells/ivfRanked
    * structurally. */
  private def ivfSql: String = {
    // one Lloyd round: centroids (cell,pos,m) + norms from the given
    // centroid CTE; emits assignN over raw doubles
    def assignCte(n: Int, centSrc: String): String =
      s"""cn$n AS (SELECT cell, sqrt(SUM(m * m)) AS nrm
         |  FROM $centSrc GROUP BY 1),
         |dot$n AS (
         |  SELECT ev.vec_id, c.cell, SUM(ev.v * c.m) AS d
         |  FROM ev JOIN $centSrc c ON ev.pos = c.pos GROUP BY 1, 2),
         |assign$n AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT d.vec_id, d.cell, row_number() OVER (
         |      PARTITION BY d.vec_id
         |      ORDER BY d.d / (en.nrm * cn$n.nrm) DESC, d.cell ASC) AS rn
         |    FROM dot$n d JOIN en ON d.vec_id = en.vec_id
         |    JOIN cn$n ON d.cell = cn$n.cell)
         |  WHERE rn = 1)""".stripMargin
    def recomputeCte(n: Int, fromAssign: String): String =
      s"""c$n AS (
         |  SELECT a.cell, ev.pos,
         |    CAST(SUM(CAST(round(ev.v * 1e6) AS BIGINT)) AS DOUBLE)
         |      / 1e6 / COUNT(*) AS m
         |  FROM $fromAssign a JOIN ev ON a.vec_id = ev.vec_id
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH ev AS (
       |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings CROSS JOIN unnest(range(1, len(embedding)+1)) AS t(i)),
       |en AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ev GROUP BY 1),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
       |    vec_id
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $NCells),
       |c0 AS (
       |  SELECT s.cell, ev.pos, ev.v AS m
       |  FROM seeds s JOIN ev ON s.vec_id = ev.vec_id),
       |${assignCte(0, "c0")},
       |${recomputeCte(1, "assign0")},
       |${assignCte(1, "c1")},
       |${recomputeCte(2, "assign1")},
       |${assignCte(2, "c2")},
       |qdot AS (
       |  SELECT ev.vec_id AS qid, c.cell, SUM(ev.v * c.m) AS d
       |  FROM ev JOIN c2 c ON ev.pos = c.pos
       |  WHERE ev.vec_id < 20 GROUP BY 1, 2),
       |qcells AS (
       |  SELECT qid, cell FROM (
       |    SELECT q.qid, q.cell, row_number() OVER (
       |      PARTITION BY q.qid
       |      ORDER BY q.d / (en.nrm * cn2.nrm) DESC, q.cell ASC) AS pr
       |    FROM qdot q JOIN en ON q.qid = en.vec_id
       |    JOIN cn2 ON q.cell = cn2.cell)
       |  WHERE pr <= $NProbe),
       |cand AS (
       |  SELECT qc.qid, a.vec_id
       |  FROM qcells qc JOIN assign2 a ON qc.cell = a.cell),
       |dots AS (
       |  SELECT cand.qid, cand.vec_id, SUM(qa.v * ca.v) AS d
       |  FROM cand
       |  JOIN ev qa ON cand.qid = qa.vec_id
       |  JOIN ev ca ON cand.vec_id = ca.vec_id AND qa.pos = ca.pos
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT dots.qid, dots.vec_id,
       |    round(dots.d / (eq.nrm * ec.nrm), 6) AS cos
       |  FROM dots JOIN en eq ON dots.qid = eq.vec_id
       |  JOIN en ec ON dots.vec_id = ec.vec_id)
       |SELECT qid, vec_id, cos, rnk FROM (
       |  SELECT qid, vec_id, cos, row_number() OVER (
       |    PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM scored) WHERE rnk <= 5""".stripMargin
  }

  /** Recall@5 of the multiprobe-LSH index against the EXACT brute-force
    * top-5 — the eval harness every ANN deployment runs before trusting
    * an index (and re-runs as the corpus drifts). Both arms use the
    * identical rounded-cosine + vec_id tiebreak, so the top-5 SETS are
    * deterministic in both engines and recall is exactly defined; the
    * oracle rebuilds BOTH arms (the sign-matrix/probe-mask LSH pipeline
    * annLshSql established, plus the 20×N exact scan) and intersects.
    * Per-query output (n_hit, recall) rather than one average: the
    * distribution is what tells you WHICH queries the index fails.
    * Scale: the brute arm is the expensive one by design — 20 probe
    * queries × corpus, the same bounded evaluation budget a production
    * recall audit uses (sampled queries, never all-pairs). */
  private val annRecallQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val lsh = annQ(s, dir).select(col("qid"), col("vec_id"))
    val q20 = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val bf = e.crossJoin(broadcast(q20))
      .select(col("qid"), col("vec_id"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("vec_id"))
    val hits = bf.join(lsh, Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    q20.select(col("qid")).join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / 5.0, 6).as("recall_at_5"))
  }

  private def annRecallSql: String = {
    val signs = VectorOps.signsFor(Dim, NBits, 42L)
    val signRows = (for (k <- 0 until NBits; d <- 0 until Dim)
      yield s"($k,${d + 1},${signs(k)(d).toInt})").mkString(",")
    val maskRows = probeMasks(NBits, Probe).map(m => s"($m)").mkString(",")
    s"""WITH signs(plane, dim, sgn) AS (VALUES $signRows),
       |masks(m) AS (VALUES $maskRows),
       |proj AS (
       |  SELECT e.vec_id, s.plane,
       |    SUM(s.sgn * CAST(e.embedding[s.dim] AS DOUBLE)) AS p
       |  FROM embeddings e, signs s GROUP BY 1, 2),
       |b AS (
       |  SELECT vec_id,
       |    CAST(SUM(CASE WHEN p > 0 THEN CAST(power(2, plane) AS BIGINT)
       |             ELSE 0 END) AS BIGINT) AS bucket
       |  FROM proj GROUP BY 1),
       |probes AS (
       |  SELECT q.vec_id AS qid, xor(q.bucket, m.m) AS bucket
       |  FROM b q, masks m WHERE q.vec_id < 20),
       |cand AS (
       |  SELECT p.qid, c.vec_id FROM probes p JOIN b c USING (bucket)),
       |nrm AS (
       |  SELECT vec_id, sqrt(list_sum(list_transform(
       |    range(1, len(embedding)+1),
       |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
       |    AS nrm
       |  FROM embeddings),
       |lscored AS (
       |  SELECT cand.qid, cand.vec_id,
       |    round(list_sum(list_transform(range(1, len(a.embedding)+1),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |      / (qn.nrm * cn.nrm), 6) AS cos
       |  FROM cand
       |  JOIN embeddings a ON cand.qid = a.vec_id
       |  JOIN embeddings c ON cand.vec_id = c.vec_id
       |  JOIN nrm qn ON cand.qid = qn.vec_id
       |  JOIN nrm cn ON cand.vec_id = cn.vec_id),
       |lsh AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |    FROM lscored) WHERE rnk <= 5),
       |bscored AS (
       |  SELECT a.vec_id AS qid, c.vec_id,
       |    round(list_sum(list_transform(range(1, len(a.embedding)+1),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |      / (qn.nrm * cn.nrm), 6) AS cos
       |  FROM embeddings a
       |  JOIN nrm qn ON a.vec_id = qn.vec_id
       |  CROSS JOIN embeddings c
       |  JOIN nrm cn ON c.vec_id = cn.vec_id
       |  WHERE a.vec_id < 20),
       |bf AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (
       |      PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |    FROM bscored) WHERE rnk <= 5),
       |hits AS (
       |  SELECT bf.qid, COUNT(*) AS n_hit
       |  FROM bf JOIN lsh ON bf.qid = lsh.qid AND bf.vec_id = lsh.vec_id
       |  GROUP BY 1)
       |SELECT q.vec_id AS qid, COALESCE(h.n_hit, 0) AS n_hit,
       |  round(COALESCE(h.n_hit, 0) / 5.0, 6) AS recall_at_5
       |FROM embeddings q LEFT JOIN hits h ON q.vec_id = h.qid
       |WHERE q.vec_id < 20""".stripMargin
  }

  /** Corpus + an exact clone (vec_id + 10000) of each query vector —
    * the planted ground truth that makes ANN top-k SQL-expressible:
    * excluding self, the nearest neighbor of query q IS clone q+10000
    * (cosine exactly 1), and any correct ANN index must retrieve it
    * (an identical vector shares the query's bucket / cell by
    * construction). Promotes both ANN paths from rows-only to
    * oracle-checked. */
  private def withClones(e: DataFrame): DataFrame = {
    val base = e.select(col("vec_id"), col("embedding"))
    base.unionByName(base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
  }

  private val plantedSql =
    """SELECT vec_id AS qid, vec_id + 10000 AS best
      |FROM embeddings WHERE vec_id < 20""".stripMargin

  private val annLshPlantedQ = (s: SparkSession, dir: String) => {
    val e0 = Tables.embeddings(s, dir)
    val e = withClones(e0)
      .withColumn("bucket", VectorOps.rhpBucket(col("embedding"), Dim, NBits))
    val probes = e0.filter(col("vec_id") < 20)
      .withColumn("bucket", VectorOps.rhpBucket(col("embedding"), Dim, NBits))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bucket").as("qbucket"))
      .withColumn("mask", explode(typedLit(probeMasks(NBits, Probe))))
      .select(col("qid"), col("qe"),
        col("qbucket").bitwiseXOR(col("mask")).as("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid")) // exclude self; clone remains
      .select(col("qid"), col("vec_id"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("qid"), col("vec_id").as("best"))
  }

  private val annIvfPlantedQ = (s: SparkSession, dir: String) => {
    val e0 = Tables.embeddings(s, dir)
    ivfRanked(withClones(e0), e0.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe")))
      .filter(col("vec_id") =!= col("qid"))
      .filter(col("rnk") <= 2) // self may hold rank 1; clone then rank 2
      .withColumn("r2", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("rnk").asc)))
      .filter(col("r2") === 1)
      .select(col("qid"), col("vec_id").as("best"))
  }

  // ------------------------------------------------------------------
  // Materialized ANN index — the "bucket/cell precomputed at ingest"
  // claim made real: the corpus is rewritten ONCE into the object
  // layout with stored `bucket` (LSH) and `cell` (IVF) columns plus a
  // stored centroid table, and the search queries consume the stored
  // columns — query plans carry NO rhp_bucket / assignCells recompute
  // over the corpus (AnnIndexSpec asserts it). The corpus objects are
  // range-partitioned on `bucket`, so the object-store min/max index
  // prunes whole objects for bucket-equality probes — the 100 TB path
  // where a probe touches ~C(nBits,≤probe)/2^nBits of the data and
  // only the objects that hold those buckets are opened.
  // ------------------------------------------------------------------

  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per session × sfDir) the materialized index over the
    * planted-clone corpus; returns its root. Ingest-time work — the
    * one-off cost every index pays; queries below read only the
    * stored layout. */
  private[graft] def annIndexRoot(s: SparkSession, dir: String): String =
    indexCache.computeIfAbsent(s"${System.identityHashCode(s)}|$dir", { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft-annidx").toString
      val corpus = withClones(Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding")))
      val cents = trainIvf(corpus)
      cents.coalesce(1).write.format("graft-objects")
        .mode("overwrite").save(s"$root/centroids")
      val storedCents = s.read.format("graft-objects").load(s"$root/centroids")
      assignCells(corpus, storedCents)
        .withColumn("bucket", VectorOps.rhpBucket(col("embedding"), Dim, NBits))
        .repartitionByRange(8, col("bucket"))
        .write.format("graft-objects").mode("overwrite").save(s"$root/corpus")
      // PQ sidecar (r4 verdict #2): the production FAISS layout stores
      // the 8×4-bit codes — train once at ingest over the plain corpus
      // (the pqSql oracle's training set), persist the codebook (tiny)
      // and the per-vector codes (8 small ints — the 32× shrink that
      // makes the ADC scan cache-resident), so query time never runs
      // pqEncode over the corpus again.
      val plain = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val pqCb = trainPq(plain)
      pqCb.coalesce(1).write.format("graft-objects")
        .mode("overwrite").save(s"$root/pq_codebook")
      val storedCb = s.read.format("graft-objects").load(s"$root/pq_codebook")
      pqEncode(plain, storedCb).select(col("vec_id"), col("codes"))
        .repartitionByRange(4, col("vec_id"))
        .write.format("graft-objects").mode("overwrite").save(s"$root/pq_codes")
      root
    })

  /** LSH search over the STORED index: probes (20 query rows) explode
    * into their XOR buckets; the corpus side is a plain object-store
    * scan of the stored `bucket` column — zero per-row hashing at
    * query time, hash join on the stored key. Planted clones make it
    * oracle-checkable (clone q+10000 is the exact nearest non-self
    * neighbor by construction). */
  private val annLshIndexedQ = (s: SparkSession, dir: String) => {
    val root = annIndexRoot(s, dir)
    val corpus = s.read.format("graft-objects").load(s"$root/corpus")
    val probes = Tables.embeddings(s, dir).filter(col("vec_id") < 20)
      .withColumn("bucket", VectorOps.rhpBucket(col("embedding"), Dim, NBits))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bucket").as("qbucket"))
      .withColumn("mask", explode(typedLit(probeMasks(NBits, Probe))))
      .select(col("qid"), col("qe"),
        col("qbucket").bitwiseXOR(col("mask")).as("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid")) // exclude self; clone remains
      .select(col("qid"), col("vec_id"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("qid"), col("vec_id").as("best"))
  }

  /** IVF search over the STORED index: probe cells come from the
    * stored centroid table (tiny, broadcast); candidates come from an
    * equi-join on the stored `cell` column — no Lloyd recompute, no
    * per-row argmax over the corpus at query time. */
  private val annIvfIndexedQ = (s: SparkSession, dir: String) => {
    val root = annIndexRoot(s, dir)
    val corpus = s.read.format("graft-objects").load(s"$root/corpus")
    val cents = s.read.format("graft-objects").load(s"$root/centroids")
    val queries = Tables.embeddings(s, dir).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val qcells = queries
      .crossJoin(broadcast(cents))
      .withColumn("qc", cosNative(col("qe"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("qc").desc, col("cell").asc)))
      .filter(col("pr") <= NProbe)
      .select(col("qid"), col("qe"), col("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    corpus.join(broadcast(qcells), Seq("cell"))
      .select(col("qid"), col("vec_id"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("vec_id") =!= col("qid"))
      .filter(col("rnk") <= 2) // self may hold rank 1; clone then rank 2
      .withColumn("r2", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("rnk").asc)))
      .filter(col("r2") === 1)
      .select(col("qid"), col("vec_id").as("best"))
  }

  /** PQ ADC search over the STORED index: the codebook comes from the
    * persisted sidecar (tiny, broadcast into the per-query distance
    * tables) and the corpus side is a plain object-store scan of the
    * stored 8-int `codes` column — the `embedding` column is never
    * read on the corpus side and no pqEncode/trainPq runs at query
    * time (AnnIndexSpec asserts both). Identical output to
    * q_sim_ann_pq, so it shares the full-training oracle. */
  private val annPqIndexedQ = (s: SparkSession, dir: String) => {
    val root = annIndexRoot(s, dir)
    val cb = s.read.format("graft-objects").load(s"$root/pq_codebook")
    val codes = s.read.format("graft-objects").load(s"$root/pq_codes")
    val queries = Tables.embeddings(s, dir).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    pqAdcScan(codes, cb, queries)
  }

  /** Same query through the native codegen Expression (functions/
    * CosineSimilarity) — the SURVEY §4.2 perf path. Bit-identical to
    * the HOF fold by construction, so it shares the brute oracle.
    */
  private val bruteNativeQ = (s: SparkSession, dir: String) => {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(call_function("cosine_sim", col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
  }

  /** int8 scalar quantization — the embedding-compression pass a 100 TB
    * vector corpus runs before indexing (4× smaller than float32, and
    * the dequantization error is bounded by scale/2 per element). Pure
    * per-row map work: min/max over the array, affine code, dequantize,
    * max abs reconstruction error — zero shuffles, runs at scan speed.
    * The oracle recomputes the identical double arithmetic in DuckDB
    * (float→double widening is exact in both engines; round-half-up
    * agrees on the non-negative code domain). */
  private val quantQ = (s: SparkSession, dir: String) =>
    Tables.embeddings(s, dir)
      .withColumn("mn", array_min(col("embedding")).cast("double"))
      .withColumn("mx", array_max(col("embedding")).cast("double"))
      .withColumn("scale",
        greatest((col("mx") - col("mn")) / lit(255.0), lit(1e-12)))
      .withColumn("raw_err",
        array_max(transform(col("embedding"), v =>
          abs(v.cast("double") - (col("mn") +
            round((v.cast("double") - col("mn")) / col("scale")) * col("scale"))))))
      // bound checked on the RAW error — rounding the error for display
      // can round it up past scale/2
      .select(col("vec_id"), size(col("embedding")).cast("long").as("n_dims"),
        round(col("raw_err"), 6).as("max_err"),
        (col("raw_err") <= col("scale") / 2 + lit(1e-9)).as("within_bound"))

  private val quantSql =
    """WITH q AS (
      |  SELECT vec_id, len(embedding) AS n_dims,
      |    list_min(embedding)::DOUBLE AS mn,
      |    list_max(embedding)::DOUBLE AS mx, embedding
      |  FROM embeddings),
      |s AS (
      |  SELECT *, greatest((mx - mn) / 255.0, 1e-12) AS scale FROM q),
      |e AS (
      |  SELECT vec_id, n_dims, scale,
      |    list_max(list_transform(embedding, v ->
      |      abs(v::DOUBLE - (mn + round((v::DOUBLE - mn) / scale) * scale))))
      |      AS raw_err
      |  FROM s)
      |SELECT vec_id, n_dims, round(raw_err, 6) AS max_err,
      |  raw_err <= scale / 2 + 1e-9 AS within_bound
      |FROM e""".stripMargin

  /** Per-label centroid — element-wise mean vector per class (the
    * class-prototype / centroid-classifier build). Same plan shape as
    * the IVF Lloyd recompute: posexplode → groupBy(label, pos) with
    * map-side partials (exchange carries labels×dim partial rows, not
    * the corpus), means order-insensitive via 1e-6-quantized long sums.
    * Centroid rendered as a joined milli-scaled int string (the driver
    * comparator cannot hash list columns). */
  private val centroidQ = (s: SparkSession, dir: String) =>
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(round(col("v").cast("double") * 1e6).cast("long"))
        .cast("double") / 1e6 / count(lit(1))).as("m"),
        count(lit(1)).as("cnt"))
      .groupBy(col("label"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => round(x.getField("m") * 1000).cast("long").cast("string")),
          ",").as("centroid_milli"),
        count(lit(1)).as("n_dims"),
        max(col("cnt")).as("n_vecs"))

  /** Centroid silhouette — the cluster-quality eval beside recall@5
    * (the ANN eval): per vector, a = Euclidean distance to its OWN
    * label centroid, b = distance to the nearest OTHER centroid,
    * s = (b−a)/max(a,b); reported per label as the quantized mean plus
    * the misfit count (s < 0 ⇒ the vector sits closer to a foreign
    * centroid — the rows a curator relabels or drops). Plan: one
    * partial-agg exchange builds the labels×dim centroid table
    * (quantized long-sum means, bit-identical cross-engine), which
    * collapses to ONE broadcast row; every distance is then a map-side
    * fold over the |labels| centroids — the corpus is never joined or
    * shuffled for scoring, and the final rollup is |labels| rows.
    * Per-vector s quantizes to 1e-6 ints BEFORE the mean so the
    * rollup sum is order-insensitive; sqrt is IEEE-exact in both
    * engines (the 64-term sums carry the same negligible boundary
    * risk ivfSql documents). */
  private val silhouetteQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(round(col("v").cast("double") * 1e6).cast("long"))
        .cast("double") / 1e6 / count(lit(1))).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x("m")).as("centroid"))
      .agg(array_sort(collect_list(struct(col("label"), col("centroid"))))
        .as("cb"))
    e.select(col("vec_id"), col("label").as("lbl"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("dists", expr(
        """transform(cb, c -> struct(c.label as l,
          |  sqrt(aggregate(zip_with(embedding, c.centroid,
          |    (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),
          |    cast(0 as double), (p, q) -> p + q)) as d))""".stripMargin))
      .withColumn("a", expr("filter(dists, x -> x.l = lbl)[0].d"))
      .withColumn("b", expr(
        "array_min(transform(filter(dists, x -> x.l != lbl), x -> x.d))"))
      .withColumn("s_q",
        round((col("b") - col("a")) / greatest(col("a"), col("b")) * 1e6)
          .cast("long"))
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("s_q")) / count(lit(1)) / 1e6, 6).as("avg_silhouette"),
        sum(when(col("s_q") < 0, 1L).otherwise(0L)).as("n_misfit"))
      .select(col("lbl").as("label"), col("n_vecs"),
        col("avg_silhouette"), col("n_misfit"))
  }

  private val silhouetteSql =
    """WITH ev AS (
      |  SELECT vec_id, label, t.i - 1 AS pos,
      |    CAST(embedding[t.i] AS DOUBLE) AS v
      |  FROM embeddings,
      |    LATERAL unnest(generate_series(1, len(embedding))) AS t(i)),
      |p AS (
      |  SELECT label, pos,
      |    CAST(SUM(CAST(round(v * 1e6) AS BIGINT)) AS DOUBLE)
      |      / 1e6 / COUNT(*) AS m
      |  FROM ev GROUP BY 1, 2),
      |d AS (
      |  SELECT ev.vec_id, ev.label AS lbl, p.label AS cl,
      |    sqrt(SUM((ev.v - p.m) * (ev.v - p.m))) AS d
      |  FROM ev JOIN p ON ev.pos = p.pos GROUP BY 1, 2, 3),
      |ab AS (
      |  SELECT vec_id, lbl,
      |    MIN(CASE WHEN cl = lbl THEN d END) AS a,
      |    MIN(CASE WHEN cl <> lbl THEN d END) AS b
      |  FROM d GROUP BY 1, 2),
      |sq AS (
      |  SELECT lbl,
      |    CAST(round((b - a) / greatest(a, b) * 1e6) AS BIGINT) AS s_q
      |  FROM ab)
      |SELECT lbl AS label, COUNT(*) AS n_vecs,
      |  round(CAST(SUM(s_q) AS BIGINT) / COUNT(*) / 1e6, 6) AS avg_silhouette,
      |  CAST(SUM(CASE WHEN s_q < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_misfit
      |FROM sq GROUP BY 1""".stripMargin

  private val centroidSql =
    """WITH e AS (
      |  SELECT label, t.i - 1 AS pos, embedding[t.i] AS v
      |  FROM embeddings,
      |    LATERAL unnest(generate_series(1, len(embedding))) AS t(i)),
      |p AS (
      |  SELECT label, pos,
      |    CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
      |      AS DOUBLE) / 1000000 / COUNT(*) AS m,
      |    COUNT(*) AS cnt
      |  FROM e GROUP BY label, pos)
      |SELECT label,
      |  array_to_string(
      |    list(CAST(CAST(round(m * 1000) AS BIGINT) AS VARCHAR)
      |      ORDER BY pos), ',') AS centroid_milli,
      |  COUNT(*) AS n_dims,
      |  CAST(MAX(cnt) AS BIGINT) AS n_vecs
      |FROM p GROUP BY label""".stripMargin

  // ---- top principal direction via integer power iteration --------
  //
  // The leading singular direction of the (uncentered) embedding Gram
  // matrix G(i,j) = Σ_v eᵢ·eⱼ on milli-quantized components — the PCA
  // primitive (dominant variance axis) every embedding-space pipeline
  // wants, built so both engines agree to the BIT: the corpus-scale
  // work is ONE pass (nested posexplode → groupBy(i,j), map-side
  // partials collapse to ≤ dim² rows per partition before the
  // exchange — no self-join of the corpus); the power loop then runs
  // on the dim²-row G with INTEGER arithmetic only: w = G·v in BIGINT,
  // rescaled each round to max |v| = 1000 by integer division — no
  // sqrt, no float normalization, so no engine divergence and no
  // accumulation-order sensitivity anywhere.
  //
  // MAGNITUDE BOUND: |G| ≤ rows·10⁶ (milli components ≤ 10³), so
  // w ≤ dim·10³·|G| stays in BIGINT while rows ≲ 10⁸ per the widest
  // term dim·10⁹·rows; past that, re-quantize v to max 100 (one-line
  // change, same loop). 12 rounds: the fixture Gram spectrum is
  // random-matrix flat (λ₂/λ₁ ≈ 0.9), so convergence needs the extra
  // doublings — each round is one dim²-row join, so the cost is noise
  // (spec asserts Rayleigh dominance + near-eigenvector alignment).
  private val PcaIters = 12

  private val pcaPowerQ = (s: SparkSession, dir: String) => {
    val em = Tables.embeddings(s, dir).select(
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")
        .as("em"))
    val g = em
      .select(posexplode(col("em")).as(Seq("i", "ei")), col("em"))
      .select(col("i"), col("ei"),
        posexplode(col("em")).as(Seq("j", "ej")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("ei") * col("ej")).as("g"))
      .localCheckpoint()
    var v = s.range(0, Dim.toLong)
      .select(col("id").cast("int").as("j"), lit(1000L).as("vj"))
    for (_ <- 1 to PcaIters) {
      val w = g.join(v, "j")
        .groupBy(col("i"))
        .agg(sum(col("g") * col("vj")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      v = w.crossJoin(broadcast(m))
        .select(col("i").as("j"), expr("(w * 1000) div m").as("vj"))
        .localCheckpoint()
    }
    v.select(col("j").as("pos"), col("vj").as("v_milli"))
  }

  // Every iteration CTE is AS MATERIALIZED: w_k is referenced twice
  // (by m_k and v_k), so DuckDB's single-reference inlining would
  // otherwise expand the chain 2^iters times — exponential plan
  // blowup, measured in MINUTES past 8 rounds. Materialization pins
  // each round to one evaluation, like the Spark side's
  // localCheckpoint.
  private def pcaPowerSql: String = {
    def iter(k: Int): String =
      s"""w$k AS MATERIALIZED (
         |  SELECT g.i, SUM(g.g * v.vj) AS w
         |  FROM g JOIN v${k - 1} v ON g.j = v.j GROUP BY g.i),
         |m$k AS MATERIALIZED (SELECT MAX(abs(w)) AS m FROM w$k),
         |v$k AS MATERIALIZED (
         |  SELECT i AS j, (w * 1000) // m AS vj FROM w$k, m$k)"""
        .stripMargin
    s"""WITH em AS (
       |  SELECT list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS em
       |  FROM embeddings),
       |g AS MATERIALIZED (
       |  SELECT a - 1 AS i, b - 1 AS j,
       |    CAST(SUM(CAST(em[a] * em[b] AS DECIMAL(18,0))) AS BIGINT) AS g
       |  FROM em, range(1, ${Dim + 1}) ra(a), range(1, ${Dim + 1}) rb(b)
       |  GROUP BY 1, 2),
       |v0 AS (SELECT a - 1 AS j, CAST(1000 AS BIGINT) AS vj
       |       FROM range(1, ${Dim + 1}) ra(a)),
       |${(1 to PcaIters).map(iter).mkString(",\n")}
       |SELECT j AS pos, CAST(vj AS BIGINT) AS v_milli FROM v$PcaIters"""
      .stripMargin
  }

  // ---- cosine range search (threshold, not top-k) ----------------
  //
  // All vectors within cosine ≥ 0.1 of the vec_id=7 query — the RANGE
  // twin of the brute top-k above: retrieval APIs need both "best k"
  // and "everything at least this similar" (dedup thresholds, recall
  // sweeps). Same plan shape as bruteQ — broadcast query row, codegen
  // cosine, but the cutoff is a FILTER, so no global sort/merge at
  // all: the result streams out of the scan partitions. At 100 TB the
  // LSH/IVF bucket columns prefilter candidates exactly as in the ANN
  // family; the threshold filter composes unchanged.
  private val rangeSearchQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qv = e.filter(col("vec_id") === 7).select(col("embedding").as("qe"))
    e.filter(col("vec_id") =!= 7)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), cosRounded(col("embedding"), col("qe")).as("cos"))
      .filter(col("cos") >= 0.1)
  }

  private val rangeSearchSql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
      |scored AS (
      |  SELECT vec_id,
      |    round(
      |      list_sum(list_transform(range(1, len(embedding)+1),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(range(1, len(embedding)+1),
      |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |           i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))), 6) AS cos
      |  FROM embeddings, q WHERE vec_id <> 7)
      |SELECT vec_id, cos FROM scored WHERE cos >= 0.1""".stripMargin

  // ---- MaxSim late interaction (ColBERT shape) --------------------
  //
  // Multi-vector retrieval scoring: the "query" is a SET of token
  // vectors (vec_id 0-2), each "document" is a label group's vector
  // set, and score(doc) = Σ_q max_t cos(q, t) — the late-interaction
  // operator ColBERT popularized, reduced to relational form: one
  // broadcast of the query tokens, one corpus pass scoring every
  // (doc-token, query-token) pair with the codegen cosine expression,
  // a (label, qid) max — partial maxes combine map-side, so the
  // exchange carries |docs|·|query-tokens| rows, never the corpus —
  // and a decimal-exact final sum (each max is a 6-decimal rounded
  // cosine; DECIMAL(10,6) addition is order-independent, so the
  // partial/final shuffle order can't perturb bits). At 100 TB the
  // first-stage max runs against an ANN-pruned candidate set (the
  // LSH/IVF indexes two queries up) instead of the full corpus —
  // the scoring plan is unchanged.
  private val maxsimQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qs = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    e.filter(col("vec_id") >= 3)
      .crossJoin(broadcast(qs))
      .select(col("label"), col("qid"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .groupBy(col("label"), col("qid"))
      .agg(max(col("cos")).as("mx"))
      .groupBy(col("label"))
      .agg(sum(col("mx").cast("decimal(10,6)")).cast("double").as("maxsim"),
        count(lit(1)).as("n_terms"))
  }

  private val maxsimSql =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qe
      |           FROM embeddings WHERE vec_id < 3),
      |scored AS (
      |  SELECT e.label, q.qid,
      |    round(
      |      list_sum(list_transform(range(1, len(e.embedding)+1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
      |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |           i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))), 6) AS cos
      |  FROM embeddings e, q WHERE e.vec_id >= 3),
      |mx AS (SELECT label, qid, MAX(cos) AS mx
      |       FROM scored GROUP BY 1, 2)
      |SELECT label, CAST(SUM(CAST(mx AS DECIMAL(10,6))) AS DOUBLE) AS maxsim,
      |  COUNT(*) AS n_terms
      |FROM mx GROUP BY 1""".stripMargin

  // ---- per-dimension standardization (z-norm / whitening-lite) ----
  //
  // The ANN-preprocessing step every embedding pipeline runs before
  // indexing: per-dimension mean/std from EXACT micro-integer moments
  // (round(v·10⁶) longs; squares summed in DECIMAL(38)), then one
  // mirrored double expression per value. Plan: ONE partial-agg pass
  // builds the |dims|-row stats table, which broadcasts back onto the
  // (map-side) z-scoring — the corpus is exploded once and never
  // shuffled. Output is the first 3 vectors' z-values, 6-decimal
  // rounded (the full standardized corpus is this same projection
  // without the vec_id filter).
  private val standardizeQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val vm = round(col("v").cast("double") * 1e6).cast("long")
    val dims = e.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("pos"), vm.as("vm"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("s1"),
        sum((col("vm") * col("vm")).cast("decimal(38,0)")).as("s2"))
    val stats = dims.select(col("pos"),
        (col("s1").cast("double") / col("n").cast("double")).as("mu"),
        (col("s2").cast("double") / col("n").cast("double")).as("e2"))
      .select(col("pos"), col("mu"),
        sqrt(col("e2") - col("mu") * col("mu")).as("sd"))
    e.filter(col("vec_id") < 3)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"), vm.as("vm"))
      .join(broadcast(stats), "pos")
      .select(col("vec_id"), col("pos"),
        round((col("vm").cast("double") - col("mu")) / col("sd"), 6).as("zval"))
  }

  private val standardizeSql =
    """WITH x AS (
      |  SELECT vec_id, t.i - 1 AS pos,
      |    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000) AS BIGINT) AS vm
      |  FROM embeddings,
      |    LATERAL unnest(generate_series(1, len(embedding))) AS t(i)),
      |mo AS (
      |  SELECT pos, COUNT(*) AS n, CAST(SUM(vm) AS BIGINT) AS s1,
      |    SUM(CAST(vm * vm AS DECIMAL(38,0))) AS s2
      |  FROM x GROUP BY 1),
      |ms AS (
      |  SELECT pos, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
      |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2
      |  FROM mo),
      |st AS (SELECT pos, mu, sqrt(e2 - mu * mu) AS sd FROM ms)
      |SELECT x.vec_id, x.pos,
      |  round((CAST(x.vm AS DOUBLE) - st.mu) / st.sd, 6) AS zval
      |FROM x JOIN st ON x.pos = st.pos
      |WHERE x.vec_id < 3""".stripMargin

  // ---- pairwise centroid distance matrix --------------------------
  //
  // Cluster-geometry diagnostic: Euclidean distance between every
  // label-centroid pair. Centroid components are FLOOR-divided
  // micro-integers (sum div n — exact, engine-identical), so the
  // squared-distance sum is pure BIGINT; one sqrt at the end. The
  // corpus collapses to |labels|·|dims| rows in one partial-agg pass;
  // the pair matrix is a self-join of a 10-row-per-dim table.
  private val centroidDistQ = (s: SparkSession, dir: String) => {
    val cents = Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"),
        round(col("v").cast("double") * 1e6).cast("long").as("vm"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), expr("s div n").as("cm"))
    val a = cents.select(col("label").as("label_a"), col("pos"),
      col("cm").as("cma"))
    val b = cents.select(col("label").as("label_b"), col("pos"),
      col("cm").as("cmb"))
    a.join(b, Seq("pos")).filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum((col("cma") - col("cmb")) * (col("cma") - col("cmb"))).as("d2"))
      .select(col("label_a"), col("label_b"),
        round(sqrt(col("d2").cast("double")) / 1e6, 6).as("dist"))
  }

  private val centroidDistSql =
    """WITH x AS (
      |  SELECT label, t.i - 1 AS pos,
      |    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000) AS BIGINT) AS vm
      |  FROM embeddings,
      |    LATERAL unnest(generate_series(1, len(embedding))) AS t(i)),
      |c AS (
      |  SELECT label, pos, CAST(SUM(vm) // COUNT(*) AS BIGINT) AS cm
      |  FROM x GROUP BY 1, 2),
      |d AS (
      |  SELECT a.label AS label_a, b.label AS label_b,
      |    CAST(SUM((a.cm - b.cm) * (a.cm - b.cm)) AS BIGINT) AS d2
      |  FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
      |  GROUP BY 1, 2)
      |SELECT label_a, label_b,
      |  round(sqrt(CAST(d2 AS DOUBLE)) / 1000000, 6) AS dist
      |FROM d""".stripMargin

  // ---- kNN neighbor graph + reciprocity ---------------------------
  //
  // The graph-construction primitive under HNSW/NN-descent indexes and
  // under graph-based dedup: every vector's top-3 cosine neighbors
  // (count-major rank, id-minor tie-break) plus how many of those
  // edges are reciprocated — the symmetry statistic that predicts how
  // well greedy graph search will navigate. Fixture plan: the corpus
  // scores against a broadcast copy of itself (codegen cosine), one
  // rank window per query id, then the mutual-edge check is an
  // equi-join of the 3·|V| edge list against its own reversal — edge-
  // bounded, never corpus². At 100 TB the scored candidates come from
  // the LSH/IVF buckets (the indexed queries above) instead of the
  // full cross — rank, reversal join and reciprocity are unchanged.
  private val knnGraphQ = (s: SparkSession, dir: String) => {
    graft.plans.TopKPerGroup.register(s)
    graft.functions.GraftFunctions.register(s)
    // The probe side MUST be spread across the machine before the
    // broadcast-scored cross product: the embeddings fixture is one
    // small parquet file = one input split, so without this the |V|²
    // scoring volume lands on a single task (caught by the round-6 sf1
    // scale tier: 72.8× wall at 10× data; repartitioned it rides all
    // cores and the quadratic volume is at least machine-wide).
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      .repartition(s.sparkContext.defaultParallelism)
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nb").asc)
    // Two measured hazards at |V|² scoring volume, both fixed natively:
    // the HOF cosine (aggregate∘zip_with) evaluates interpreted+boxed —
    // 80 s for the 4M-pair materialization at sf0.1 — so scoring uses
    // the codegen cosine_sim expression (bit-identical, row-equal spec;
    // 40× here); and the full-rank window sorts/shuffles all pairs, so
    // the §4.2(c) bounded-heap rewrite caps it at ≤3 rows per (query,
    // partition) crossing the exchange (measured 2.1 s vs 5.5 s for the
    // window on identical materialized input).
    val prev = s.conf.getOption(graft.plans.TopKPerGroupRewrite.ConfKey)
    s.conf.set(graft.plans.TopKPerGroupRewrite.ConfKey, "true")
    val top3 = try {
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nb"),
          round(call_function("cosine_sim", col("embedding"), col("qe")), 6)
            .as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .drop("rn")
        .localCheckpoint() // pins the heap plan under the flag
    } finally prev match {
      case Some(v) => s.conf.set(graft.plans.TopKPerGroupRewrite.ConfKey, v)
      case None => s.conf.unset(graft.plans.TopKPerGroupRewrite.ConfKey)
    }
    // re-rank the 3·|V| survivors (total order ⇒ identical ranks)
    val edges = top3.withColumn("rnk", row_number().over(w))
      .select(col("qid"), col("nb"), col("rnk"))
      .localCheckpoint() // reused: pivot + both sides of the reversal join
    val mutual = edges.select(col("qid"), col("nb"))
      .join(edges.select(col("nb").as("qid"), col("qid").as("nb")),
        Seq("qid", "nb"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_mutual"))
    edges.groupBy(col("qid"))
      .agg(max(when(col("rnk") === 1, col("nb"))).as("nb1"),
        max(when(col("rnk") === 2, col("nb"))).as("nb2"),
        max(when(col("rnk") === 3, col("nb"))).as("nb3"))
      .join(mutual, Seq("qid"), "left")
      .select(col("qid").as("vec_id"), col("nb1"), col("nb2"), col("nb3"),
        coalesce(col("n_mutual"), lit(0L)).as("n_mutual"))
  }

  // norms precomputed per vector (sqrt of the same fold), dot via the
  // native list_dot_product — verified bit-identical to the
  // list_sum(list_transform(...)) sequential fold on this data, and
  // the only way the |V|² oracle stays tractable at sf0.1.
  private val knnGraphSql =
    """WITH n AS MATERIALIZED (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
      |      AS nrm
      |  FROM embeddings),
      |edges AS MATERIALIZED (
      |  SELECT qid, nb, rnk FROM (
      |    SELECT a.vec_id AS qid, b.vec_id AS nb,
      |      row_number() OVER (PARTITION BY a.vec_id
      |        ORDER BY round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)
      |          DESC, b.vec_id ASC) AS rnk
      |    FROM n a JOIN n b ON a.vec_id <> b.vec_id)
      |  WHERE rnk <= 3),
      |m AS (
      |  SELECT e.qid, COUNT(*) AS n_mutual
      |  FROM edges e JOIN edges r ON r.qid = e.nb AND r.nb = e.qid
      |  GROUP BY 1)
      |SELECT e.qid AS vec_id,
      |  MAX(CASE WHEN e.rnk = 1 THEN e.nb END) AS nb1,
      |  MAX(CASE WHEN e.rnk = 2 THEN e.nb END) AS nb2,
      |  MAX(CASE WHEN e.rnk = 3 THEN e.nb END) AS nb3,
      |  COALESCE(MAX(m.n_mutual), 0) AS n_mutual
      |FROM edges e LEFT JOIN m ON m.qid = e.qid
      |GROUP BY 1""".stripMargin

  // ---- ANN-BLOCKED kNN graph (round 7 — r6 verdict #4) -------------
  //
  // The exact graph above is the DELIBERATE |V|² oracle; this is the
  // production form a 100 TB corpus requires: candidates come from the
  // IVF cells (every vector probes its NProbe nearest centroids, the
  // corpus side carries its trained cell id), exact cosine re-ranks
  // WITHIN candidates only — the scored volume drops from |V|² to
  // ~|V|²·(NProbe/NCells) here, and to |V|·(NProbe·cell size) in
  // general, which is sublinear-per-vector once cells ∝ √N (the IVF
  // contract documented at trainIvf). The candidate join is a
  // cell-keyed equi-join — at NCells=16 the fixture join is 16-way
  // (AQE splits the skew); production cell counts ∝ √N make it wide.
  // The oracle REBUILDS the whole thing in DuckDB — the md5-seeded
  // Lloyd chain ivfSql established, probe-cell ranking for EVERY
  // vector, candidate re-rank via list_dot_product — so this is an
  // exact-contract row like the trained-ANN family, not a rows-only
  // check.
  private val knnGraphAnnQ = (s: SparkSession, dir: String) => {
    graft.plans.TopKPerGroup.register(s)
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      .repartition(s.sparkContext.defaultParallelism)
    // cells ∝ √N (one driver count — the IVF sizing every production
    // index uses): candidate volume per query ≈ NProbe·√N, total
    // ≈ NProbe·N^1.5 — sub-quadratic where the exact graph is |V|²
    val nCells = math.ceil(math.sqrt(e.count().toDouble)).toInt
    val cents = trainIvf(e, nCells)
    val data = assignCells(e, cents).localCheckpoint()
    val qcells = e.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("qc", cosNative(col("qe"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("qc").desc, col("cell").asc)))
      .filter(col("pr") <= NProbe)
      .select(col("qid"), col("qe"), col("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nb").asc)
    val prev = s.conf.getOption(graft.plans.TopKPerGroupRewrite.ConfKey)
    s.conf.set(graft.plans.TopKPerGroupRewrite.ConfKey, "true")
    val top3 = try {
      data.join(qcells, Seq("cell")) // cell-keyed equi-join, never |V|²
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nb"),
          round(call_function("cosine_sim", col("embedding"), col("qe")), 6)
            .as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .drop("rn")
        .localCheckpoint()
    } finally prev match {
      case Some(v) => s.conf.set(graft.plans.TopKPerGroupRewrite.ConfKey, v)
      case None => s.conf.unset(graft.plans.TopKPerGroupRewrite.ConfKey)
    }
    val edges = top3.withColumn("rnk", row_number().over(w))
      .select(col("qid"), col("nb"), col("rnk"))
      .localCheckpoint()
    val mutual = edges.select(col("qid"), col("nb"))
      .join(edges.select(col("nb").as("qid"), col("qid").as("nb")),
        Seq("qid", "nb"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_mutual"))
    val pivoted = edges.groupBy(col("qid"))
      .agg(max(when(col("rnk") === 1, col("nb"))).as("nb1"),
        max(when(col("rnk") === 2, col("nb"))).as("nb2"),
        max(when(col("rnk") === 3, col("nb"))).as("nb3"))
      .join(mutual, Seq("qid"), "left")
    // every vector gets a row even if its probed cells held no other
    // vector (can't happen at fixture scale; cheap insurance)
    e.select(col("vec_id"))
      .join(pivoted.withColumnRenamed("qid", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("nb1"), col("nb2"), col("nb3"),
        coalesce(col("n_mutual"), lit(0L)).as("n_mutual"))
  }

  /** DuckDB rebuild: the ivfSql training chain verbatim (md5 seeds,
    * two quantized-mean Lloyd rounds), then probe cells for EVERY
    * vector and list_dot_product re-rank within candidates. */
  private val knnGraphAnnSql = {
    def assignCte(n: Int, centSrc: String): String =
      s"""cn$n AS (SELECT cell, sqrt(SUM(m * m)) AS nrm
         |  FROM $centSrc GROUP BY 1),
         |dot$n AS (
         |  SELECT ev.vec_id, c.cell, SUM(ev.v * c.m) AS d
         |  FROM ev JOIN $centSrc c ON ev.pos = c.pos GROUP BY 1, 2),
         |assign$n AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT d.vec_id, d.cell, row_number() OVER (
         |      PARTITION BY d.vec_id
         |      ORDER BY d.d / (en.nrm * cn$n.nrm) DESC, d.cell ASC) AS rn
         |    FROM dot$n d JOIN en ON d.vec_id = en.vec_id
         |    JOIN cn$n ON d.cell = cn$n.cell)
         |  WHERE rn = 1)""".stripMargin
    def recomputeCte(n: Int, fromAssign: String): String =
      s"""c$n AS (
         |  SELECT a.cell, ev.pos,
         |    CAST(SUM(CAST(round(ev.v * 1e6) AS BIGINT)) AS DOUBLE)
         |      / 1e6 / COUNT(*) AS m
         |  FROM $fromAssign a JOIN ev ON a.vec_id = ev.vec_id
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH ev AS MATERIALIZED (
       |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings CROSS JOIN unnest(range(1, len(embedding)+1)) AS t(i)),
       |en AS MATERIALIZED (
       |  SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ev GROUP BY 1),
       |lv AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
       |    vec_id
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT (SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT)
       |         FROM embeddings)),
       |c0 AS (
       |  SELECT s.cell, ev.pos, ev.v AS m
       |  FROM seeds s JOIN ev ON s.vec_id = ev.vec_id),
       |${assignCte(0, "c0")},
       |${recomputeCte(1, "assign0")},
       |${assignCte(1, "c1")},
       |${recomputeCte(2, "assign1")},
       |${assignCte(2, "c2")},
       |qdot AS (
       |  SELECT ev.vec_id AS qid, c.cell, SUM(ev.v * c.m) AS d
       |  FROM ev JOIN c2 c ON ev.pos = c.pos GROUP BY 1, 2),
       |qcells AS (
       |  SELECT qid, cell FROM (
       |    SELECT q.qid, q.cell, row_number() OVER (
       |      PARTITION BY q.qid
       |      ORDER BY q.d / (en.nrm * cn2.nrm) DESC, q.cell ASC) AS pr
       |    FROM qdot q JOIN en ON q.qid = en.vec_id
       |    JOIN cn2 ON q.cell = cn2.cell)
       |  WHERE pr <= $NProbe),
       |cand AS (
       |  SELECT qc.qid, a.vec_id
       |  FROM qcells qc JOIN assign2 a ON qc.cell = a.cell
       |  WHERE a.vec_id <> qc.qid),
       |edges AS MATERIALIZED (
       |  SELECT qid, nb, rnk FROM (
       |    SELECT cand.qid, cand.vec_id AS nb,
       |      row_number() OVER (PARTITION BY cand.qid
       |        ORDER BY round(list_dot_product(q.e, c.e)
       |            / (eq.nrm * ec.nrm), 6) DESC,
       |          cand.vec_id ASC) AS rnk
       |    FROM cand
       |    JOIN lv q ON cand.qid = q.vec_id
       |    JOIN lv c ON cand.vec_id = c.vec_id
       |    JOIN en eq ON cand.qid = eq.vec_id
       |    JOIN en ec ON cand.vec_id = ec.vec_id)
       |  WHERE rnk <= 3),
       |m AS (
       |  SELECT e.qid, COUNT(*) AS n_mutual
       |  FROM edges e JOIN edges r ON r.qid = e.nb AND r.nb = e.qid
       |  GROUP BY 1),
       |p AS (
       |  SELECT e.qid,
       |    MAX(CASE WHEN e.rnk = 1 THEN e.nb END) AS nb1,
       |    MAX(CASE WHEN e.rnk = 2 THEN e.nb END) AS nb2,
       |    MAX(CASE WHEN e.rnk = 3 THEN e.nb END) AS nb3,
       |    COALESCE(MAX(m.n_mutual), 0) AS n_mutual
       |  FROM edges e LEFT JOIN m ON m.qid = e.qid
       |  GROUP BY 1)
       |SELECT emb.vec_id, p.nb1, p.nb2, p.nb3,
       |  COALESCE(p.n_mutual, 0) AS n_mutual
       |FROM embeddings emb LEFT JOIN p ON p.qid = emb.vec_id""".stripMargin
  }

  // ---- Clustered-fixture ANN recall (round 7 — r6 verdict #5) ------
  //
  // The standing caveat on the ANN family was recall 0.26 measured on
  // the UNCLUSTERED fixture — an honest number for noise, but real
  // embedding corpora are clustered, and an index's job is to exploit
  // that. This plants the clusters DETERMINISTICALLY IN-QUERY (both
  // engines can rebuild them bit-for-bit, so the recall VALUE itself
  // is oracle-checked): the first 50 stored embeddings become cluster
  // centers; cluster c's member m (m = 0..19) is the deterministic
  // BLEND v = center_c + (m/20)·center_{(c+1) mod 50} — low-m members
  // sit tight on their center, high-m members drift toward the next
  // cluster, so exact neighbor sets straddle IVF cell boundaries and
  // the probe count actually matters. IVF (16 cells, 2 Lloyd rounds)
  // trains on the planted corpus; the 20 queries are the
  // most-blended members (m = 19 of clusters 0..19 — the hard
  // boundary cases); the output is the recall@10 MULTIPROBE CURVE at
  // nprobe ∈ {1, 2, 4}. AnnClusteredSpec asserts mean recall ≥ 0.8
  // at nprobe 4 and monotone non-decreasing in nprobe — the
  // required-nprobe demonstration the r6 verdict asked for.
  private val recallClusteredQ = (s: SparkSession, dir: String) => {
    val centers0 = Tables.embeddings(s, dir).filter(col("vec_id") < 50)
      .select(col("vec_id").as("c"),
        col("embedding").cast("array<double>").as("ce"))
    val centers = centers0.join(
      centers0.select(((col("c") + 49L) % 50L).as("c"),
        col("ce").as("ce2")), Seq("c"))
    val corpus = centers
      .withColumn("m", explode(array((0 until 20).map(lit(_)): _*)))
      .withColumn("vec_id", col("c") * 100L + col("m"))
      .withColumn("embedding", expr(
        "zip_with(ce, ce2, (x, y) -> x + (m / 20.0) * y)"))
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint() // planted corpus is reused by 4 consumers
    val queries = corpus.filter(col("vec_id") % 100 === 19
        && col("vec_id") < 2000)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    // exact arm: 20 queries × corpus, broadcast-scored
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val exact = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id"))
    // ANN arm: IVF over the planted corpus; the MULTIPROBE CURVE —
    // each candidate remembers which probe rank (pr) reached it, and
    // recall@10 is evaluated at nprobe ∈ {1, 2, 4}, so the output IS
    // the required-nprobe demonstration (how many probes a clustered
    // corpus needs for recall ≥ 0.8), not a single flattering point
    val cents = trainIvf(corpus)
    val data = assignCells(corpus, cents)
    val qc = queries.crossJoin(broadcast(cents))
      .withColumn("qcos", cosNative(col("qe"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cell").asc)))
      .filter(col("pr") <= NProbe)
      .select(col("qid"), col("qe"), col("cell"), col("pr"))
    val cand = data.join(broadcast(qc), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("pr"),
        cosRounded(col("embedding"), col("qe")).as("cos"))
    val wnp = Window.partitionBy(col("np"), col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val ann = cand
      .withColumn("np", explode(array(lit(1), lit(2), lit(4))))
      .filter(col("pr") <= col("np"))
      .withColumn("rnk", row_number().over(wnp))
      .filter(col("rnk") <= 10)
      .select(col("np"), col("qid"), col("vec_id"))
    val hits = exact.join(ann, Seq("qid", "vec_id"))
      .groupBy(col("np"), col("qid")).agg(count(lit(1)).as("n_hit"))
    queries.select(col("qid"))
      .withColumn("np", explode(array(lit(1), lit(2), lit(4))))
      .join(hits, Seq("np", "qid"), "left")
      .select(col("np"), col("qid"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall_micro", col("n_hit") * 100000L)
  }

  private val recallClusteredSql = {
    def assignCte(n: Int, centSrc: String): String =
      s"""cn$n AS (SELECT cell, sqrt(SUM(m * m)) AS nrm
         |  FROM $centSrc GROUP BY 1),
         |dot$n AS (
         |  SELECT mev.vec_id, c.cell, SUM(mev.v * c.m) AS d
         |  FROM mev JOIN $centSrc c ON mev.pos = c.pos GROUP BY 1, 2),
         |assign$n AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT d.vec_id, d.cell, row_number() OVER (
         |      PARTITION BY d.vec_id
         |      ORDER BY d.d / (men.nrm * cn$n.nrm) DESC, d.cell ASC) AS rn
         |    FROM dot$n d JOIN men ON d.vec_id = men.vec_id
         |    JOIN cn$n ON d.cell = cn$n.cell)
         |  WHERE rn = 1)""".stripMargin
    def recomputeCte(n: Int, fromAssign: String): String =
      s"""c$n AS (
         |  SELECT a.cell, mev.pos,
         |    CAST(SUM(CAST(round(mev.v * 1e6) AS BIGINT)) AS DOUBLE)
         |      / 1e6 / COUNT(*) AS m
         |  FROM $fromAssign a JOIN mev ON a.vec_id = mev.vec_id
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH cev AS (
       |  SELECT vec_id AS c, i AS pos, CAST(embedding[i] AS DOUBLE) AS cv
       |  FROM embeddings CROSS JOIN unnest(range(1, len(embedding)+1)) AS t(i)
       |  WHERE vec_id < 50),
       |cev2 AS (
       |  SELECT (c + 49) % 50 AS c, pos, cv AS cv2 FROM cev),
       |mev AS MATERIALIZED (
       |  SELECT c * 100 + m AS vec_id, pos, cv + (m / 20.0) * cv2 AS v
       |  FROM cev JOIN cev2 USING (c, pos)
       |  CROSS JOIN unnest(range(0, 20)) AS tm(m)),
       |men AS MATERIALIZED (
       |  SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM mev GROUP BY 1),
       |q AS (SELECT DISTINCT vec_id AS qid FROM mev
       |      WHERE vec_id % 100 = 19 AND vec_id < 2000),
       |xdot AS (
       |  SELECT qa.vec_id AS qid, ca.vec_id, SUM(qa.v * ca.v) AS d
       |  FROM mev qa JOIN q ON qa.vec_id = q.qid
       |  JOIN mev ca ON qa.pos = ca.pos AND ca.vec_id <> qa.vec_id
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT x.qid, x.vec_id, row_number() OVER (
       |      PARTITION BY x.qid
       |      ORDER BY round(x.d / (eq.nrm * ec.nrm), 6) DESC,
       |        x.vec_id ASC) AS rnk
       |    FROM xdot x JOIN men eq ON x.qid = eq.vec_id
       |    JOIN men ec ON x.vec_id = ec.vec_id)
       |  WHERE rnk <= 10),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
       |    vec_id
       |  FROM (SELECT DISTINCT vec_id FROM mev)
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $NCells),
       |c0 AS (
       |  SELECT s.cell, mev.pos, mev.v AS m
       |  FROM seeds s JOIN mev ON s.vec_id = mev.vec_id),
       |${assignCte(0, "c0")},
       |${recomputeCte(1, "assign0")},
       |${assignCte(1, "c1")},
       |${recomputeCte(2, "assign1")},
       |${assignCte(2, "c2")},
       |qdot AS (
       |  SELECT mev.vec_id AS qid, c.cell, SUM(mev.v * c.m) AS d
       |  FROM mev JOIN q ON mev.vec_id = q.qid
       |  JOIN c2 c ON mev.pos = c.pos GROUP BY 1, 2),
       |qcells AS (
       |  SELECT qid, cell, pr FROM (
       |    SELECT qd.qid, qd.cell, row_number() OVER (
       |      PARTITION BY qd.qid
       |      ORDER BY qd.d / (men.nrm * cn2.nrm) DESC, qd.cell ASC) AS pr
       |    FROM qdot qd JOIN men ON qd.qid = men.vec_id
       |    JOIN cn2 ON qd.cell = cn2.cell)
       |  WHERE pr <= $NProbe),
       |cdot AS (
       |  SELECT qc.qid, a.vec_id, qc.pr, SUM(qa.v * ca.v) AS d
       |  FROM qcells qc
       |  JOIN assign2 a ON qc.cell = a.cell AND a.vec_id <> qc.qid
       |  JOIN mev qa ON qa.vec_id = qc.qid
       |  JOIN mev ca ON ca.vec_id = a.vec_id AND qa.pos = ca.pos
       |  GROUP BY 1, 2, 3),
       |nps AS (SELECT unnest([1, 2, 4]) AS np),
       |ann AS (
       |  SELECT np, qid, vec_id FROM (
       |    SELECT nps.np, cd.qid, cd.vec_id, row_number() OVER (
       |      PARTITION BY nps.np, cd.qid
       |      ORDER BY round(cd.d / (eq.nrm * ec.nrm), 6) DESC,
       |        cd.vec_id ASC) AS rnk
       |    FROM cdot cd JOIN nps ON cd.pr <= nps.np
       |    JOIN men eq ON cd.qid = eq.vec_id
       |    JOIN men ec ON cd.vec_id = ec.vec_id)
       |  WHERE rnk <= 10),
       |hits AS (
       |  SELECT a.np, e.qid, COUNT(*) AS n_hit
       |  FROM exact e JOIN ann a ON e.qid = a.qid AND e.vec_id = a.vec_id
       |  GROUP BY 1, 2)
       |SELECT nps.np, q.qid,
       |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       |  CAST(COALESCE(h.n_hit, 0) * 100000 AS BIGINT) AS recall_micro
       |FROM q CROSS JOIN nps
       |LEFT JOIN hits h ON h.qid = q.qid AND h.np = nps.np""".stripMargin
  }

  /** Scalar quantization (SQ8) recall eval — the int8 compression
    * every production vector store offers (4× smaller than float32),
    * evaluated the way q_vec_matryoshka evaluates truncation: per
    * dimension, min/max train the affine quantizer; each component
    * encodes to an 8-bit code ((vm−mn)·256) div width ∈ [0,255] and
    * reconstructs to its bucket midpoint; top-10 by exact INTEGER
    * dot product (micro² units — 64·(2·10⁶)² ≈ 2.6·10¹⁴, inside
    * BIGINT) is compared between full-precision and reconstructed
    * corpora (asymmetric/ADC style: the query stays full-precision).
    * overlap10 is the recall@10 a rollout decision reads.
    *
    * 100 TB posture: the quantizer stats are a |dim|-row table
    * (one partial-agg collapse, broadcast back); encode/reconstruct
    * are map-side; the only corpus exchange is the top-10 rank. */
  private val sq8Q = (s: SparkSession, dir: String) => {
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "ev")))
      .select(col("vec_id"), col("pos"),
        floor(col("ev").cast("double") * 1000000L).cast("long").as("vm"))
    val stats = v.groupBy(col("pos"))
      .agg(min(col("vm")).as("mn"), max(col("vm")).as("mx"))
    val enc = v.join(broadcast(stats), "pos")
      .withColumn("w", col("mx") - col("mn") + 1L)
      .withColumn("q", expr("((vm - mn) * 256) div w"))
      .withColumn("rm", expr("mn + ((2*q + 1) * w) div 512"))
    val qd = enc.filter(col("vec_id") === 0)
      .select(col("pos").as("qpos"), col("vm").as("qm"))
    val dots = enc.filter(col("vec_id") =!= 0)
      .join(broadcast(qd), col("pos") === col("qpos"))
      .groupBy(col("vec_id"))
      .agg(sum(col("qm") * col("vm")).as("dot_full"),
        sum(col("qm") * col("rm")).as("dot_sq8"))
    def top10(c: String, alias: String): DataFrame = {
      val t = dots.select(col("vec_id"), col(c))
        .orderBy(col(c).desc, col("vec_id").asc).limit(10)
      val w = Window.orderBy(col(c).desc, col("vec_id").asc)
      t.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("vec_id").as(s"${alias}_id"),
          col(c).as(s"${alias}_dot"))
    }
    val f = top10("dot_full", "full")
    val h = top10("dot_sq8", "sq8")
    val ov = f.select(col("full_id").as("vec_id"))
      .join(h.select(col("sq8_id").as("vec_id")), "vec_id")
      .agg(count(lit(1)).as("overlap10"))
    f.join(h, "rank").crossJoin(broadcast(ov))
  }

  private val sq8Sql =
    """WITH v AS (
      |  SELECT vec_id, i AS pos,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
      |      AS vm
      |  FROM embeddings CROSS JOIN
      |    unnest(range(1, len(embedding) + 1)) AS t(i)),
      |st AS (SELECT pos, MIN(vm) AS mn, MAX(vm) AS mx FROM v GROUP BY 1),
      |enc AS (
      |  SELECT vec_id, v.pos, vm, mn, mx - mn + 1 AS w,
      |    ((vm - mn) * 256) // (mx - mn + 1) AS q
      |  FROM v JOIN st ON v.pos = st.pos),
      |r AS (
      |  SELECT vec_id, pos, vm,
      |    mn + ((2*q + 1) * w) // 512 AS rm
      |  FROM enc),
      |qd AS (SELECT pos, vm AS qm FROM r WHERE vec_id = 0),
      |d AS (
      |  SELECT r.vec_id,
      |    CAST(SUM(qm * vm) AS BIGINT) AS dot_full,
      |    CAST(SUM(qm * rm) AS BIGINT) AS dot_sq8
      |  FROM r JOIN qd ON r.pos = qd.pos
      |  WHERE r.vec_id <> 0 GROUP BY 1),
      |f AS (
      |  SELECT vec_id AS full_id, dot_full, row_number() OVER (
      |    ORDER BY dot_full DESC, vec_id ASC) AS rank
      |  FROM d ORDER BY dot_full DESC, vec_id ASC LIMIT 10),
      |h AS (
      |  SELECT vec_id AS sq8_id, dot_sq8, row_number() OVER (
      |    ORDER BY dot_sq8 DESC, vec_id ASC) AS rank
      |  FROM d ORDER BY dot_sq8 DESC, vec_id ASC LIMIT 10),
      |ov AS (SELECT COUNT(*) AS overlap10
      |       FROM f JOIN h ON f.full_id = h.sq8_id)
      |SELECT f.rank, f.full_id, f.dot_full AS full_dot,
      |  h.sq8_id, h.dot_sq8 AS sq8_dot, ov.overlap10
      |FROM f JOIN h ON f.rank = h.rank, ov""".stripMargin

  /** Greedy k-center selection (Gonzalez farthest-first traversal) —
    * the coreset/diverse-sampling primitive (2-approximation to the
    * k-center objective, the standard seed for diverse eval sets and
    * k-means++ style initialization). Seed = vec_id 0; each of 4
    * further rounds picks the point FARTHEST from everything chosen
    * so far (exact integer micro dist², min-vec_id tiebreak). The
    * selected set never leaves the cluster: each round is a
    * points × (≤5 broadcast centers) map-side min-distance pass +
    * one argmax, `localCheckpoint` pinning plan depth.
    *
    * 100 TB posture: cost is rounds × one corpus scan with a tiny
    * broadcast — the documented swap at billions of points is
    * running rounds over an ANN-recalled candidate pool. */
  private val kcenterQ = (s: SparkSession, dir: String) => {
    val pts = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("vm"))
      .localCheckpoint()
    var sel = pts.filter(col("vec_id") === 0)
      .select(col("vec_id").as("cid"), col("vm").as("cvm"),
        lit(1).as("sel_round"), lit(null).cast("long").as("sel_dist2"))
    for (k <- 2 to 5) {
      val dmin = pts
        .crossJoin(broadcast(sel.select(col("cid"), col("cvm"))))
        .withColumn("d2", expr(
          "aggregate(zip_with(vm, cvm, (x, y) -> (x - y) * (x - y))," +
            " 0L, (acc, v) -> acc + v)"))
        .groupBy(col("vec_id")).agg(min(col("d2")).as("dmin"))
      val pick = dmin.orderBy(col("dmin").desc, col("vec_id").asc).limit(1)
        .join(pts, "vec_id")
        .select(col("vec_id").as("cid"), col("vm").as("cvm"),
          lit(k).as("sel_round"), col("dmin").as("sel_dist2"))
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel.select(col("sel_round"), col("cid").as("vec_id"), col("sel_dist2"))
  }

  /** Bounded-round Lloyd k-means over the integer-micro embeddings —
    * the clustering pass a curation pipeline runs before per-cluster
    * sampling/dedup: k = 4 seeds are the 4 smallest vec_ids (cluster
    * index = seed rank, fully deterministic), 3 synchronous update
    * rounds, then a final assignment under the settled centroids.
    * All distances are EXACT integer d² (the smote/k-center
    * discipline); centroid components are TRUNCATING-division means
    * (Scala `/` and DuckDB integer `//` both truncate toward zero —
    * unlike the flooring `div`, and centroid sums DO go negative, so
    * this pairing is load-bearing); assignment
    * ties break to the smallest cluster index via a (d2, cl) struct
    * min. An emptied cluster keeps its previous centroid (mirrored
    * COALESCE in the oracle).
    *
    * 100 TB posture: per round, one broadcast of k·dim centroid longs
    * + one map-side d² pass + one (cluster, dim)-keyed partial-agg
    * shuffle of k·dim rows; the k×64 centroid collect is k-bounded
    * (the graph-tier domain-bound discipline), never data-bounded.
    * "3 rounds" is the documented contract — a fixpoint would be
    * data-dependent. */
  private val KmK = 4
  private val KmRounds = 3

  private val kmeansQ = (s: SparkSession, dir: String) => {
    val pts = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("vm"))
      .localCheckpoint()
    var cents: Array[(Int, Seq[Long])] = pts.orderBy(col("vec_id").asc)
      .limit(KmK).collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Long](1) }
    def assigned = {
      import s.implicits._
      val centDf = cents.toSeq.toDF("cl", "cv")
      pts.crossJoin(broadcast(centDf))
        .withColumn("d2", expr(
          "aggregate(zip_with(vm, cv, (x, y) -> (x - y) * (x - y))," +
            " 0L, (acc, v) -> acc + v)"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cl"))).as("m"))
        .select(col("vec_id"), col("m.cl").as("cl"), col("m.d2").as("d2"))
    }
    for (_ <- 1 to KmRounds) {
      val upd = assigned.join(pts, "vec_id")
        .select(col("cl"), posexplode(col("vm")))
        .groupBy(col("cl"), col("pos"))
        .agg(sum(col("col")).as("sx"), count(lit(1)).as("n"))
        .collect() // k·dim rows — k-bounded, like the graph collects
      val byCl = upd.groupBy(_.getInt(0))
      cents = cents.map { case (cl, old) =>
        byCl.get(cl) match {
          case Some(rows) =>
            // TRUNCATING division (Scala /): DuckDB's integer `//`
            // truncates toward zero (-7//2 = -3), NOT floor — the
            // one place this codebase meets a negative numerator
            cl -> rows.sortBy(_.getInt(1))
              .map(r => r.getLong(2) / r.getLong(3)).toSeq
          case None => cl -> old // emptied cluster keeps its centroid
        }
      }
    }
    assigned.groupBy(col("cl").as("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("d2")).as("inertia"),
        min(col("vec_id")).as("min_member"))
  }

  private def kmeansSql: String = {
    def mic(e: String) =
      s"CAST(floor(CAST($e AS DOUBLE) * 1000000) AS BIGINT)"
    def round(r: Int): String =
      s"""s$r AS (
         |  SELECT e.vec_id, c.cl,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> (${mic("e.embedding[i]")} - c.cv[i])
         |         * (${mic("e.embedding[i]")} - c.cv[i]))) AS BIGINT) AS d2
         |  FROM embeddings e, c${r - 1} c),
         |a$r AS (
         |  SELECT vec_id, cl, d2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2 ASC, cl ASC) AS rn FROM s$r)
         |  WHERE rn = 1),
         |u$r AS (
         |  SELECT a.cl, t.i AS pos,
         |    CAST(SUM(${mic("e.embedding[t.i]")}) AS BIGINT) AS sx,
         |    COUNT(*) AS n
         |  FROM a$r a JOIN embeddings e USING (vec_id), range(1, 65) t(i)
         |  GROUP BY 1, 2),
         |c$r AS MATERIALIZED (
         |  SELECT c.cl, COALESCE(n.cv, c.cv) AS cv
         |  FROM c${r - 1} c LEFT JOIN (
         |    SELECT cl, list(sx // n ORDER BY pos) AS cv
         |    FROM u$r GROUP BY cl) n ON c.cl = n.cl)""".stripMargin
    s"""WITH c0 AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,
       |    list_transform(embedding, x ->
       |      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS cv
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $KmK)),
       |${(1 to KmRounds).map(round).mkString(",\n")},
       |sf AS (
       |  SELECT e.vec_id, c.cl,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      i -> (${mic("e.embedding[i]")} - c.cv[i])
       |         * (${mic("e.embedding[i]")} - c.cv[i]))) AS BIGINT) AS d2
       |  FROM embeddings e, c$KmRounds c),
       |af AS (
       |  SELECT vec_id, cl, d2 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d2 ASC, cl ASC) AS rn FROM sf)
       |  WHERE rn = 1)
       |SELECT cl AS cluster, COUNT(*) AS n_members,
       |  CAST(SUM(d2) AS BIGINT) AS inertia,
       |  MIN(vec_id) AS min_member
       |FROM af GROUP BY 1""".stripMargin
  }

  private def kcenterSql: String = {
    def mic(e: String) =
      s"CAST(floor(CAST($e AS DOUBLE) * 1000000) AS BIGINT)"
    def d2(a: String, b: String) =
      s"""CAST(list_sum(list_transform(range(1, len($a) + 1),
         |    i -> (${mic(s"$a[i]")} - ${mic(s"$b[i]")})
         |       * (${mic(s"$a[i]")} - ${mic(s"$b[i]")}))) AS BIGINT)""".stripMargin
    val rounds = (2 to 5).map { k =>
      s"""dm$k AS MATERIALIZED (
         |  SELECT e.vec_id, MIN(${d2("e.embedding", "s.ce")}) AS dmin
         |  FROM embeddings e, sel${k - 1} s GROUP BY 1),
         |p$k AS (
         |  SELECT d.vec_id AS cid, e.embedding AS ce,
         |    $k AS sel_round, d.dmin AS sel_dist2
         |  FROM dm$k d JOIN embeddings e ON d.vec_id = e.vec_id
         |  ORDER BY d.dmin DESC, d.vec_id ASC LIMIT 1),
         |sel$k AS MATERIALIZED (
         |  SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM p$k)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH sel1 AS (
       |  SELECT vec_id AS cid, embedding AS ce, 1 AS sel_round,
       |    CAST(NULL AS BIGINT) AS sel_dist2
       |  FROM embeddings WHERE vec_id = 0),
       |$rounds
       |SELECT sel_round, cid AS vec_id, sel_dist2 FROM sel5""".stripMargin
  }

  /** Binary quantization recall eval — the 1-bit-per-dimension
    * compression (32× smaller than float32) behind binary-vector
    * search: each embedding becomes its SIGN PATTERN, packed into two
    * 32-bit words (bits 33..64 in a second word so bit 63 never
    * touches BIGINT's sign), distance = popcount(xor) — exact integer
    * hamming via codegen `^` and `bit_count`. Top-10 by (hamming asc,
    * vec_id) is compared against the exact full-precision integer-dot
    * top-10; overlap10 is the recall a binary-prefilter rollout
    * reads. Completes the compression-eval family: truncation
    * (matryoshka) / int8 (sq8) / 1-bit (this).
    *
    * 100 TB posture: packing is map-side (the stored-column candidate
    * for the object layout); the only exchanges are the two top-10
    * ranks. */
  private val binaryQ = (s: SparkSession, dir: String) => {
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "ev")))
      .select(col("vec_id"), col("pos"),
        floor(col("ev").cast("double") * 1000000L).cast("long").as("vm"))
      .withColumn("bit", (col("vm") >= 0L).cast("long"))
    val words = v.groupBy(col("vec_id"))
      .agg(sum(expr("CASE WHEN pos < 32 THEN shiftleft(bit, pos)" +
          " ELSE 0L END")).as("w1"),
        sum(expr("CASE WHEN pos >= 32 THEN shiftleft(bit, pos - 32)" +
          " ELSE 0L END")).as("w2"))
    val full = v.filter(col("vec_id") === 0)
      .select(col("pos").as("qpos"), col("vm").as("qm"))
    val dots = v.filter(col("vec_id") =!= 0)
      .join(broadcast(full), col("pos") === col("qpos"))
      .groupBy(col("vec_id")).agg(sum(col("qm") * col("vm")).as("dot_full"))
    val qw = words.filter(col("vec_id") === 0)
      .select(col("w1").as("qw1"), col("w2").as("qw2"))
    val ham = words.filter(col("vec_id") =!= 0).crossJoin(broadcast(qw))
      .select(col("vec_id"),
        (expr("bit_count(w1 ^ qw1)") + expr("bit_count(w2 ^ qw2)"))
          .cast("long").as("hamming"))
    def top10(df: DataFrame, c: String, asc: Boolean, alias: String)
        : DataFrame = {
      val key = if (asc) col(c).asc else col(c).desc
      val t = df.select(col("vec_id"), col(c))
        .orderBy(key, col("vec_id").asc).limit(10)
      val w = Window.orderBy(key, col("vec_id").asc)
      t.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("vec_id").as(s"${alias}_id"),
          col(c).as(s"${alias}_$c"))
    }
    val f = top10(dots, "dot_full", asc = false, "full")
    val h = top10(ham, "hamming", asc = true, "bin")
    val ov = f.select(col("full_id").as("vec_id"))
      .join(h.select(col("bin_id").as("vec_id")), "vec_id")
      .agg(count(lit(1)).as("overlap10"))
    f.join(h, "rank").crossJoin(broadcast(ov))
  }

  private val binarySql =
    """WITH v AS (
      |  SELECT vec_id, i - 1 AS pos,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
      |      AS vm
      |  FROM embeddings CROSS JOIN
      |    unnest(range(1, len(embedding) + 1)) AS t(i)),
      |b AS (
      |  SELECT vec_id, pos, vm,
      |    CASE WHEN vm >= 0 THEN CAST(1 AS BIGINT)
      |      ELSE CAST(0 AS BIGINT) END AS bit
      |  FROM v),
      |words AS (
      |  SELECT vec_id,
      |    CAST(SUM(CASE WHEN pos < 32 THEN bit * (CAST(1 AS BIGINT) << pos)
      |      ELSE 0 END) AS BIGINT) AS w1,
      |    CAST(SUM(CASE WHEN pos >= 32
      |      THEN bit * (CAST(1 AS BIGINT) << (pos - 32))
      |      ELSE 0 END) AS BIGINT) AS w2
      |  FROM b GROUP BY 1),
      |qd AS (SELECT pos, vm AS qm FROM v WHERE vec_id = 0),
      |d AS (
      |  SELECT v.vec_id, CAST(SUM(qm * vm) AS BIGINT) AS dot_full
      |  FROM v JOIN qd ON v.pos = qd.pos
      |  WHERE v.vec_id <> 0 GROUP BY 1),
      |qw AS (SELECT w1 AS qw1, w2 AS qw2 FROM words WHERE vec_id = 0),
      |hm AS (
      |  SELECT vec_id,
      |    CAST(bit_count(xor(w1, qw1)) AS BIGINT)
      |      + CAST(bit_count(xor(w2, qw2)) AS BIGINT) AS hamming
      |  FROM words, qw WHERE vec_id <> 0),
      |f AS (
      |  SELECT vec_id AS full_id, dot_full, row_number() OVER (
      |    ORDER BY dot_full DESC, vec_id ASC) AS rank
      |  FROM d ORDER BY dot_full DESC, vec_id ASC LIMIT 10),
      |h AS (
      |  SELECT vec_id AS bin_id, hamming AS bin_hamming,
      |    row_number() OVER (ORDER BY hamming ASC, vec_id ASC) AS rank
      |  FROM hm ORDER BY hamming ASC, vec_id ASC LIMIT 10),
      |ov AS (SELECT COUNT(*) AS overlap10
      |       FROM f JOIN h ON f.full_id = h.bin_id)
      |SELECT f.rank, f.full_id, f.dot_full AS full_dot_full,
      |  h.bin_id, h.bin_hamming, ov.overlap10
      |FROM f JOIN h ON f.rank = h.rank, ov""".stripMargin

  /** Pairwise-cosine histogram — the hubness / representation-
    * collapse audit: the distribution of ALL pairwise cosines (20
    * bins over [−1, 1], 6-dp-rounded — the engine-stable rounding
    * every cosine rank here uses) plus the exact-decimal mean. A
    * healthy embedding space is centered near 0 with thin tails; a
    * collapsed one piles mass near 1 — the single chart an
    * embedding-model regression review reads first.
    *
    * 100 TB posture: the |V|² scoring is the documented
    * fixture-scale verification form (the cosine-all-pairs scope
    * note); at scale the same histogram is computed on a
    * hash-deterministic pair SAMPLE — one map pass either way, the
    * histogram is a 20-row rollup. */
  private val cosHistQ = (s: SparkSession, dir: String) => {
    // Two r8 full-registry-screen fixes, semantics untouched: the
    // streamed side is explicitly widened (the small embeddings file
    // otherwise plans as ONE scan partition, and the broadcast
    // nested-loop theta join then scores all |V|²/2 pairs in a single
    // task), and the pair cosine is the codegen cosine_sim expression
    // (bit-identical to the HOF fold by the CosineSimilarity contract;
    // the interpreted zip_with/aggregate lambda is the documented 40×
    // penalty — at sf1 the old shape ran 25+ min on one core).
    graft.functions.GraftFunctions.register(s)
    val a = Tables.embeddings(s, dir)
      .select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .repartition(s.sparkContext.defaultParallelism)
    val b = Tables.embeddings(s, dir)
      .select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ida") < col("idb"))
      .select(round(call_function("cosine_sim", col("ea"), col("eb")), 6)
        .as("c"))
    pairs
      .withColumn("bin", least(lit(19L),
        floor((col("c") + 1.0d) * 10.0d).cast("long")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast("decimal(18,6)")).as("csum"))
      .select(col("bin"), col("n"),
        (col("csum").cast("double") / col("n")).as("mean_cos"))
  }

  private def cosHistSql: String = {
    val cosE =
      """round(
        |      list_sum(list_transform(range(1, len(a.embedding)+1),
        |        i -> CAST(a.embedding[i] AS DOUBLE)
        |           * CAST(b.embedding[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1),
        |           i -> CAST(a.embedding[i] AS DOUBLE)
        |              * CAST(a.embedding[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1),
        |           i -> CAST(b.embedding[i] AS DOUBLE)
        |              * CAST(b.embedding[i] AS DOUBLE)))))
        |      , 6)""".stripMargin
    s"""WITH p AS (
       |  SELECT $cosE AS c
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
       |h AS (
       |  SELECT least(19, CAST(floor((c + 1.0) * 10.0) AS BIGINT))
       |      AS bin,
       |    COUNT(*) AS n, SUM(CAST(c AS DECIMAL(18,6))) AS csum
       |  FROM p GROUP BY 1)
       |SELECT bin, n, CAST(csum AS DOUBLE) / n AS mean_cos
       |FROM h""".stripMargin
  }

  /** Bounded-sample twin of [[cosHistQ]] — the scale-SAFE hubness
    * audit (r8 verdict #2: the all-pairs form is now a registered
    * FixtureDiagnostic naming this query as its twin). A deterministic
    * id-stride sample caps the scored set at ~1,024 vectors at EVERY
    * tier (stride = ceil(N/1024), keep vec_id ≡ 0 mod stride), so the
    * pair stage is a constant ≤ ~0.5M cosines regardless of corpus
    * size — exactly what a production embedding-regression audit
    * computes. The stride is derived from the same COUNT(*) in both
    * engines, so the sampled population is identical and the
    * histogram stays hash-exact. */
  private val cosHistSampledQ = (s: SparkSession, dir: String) => {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val stride = math.max(1L, math.ceil(e.count() / 1024.0).toLong)
    val sampled = e.filter(col("vec_id") % stride === 0)
    val a = sampled
      .select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .repartition(s.sparkContext.defaultParallelism)
    val b = sampled
      .select(col("vec_id").as("idb"), col("embedding").as("eb"))
    a.join(b, col("ida") < col("idb"))
      .select(round(call_function("cosine_sim", col("ea"), col("eb")), 6)
        .as("c"))
      .withColumn("bin", least(lit(19L),
        floor((col("c") + 1.0d) * 10.0d).cast("long")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast("decimal(18,6)")).as("csum"))
      .select(col("bin"), col("n"),
        (col("csum").cast("double") / col("n")).as("mean_cos"))
  }

  private def cosHistSampledSql: String = {
    val cosE =
      """round(
        |      list_sum(list_transform(range(1, len(a.embedding)+1),
        |        i -> CAST(a.embedding[i] AS DOUBLE)
        |           * CAST(b.embedding[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1),
        |           i -> CAST(a.embedding[i] AS DOUBLE)
        |              * CAST(a.embedding[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1),
        |           i -> CAST(b.embedding[i] AS DOUBLE)
        |              * CAST(b.embedding[i] AS DOUBLE)))))
        |      , 6)""".stripMargin
    s"""WITH st AS (
       |  SELECT GREATEST(1, CAST(ceil(COUNT(*) / 1024.0) AS BIGINT))
       |    AS stride FROM embeddings),
       |sv AS (
       |  SELECT e.* FROM embeddings e, st WHERE e.vec_id % st.stride = 0),
       |p AS (
       |  SELECT $cosE AS c
       |  FROM sv a JOIN sv b ON a.vec_id < b.vec_id),
       |h AS (
       |  SELECT least(19, CAST(floor((c + 1.0) * 10.0) AS BIGINT))
       |      AS bin,
       |    COUNT(*) AS n, SUM(CAST(c AS DECIMAL(18,6))) AS csum
       |  FROM p GROUP BY 1)
       |SELECT bin, n, CAST(csum AS DOUBLE) / n AS mean_cos
       |FROM h""".stripMargin
  }

  /** Intra-list diversity (ILD@10) — the rec-sys diversity metric
    * that quantifies what q_sim_mmr optimizes: for the brute top-10
    * of query vec 0, the mean pairwise dissimilarity (1 − cos) over
    * the 45 result pairs, with the 6-dp-rounded cosine and a
    * DECIMAL-exact mean so the number is bit-stable. Read next to
    * relevance: high relevance + low ILD = the redundant result list
    * MMR exists to fix.
    *
    * 100 TB posture: the top-10 comes from the standard brute/ANN
    * recall stage; the pairwise pass is 45 rows. */
  private val ildQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val top = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("embedding"),
        cosRounded(col("embedding"), col("qe")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(10)
      .localCheckpoint()
    val a = top.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = top.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    a.join(b, col("ida") < col("idb"))
      .select((lit(1.0d) - cosRounded(col("ea"), col("eb"))).as("d"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(col("d").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("ild"))
  }

  private def ildSql: String = {
    def cosE(x: String, y: String): String =
      s"""round(
         |      list_sum(list_transform(range(1, len($x)+1),
         |        i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(range(1, len($x)+1),
         |           i -> CAST($x[i] AS DOUBLE) * CAST($x[i] AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(range(1, len($y)+1),
         |           i -> CAST($y[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))))
         |      , 6)""".stripMargin
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings
       |           WHERE vec_id = 0),
       |top AS (
       |  SELECT vec_id, embedding
       |  FROM embeddings, q WHERE vec_id <> 0
       |  ORDER BY ${cosE("embedding", "qe")} DESC, vec_id ASC
       |  LIMIT 10),
       |p AS (
       |  SELECT 1.0 - ${cosE("a.embedding", "b.embedding")} AS d
       |  FROM top a JOIN top b ON a.vec_id < b.vec_id)
       |SELECT COUNT(*) AS n_pairs,
       |  CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
       |    AS ild
       |FROM p""".stripMargin
  }

  override val queries: Map[String, Q] = Map(
    "q_sim_ild" -> Q(ildQ, Some(ildSql),
      "intra-list diversity of the top-10: mean pairwise 1-cos, decimal-exact"),
    "q_vec_cos_histogram" -> Q(cosHistQ, Some(cosHistSql),
      "pairwise-cosine histogram: hubness/collapse audit, 20 bins, exact counts" +
        " (all-pairs |V|^2 verification form)",
      scale = graft.ScaleClass.FixtureDiagnostic("q_vec_cos_histogram_sampled")),
    "q_vec_cos_histogram_sampled" -> Q(cosHistSampledQ, Some(cosHistSampledSql),
      "scale-safe hubness audit: deterministic id-stride sample capped at ~1024 vectors, same 20-bin histogram"),
    "q_vec_binary" -> Q(binaryQ, Some(binarySql),
      "1-bit binary quantization recall: packed sign words, popcount-xor hamming"),
    "q_vec_sq8" -> Q(sq8Q, Some(sq8Sql),
      "SQ8 int8 quantization recall eval: exact integer ADC dots, overlap@10"),
    "q_sim_kmeans" -> Q(kmeansQ, Some(kmeansSql),
      "bounded-round Lloyd k-means, exact integer d2, floor-div centroids, deterministic seeds"),
    "q_sim_kcenter" -> Q(kcenterQ, Some(kcenterSql),
      "greedy k-center (farthest-first) coreset selection, exact micro distances"),
    "q_sim_knn_graph" -> Q(knnGraphQ, Some(knnGraphSql),
      "top-3 cosine neighbor graph + edge reciprocity (the HNSW-construction primitive)",
      scale = graft.ScaleClass.FixtureDiagnostic("q_sim_knn_graph_ann")),
    "q_vec_standardize" -> Q(standardizeQ, Some(standardizeSql),
      "per-dimension z-normalization from exact micro-integer moments"),
    "q_vec_centroid_dist" -> Q(centroidDistQ, Some(centroidDistSql),
      "pairwise label-centroid Euclidean distance matrix, integer-exact squares"),
    "q_sim_maxsim" -> Q(maxsimQ, Some(maxsimSql),
      "ColBERT-style MaxSim late-interaction scoring of label groups by a 3-token query"),
    "q_vec_pca_power" -> Q(pcaPowerQ, Some(pcaPowerSql),
      "top principal direction: one-pass Gram matrix + integer power iteration"),
    "q_sim_range_search" -> Q(rangeSearchQ, Some(rangeSearchSql),
      "cosine range search (threshold filter, no global sort) vs one query vector"),
    "q_vec_silhouette" -> Q(silhouetteQ, Some(silhouetteSql),
      "centroid silhouette per label: map-side scoring vs one broadcast centroid row"),
    "q_vec_centroid" -> Q(centroidQ, Some(centroidSql),
      "per-label mean embedding (order-insensitive, partial-agg shuffle)"),
    "q_vec_quantize" -> Q(quantQ, Some(quantSql),
      "int8 scalar quantization: codes + bounded reconstruction error"),
    "q_sim_topk_brute_native" -> Q(bruteNativeQ, Some(bruteSql),
      "brute-force top-10 via native codegen cosine Expression"),
    "q_sim_mmr" -> Q(mmrQ, Some(mmrSql),
      "MMR diversified top-5 rerank over the brute top-20 candidate set"),
    "q_vec_matryoshka" -> Q(matryoshkaQ, Some(matryoshkaSql),
      "Matryoshka truncation eval: half-dim vs full-dim top-10 rank tables + overlap@10"),
    "q_vec_ood" -> Q(oodQ, Some(oodSql),
      "embedding QA: top-5 farthest-from-own-centroid vectors per label, integer micro distances"),
    "q_sim_triplet_semihard" -> Q(tripletQ, Some(tripletSql),
      "semi-hard triplet mining: nearest positive, hardest negative below it"),
    "q_vec_dim_profile" -> Q(dimProfileQ, Some(dimProfileSql),
      "per-dimension embedding statistics + dead/dominant dimension flags, integer-exact"),
    "q_sim_topk_brute" -> Q(bruteQ, Some(bruteSql),
      "brute-force cosine top-10 (TakeOrderedAndProject merge)"),
    "q_sim_topk_per_query" -> Q(perQueryQ, Some(perQuerySql),
      "batch top-3 per query via broadcast + window rank"),
    "q_sim_ann_lsh" -> Q(annQ, Some(annLshSql),
      "LSH multiprobe ANN top-5: exploded probe-bucket equi-join"),
    "q_sim_ann_recall" -> Q(annRecallQ, Some(annRecallSql),
      "recall@5 eval: LSH index vs exact brute-force top-5, per query"),
    "q_sim_ann_ivf" -> Q(ivfQ, Some(ivfSql),
      "IVF ANN: k-means cells + nprobe search (full training-run oracle)"),
    "q_sim_ann_pq" -> Q(pqQ, Some(pqSql),
      "PQ ANN: per-subspace codebooks + ADC code-scan (full training oracle)"),
    "q_sim_ann_ivfpq" -> Q(ivfpqQ, Some(ivfpqSql),
      "IVF-PQ: cell-probe pruning + ADC over candidates (composed oracle)"),
    "q_sim_ann_ivfpq_residual" -> Q(ivfpqResidualQ, Some(ivfpqResidualSql),
      "residual IVF-PQ: codebooks on x - centroid, per-cell ADC tables"),
    "q_sim_knn_classify" -> Q(knnClassifyQ, Some(knnClassifySql),
      "k-NN majority-vote classification over the embedding corpus"),
    "q_sim_ann_lsh_planted" -> Q(annLshPlantedQ, Some(plantedSql),
      "LSH ANN vs planted exact-duplicate ground truth (oracle-checked)"),
    "q_sim_ann_ivf_planted" -> Q(annIvfPlantedQ, Some(plantedSql),
      "IVF ANN vs planted exact-duplicate ground truth (oracle-checked)"),
    "q_sim_ann_lsh_indexed" -> Q(annLshIndexedQ, Some(plantedSql),
      "LSH ANN over the MATERIALIZED bucket index (stored column, oracle-checked)"),
    "q_sim_ann_ivf_indexed" -> Q(annIvfIndexedQ, Some(plantedSql),
      "IVF ANN over the MATERIALIZED cell index (stored column + centroids, oracle-checked)"),
    "q_sim_knn_graph_ann" -> Q(knnGraphAnnQ, Some(knnGraphAnnSql),
      "ANN-blocked kNN graph: IVF-cell candidates + exact re-rank, full DuckDB training rebuild"),
    "q_sim_ann_recall_clustered" -> Q(recallClusteredQ, Some(recallClusteredSql),
      "multiprobe IVF recall@10 on a deterministic planted-cluster corpus, recall value oracle-checked"),
    "q_sim_ann_pq_indexed" -> Q(annPqIndexedQ, Some(pqSql),
      "PQ ADC over MATERIALIZED codes + codebook sidecar (no query-time encode, full-training oracle)"))
}
