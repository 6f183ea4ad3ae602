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

  private def cosRounded(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    round(VectorOps.cosine(a, b), 6)

  // 1. Brute-force cosine top-10 for the vec_id=0 query vector.
  private val bruteQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), cosRounded(col("embedding"), col("qe")).as("cos"))
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

  /** 3. ANN: bucket-pruned search for 20 queries over the full set
    * (self included — a vector always lands in its own bucket, so
    * self-retrieval at rank 1 is the invariant the spec checks).
    * Not SQL-expressible (bucket constants live engine-side) →
    * driver rows-only; DedupSpec-style recall check in SimilaritySpec.
    */
  private val annQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", VectorOps.rhpBucket(col("embedding"), Dim, NBits))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(queries),
        bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= Probe)
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
    * max-cosine centroid (broadcast centroids, `max_by` shuffle agg with
    * map-side partials — no window over the corpus), recompute each
    * centroid as the element-wise mean of its cell (posexplode →
    * groupBy(cell, pos) → avg → re-assemble, all shuffle-bounded by
    * cells×dim). Search: each query probes its `NProbe` nearest cells;
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

  private def assignCells(data: DataFrame, cents: DataFrame): DataFrame =
    data.crossJoin(broadcast(cents))
      .withColumn("c", VectorOps.cosine(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(struct(col("cell"), col("embedding")),
          struct(col("c"), -col("cell"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.cell").as("cell"))

  private val ivfQ = (s: SparkSession, dir: String) => {
    val e = Tables.embeddings(s, dir)
    // deterministic seed sample → cells 0..NCells-1 (row_number runs on
    // NCells rows post-limit, not the corpus)
    val wSeed = Window.orderBy(col("hk"), col("vec_id"))
    var cents = e.withColumn("hk", xxhash64(col("vec_id")))
      .orderBy(col("hk"), col("vec_id")).limit(NCells)
      .withColumn("cell", row_number().over(wSeed) - 1)
      .select(col("cell"), col("embedding").as("centroid"))
    for (_ <- 0 until LloydIters) {
      cents = assignCells(e, cents)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x("m")).as("centroid"))
        .localCheckpoint()
    }
    val data = assignCells(e, cents)
    val qcells = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("qc", VectorOps.cosine(col("qe"), col("centroid")))
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

  override val queries: Map[String, Q] = Map(
    "q_sim_topk_brute_native" -> Q(bruteNativeQ, Some(bruteSql),
      "brute-force top-10 via native codegen cosine Expression"),
    "q_sim_topk_brute" -> Q(bruteQ, Some(bruteSql),
      "brute-force cosine top-10 (TakeOrderedAndProject merge)"),
    "q_sim_topk_per_query" -> Q(perQueryQ, Some(perQuerySql),
      "batch top-3 per query via broadcast + window rank"),
    "q_sim_ann_lsh" -> Q(annQ, None,
      "LSH-bucketed multiprobe ANN top-5 (rows-only; recall in spec)"),
    "q_sim_ann_ivf" -> Q(ivfQ, None,
      "IVF ANN: k-means cells + nprobe search (rows-only; recall in spec)"))
}
