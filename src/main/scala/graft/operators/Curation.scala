package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation wave 2 — the filters a production training-data pipeline
  * runs between raw ingest and tokenization, beyond the C4-style gate
  * in TextOps (q_text_filter_policy):
  *
  * 1. repetition    — Gopher-style repetition statistics (duplicate-word
  *                    fraction, most-common-2-gram fraction, duplicate-
  *                    3-gram fraction) + a keep verdict.
  * 2. decontam      — benchmark decontamination: flag documents sharing
  *                    a word n-gram with a held-out eval set.
  * 3. pii           — PII detection/redaction: regex count of emails /
  *                    phone numbers / IPs + redacted length.
  * 4. canonical     — turn near-dup clusters into a training-set keep
  *                    list: one representative per cluster (longest doc
  *                    wins, doc_id breaks ties).
  * 5. semantic      — SemDeDup-style embedding-space dedup: connected
  *                    components over cosine>=τ pairs, keep min vec_id.
  * 6. weighted mix  — domain-mixture construction: per-source target
  *                    quotas filled deterministically by content hash.
  *
  * 100 TB posture: (1) is explode + two hash shuffles keyed
  * (doc,n,gram)→(doc) with map-side partials — shuffle volume is
  * per-doc gram profiles, not the corpus reread. (2) broadcasts the
  * eval-set gram list (eval sets are tiny by construction) so the probe
  * is a map-side hash semi-join; no corpus shuffle at all. (3) is pure
  * per-row regex — map-only, zero shuffles, fully codegen'd. (4)/(5)
  * run CC over the EDGE list only (near-dup pairs ≪ corpus; the
  * alternating large-star/small-star rounds from Dedup — O(log n)
  * regardless of component diameter), then one window over cluster
  * members. (6) is the stratified-sample shape: one shuffle on the
  * domain key; quotas are a broadcast-size literal map. All six are
  * pure column expressions — no UDFs, nothing leaves whole-stage
  * codegen except the CC driver loop already audited in Dedup.
  */
object Curation extends QueryModule {

  // ---- 1. repetition statistics (Gopher filter analog) ----
  //
  // One generator pass emits (doc_id, n, gram) for n=1,2,3 from a
  // single split — word unigrams, bigrams, trigrams — then two keyed
  // aggregations build per-(doc,n) profiles and pivot them to one row
  // per doc. Short docs guard: a CASE arm emits a correctly-typed
  // empty array when size(tk) < n (array_repeat(..., 0)) instead of
  // sequence()'s descending-range surprise.
  private def gramsExpr(n: Int): String =
    if (n == 1) "transform(tk, t -> named_struct('n', 1, 'gram', t))"
    else
      s"""CASE WHEN size(tk) >= $n
         |  THEN transform(sequence(0, size(tk) - $n),
         |         i -> named_struct('n', $n, 'gram', concat_ws(' ', slice(tk, i + 1, $n))))
         |  ELSE array_repeat(named_struct('n', 1, 'gram', ''), 0) END""".stripMargin

  private val repetitionQ = (s: SparkSession, dir: String) => {
    val grams = Tables.documents(s, dir)
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        s"flatten(array(${gramsExpr(1)}, ${gramsExpr(2)}, ${gramsExpr(3)}))")).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
    // per-(doc,n) totals fold into the per-doc pivot as CONDITIONAL
    // aggregates over the (doc,n,gram) counts — two exchanges total,
    // not three (the (doc,n)-keyed middle agg would re-shuffle rows
    // already keyed by doc prefix).
    def overN(n: Int, c: Column) = when(col("n") === n, c)
    val counts = grams
      .groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(
        round(lit(1) - count(overN(1, lit(1))) / sum(overN(1, col("c"))), 6)
          .as("word_rep_frac"),
        round(max(overN(2, col("c"))) / sum(overN(2, col("c"))), 6)
          .as("top2gram_frac"),
        round(coalesce(sum(overN(3, when(col("c") > 1, col("c")))), lit(0L))
          / sum(overN(3, col("c"))), 6).as("dup3gram_frac"))
      .withColumn("keep",
        col("word_rep_frac") <= 0.6 && col("top2gram_frac") <= 0.05)
  }

  private val repetitionSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      |g AS (
      |  SELECT doc_id, 1 AS n, unnest(tk) AS gram FROM toks
      |  UNION ALL
      |  SELECT doc_id, 2, unnest(list_transform(range(1, len(tk)),
      |    i -> tk[i] || ' ' || tk[i+1])) FROM toks
      |  UNION ALL
      |  SELECT doc_id, 3, unnest(list_transform(range(1, len(tk)-1),
      |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) FROM toks),
      |c AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY ALL),
      |p AS (SELECT doc_id, n, SUM(c) AS total, MAX(c) AS top,
      |        COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS dup, COUNT(*) AS dist
      |      FROM c GROUP BY 1, 2)
      |SELECT doc_id,
      |  round(1 - MAX(CASE WHEN n=1 THEN dist END) * 1.0
      |    / MAX(CASE WHEN n=1 THEN total END), 6) AS word_rep_frac,
      |  round(MAX(CASE WHEN n=2 THEN top END) * 1.0
      |    / MAX(CASE WHEN n=2 THEN total END), 6) AS top2gram_frac,
      |  round(MAX(CASE WHEN n=3 THEN dup END) * 1.0
      |    / MAX(CASE WHEN n=3 THEN total END), 6) AS dup3gram_frac,
      |  (round(1 - MAX(CASE WHEN n=1 THEN dist END) * 1.0
      |    / MAX(CASE WHEN n=1 THEN total END), 6) <= 0.6
      |   AND round(MAX(CASE WHEN n=2 THEN top END) * 1.0
      |    / MAX(CASE WHEN n=2 THEN total END), 6) <= 0.05) AS keep
      |FROM p GROUP BY doc_id""".stripMargin

  // ---- 2. benchmark decontamination ----
  //
  // Eval set = every 97th doc (stand-in for a held-out benchmark).
  // Its distinct trigram list is broadcast; every other doc is flagged
  // with how many distinct trigrams it shares. The probe side is one
  // explode + a broadcast semi-ish join + one doc-keyed aggregation:
  // the corpus is never shuffled on the gram key.
  private val trigramsExpr =
    """CASE WHEN size(tk) >= 3
      |  THEN transform(sequence(0, size(tk) - 3),
      |         i -> concat_ws(' ', slice(tk, i + 1, 3)))
      |  ELSE array_repeat('', 0) END""".stripMargin

  private val decontamQ = (s: SparkSession, dir: String) => {
    val g = Tables.documents(s, dir)
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(trigramsExpr)).as("gram"))
    val bench = g.filter(col("doc_id") % 97 === 0).select(col("gram")).distinct()
    val hits = g.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hit_grams"))
    Tables.documents(s, dir)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
  }

  private val decontamSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram FROM toks),
      |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
      |hits AS (SELECT doc_id, COUNT(DISTINCT gram) AS n_hit_grams
      |         FROM g JOIN bench USING (gram)
      |         WHERE doc_id % 97 <> 0 GROUP BY 1)
      |SELECT d.doc_id, COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
      |  COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      |WHERE d.doc_id % 97 <> 0""".stripMargin

  // ---- 3. PII detection / redaction ----
  //
  // The fixture corpus carries no PII, so the operator PLANTS it
  // deterministically (same closed forms in both engines — the
  // multimodal-payload trick): every 7th doc gains an email, every
  // 11th a phone number, every 13th an IP. The detector then has real
  // work: regex-count each class and measure the redacted text. Pure
  // per-row expressions — map-only, zero shuffles.
  private val EmailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  private val PhoneRe = "555-[0-9]{4}"
  private val IpRe    = "10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}"

  private val piiQ = (s: SparkSession, dir: String) => {
    val id = col("doc_id")
    val pii = concat(col("text"),
      when(id % 7 === 0,
        concat(lit(" reach user"), id.cast("string"), lit("@example.com")))
        .otherwise(""),
      when(id % 11 === 0,
        concat(lit(" call 555-"), lpad((id % 10000).cast("string"), 4, "0")))
        .otherwise(""),
      when(id % 13 === 0,
        concat(lit(" host 10.0."), (id % 256).cast("string"), lit("."),
          ((id * 7) % 256).cast("string")))
        .otherwise(""))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(pii, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(expr(s"regexp_extract_all($piiExprSql, '$EmailRe', 0)"))
        .cast("long").as("n_emails"),
      size(expr(s"regexp_extract_all($piiExprSql, '$PhoneRe', 0)"))
        .cast("long").as("n_phones"),
      size(expr(s"regexp_extract_all($piiExprSql, '$IpRe', 0)"))
        .cast("long").as("n_ips"),
      length(redacted).cast("long").as("redacted_len"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ips") > 0)
  }

  /** The planted-PII text as a SQL expression (shared by the three
    * regexp_extract_all calls above — Column-API regexp_extract_all
    * lands in Spark SQL expr form anyway). */
  private def piiExprSql: String =
    """concat(text,
      |  CASE WHEN doc_id % 7 = 0
      |    THEN concat(' reach user', CAST(doc_id AS STRING), '@example.com') ELSE '' END,
      |  CASE WHEN doc_id % 11 = 0
      |    THEN concat(' call 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END,
      |  CASE WHEN doc_id % 13 = 0
      |    THEN concat(' host 10.0.', CAST(doc_id % 256 AS STRING), '.',
      |                CAST((doc_id * 7) % 256 AS STRING)) ELSE '' END)"""
      .stripMargin.replaceAll("\n", " ")

  private val piiSql = {
    val p =
      """concat(text,
        |  CASE WHEN doc_id % 7 = 0
        |    THEN concat(' reach user', CAST(doc_id AS VARCHAR), '@example.com') ELSE '' END,
        |  CASE WHEN doc_id % 11 = 0
        |    THEN concat(' call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END,
        |  CASE WHEN doc_id % 13 = 0
        |    THEN concat(' host 10.0.', CAST(doc_id % 256 AS VARCHAR), '.',
        |                CAST((doc_id * 7) % 256 AS VARCHAR)) ELSE '' END)"""
        .stripMargin.replaceAll("\n", " ")
    s"""SELECT doc_id,
       |  len(regexp_extract_all($p, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all($p, '$PhoneRe')) AS n_phones,
       |  len(regexp_extract_all($p, '$IpRe')) AS n_ips,
       |  length(regexp_replace(regexp_replace(regexp_replace($p,
       |    '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g'),
       |    '$IpRe', '<IP>', 'g')) AS redacted_len,
       |  (len(regexp_extract_all($p, '$EmailRe'))
       |   + len(regexp_extract_all($p, '$PhoneRe'))
       |   + len(regexp_extract_all($p, '$IpRe'))) > 0 AS has_pii
       |FROM documents""".stripMargin
  }

  // ---- 4. canonical representative per near-dup cluster ----
  //
  // Composes the verified-jaccard clusters (Dedup.clusters — CC over
  // the near-dup edge list) with a per-cluster argmax: the longest
  // member wins, doc_id breaks ties. This is the step that turns
  // pairwise dedup output into an actual keep list. One extra shuffle
  // (window over cluster_id) over CLUSTERED docs only.
  private val canonicalQ = (s: SparkSession, dir: String) => {
    val members = Dedup.clusters(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        Seq("doc_id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    members
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1))
        .over(Window.partitionBy(col("cluster_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("canonical_doc_id"),
        col("n_chars").as("canonical_n_chars"), col("n_members"))
  }

  // the clusters oracle's CTE chain verbatim (Dedup.clustersSql), with
  // the canonical-selection window on top
  private val canonicalSql =
    """WITH RECURSIVE
      |toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s FROM toks),
      |d AS (SELECT DISTINCT doc_id, s FROM sh),
      |n AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
      |inter AS (SELECT a.doc_id ida, b.doc_id idb, count(*) i
      |          FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (SELECT ida, idb
      |          FROM inter JOIN n na ON ida = na.doc_id
      |                     JOIN n nb ON idb = nb.doc_id
      |          WHERE round(i*1.0/(na.n+nb.n-i), 6) >= 0.7),
      |edges AS (SELECT ida AS a, idb AS b FROM pairs
      |          UNION SELECT idb, ida FROM pairs),
      |reach AS (SELECT a AS id, b AS peer FROM edges
      |          UNION
      |          SELECT r.id, e.b FROM reach r JOIN edges e ON r.peer = e.a),
      |cl AS (SELECT id AS doc_id, least(id, min(peer)) AS cluster_id
      |       FROM reach GROUP BY id),
      |m AS (SELECT cl.cluster_id, cl.doc_id, doc.n_chars,
      |        ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
      |          ORDER BY doc.n_chars DESC, cl.doc_id ASC) AS rn,
      |        COUNT(*) OVER (PARTITION BY cl.cluster_id) AS n_members
      |      FROM cl JOIN documents doc ON cl.doc_id = doc.doc_id)
      |SELECT cluster_id, doc_id AS canonical_doc_id,
      |  n_chars AS canonical_n_chars, n_members
      |FROM m WHERE rn = 1""".stripMargin

  // ---- 5. semantic dedup (SemDeDup shape) ----
  //
  // Same CC machinery, but the edges live in EMBEDDING space — and the
  // candidate pairs come from an LSH-bucket BAND equi-join, never an
  // all-pairs scan (the r3 scale-killer this replaces; Dedup.cosinePairs
  // survives solely as the explicitly-scoped small-scale verification
  // baseline for q_dedup_cosine_pairs).
  //
  // Threshold honesty: SemDeDup runs at HIGH cosine thresholds
  // (near-duplicate semantics). At a weak threshold like the old 0.45
  // no sublinear candidate generation can be exact — measured on this
  // fixture, cos≈0.45 pairs sit at random-hyperplane bucket hamming up
  // to 9/16, i.e. indistinguishable from chance (p_bit = 1-θ/π ≈ 0.65)
  // — so the query now targets τ=0.9 over a planted-near-dup corpus:
  // base embeddings ∪ exact clones (vec_id+10000) ∪ DETERMINISTICALLY
  // PERTURBED near-clones (vec_id+20000, first 8 components ×1.5,
  // cos ≥ 0.98, bucket hamming 0-3 — 9 of 20 nonzero, so the band
  // path is genuinely exercised, not just hash equality).
  //
  // Recall is GUARANTEED, not sampled: a 16-bit bucket split into four
  // 4-bit bands means hamming ≤ 3 ⇒ at least one band matches exactly
  // (pigeonhole) ⇒ the pair surfaces as a candidate; CurationSpec
  // asserts every planted pair's hamming ≤ 3 and that the edge plan
  // contains no BroadcastNestedLoopJoin/CartesianProduct. Candidates
  // are cosine-VERIFIED before the distinct, so exchanges past the
  // band join carry verified matches only (the simhash discipline,
  // Dedup.scala). 100 TB: 4 rows per vector into one equi-join
  // keyed (band, value) — band-bucket density bounds candidates, the
  // corpus is never crossed with itself. Keep = min vec_id per CC.
  private val SemDim = 64
  private val SemBits = 16
  private val SemBands = 4 // 4 bands × 4 bits: exact-match guarantee ≤ 3-bit drift
  private val SemTau = 0.9

  /** Base ∪ exact clones ∪ perturbed near-clones — the planted ground
    * truth both engines rebuild identically (float ×1.5 is exact in
    * IEEE-754, so Spark and DuckDB agree bit-for-bit). */
  private[graft] def semanticCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 20)
    e.unionByName(q.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      .unionByName(q.select((col("vec_id") + 20000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i < 8, x * lit(1.5f)).otherwise(x)).as("embedding")))
  }

  private[graft] def semanticEdges(s: SparkSession, dir: String): DataFrame = {
    // codegen cosine_sim for the candidate verify (bit-identical to
    // the HOF fold by the CosineSimilarity contract): the banded
    // candidate set is ~4·(N/16)²/2 pairs, and the interpreted
    // zip_with/aggregate lambda at ~80 µs/pair made the verify the
    // whole query at sf1 (272 s → seconds; r8 full-registry screen)
    graft.functions.GraftFunctions.register(s)
    val withB = semanticCorpus(s, dir)
      .withColumn("bucket", graft.functions.VectorOps
        .rhpBucket(col("embedding"), SemDim, SemBits))
    val bandWidth = SemBits / SemBands
    val bands = withB.select(col("vec_id"), col("embedding"),
      explode(array((0 until SemBands).map(i => struct(lit(i).as("band"),
        col("bucket").bitwiseAND(lit(((1L << bandWidth) - 1) << (i * bandWidth)))
          .as("bv"))): _*)).as("bb"))
      .select(col("vec_id"), col("embedding"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("ida"), col("y.vec_id").as("idb"),
        round(call_function("cosine_sim",
          col("x.embedding"), col("y.embedding")), 6).as("cos"))
      .filter(col("cos") >= SemTau) // verify BEFORE distinct: exchanges carry matches only
      .select(col("ida"), col("idb"))
      .distinct()
  }

  private val semanticQ = (s: SparkSession, dir: String) =>
    Dedup.connectedComponentsStars(semanticEdges(s, dir))
      .select(col("id").as("vec_id"), col("label").as("cluster_id"))
      .withColumn("kept", col("vec_id") === col("cluster_id"))

  // Oracle: brute-force all-pairs over the SAME planted corpus (the
  // closed-form ground truth the banded path must reproduce exactly).
  private val semanticSql =
    """WITH RECURSIVE corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL SELECT vec_id + 10000 AS vec_id, embedding
      |    FROM embeddings WHERE vec_id < 20
      |  UNION ALL SELECT vec_id + 20000 AS vec_id,
      |    list_transform(range(1, len(embedding)+1),
      |      i -> CASE WHEN i <= 8
      |           THEN CAST(embedding[i] * CAST(1.5 AS FLOAT) AS FLOAT)
      |           ELSE embedding[i] END) AS embedding
      |    FROM embeddings WHERE vec_id < 20),
      |dots AS (
      |  SELECT a.vec_id AS ida, b.vec_id AS idb,
      |    list_sum(list_transform(range(1, len(a.embedding)+1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS ab,
      |    list_sum(list_transform(range(1, len(a.embedding)+1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))) AS aa,
      |    list_sum(list_transform(range(1, len(b.embedding)+1),
      |      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS bb
      |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id),
      |pairs AS (SELECT ida, idb FROM dots
      |          WHERE round(ab / (sqrt(aa) * sqrt(bb)), 6) >= 0.9),
      |edges AS (SELECT ida AS a, idb AS b FROM pairs
      |          UNION SELECT idb, ida FROM pairs),
      |reach AS (SELECT a AS id, b AS peer FROM edges
      |          UNION
      |          SELECT r.id, e.b FROM reach r JOIN edges e ON r.peer = e.a)
      |SELECT id AS vec_id, least(id, min(peer)) AS cluster_id,
      |  id = least(id, min(peer)) AS kept
      |FROM reach GROUP BY id""".stripMargin

  // ---- 6. weighted domain mixture ----
  //
  // Training-mixture construction: each source domain has a target
  // quota; fill each quota deterministically by content hash (the
  // Sampling.scala convention — never rand()), so the mixture is a
  // pure function of the data. One shuffle on the domain key.
  private val quotaExpr =
    when(col("source").isin("src0", "src1", "src2"), 10)
      .when(col("source").isin("src3", "src4"), 5)
      .otherwise(2)

  private val quotaSql =
    """CASE WHEN source IN ('src0','src1','src2') THEN 10
      |     WHEN source IN ('src3','src4') THEN 5
      |     ELSE 2 END""".stripMargin

  private val weightedMixQ = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("hk"), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("hk", md5(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= quotaExpr)
      .select(col("source"), col("rn"), col("doc_id"), col("hk"))
  }

  private val weightedMixSql =
    s"""WITH k AS (SELECT source, doc_id,
       |  md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents)
       |SELECT source, rn, doc_id, hk FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY source ORDER BY hk, doc_id) AS rn
       |  FROM k)
       |WHERE rn <= ($quotaSql)""".stripMargin

  /** Bigram language-model quality score — the CCNet/KenLM-style
    * perplexity filter: train add-one-smoothed bigram counts on the
    * corpus itself, score every document by its mean inverse bigram
    * probability, and keep documents no worse than 2× the corpus-wide
    * mean. High score = improbable token transitions = boilerplate,
    * mangled extraction, or non-text — exactly what the perplexity
    * gate drops in production pipelines.
    *
    * Determinism discipline: the per-token statistic is computed in
    * INTEGER arithmetic — `(c(prev)+V) * 1e6 div (c(prev,tok)+1)` —
    * so per-doc sums are exact longs (no float accumulation order to
    * diverge), and the keep verdict cross-multiplies in decimal/
    * hugeint instead of dividing. Every bigram scored is observed in
    * the training corpus, so c(big) >= 1 and the ratio is bounded.
    *
    * 100 TB posture: prev-token derivation is MAP-ONLY (posexplode
    * with the token array in scope — no per-doc window); the bigram
    * and context count tables aggregate from the same exchange the
    * probe join uses (gram-keyed shuffles over gram TYPES, far
    * smaller than the corpus); V and the global mean are one-row
    * crossJoin broadcast scalars, never a driver collect.
    *
    * SKEW hardening (r3 advice closed): natural language grams are
    * Zipf-distributed — at 100 TB the hottest contexts ("the", "of")
    * would hash-partition a constant fraction of the CORPUS onto
    * single reducers in the probe join. The probe therefore joins on
    * SALTED keys: each corpus token carries a deterministic salt in
    * [0, LmSalt), and the count tables are replicated LmSalt× (they
    * are gram-TYPE-sized, so the replication is over the small side),
    * spreading every hot gram across LmSalt reducers. Results are
    * bit-identical — each token row matches exactly its salt replica. */
  private val LmSalt = 16
  private val lmScoreQ = (s: SparkSession, dir: String) => {
    val big = Tables.documents(s, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("tk"))
      .select(col("doc_id"), col("tk"), posexplode(col("tk")))
      .select(col("doc_id"),
        when(col("pos") === 0, lit("<s>"))
          .otherwise(element_at(col("tk"), col("pos"))).as("prev"),
        col("col").as("tok"),
        pmod(xxhash64(col("doc_id"), col("pos")), lit(LmSalt.toLong))
          .as("salt"))
    val cb = big.groupBy(col("prev"), col("tok"))
      .agg(count(lit(1)).as("cb"))
    val cp = big.groupBy(col("prev")).agg(count(lit(1)).as("cp"))
    val salts = sequence(lit(0L), lit(LmSalt - 1L))
    val cbS = cb.withColumn("salt", explode(salts))
    val cpS = cp.withColumn("salt", explode(salts))
    val v = big.agg((countDistinct(col("tok")) + 1).as("v"))
    val perDoc = big
      .join(cbS, Seq("prev", "tok", "salt"))
      .join(cpS, Seq("prev", "salt")).crossJoin(v)
      .withColumn("q", expr("(cp + v) * 1000000 div (cb + 1)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("q")).as("score_q"))
    val tot = perDoc.agg(sum(col("score_q")).as("total_q"),
      sum(col("n_tok")).as("total_n"))
    perDoc.crossJoin(tot).select(
      col("doc_id"), col("n_tok"), col("score_q"),
      round(col("score_q") / col("n_tok") / 1e6, 4).as("avg_invp"),
      (col("score_q").cast("decimal(20,0)") *
        col("total_n").cast("decimal(20,0)") <=
        (col("total_q") * 2).cast("decimal(20,0)") *
          col("n_tok").cast("decimal(20,0)")).as("keep"))
  }

  private val lmScoreSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
      |big AS (
      |  SELECT doc_id,
      |    unnest(list_prepend('<s>', list_slice(tk, 1, len(tk) - 1))) AS prev,
      |    unnest(tk) AS tok
      |  FROM toks),
      |cb AS (SELECT prev, tok, COUNT(*) AS cb FROM big GROUP BY 1, 2),
      |cp AS (SELECT prev, COUNT(*) AS cp FROM big GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT tok) + 1 AS v FROM big),
      |q AS (
      |  SELECT b.doc_id, (cp.cp + v.v) * 1000000 // (cb.cb + 1) AS q
      |  FROM big b
      |  JOIN cb ON b.prev = cb.prev AND b.tok = cb.tok
      |  JOIN cp ON b.prev = cp.prev, v),
      |per AS (
      |  SELECT doc_id, COUNT(*) AS n_tok,
      |    CAST(SUM(q) AS BIGINT) AS score_q FROM q GROUP BY 1),
      |tot AS (SELECT CAST(SUM(score_q) AS BIGINT) AS total_q,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_n FROM per)
      |SELECT doc_id, n_tok, score_q,
      |  round(score_q / n_tok / 1e6, 4) AS avg_invp,
      |  CAST(score_q AS HUGEINT) * CAST(total_n AS HUGEINT)
      |    <= CAST(2 * total_q AS HUGEINT) * CAST(n_tok AS HUGEINT) AS keep
      |FROM per, tot""".stripMargin

  /** Cross-document boilerplate passage removal — the CCNet paragraph-
    * dedup shape adapted to this corpus (texts carry no newlines, so
    * the passage unit is a fixed `ChunkTok`-token window, stride =
    * width): a chunk whose exact text recurs in MORE than one document
    * is boilerplate; every occurrence except the lexicographically
    * first (doc_id, position) is dropped and documents are rebuilt
    * from their surviving chunks in order. Within-doc repeats are NOT
    * touched (that is q_text_repetition's job) — this gate removes
    * shared headers/footers/navigation across the corpus.
    *
    * 100 TB posture: chunking is map-side; the dup-stats aggregate
    * groups on chunk TEXT with map-side partials, so the exchange
    * carries distinct-chunk partials and a million-fold repeated
    * footer collapses per task before it travels. The occurrence join
    * + first-occurrence window also key on chunk — a real corpus'
    * mega-hot chunks would salt this window's key exactly like the
    * lm-score probe (the count is per-chunk, so a two-level
    * salted-then-merge rank works); documented, not needed at fixture
    * skew. Rebuild is one doc_id shuffle. */
  private val ChunkTok = 3
  private val chunkDedupQ = (s: SparkSession, dir: String) => {
    val chunks = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"),
        size(col("tk")).as("n_toks"),
        expr(
          s"""transform(sequence(0, cast(ceil(size(tk) / ${ChunkTok}.0) as int) - 1),
             |  i -> array_join(slice(tk, i * $ChunkTok + 1, $ChunkTok), ' '))"""
            .stripMargin).as("cs"))
      .select(col("doc_id"), size(col("cs")).as("n_chunks"),
        posexplode(col("cs")).as(Seq("ci", "chunk")))
    // "recurs in more than one doc" ⟺ min(doc_id) ≠ max(doc_id) over
    // the chunk's occurrences — windows on the SAME partitioning as
    // the first-occurrence rank, so the dup test costs no extra
    // exchange (the r4 first cut aggregated ndocs separately and
    // joined back: one more corpus shuffle for the same answer).
    val wAll = Window.partitionBy(col("chunk"))
    val wFirst = Window.partitionBy(col("chunk"))
      .orderBy(col("doc_id").asc, col("ci").asc)
    chunks
      .withColumn("multi",
        min(col("doc_id")).over(wAll) =!= max(col("doc_id")).over(wAll))
      .withColumn("rn", row_number().over(wFirst))
      .filter(!col("multi") || col("rn") === 1)
      .groupBy(col("doc_id"), col("n_chunks"))
      .agg(count(lit(1)).as("n_kept"),
        (col("n_chunks") - count(lit(1))).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(struct(col("ci"), col("chunk")))),
          x => x("chunk")), " ").as("cleaned_text"))
  }

  private val chunkDedupSql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
       |  WHERE len(string_split(text, ' ')) > 0),
       |chunks AS (
       |  SELECT doc_id,
       |    CAST(ceil(len(tk) / ${ChunkTok}.0) AS INT) AS n_chunks,
       |    i - 1 AS ci,
       |    array_to_string(
       |      tk[(i - 1) * $ChunkTok + 1 : (i - 1) * $ChunkTok + $ChunkTok],
       |      ' ') AS chunk
       |  FROM toks CROSS JOIN unnest(
       |    range(1, CAST(ceil(len(tk) / ${ChunkTok}.0) AS INT) + 1)) AS t(i)),
       |stats AS (
       |  SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs
       |  FROM chunks GROUP BY 1),
       |occ AS (
       |  SELECT c.doc_id, c.n_chunks, c.ci, c.chunk, s.ndocs,
       |    row_number() OVER (PARTITION BY c.chunk
       |      ORDER BY c.doc_id ASC, c.ci ASC) AS rn
       |  FROM chunks c JOIN stats s USING (chunk))
       |SELECT doc_id, n_chunks, COUNT(*) AS n_kept,
       |  n_chunks - COUNT(*) AS n_dropped,
       |  string_agg(chunk, ' ' ORDER BY ci) AS cleaned_text
       |FROM occ WHERE ndocs = 1 OR rn = 1
       |GROUP BY 1, 2""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_text_chunk_dedup" -> Q(chunkDedupQ, Some(chunkDedupSql),
      "cross-doc boilerplate passage removal: keep-first chunk dedup + rebuild"),
    "q_text_lm_score" -> Q(lmScoreQ, Some(lmScoreSql),
      "bigram-LM perplexity gate: integer-exact inverse-probability score"),
    "q_text_repetition" -> Q(repetitionQ, Some(repetitionSql),
      "Gopher repetition stats: dup-word/top-2gram/dup-3gram fractions + keep"),
    "q_text_decontam" -> Q(decontamQ, Some(decontamSql),
      "benchmark decontamination: trigram overlap vs held-out set (broadcast)"),
    "q_text_pii" -> Q(piiQ, Some(piiSql),
      "PII detect/redact: planted emails/phones/IPs, regex count + redacted len"),
    "q_dedup_canonical" -> Q(canonicalQ, Some(canonicalSql),
      "canonical doc per near-dup cluster: longest member wins"),
    "q_sim_semantic_dedup" -> Q(semanticQ, Some(semanticSql),
      "SemDeDup: LSH band-join candidates, cosine>=0.9 verified, CC, keep min vec_id"),
    "q_sample_weighted_mix" -> Q(weightedMixQ, Some(weightedMixSql),
      "domain-mixture quotas filled deterministically by content hash"))
}
