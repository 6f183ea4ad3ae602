package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 — deduplication suite (north-star LLM-pipeline ops).
  *
  * Five dedup strategies over `documents`/`embeddings`, all pure column
  * expressions (no UDFs — everything stays codegen'd):
  *
  * 1. exact       — md5(text) group-dedup (keep min doc_id).
  * 2. jaccard     — EXACT 3-gram-shingle jaccard similarity join via an
  *                  inverted index (shingle → docs) — no O(n²) scan.
  * 3. minhash LSH — 64 seeded minhashes → 16 bands × 4 → band-bucket
  *                  equi-join → exact-jaccard verification of candidates.
  * 4. simhash     — 60-bit simhash from md5 token hashes, hamming ≤ 10
  *                  pairs (md5 so the oracle can rebuild bit-for-bit).
  * 5. cosine      — embedding near-dup pairs above a cosine threshold,
  *                  double-precision dot product via zip_with+aggregate.
  *
  * 100 TB posture: (2) fan-out is bounded by shingle document-frequency
  * (large shingle space ⇒ rare shingles); when df spikes, (3) is the
  * scale path — LSH bucket join touches only same-bucket pairs, and the
  * band hash is the shuffle key so candidate generation is one shuffle.
  * (4) at scale adds a band-split equi-join prefilter (pigeonhole: any
  * hamming≤k pair shares one of k+1 bit-bands) — noted inline. (5) at
  * scale goes through the LSH-bucketed variant in Similarity.scala.
  * MinHash seeds are fixed literals — never Math.random (SURVEY §7 risk 3).
  */
object Dedup extends QueryModule {

  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = 4 // NumHashes / Bands

  /** tokens → array of 3-gram shingle strings (0-based array lambda). */
  private def shingled(df: DataFrame): DataFrame =
    df.withColumn("tk", split(col("text"), " "))
      .withColumn("sh", expr(
        "CASE WHEN size(tk) >= 3 THEN transform(sequence(0, size(tk) - 3), " +
          "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])) " +
          "ELSE array_repeat('', 0) END"))

  /** (doc_id, shingle) distinct pairs — the inverted-index edge list.
    * r9: positional explode + codegen concat projection — building the
    * shingle ARRAY first paid an interpreted lambda per shingle (the
    * array-returning `shingled` stays for the consumers that need the
    * array itself). Same rows: <3-token docs exploded an empty array
    * before, the size filter drops them now; shingle strings are the
    * identical concat_ws over the identical elements. */
  private def shingleEdges(df: DataFrame): DataFrame =
    df.withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), col("tk"),
        explode(expr("sequence(0, size(tk) - 3)")).as("i"))
      .select(col("doc_id"),
        expr("concat_ws(' ', tk[i], tk[i+1], tk[i+2])").as("s"))
      .distinct()

  /** The corpus (doc_id, s) shingle edge list, built once per
    * (session, route, dir) and cached — the explicit share for the
    * TextOps gram consumers (q_text_ngram_novelty, q_text_boilerplate)
    * whose inline gram subtrees previously rode CacheManager's
    * ACCIDENTAL canonical-plan match against this same cache (the
    * cross-suite plan-substitution behavior PropertySpec documents);
    * the r9 shingleEdges rewrite changed the canonical plan and
    * silently cost those two queries their cache hit (measured ~8×
    * on the bench) until they were pointed here deliberately. */
  private[graft] def sharedShingleEdges(
      s: SparkSession, dir: String): DataFrame =
    shared(s, s"edges|$dir")(shingleEdges(Tables.documents(s, dir)))

  /** Shared-key co-occurrence counts over an (id, s) edge list: for
    * every unordered id pair sharing a key, |A∩B| — rows
    * (aName < bName, i). r9 optimization (guide §2.4, the market-
    * basket shape): the former spelling self-joined the edge list on
    * the key — two full shuffles plus two sort-merge sorts per call
    * site. Grouping to ONE sorted id set per key (a single exchange;
    * collect_set folds the dedup in) and exploding the C(m,2) ordered
    * combinations map-side feeds the pair aggregate directly.
    * Result-identical: same pair multiset (the join's a<b half),
    * and per-key fan-out C(m,2) is exactly the volume the join
    * produced, so hot-key bounds are unchanged. */
  private def pairIntersections(
      edges: DataFrame, id: String,
      aName: String, bName: String): DataFrame =
    edges.groupBy(col("s"))
      .agg(array_sort(collect_set(col(id))).as("ids"))
      .filter(size(col("ids")) >= 2)
      // codegen pair generation: two Generate operators + a slice —
      // NOT transform/flatten lambdas, which are interpreted per
      // element and measured slower than the join they replaced
      .select(col("ids"), posexplode(col("ids")).as(Seq("p", aName)))
      .select(col(aName),
        explode(slice(col("ids"), col("p") + lit(2),
          greatest(size(col("ids")) - col("p") - lit(1), lit(0))))
          .as(bName))
      .groupBy(col(aName), col(bName)).agg(count(lit(1)).as("i"))

  /** Cached-intermediate registry: the edge list / minhash profile /
    * simhash table are each used by several queries (pairs, clusters,
    * verification); memoizing the CACHED DataFrame per (session, dir)
    * means one CacheManager entry reused everywhere instead of a fresh
    * registration per invocation (the cross-suite plan-substitution
    * hazard PropertySpec documents — and the "already cached" warnings
    * in bench runs). Entries die with the session. */
  private val sharedCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def shared(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    sharedCache.computeIfAbsent( // key includes the storage route so the
      // DSv2 path never silently reuses a parquet-built cache entry
      s"${System.identityHashCode(s)}|${Tables.objectStoreRoot.getOrElse("pq")}|$key",
      _ => build.cache())

  private val exactQ = (s: SparkSession, dir: String) =>
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Cross-SOURCE contamination matrix — the dataset-level question a
    * training-data curator asks before mixing corpora ("how much of
    * source B is already in source A?"): exact 3-gram-shingle Jaccard
    * between every source pair. The per-source DISTINCT collapses the
    * corpus to (vocabulary × sources) BEFORE any pairing, so the one
    * shingle-keyed self-join fans out at most |sources|² rows per
    * shingle — cost ∝ shared vocabulary, never corpus². At a scale
    * where even the distinct shingle sets are huge, the same matrix
    * downgrades to the minhash signatures q_dedup_minhash_lsh already
    * maintains (union the per-doc signatures per source); this query
    * is the exact form those estimates are verified against. */
  private val crossSourceQ = (s: SparkSession, dir: String) => {
    val sh = shingled(Tables.documents(s, dir)
        .select(col("source"), col("text")))
      .select(col("source"), explode(col("sh")).as("s")).distinct()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    pairIntersections(sh, "source", "src_a", "src_b")
      .withColumnRenamed("i", "n_shared")
      .join(sizes.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("na"), col("nb"),
        round(col("n_shared") /
          (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
  }

  private val crossSourceSql =
    """WITH toks AS (
      |  SELECT source, string_split(text, ' ') AS tk FROM documents),
      |sh0 AS (
      |  SELECT source, unnest(list_transform(range(1, len(tk)-1),
      |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
      |  FROM toks),
      |sh AS (SELECT DISTINCT source, s FROM sh0),
      |sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT i.src_a, i.src_b, i.n_shared, na.n AS na, nb.n AS nb,
      |  round(i.n_shared * 1.0 / (na.n + nb.n - i.n_shared), 6) AS jaccard
      |FROM inter i
      |JOIN sizes na ON i.src_a = na.source
      |JOIN sizes nb ON i.src_b = nb.source""".stripMargin

  private val exactSql =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  // Exact shingle-jaccard similarity join (threshold 0.7) — the ground
  // truth the LSH pipeline is verified against.
  private[graft] def jaccardPairs(s: SparkSession, dir: String, thresh: Double): DataFrame = {
    val edges = shared(s, s"edges|$dir")(shingleEdges(Tables.documents(s, dir)))
    val counts = edges.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairIntersections(edges, "doc_id", "ida", "idb")
    inter
      .join(counts.select(col("doc_id").as("ida"), col("n").as("na")), Seq("ida"))
      .join(counts.select(col("doc_id").as("idb"), col("n").as("nb")), Seq("idb"))
      .withColumn("jaccard", round(col("i") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= thresh)
      .select("ida", "idb", "jaccard")
  }

  private val jaccardSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s FROM toks),
      |d AS (SELECT DISTINCT doc_id, s FROM sh),
      |n AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
      |inter AS (SELECT a.doc_id ida, b.doc_id idb, count(*) i
      |          FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT idb, ida, round(i*1.0/(na.n+nb.n-i), 6) AS jaccard
      |FROM inter JOIN n na ON ida = na.doc_id JOIN n nb ON idb = nb.doc_id
      |WHERE round(i*1.0/(na.n+nb.n-i), 6) >= 0.7""".stripMargin

  // LSH candidates verified by exact jaccard ≥ 0.7. With 16×4 banding,
  // P(miss) at j=0.9 is (1-0.9⁴)¹⁶ ≈ 4e-8, so verified-LSH equals the
  // exact similarity join on any realistic dataset — which is what the
  // SQL oracle computes.
  //
  // Plan shape (deliberate): ONE explode + ONE groupBy builds the whole
  // per-doc profile — 64 signature minima AND the verification shingle
  // set — because `min` is duplicate-insensitive and `collect_set`
  // dedups, so no distinct pre-pass and no second aggregation are
  // needed. Total: 1 shuffle to profile, then bucket/verify joins whose
  // volume is candidates, not corpus.
  /** Shared by minhashQ and BlockingAudit (one derivation, no drift). */
  private[operators] def minhashProfileForAudit(
      s: SparkSession, dir: String): DataFrame =
    shared(s, s"minhash-profile|$dir") {
      shingled(Tables.documents(s, dir))
        .select(col("doc_id"), explode(col("sh")).as("s"))
        .groupBy(col("doc_id"))
        .agg(
          collect_set(col("s")).as("shset"),
          (0 until NumHashes).map(h =>
            min(xxhash64(lit(h), col("s"))).as(s"m$h")): _*)
        .withColumn("n", size(col("shset")))
    }

  /** Band-bucket assignment over a minhash profile — shared by
    * minhashQ and BlockingAudit. */
  private[operators] def minhashBucketsForAudit(
      profile: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    profile
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
  }

  private val minhashQ = (s: SparkSession, dir: String) => {
    val profile = minhashProfileForAudit(s, dir)
    val buckets = minhashBucketsForAudit(profile)
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
      .distinct()
    val sets = profile.select(col("doc_id"), col("shset"), col("n"))
    cand
      .join(sets.select(col("doc_id").as("ida"), col("shset").as("sha"),
        col("n").as("na")), Seq("ida"))
      .join(sets.select(col("doc_id").as("idb"), col("shset").as("shb"),
        col("n").as("nb")), Seq("idb"))
      .withColumn("i", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", round(col("i") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= 0.7)
      .select("ida", "idb", "jaccard")
  }

  private val SimhashBits = 60 // 15 hex chars of md5 → fits in a signed long

  /** SimHash: md5-derived 60-bit token hash; per-bit ±tf vote; bit set
    * where the vote is positive. md5 (not xxhash64) so DuckDB rebuilds
    * the identical hash. At 100 TB the pair search adds a band-split
    * equi-join prefilter (any hamming≤k pair shares an identical
    * (k+1)-way bit-band by pigeonhole); at fixture scale the verified
    * pair set is computed directly on the (small) per-doc hash table.
    */
  private[operators] def simhashesForAudit(
      s: SparkSession, dir: String): DataFrame = simhashes(s, dir)

  private def simhashes(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("h", conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until SimhashBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$i")
    }
    val sim = (0 until SimhashBits).map { i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    toks.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sim.as("simhash"))
  }

  /** Pair search with the band-split prefilter (the 100 TB plan made
    * real, not just documented): 60 bits → 12 bands of 5; any pair
    * with hamming ≤ 10 has ≤ 10 corrupted bands, so it shares ≥ 2
    * intact bands (pigeonhole) — the band equi-join therefore loses
    * NOTHING vs the all-pairs theta join while touching only
    * same-band-value pairs. Exact hamming verification then filters
    * candidates. Result-identical by construction; the oracle (which
    * computes all pairs) proves it.
    */
  private val simhashQ = (s: SparkSession, dir: String) => {
    val h = shared(s, s"simhash|$dir")(simhashes(s, dir))
    val bandCols = (0 until 12).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 5).bitwiseAND(31L).as("bv"))
    }
    val buckets = h.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    // hamming is verified BEFORE the dedup `distinct` — bit_count is
    // free next to a shuffle, so the only exchange here carries the
    // (rare) verified matches, not every same-band candidate pair.
    buckets.as("x").join(buckets.as("y"), Seq("band", "bv"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= 10)
      .distinct()
  }

  // DuckDB rebuilds the identical simhash from md5 — generated SQL.
  private val simhashSql: String = {
    val votes = (0 until SimhashBits).map(i =>
      s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i").mkString(",\n    ")
    val bits = (0 until SimhashBits).map(i =>
      s"(CASE WHEN v$i > 0 THEN (1::BIGINT << $i) ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |th AS (SELECT doc_id, CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tok),
       |votes AS (SELECT doc_id,
       |    $votes
       |  FROM th GROUP BY doc_id),
       |sh AS (SELECT doc_id, $bits AS simhash FROM votes)
       |SELECT a.doc_id AS ida, b.doc_id AS idb,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 10""".stripMargin
  }

  private val cosineQ = (s: SparkSession, dir: String) => {
    // codegen cosine_sim, not the HOF fold: the |V|²/2 pairing makes
    // interpreted+boxed lambda evaluation the dominant cost at sf0.1
    // (the q_sim_knn_graph lesson — 40× measured); bit-identical by
    // the CosineSimilarity contract + row-equal spec.
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    // widen the streamed side: the small embeddings file plans as one
    // scan partition, so the broadcast nested-loop theta join would
    // otherwise score all |V|²/2 pairs in a single task (the r8
    // full-registry sf1 screen measured 256 s on one core)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .repartition(s.sparkContext.defaultParallelism)
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    a.join(b, col("ida") < col("idb"))
      .withColumn("cos",
        round(call_function("cosine_sim", col("ea"), col("eb")), 6))
      .filter(col("cos") >= 0.45)
      .select("ida", "idb", "cos")
  }

  private val cosineSql =
    """WITH dots AS (
      |  SELECT a.vec_id AS ida, b.vec_id AS idb,
      |    list_sum(list_transform(range(1, len(a.embedding)+1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS ab,
      |    list_sum(list_transform(range(1, len(a.embedding)+1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))) AS aa,
      |    list_sum(list_transform(range(1, len(b.embedding)+1),
      |      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS bb
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      |SELECT ida, idb, round(ab / (sqrt(aa) * sqrt(bb)), 6) AS cos
      |FROM dots WHERE round(ab / (sqrt(aa) * sqrt(bb)), 6) >= 0.45""".stripMargin

  /** Near-dup CLUSTERS: connected components over the verified jaccard
    * pairs, labeling every clustered doc with the min doc_id reachable
    * in its component — the "keep one representative per duplicate
    * group" step that turns pairwise dedup output into an actual
    * training-set filter.
    *
    * Algorithm: min-label propagation to fixpoint. Labels start as the
    * node's own id; each round every node takes the min of its own and
    * its neighbors' labels; converges in O(component diameter) rounds.
    * Each round is one shuffle over the EDGE set (candidate pairs, tiny
    * vs the corpus — near-dup pair density is what made dedup worth
    * running), never over the corpus; `localCheckpoint` truncates the
    * per-round lineage so the fixpoint loop doesn't grow the plan. At
    * 100 TB the same loop holds (edges ≪ corpus); if components ever
    * get deep, the documented upgrade is the large-star/small-star
    * alternating rounds, which cut convergence to O(log n) with the
    * same join/groupBy primitives.
    *
    * The oracle rebuilds the identical clustering with a DuckDB
    * recursive CTE (transitive closure + min over each reach set).
    */
  /** Min-label propagation to fixpoint over an undirected pair list
    * (cols ida, idb) — shared by the jaccard clusters below and the
    * embedding-space semantic dedup in Curation.scala. Returns
    * (id, label) where label = min id reachable in the component. */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("idb"), col("ida")))
      .toDF("a", "b")
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
    var changed = 1L
    while (changed > 0) {
      val prop = edges.join(labels, edges("a") === labels("id"))
        .select(col("b").as("id"), col("label"))
      val next = labels.unionAll(prop)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label")).count()
      labels = next
    }
    labels
  }

  /** Alternating large-star / small-star connected components — the
    * O(log n)-round upgrade the min-label loop's doc promised (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14):
    * each round is two keyed aggregations + joins over the EDGE set;
    * convergence is when the edge set is a stable forest of stars
    * (every node linked directly to its component minimum), which the
    * paper proves takes O(log n) alternations regardless of component
    * DIAMETER — the regime (long chains) where min-label propagation's
    * O(diameter) rounds degrade. Per-round driver work is one
    * count+hash fingerprint action, same bounded discipline as the
    * min-label loop but exponentially fewer rounds on deep graphs.
    *
    *  - large-star: for every node u with neighbor set N(u), link each
    *    LARGER neighbor v > u to m = min(N(u) ∪ {u}).
    *  - small-star: link each smaller-or-equal neighbor (and u itself)
    *    to m, dropping self-loops.
    *
    * Output contract identical to [[connectedComponents]]: (id, label)
    * with label = min id reachable — DedupPropertySpec proves
    * equivalence against the min-label loop on random graphs, and the
    * three CC consumers (jaccard clusters, semantic dedup, pHash
    * near-dup) stay oracle-exact through it. */
  private[graft] def connectedComponentsStars(pairs: DataFrame): DataFrame = {
    var edges = pairs
      .select(col("ida").cast("long").as("a"), col("idb").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint()
    def bidir(e: DataFrame): DataFrame =
      e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    // one aggregation computes m(u) = min(N(u) ∪ {u}); the join fans
    // the constant back over u's edges — no collect_list, so a
    // high-degree hub never materializes its neighbor array
    def withMin(nbrs: DataFrame): DataFrame = {
      val mins = nbrs.groupBy(col("a"))
        .agg(least(min(col("b")), col("a")).as("m"))
      nbrs.join(mins, "a")
    }
    def canon(e: DataFrame): DataFrame =
      e.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct()
    def largeStar(e: DataFrame): DataFrame =
      canon(withMin(bidir(e)).filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b")))
    def smallStar(e: DataFrame): DataFrame = {
      val sm = withMin(bidir(e).filter(col("b") <= col("a")))
      canon(sm.select(col("b").as("a"), col("m").as("b"))
        .unionAll(sm.select(col("a"), col("m").as("b"))))
    }
    def fingerprint(e: DataFrame): (Long, Long) = {
      // bit_xor, not sum: order-independent AND overflow-free under ANSI
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // Size-adaptive tail (round 6): the convergence fingerprint
    // already counts the edge list each round — once it is at or
    // below the cutoff, FINISH the fixpoint driver-locally with
    // union-find instead of paying more star rounds' scheduler
    // floors. The collect is bounded by the CONSTANT cutoff, never by
    // data (at 100 TB the loop stays distributed until the edge list
    // has collapsed below it — exactly the regime where per-round job
    // floors dominate the remaining work). Labels are identical: min
    // node id per component over nodes incident to ≥1 edge.
    val LocalCutoff = 100000L
    def localFinish(e: DataFrame): DataFrame = {
      val s = e.sparkSession
      val es = e.select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = parent.keys.map(n => n -> find(n)).toSeq.sorted
      import org.apache.spark.sql.types._
      s.createDataFrame(
        java.util.Arrays.asList(labels.map { case (n, l) =>
          org.apache.spark.sql.Row(n, l) }: _*),
        StructType(Seq(StructField("id", LongType),
          StructField("label", LongType))))
    }
    var fp = fingerprint(edges)
    var stable = fp._1 == 0L
    while (!stable && fp._1 > LocalCutoff) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nfp = fingerprint(next)
      stable = nfp == fp
      fp = nfp
      edges = next
    }
    if (fp._1 <= LocalCutoff && fp._1 > 0L) return localFinish(edges)
    // converged: stars — every edge links a node to its component min.
    // Labels: min over incident edges (center labels itself).
    bidir(edges)
      .groupBy(col("a").as("id"))
      .agg(least(min(col("b")), col("a")).as("label"))
      .select(col("id"), col("label"))
  }

  private val clustersQ = (s: SparkSession, dir: String) =>
    connectedComponentsStars(jaccardPairs(s, dir, 0.7).select(col("ida"), col("idb")))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))

  /** The verified-jaccard cluster labeling, for composition (canonical
    * selection in Curation.scala). */
  private[operators] def clusters(s: SparkSession, dir: String): DataFrame =
    clustersQ(s, dir)

  /** The embedding cosine near-dup pair list, for composition. */
  private[operators] def cosinePairs(s: SparkSession, dir: String): DataFrame =
    cosineQ(s, dir)

  /** Entity resolution END-TO-END — the composed pipeline the
    * pairwise [[fuzzyNamesQ]] stops short of: a dirty roster (every
    * customer keyed by a SPARSE 5-digit code, `k·7919 mod 10⁵`, plus
    * a planted one-digit-typo second record for every 20th customer)
    * is band-blocked, scored at hamming ≤ 1, the match graph
    * clustered by [[connectedComponents]], and each multi-record
    * entity canonicalized. The sparse codespace is the point: the raw
    * sequential keys are one digit apart pairwise and transitively
    * chain the WHOLE table into one entity (the classic ER
    * over-merge), which is exactly what real rosters avoid by keying
    * on sparse identifiers.
    *
    * 100 TB posture: blocking bounds the candidate join (never
    * all-pairs); CC runs over match EDGES only; the final rollup is
    * entity-keyed. */
  private val erQ = (s: SparkSession, dir: String) => {
    // 7-digit codespace (k·7919 mod 10⁷): sparsity is the POINT — at
    // sf0.1's 15 750 records a 5-digit space (15% occupied) PERCOLATES
    // under hamming-1 adjacency and the whole roster over-merges into
    // one 15 750-record entity of diameter 26 (measured) — the classic
    // ER failure this query exists to document, but as the OUTPUT, not
    // a demonstration. 10⁷ codes keep occupancy < 0.2% at any fixture
    // SF, so entities are the planted typo pairs plus rare genuine
    // collisions.
    val base = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"),
        lpad((col("c_custkey") * 7919L % 10000000L).cast("string"),
          7, "0").as("code"))
    val roster = base
      .select(col("k").as("rid"), col("code"),
        concat(lit("C-"), col("code")).as("name"))
      .unionByName(base.filter(col("k") % 20L === 0L)
        .select((col("k") + 10000000L).as("rid"),
          concat(substring(col("code"), 1, 2),
            ((substring(col("code"), 3, 1).cast("long") + 1L) % 10L)
              .cast("string"),
            substring(col("code"), 4, 4)).as("code"),
          concat(lit("C-typo-"), col("code")).as("name")))
    // 2-of-3 segment blocking (segments 3+2+2 digits): hamming ≤ 1
    // leaves at least two segments intact, so every true pair shares
    // one of the three COMPOSITE keys — each carrying ≥ 4 digits
    // (a half split keyed on 2 digits alone makes bucket size grow
    // linearly with the roster and the band join quadratically).
    val banded = roster.select(col("rid"), col("code"),
      explode(array(
        struct(lit(0).as("bi"), substring(col("code"), 1, 5).as("bv")),
        struct(lit(1).as("bi"), concat(substring(col("code"), 1, 3),
          substring(col("code"), 6, 2)).as("bv")),
        struct(lit(2).as("bi"), substring(col("code"), 4, 4).as("bv"))))
        .as("b"))
      .select(col("rid"), col("code"), col("b.bi").as("bi"),
        col("b.bv").as("bv"))
    // hamming as 7 unrolled codegen comparisons (an `aggregate` HOF
    // here is interpreted per candidate pair — measured as the hot
    // spot of the whole query), and the verified pair set
    // `localCheckpoint`ed so the CC loop's edge union doesn't
    // re-execute the band join per branch
    val hamExpr = (1 to 7).map(p =>
      s"(CASE WHEN substring(d1, $p, 1) = substring(d2, $p, 1)" +
        " THEN 0 ELSE 1 END)").mkString(" + ")
    val pairs = banded.select(col("rid").as("ida"),
        col("code").as("d1"), col("bi"), col("bv"))
      .join(banded.select(col("rid").as("idb"), col("code").as("d2"),
        col("bi"), col("bv")), Seq("bi", "bv"))
      .filter(col("ida") < col("idb"))
      .filter(expr(hamExpr) <= 1)
      .select(col("ida"), col("idb")).distinct()
      .localCheckpoint()
    // star-CC, not min-label: the hamming-1 code graph at sf0.1 has
    // long chains (the sparse-code over-merge the doc above warns
    // about, in mild form), and min-label's O(diameter) rounds were
    // measured at 12.5 s where the O(log n) star alternation takes
    // ~1 s — same (id, label) contract, DedupPropertySpec-proven
    val cc = connectedComponentsStars(pairs)
    roster.join(cc, roster("rid") === cc("id"))
      .groupBy(col("label").as("entity"))
      .agg(count(lit(1)).as("n_records"),
        min(col("name")).as("canonical_name"),
        min(col("rid")).as("min_rid"), max(col("rid")).as("max_rid"))
      .filter(col("n_records") >= 2L)
  }

  /** Domain-scaled ER twin (r8 sf10 tier finding): [[erQ]] pins a 10⁷
    * codespace, so ScaleGen copies pile into the SAME space — at sf10
    * (1.575M roster rows, 15.75% occupancy) hamming-1 adjacency
    * percolates and the roster over-merges toward one giant entity
    * (the failure mode erQ's own doc documents for a 5-digit space at
    * sf0.1 scale; the sf10 run OOMed the CC star stage on exactly that
    * component). Real rosters grow their identifier DOMAIN with the
    * population, so the scaled twin derives a code BAND from
    * ScaleGen's key shift (custkey div 10⁷ — the same move
    * q_join_spatial_grid_scaled makes for its y-bands): every copy
    * keeps sf0.1's ~0.16% occupancy, blocking keys carry the band so
    * entities never span bands, and cost per band is constant — linear
    * total. Typo rids move to +10¹⁰: erQ's +10⁷ collides with the next
    * copy's custkeys at sf ≥ 1 (harmless there — both engines compute
    * the same thing over the collided rid space — but a scaled row
    * should not build on it). On the base band this is erQ's exact
    * structure. */
  private val erScaledQ = (s: SparkSession, dir: String) => {
    val base = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"),
        expr("c_custkey div 10000000").cast("string").as("band"),
        lpad((col("c_custkey") % 10000000L * 7919L % 10000000L)
          .cast("string"), 7, "0").as("code"))
    val roster = base
      .select(col("k").as("rid"), col("band"), col("code"),
        concat(lit("C-"), col("band"), lit(":"), col("code")).as("name"))
      .unionByName(base.filter(col("k") % 20L === 0L)
        .select((col("k") + 10000000000L).as("rid"), col("band"),
          concat(substring(col("code"), 1, 2),
            ((substring(col("code"), 3, 1).cast("long") + 1L) % 10L)
              .cast("string"),
            substring(col("code"), 4, 4)).as("code"),
          concat(lit("C-typo-"), col("band"), lit(":"), col("code"))
            .as("name")))
    val banded = roster.select(col("rid"), col("band"), col("code"),
      explode(array(
        struct(lit(0).as("bi"), substring(col("code"), 1, 5).as("bv")),
        struct(lit(1).as("bi"), concat(substring(col("code"), 1, 3),
          substring(col("code"), 6, 2)).as("bv")),
        struct(lit(2).as("bi"), substring(col("code"), 4, 4).as("bv"))))
        .as("b"))
      .select(col("rid"), col("code"), col("b.bi").as("bi"),
        concat(col("band"), lit(":"), col("b.bv")).as("bv"))
    val hamExpr = (1 to 7).map(p =>
      s"(CASE WHEN substring(d1, $p, 1) = substring(d2, $p, 1)" +
        " THEN 0 ELSE 1 END)").mkString(" + ")
    val pairs = banded.select(col("rid").as("ida"),
        col("code").as("d1"), col("bi"), col("bv"))
      .join(banded.select(col("rid").as("idb"), col("code").as("d2"),
        col("bi"), col("bv")), Seq("bi", "bv"))
      .filter(col("ida") < col("idb"))
      .filter(expr(hamExpr) <= 1)
      .select(col("ida"), col("idb")).distinct()
      .localCheckpoint()
    val cc = connectedComponentsStars(pairs)
    roster.join(cc, roster("rid") === cc("id"))
      .groupBy(col("label").as("entity"))
      .agg(count(lit(1)).as("n_records"),
        min(col("name")).as("canonical_name"),
        min(col("rid")).as("min_rid"), max(col("rid")).as("max_rid"))
      .filter(col("n_records") >= 2L)
  }

  private val erScaledSql =
    """WITH RECURSIVE
      |base AS (SELECT c_custkey AS k,
      |          CAST(c_custkey // 10000000 AS VARCHAR) AS band,
      |          lpad(CAST(c_custkey % 10000000 * 7919 % 10000000
      |            AS VARCHAR), 7, '0') AS code
      |         FROM customer),
      |roster AS (
      |  SELECT k AS rid, band, code,
      |    'C-' || band || ':' || code AS name FROM base
      |  UNION ALL
      |  SELECT k + 10000000000 AS rid, band,
      |    substr(code, 1, 2)
      |      || CAST((CAST(substr(code, 3, 1) AS BIGINT) + 1) % 10
      |        AS VARCHAR)
      |      || substr(code, 4, 4) AS code,
      |    'C-typo-' || band || ':' || code AS name
      |  FROM base WHERE k % 20 = 0),
      |banded AS (
      |  SELECT rid, code, t.bi,
      |    band || ':' ||
      |    CASE WHEN t.bi = 0 THEN substr(code, 1, 5)
      |         WHEN t.bi = 1 THEN substr(code, 1, 3) || substr(code, 6, 2)
      |         ELSE substr(code, 4, 4) END AS bv
      |  FROM roster CROSS JOIN (VALUES (0), (1), (2)) AS t(bi)),
      |pairs AS (
      |  SELECT DISTINCT a.rid AS ida, b.rid AS idb
      |  FROM banded a JOIN banded b ON a.bi = b.bi AND a.bv = b.bv
      |    AND a.rid < b.rid
      |  WHERE CAST(list_sum(list_transform(range(1, 8), p ->
      |      CASE WHEN substr(a.code, p, 1) = substr(b.code, p, 1)
      |           THEN 0 ELSE 1 END)) AS INT) <= 1),
      |edges AS (SELECT ida AS a, idb AS b FROM pairs
      |          UNION SELECT idb, ida FROM pairs),
      |reach AS (SELECT a AS id, b AS peer FROM edges
      |          UNION
      |          SELECT r.id, e.b FROM reach r JOIN edges e
      |          ON r.peer = e.a),
      |lab AS (SELECT id, least(id, MIN(peer)) AS label
      |        FROM reach GROUP BY id)
      |SELECT lab.label AS entity, COUNT(*) AS n_records,
      |  MIN(r.name) AS canonical_name,
      |  MIN(r.rid) AS min_rid, MAX(r.rid) AS max_rid
      |FROM lab JOIN roster r ON lab.id = r.rid
      |GROUP BY 1
      |HAVING COUNT(*) >= 2""".stripMargin

  private val erSql =
    """WITH RECURSIVE
      |base AS (SELECT c_custkey AS k,
      |          lpad(CAST(c_custkey * 7919 % 10000000 AS VARCHAR),
      |            7, '0') AS code
      |         FROM customer),
      |roster AS (
      |  SELECT k AS rid, code, 'C-' || code AS name FROM base
      |  UNION ALL
  SELECT k + 10000000 AS rid,
      |    substr(code, 1, 2)
      |      || CAST((CAST(substr(code, 3, 1) AS BIGINT) + 1) % 10
      |        AS VARCHAR)
      |      || substr(code, 4, 4) AS code,
      |    'C-typo-' || code AS name
      |  FROM base WHERE k % 20 = 0),
      |banded AS (
      |  SELECT rid, code, t.bi,
      |    CASE WHEN t.bi = 0 THEN substr(code, 1, 5)
      |         WHEN t.bi = 1 THEN substr(code, 1, 3) || substr(code, 6, 2)
      |         ELSE substr(code, 4, 4) END AS bv
      |  FROM roster CROSS JOIN (VALUES (0), (1), (2)) AS t(bi)),
      |pairs AS (
      |  SELECT DISTINCT a.rid AS ida, b.rid AS idb
      |  FROM banded a JOIN banded b ON a.bi = b.bi AND a.bv = b.bv
      |    AND a.rid < b.rid
      |  WHERE CAST(list_sum(list_transform(range(1, 8), p ->
      |      CASE WHEN substr(a.code, p, 1) = substr(b.code, p, 1)
      |           THEN 0 ELSE 1 END)) AS INT) <= 1),
      |edges AS (SELECT ida AS a, idb AS b FROM pairs
      |          UNION SELECT idb, ida FROM pairs),
      |reach AS (SELECT a AS id, b AS peer FROM edges
      |          UNION
      |          SELECT r.id, e.b FROM reach r JOIN edges e
      |          ON r.peer = e.a),
      |lab AS (SELECT id, least(id, MIN(peer)) AS label
      |        FROM reach GROUP BY id)
      |SELECT lab.label AS entity, COUNT(*) AS n_records,
      |  MIN(r.name) AS canonical_name,
      |  MIN(r.rid) AS min_rid, MAX(r.rid) AS max_rid
      |FROM lab JOIN roster r ON lab.id = r.rid
      |GROUP BY 1
      |HAVING COUNT(*) >= 2""".stripMargin

  private val clustersSql =
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
      |          SELECT r.id, e.b FROM reach r JOIN edges e ON r.peer = e.a)
      |SELECT id AS doc_id, least(id, min(peer)) AS cluster_id
      |FROM reach GROUP BY id""".stripMargin

  /** Incremental dedup: find the rows of an incoming batch (doc_id ≡ 0
    * mod 5 here) whose text does NOT already exist in the historical
    * corpus (the rest) — the recurring ingest problem at 100 TB, where
    * "anti-join the batch against the whole corpus" is unaffordable if
    * it shuffles the corpus. The shape that scales:
    *
    *  1. one map-side corpus pass folds every text hash into a BLOOM
    *     filter (partials merge associatively; at 100 TB the sketch is
    *     built once at ingest and persisted, not rebuilt per query);
    *  2. the broadcast sketch splits the batch map-side: bloom-negative
    *     rows are DEFINITELY new (no false negatives) and never touch a
    *     join; bloom-positive rows (true dups + fpp·batch false
    *     positives) form the tiny probe set;
    *  3. the corpus is map-scanned once more against the BROADCAST
    *     probe-hash set (left-semi) — confirming which probes really
    *     exist; the corpus is never hash-exchanged;
    *  4. the batch anti-joins the broadcast confirmed-dup set.
    *
    * Every shuffle in the plan carries probe-set-sized data; both joins
    * are broadcast (spec-asserted). The bloom probe itself is the one
    * UDF (Spark exposes no expression over a driver-built BloomFilter);
    * it runs only over the BATCH, and exactness never depends on it —
    * false positives are removed by the verify semi-join, so the result
    * is bit-equal to the plain NOT EXISTS oracle. */
  private val incrementalQ = (s: SparkSession, dir: String) => {
    val docs = Tables.documents(s, dir)
      .withColumn("text_hash", md5(col("text")))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val bloom = corpus.stat.bloomFilter("text_hash", 1 << 20, 0.03)
    val bloomBc = s.sparkContext.broadcast(bloom)
    val inBloom = udf((h: String) => h != null && bloomBc.value.mightContain(h))
    val definitelyNew = batch.filter(!inBloom(col("text_hash")))
    val probes = batch.filter(inBloom(col("text_hash")))
    val confirmedDup = corpus
      .join(broadcast(probes.select("text_hash").distinct()),
        Seq("text_hash"), "left_semi")
      .select("text_hash").distinct()
    definitelyNew.select(col("doc_id"), col("text_hash"))
      .unionAll(probes.join(broadcast(confirmedDup), Seq("text_hash"), "left_anti")
        .select(col("doc_id"), col("text_hash")))
  }

  private val incrementalSql =
    """SELECT doc_id, md5(text) AS text_hash FROM documents d
      |WHERE doc_id % 5 = 0 AND NOT EXISTS (
      |  SELECT 1 FROM documents c
      |  WHERE c.doc_id % 5 <> 0 AND md5(c.text) = md5(d.text))""".stripMargin

  /** The incremental-dedup shape composed with TABLE VERSIONING: the
    * corpus is a SNAPSHOT of the versioned object store and the batch
    * is the DELTA VIEW of what arrived after it (`@vBase..vNow` —
    * selected by commit membership, no predicate on the data), so the
    * "dedup only the new tranche against the frozen corpus" pipeline
    * needs no ingest-time bookkeeping columns at all: the checkpoint
    * is one version number. Same bloom-prefilter + broadcast-verify
    * plan as q_dedup_incremental (corpus never exchanged; exactness
    * from the verify join, never the bloom). The oracle reconstructs
    * the same answer by VALUE predicate — structural selection must
    * agree. */
  private val incrementalVersionedQ = (s: SparkSession, dir: String) => {
    val out = "/tmp/graft_dedupver_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_") + "/documents"
    val docs = Tables.documents(s, dir)
    docs.filter(col("doc_id") % 5 =!= 0).repartition(4)
      .write.format("graft-objects").mode("overwrite").save(out)
    val vBase = graft.sources.GraftVersions.currentVersion(out)
    docs.filter(col("doc_id") % 5 === 0).repartition(2)
      .write.format("graft-objects").mode("append").save(out)
    val vNow = graft.sources.GraftVersions.currentVersion(out)
    val corpus = s.read.format("graft-objects").load(s"$out@v$vBase")
      .withColumn("text_hash", md5(col("text")))
    val batch = s.read.format("graft-objects").load(s"$out@v$vBase..$vNow")
      .withColumn("text_hash", md5(col("text")))
    val bloom = corpus.stat.bloomFilter("text_hash", 1 << 20, 0.03)
    val bloomBc = s.sparkContext.broadcast(bloom)
    val inBloom = udf((h: String) => h != null && bloomBc.value.mightContain(h))
    val definitelyNew = batch.filter(!inBloom(col("text_hash")))
    val probes = batch.filter(inBloom(col("text_hash")))
    val confirmedDup = corpus
      .join(broadcast(probes.select("text_hash").distinct()),
        Seq("text_hash"), "left_semi")
      .select("text_hash").distinct()
    definitelyNew.select(col("doc_id"), col("text_hash"))
      .unionAll(probes
        .join(broadcast(confirmedDup), Seq("text_hash"), "left_anti")
        .select(col("doc_id"), col("text_hash")))
  }

  /** Banded fuzzy STRING-match join — entity-resolution dedup over an
    * identifier column (the record-linkage companion to the content
    * dedups above): customer names share the fixed `Customer#` + nine
    * digits format, so the digit suffix splits into three 3-digit
    * tercets and a substitution distance ≤ 2 pigeonholes at least one
    * tercet equal — candidates come from a 3-band equi-join (the
    * simhash discipline: verify BEFORE distinct so exchanges carry
    * verified matches only), never an all-pairs scan. Candidates are
    * verified with the exact per-position hamming count and also
    * scored with full Levenshtein (both engines' `levenshtein` is the
    * classic integer DP — cross-engine exact). Recall contract:
    * complete for substitution distance ≤ 2 (the declared metric);
    * alignment-shift pairs (lev < ham) are still REPORTED when banding
    * finds them but are not guaranteed — the honest bounded-recall
    * trade every production blocking scheme makes. k1 < 100 bounds the
    * reported pair set at every scale. */
  private val fuzzyNamesQ = (s: SparkSession, dir: String) => {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"), col("c_name").as("name"),
        expr("substring(c_name, 10, 9)").as("d"))
    val banded = c.select(col("k"), col("name"), col("d"),
      explode(array(
        struct(lit(0).as("bi"), substring(col("d"), 1, 3).as("bv")),
        struct(lit(1).as("bi"), substring(col("d"), 4, 3).as("bv")),
        struct(lit(2).as("bi"), substring(col("d"), 7, 3).as("bv"))))
        .as("b"))
      .select(col("k"), col("name"), col("d"),
        col("b.bi").as("bi"), col("b.bv").as("bv"))
    val a = banded.select(col("k").as("k1"), col("d").as("d1"),
      col("bi"), col("bv"))
      .filter(col("k1") < 100)
    val b = banded.select(col("k").as("k2"), col("name").as("name2"),
      col("d").as("d2"), col("bi"), col("bv"))
    a.join(b, Seq("bi", "bv"))
      .filter(col("k1") < col("k2"))
      .withColumn("ham", expr(
        """aggregate(sequence(1, 9), 0, (acc, p) ->
          |  acc + if(substring(d1, p, 1) = substring(d2, p, 1), 0, 1))"""
          .stripMargin))
      .filter(col("ham") <= 2)
      .withColumn("lev", levenshtein(col("d1"), col("d2")))
      .select(col("k1"), col("k2"), col("name2"), col("ham"), col("lev"))
      .distinct()
  }

  private val fuzzyNamesSql =
    """WITH c AS (
      |  SELECT c_custkey AS k, c_name AS name,
      |    substr(c_name, 10, 9) AS d
      |  FROM customer),
      |banded AS (
      |  SELECT k, name, d, t.bi,
      |    substr(d, t.bi * 3 + 1, 3) AS bv
      |  FROM c CROSS JOIN (VALUES (0), (1), (2)) AS t(bi)),
      |cand AS (
      |  SELECT a.k AS k1, a.d AS d1, b.k AS k2, b.name AS name2,
      |    b.d AS d2
      |  FROM banded a JOIN banded b
      |    ON a.bi = b.bi AND a.bv = b.bv AND a.k < b.k
      |  WHERE a.k < 100),
      |scored AS (
      |  SELECT k1, k2, name2,
      |    CAST(list_sum(list_transform(range(1, 10), p ->
      |      CASE WHEN substr(d1, p, 1) = substr(d2, p, 1)
      |           THEN 0 ELSE 1 END)) AS INT) AS ham,
      |    CAST(levenshtein(d1, d2) AS INT) AS lev
      |  FROM cand)
      |SELECT DISTINCT k1, k2, name2, ham, lev
      |FROM scored WHERE ham <= 2""".stripMargin

  // ---- asymmetric containment (sub-document duplication) ----------
  //
  // C(A→B) = |A∩B| / |A| over 3-gram shingle sets — the measure
  // jaccard misses: a short document wholly quoted inside a long one
  // has low jaccard but containment ≈ 1. Both directions are emitted
  // from ONE canonical-pair intersection (i, na, nb computed once,
  // divided twice) — the same shared-shingle equi-join as the jaccard
  // path, cost ∝ pair density, corpus never all-paired.
  private val containmentQ = (s: SparkSession, dir: String) => {
    val edges = shared(s, s"edges|$dir")(shingleEdges(Tables.documents(s, dir)))
    val counts = edges.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairIntersections(edges, "doc_id", "ida", "idb")
      .join(counts.select(col("doc_id").as("ida"), col("n").as("na")), Seq("ida"))
      .join(counts.select(col("doc_id").as("idb"), col("n").as("nb")), Seq("idb"))
    // both directions from ONE pass over inter (a unionAll of two
    // selects would recompute the whole intersection subtree per
    // branch — audited at 2x the exchanges); the explode is map-side
    inter
      .select(explode(array(
        struct(col("ida").as("doc_a"), col("idb").as("doc_b"),
          round(col("i") / col("na"), 6).as("containment")),
        struct(col("idb").as("doc_a"), col("ida").as("doc_b"),
          round(col("i") / col("nb"), 6).as("containment")))).as("e"))
      .select(col("e.doc_a"), col("e.doc_b"), col("e.containment"))
      .filter(col("containment") >= 0.5)
  }

  private val containmentSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s FROM toks),
      |d AS (SELECT DISTINCT doc_id, s FROM sh),
      |n AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
      |inter AS MATERIALIZED (
      |  SELECT a.doc_id ida, b.doc_id idb, count(*) i
      |  FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |dirs AS (
      |  SELECT i.ida AS doc_a, i.idb AS doc_b,
      |    round(i.i * 1.0 / na.n, 6) AS containment
      |  FROM inter i JOIN n na ON i.ida = na.doc_id
      |  UNION ALL
      |  SELECT i.idb, i.ida, round(i.i * 1.0 / nb.n, 6)
      |  FROM inter i JOIN n nb ON i.idb = nb.doc_id)
      |SELECT doc_a, doc_b, containment FROM dirs
      |WHERE containment >= 0.5""".stripMargin

  // ---- prefix-filtered similarity join (AllPairs/PPJoin family) ---
  //
  // The scale path for the exact jaccard join: under a GLOBAL shingle
  // order (rarity-first — df ASC, shingle ASC), any pair with
  // J ≥ t must share a shingle within each side's first
  // p = |d| − ⌈t·|d|⌉ + 1 shingles (the prefix-filter theorem), so
  // candidates come from joining PREFIXES only — the indexed volume
  // drops from Σ|d| to Σp ≈ (1−t)·Σ|d|, and the candidate pairs from
  // "docs sharing any shingle" to "docs sharing a RARE early shingle".
  // ⌈0.7n⌉ is the exact integer (7n+9) div 10 — no float boundary.
  // Candidates then verify by exact intersection (cost ∝ candidates).
  // Same answer as q_dedup_jaccard_pairs — it shares that oracle.
  private val jaccardPrefixQ = (s: SparkSession, dir: String) => {
    val edges = shared(s, s"edges|$dir")(shingleEdges(Tables.documents(s, dir)))
    val dfreq = edges.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val sizes = edges.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("s").asc)
    val prefix = edges.join(dfreq, "s")
      .withColumn("rk", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("rk") <=
        col("n") - expr("(7 * n + 9) div 10") + lit(1))
      .select(col("doc_id"), col("s"))
    val cands = prefix.select(col("doc_id").as("ida"), col("s"))
      .join(prefix.select(col("doc_id").as("idb"), col("s")), Seq("s"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb")).distinct()
    val inter = cands
      .join(edges.select(col("doc_id").as("ida"), col("s")), Seq("ida"))
      .join(edges.select(col("doc_id").as("idb"), col("s")), Seq("idb", "s"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("ida"), col("n").as("na")), Seq("ida"))
      .join(sizes.select(col("doc_id").as("idb"), col("n").as("nb")), Seq("idb"))
      .withColumn("jaccard",
        round(col("i") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= 0.7)
      .select(col("ida"), col("idb"), col("jaccard"))
  }

  /** Candidate-pair counts for the spec: (prefix-filtered, full
    * inverted-index) — the pruning the prefix filter buys. */
  private[graft] def prefixCandidateCounts(s: SparkSession, dir: String): (Long, Long) = {
    val edges = shared(s, s"edges|$dir")(shingleEdges(Tables.documents(s, dir)))
    val dfreq = edges.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val sizes = edges.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("s").asc)
    val prefix = edges.join(dfreq, "s")
      .withColumn("rk", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("rk") <= col("n") - expr("(7 * n + 9) div 10") + lit(1))
      .select(col("doc_id"), col("s"))
    def pairs(e: DataFrame): Long =
      e.select(col("doc_id").as("ida"), col("s"))
        .join(e.select(col("doc_id").as("idb"), col("s")), Seq("s"))
        .filter(col("ida") < col("idb"))
        .select(col("ida"), col("idb")).distinct().count()
    (pairs(prefix), pairs(edges))
  }

  // ---- MinHash Jaccard ESTIMATOR vs ground truth ------------------
  //
  // The measurement query for the sketch the LSH pipeline rides on:
  // 16 minhash components per SOURCE from ONE md5 per shingle (r8):
  // the 60-bit md5 prefix h is permuted by k universal hashes
  // m_k = (A_k·h + B_k) mod (2^61−1) — the classic one-base-hash
  // construction production dedup uses, because the old spelling paid
  // k md5s per (doc, shingle) edge and md5 was ~1/3 of the S-curve
  // audit's CPU at the sf10 tier. md5 stays the base (not xxhash64)
  // so DuckDB rebuilds identical values; the Mersenne-61 modular
  // product is split (h = h1·2^30 + h0, A < 2^31, 2^61 ≡ 1 mod p) so
  // every intermediate fits a signed 64-bit in BOTH engines — no
  // wrap-around semantics, no HUGEINT, ANSI-safe. Estimated Jaccard =
  // matching-component fraction as the exact rational
  // `matches · 62500` micro-units, compared against the true
  // shingle-set Jaccard for every source pair. err_micro is the
  // estimator's absolute error — the number a curator reads before
  // trusting LSH thresholds at a new corpus.
  //
  // 100 TB posture: signatures ARE the scale story — the corpus
  // collapses to one 16-long profile row per entity in the same
  // single groupBy that counts the set sizes; the pair comparison
  // runs on |entities|² profile rows (here 20 sources), never on
  // shingles. The exact-Jaccard side is fixture-scale ground truth;
  // at production scale it's sampled, and the estimator column is
  // what ships.
  private val MheK = 16

  // Universal-hash permutation family over Z_p, p = 2^61 − 1 (Mersenne,
  // so 2^61 ≡ 1 mod p makes the split product cheap). Constants are
  // deterministic md5-derived seeds — no RNG, both engines interpolate
  // the same literals.
  private val MhP = (1L << 61) - 1
  private def mhSeed(tag: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8"))
    // 60-bit value from the first 15 hex chars — the column-side idiom
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.take(15), 16)
  }
  private val MhA: IndexedSeq[Long] = // 31-bit multipliers, nonzero
    (0 until MheK).map(k => mhSeed(s"graft-mh-a:$k") % ((1L << 31) - 1) + 1)
  private val MhB: IndexedSeq[Long] = // 60-bit offsets (< p)
    (0 until MheK).map(k => mhSeed(s"graft-mh-b:$k"))
  /** 60-bit md5 prefix of the shingle — the ONE digest per edge. */
  private def mhBase(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")
  /** m_k = (A_k·h + B_k) mod p with h = h1·2^30 + h0 pre-split:
    * u = A·h1 mod p; u·2^30 ≡ (u div 2^31) + (u mod 2^31)·2^30 (mod p);
    * every term < 2^62, every sum < 2^63 — ANSI-safe long arithmetic. */
  private def mhPerm(h1: Column, h0: Column, k: Int): Column = {
    val a = lit(MhA(k))
    val u = pmod(a * h1, lit(MhP))
    val v = pmod(shiftright(u, 31) +
      shiftleft(u.bitwiseAND(lit((1L << 31) - 1)), 30), lit(MhP))
    pmod(v + a * h0 + lit(MhB(k)), lit(MhP))
  }
  private val mhKsValues: String =
    (0 until MheK).map(k => s"(${k}, ${MhA(k)}, ${MhB(k)})").mkString(", ")
  /** The same family as DuckDB CTEs (div/mod spellings mirror the
    * shifts — identical values on nonnegative operands). Expects a
    * CTE `sh($idCol, s)` in scope; defines `mh($idCol, k, m)`. */
  private def mhCteSql(idCol: String): String =
    s"""ks(k, a, b) AS (VALUES $mhKsValues),
       |bs AS (
       |  SELECT $idCol,
       |    hh // 1073741824 AS h1, hh % 1073741824 AS h0
       |  FROM (SELECT $idCol,
       |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS hh
       |    FROM sh)),
       |mh AS (
       |  SELECT $idCol, k, MIN((v + a * h0 + b) % $MhP) AS m
       |  FROM (
       |    SELECT $idCol, k, a, b, h0,
       |      ((u // 2147483648) + (u % 2147483648) * 1073741824)
       |        % $MhP AS v
       |    FROM (
       |      SELECT $idCol, k, a, b, h0, (a * h1) % $MhP AS u
       |      FROM bs CROSS JOIN ks))
       |  GROUP BY 1, 2)""".stripMargin

  private val mhEstimateQ = (s: SparkSession, dir: String) => {
    val sh = Tables.documents(s, dir)
      .select(col("source"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(tk)-3), i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))"))
        .as("s"))
      .distinct()
    val shh = sh
      .withColumn("hh", mhBase(col("s")))
      .withColumn("h1", shiftright(col("hh"), 30))
      .withColumn("h0", col("hh").bitwiseAND(lit((1L << 30) - 1)))
    val mins = (0 until MheK).map(k =>
      min(mhPerm(col("h1"), col("h0"), k)).as(s"m$k"))
    val prof = shh.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), mins: _*)
      .select(col("source"), col("n"),
        array((0 until MheK).map(k => col(s"m$k")): _*).as("ml"))
    val pa = prof.select(col("source").as("src_a"), col("n").as("na"),
      col("ml").as("ma"))
    val pb = prof.select(col("source").as("src_b"), col("n").as("nb"),
      col("ml").as("mb"))
    val inter = pairIntersections(sh, "source", "src_a", "src_b")
    pa.crossJoin(broadcast(pb)).filter(col("src_a") < col("src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("i", coalesce(col("i"), lit(0L)))
      .select(col("src_a"), col("src_b"),
        expr("size(filter(zip_with(ma, mb, (x, y) -> x = y), v -> v))")
          .cast("long").as("n_match"),
        col("i"), col("na"), col("nb"))
      .withColumn("est_micro", col("n_match") * lit(62500L))
      .withColumn("jaccard",
        round(col("i") / (col("na") + col("nb") - col("i")), 6))
      .withColumn("err_micro",
        abs(col("est_micro") - round(col("jaccard") * 1e6).cast("long")))
      .select("src_a", "src_b", "n_match", "est_micro", "jaccard", "err_micro")
  }

  private val mhEstimateSql =
    s"""WITH toks AS MATERIALIZED (
      |  SELECT source, string_split(text,' ') AS tk FROM documents),
      |sh0 AS (SELECT source, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s FROM toks),
      |sh AS MATERIALIZED (SELECT DISTINCT source, s FROM sh0),
      |${mhCteSql("source")},
      |prof AS MATERIALIZED (
      |  SELECT mh.source, sz.n, list(mh.m ORDER BY mh.k) AS ml
      |  FROM mh JOIN (SELECT source, COUNT(*) AS n FROM sh GROUP BY 1) sz
      |    ON mh.source = sz.source
      |  GROUP BY 1, 2),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b, a.n AS na, b.n AS nb,
      |    CAST(len(list_filter(list_transform(range(1, 17),
      |      x -> a.ml[x] = b.ml[x]), v -> v)) AS BIGINT) AS n_match,
      |    COALESCE(i.i, 0) AS i
      |  FROM prof a
      |  JOIN prof b ON a.source < b.source
      |  LEFT JOIN inter i ON i.src_a = a.source AND i.src_b = b.source)
      |SELECT src_a, src_b, n_match,
      |  CAST(n_match * 62500 AS BIGINT) AS est_micro,
      |  round(i * 1.0 / (na + nb - i), 6) AS jaccard,
      |  CAST(abs(n_match * 62500
      |    - CAST(round(round(i * 1.0 / (na + nb - i), 6) * 1000000)
      |        AS BIGINT)) AS BIGINT) AS err_micro
      |FROM pairs""".stripMargin

  /** LSH band-tuning audit — the S-curve, measured on the data
    * instead of trusted from the formula: for three bandings of the
    * same 16-component minhash signature (one md5 base per shingle +
    * 16 Mersenne-61 affine permutations, see mhPerm) — (4 bands × 4
    * rows), (8 × 2), (2 × 8) — report candidate-pair count, true
    * positives, recall and precision against the EXACT shingle-
    * Jaccard ≥ 0.7 ground truth (integer rational 17·i ≥ 7·(na+nb) —
    * no float threshold). This is the table a curator reads to pick
    * b×r before a corpus-scale dedup run: more rows per band ⇒
    * higher precision / lower recall, and the planted near-dups make
    * the trade-off visible.
    *
    * 100 TB posture: candidates come from band equi-joins on the
    * signature table (never all pairs); the exact-Jaccard truth side
    * is fixture-scale verification, exactly like
    * q_dedup_minhash_estimate. */
  private val lshTuneQ = (s: SparkSession, dir: String) => {
    val edges = shared(s, s"edges|$dir")(shingleEdges(Tables.documents(s, dir)))
    // 16-component signature per doc (the mhEstimate construction:
    // one md5 base + k Mersenne-61 affine permutations)
    val eh = edges
      .withColumn("hh", mhBase(col("s")))
      .withColumn("h1", shiftright(col("hh"), 30))
      .withColumn("h0", col("hh").bitwiseAND(lit((1L << 30) - 1)))
    val mins = (0 until MheK).map(k =>
      min(mhPerm(col("h1"), col("h0"), k)).as(s"m$k"))
    val prof = eh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), mins: _*)
      .select(col("doc_id"), col("n"),
        array((0 until MheK).map(k => col(s"m$k")): _*).as("ml"))
    // ground truth: exact jaccard >= 0.7 as an integer rational
    val counts = edges.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairIntersections(edges, "doc_id", "ida", "idb")
    val truth = inter
      .join(counts.select(col("doc_id").as("ida"), col("n").as("na")), "ida")
      .join(counts.select(col("doc_id").as("idb"), col("n").as("nb")), "idb")
      .filter(expr("17 * i >= 7 * (na + nb)"))
      .select(col("ida"), col("idb")).withColumn("is_true", lit(1L))
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    // band fan-out for the three configs
    val bands = prof
      .withColumn("cfg", explode(array(
        struct(lit(4).as("b"), lit(4).as("r")),
        struct(lit(8).as("b"), lit(2).as("r")),
        struct(lit(2).as("b"), lit(8).as("r")))))
      .select(col("doc_id"), col("cfg.b").as("b"), col("cfg.r").as("r"),
        col("ml"))
      .withColumn("j", explode(expr("sequence(0, b - 1)")))
      // the band key is the raw long-array slice: same equality
      // semantics as the oracle's injective string rendering, ~8r
      // bytes instead of ~20r through the candidate shuffle
      .select(col("doc_id"), col("b"), col("r"), col("j"),
        expr("slice(ml, j * r + 1, r)").as("sig"))
    val cand = bands.select(col("b"), col("r"), col("j"), col("sig"),
        col("doc_id").as("ida"))
      .join(bands.select(col("b"), col("r"), col("j"), col("sig"),
        col("doc_id").as("idb")), Seq("b", "r", "j", "sig"))
      .filter(col("ida") < col("idb"))
      .select(col("b"), col("r"), col("ida"), col("idb"))
      .distinct()
    cand.join(truth, Seq("ida", "idb"), "left")
      .groupBy(col("b"), col("r"))
      .agg(count(lit(1)).as("n_cand"),
        sum(coalesce(col("is_true"), lit(0L))).as("tp"))
      .crossJoin(broadcast(nTrue))
      .withColumn("recall_micro",
        when(col("n_true") > 0L, expr("(1000000 * tp) div n_true")))
      .withColumn("precision_micro",
        when(col("n_cand") > 0L, expr("(1000000 * tp) div n_cand")))
      .select(col("b"), col("r"), col("n_true"), col("n_cand"),
        col("tp"), col("recall_micro"), col("precision_micro"))
  }

  private val lshTuneSql =
    s"""WITH toks AS MATERIALIZED (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |sh0 AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
      |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
      |  FROM toks),
      |sh AS MATERIALIZED (SELECT DISTINCT doc_id, s FROM sh0),
      |${mhCteSql("doc_id")},
      |prof AS MATERIALIZED (
      |  SELECT doc_id, list(m ORDER BY k) AS ml FROM mh GROUP BY 1),
      |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |truth AS MATERIALIZED (
      |  SELECT ida, idb
      |  FROM inter
      |  JOIN cnt na ON ida = na.doc_id
      |  JOIN cnt nb ON idb = nb.doc_id
      |  WHERE 17 * i >= 7 * (na.n + nb.n)),
      |ntr AS (SELECT COUNT(*) AS n_true FROM truth),
      |cfg(b, r) AS (VALUES (4, 4), (8, 2), (2, 8)),
      |bands AS (
      |  SELECT doc_id, b, r, t.j,
      |    CAST(ml[t.j * r + 1 : t.j * r + r] AS VARCHAR) AS sig
      |  FROM prof CROSS JOIN cfg,
      |    LATERAL unnest(generate_series(0, b - 1)) AS t(j)),
      |cand AS (
      |  SELECT DISTINCT x.b, x.r, x.doc_id AS ida, y.doc_id AS idb
      |  FROM bands x JOIN bands y
      |    ON x.b = y.b AND x.r = y.r AND x.j = y.j AND x.sig = y.sig
      |    AND x.doc_id < y.doc_id),
      |sc AS (
      |  SELECT c.b, c.r, COUNT(*) AS n_cand,
      |    CAST(SUM(CASE WHEN t.ida IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS tp
      |  FROM cand c LEFT JOIN truth t
      |    ON c.ida = t.ida AND c.idb = t.idb
      |  GROUP BY 1, 2)
      |SELECT b, r, ntr.n_true, sc.n_cand, sc.tp,
      |  CASE WHEN ntr.n_true > 0 THEN (1000000 * sc.tp) // ntr.n_true
      |    END AS recall_micro,
      |  CASE WHEN sc.n_cand > 0 THEN (1000000 * sc.tp) // sc.n_cand
      |    END AS precision_micro
      |FROM sc CROSS JOIN ntr""".stripMargin

  /** Dedup ROI report — the one-row summary a curation run publishes
    * before anyone approves the compute bill: corpus size, exact-dup
    * survivors (md5 groups), near-dup survivors (Jaccard ≥ 0.7
    * components, one canonical per component), and the exact
    * character savings of each tier in micro. Composes the exact
    * tier and the CC tier this module already maintains — the
    * number pipelines actually report ("dedup removed X% of bytes").
    *
    * 100 TB posture: the exact tier is one hash groupBy; the near
    * tier reuses the banded-candidate machinery (never all pairs);
    * the report is a 1-row rollup. */
  private val savingsQ = (s: SparkSession, dir: String) => {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("h"),
        length(col("text")).cast("long").as("chars"))
    val exactKeep = docs.groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"), max(col("chars")).as("chars"))
    val cc = connectedComponentsStars(
      jaccardPairs(s, dir, 0.7).select(col("ida"), col("idb")))
    val nearKeep = exactKeep
      .join(cc, exactKeep("doc_id") === cc("id"), "left")
      .withColumn("grp", coalesce(col("label"), col("doc_id")))
      .groupBy(col("grp"))
      .agg(min(exactKeep("doc_id")).as("kid"), count(lit(1)).as("m"),
        sum(col("chars")).as("grp_chars"), min(col("chars")).as("keep1"))
    val keptNearChars = nearKeep
      .join(docs.select(col("doc_id").as("kid"), col("chars").as("kc")),
        "kid")
      .agg(sum(col("kc")).as("near_chars"), count(lit(1)).as("n_near"))
    val totals = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("chars")).as("total_chars"))
    val exacts = exactKeep.agg(count(lit(1)).as("n_exact"),
      sum(col("chars")).as("exact_chars"))
    totals.crossJoin(broadcast(exacts)).crossJoin(broadcast(keptNearChars))
      .withColumn("exact_savings_micro",
        expr("(1000000 * (total_chars - exact_chars)) div total_chars"))
      .withColumn("near_savings_micro",
        expr("(1000000 * (total_chars - near_chars)) div total_chars"))
      .select(col("n_docs"), col("total_chars"), col("n_exact"),
        col("exact_chars"), col("n_near"), col("near_chars"),
        col("exact_savings_micro"), col("near_savings_micro"))
  }

  private val savingsSql =
    """WITH RECURSIVE
      |d0 AS (SELECT doc_id, md5(text) AS h,
      |         CAST(length(text) AS BIGINT) AS chars
      |       FROM documents),
      |ek AS (
      |  SELECT h, MIN(doc_id) AS doc_id, MAX(chars) AS chars
      |  FROM d0 GROUP BY 1),
      |toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
      |       FROM toks),
      |dd AS (SELECT DISTINCT doc_id, s FROM sh),
      |nn AS (SELECT doc_id, count(*) AS n FROM dd GROUP BY 1),
      |inter AS (SELECT a.doc_id ida, b.doc_id idb, count(*) i
      |          FROM dd a JOIN dd b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |prs AS (SELECT ida, idb
      |        FROM inter JOIN nn na ON ida = na.doc_id
      |                   JOIN nn nb ON idb = nb.doc_id
      |        WHERE round(i*1.0/(na.n+nb.n-i), 6) >= 0.7),
      |edges AS (SELECT ida AS a, idb AS b FROM prs
      |          UNION SELECT idb, ida FROM prs),
      |reach AS (SELECT a AS id, b AS peer FROM edges
      |          UNION
      |          SELECT r.id, e.b FROM reach r JOIN edges e
      |            ON r.peer = e.a),
      |lab AS (SELECT id, least(id, MIN(peer)) AS label
      |        FROM reach GROUP BY id),
      |nk AS (
      |  SELECT COALESCE(lab.label, ek.doc_id) AS grp,
      |    MIN(ek.doc_id) AS kid
      |  FROM ek LEFT JOIN lab ON ek.doc_id = lab.id
      |  GROUP BY 1),
      |nc AS (
      |  SELECT COUNT(*) AS n_near,
      |    CAST(SUM(d0.chars) AS BIGINT) AS near_chars
      |  FROM nk JOIN d0 ON nk.kid = d0.doc_id),
      |tot AS (SELECT COUNT(*) AS n_docs,
      |          CAST(SUM(chars) AS BIGINT) AS total_chars FROM d0),
      |ex AS (SELECT COUNT(*) AS n_exact,
      |         CAST(SUM(chars) AS BIGINT) AS exact_chars FROM ek)
      |SELECT tot.n_docs, tot.total_chars, ex.n_exact, ex.exact_chars,
      |  nc.n_near, nc.near_chars,
      |  (1000000 * (tot.total_chars - ex.exact_chars))
      |    // tot.total_chars AS exact_savings_micro,
      |  (1000000 * (tot.total_chars - nc.near_chars))
      |    // tot.total_chars AS near_savings_micro
      |FROM tot, ex, nc""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_dedup_savings" -> Q(savingsQ, Some(savingsSql),
      "dedup ROI report: exact + near tiers, canonical survivors, byte savings"),
    "q_dedup_lsh_tuning" -> Q(lshTuneQ, Some(lshTuneSql),
      "LSH S-curve audit: recall/precision of three bandings vs exact jaccard truth"),
    "q_dedup_minhash_estimate" -> Q(mhEstimateQ, Some(mhEstimateSql),
      "16-component md5 minhash Jaccard estimator vs exact ground truth per source pair"),
    "q_dedup_jaccard_prefix" -> Q(jaccardPrefixQ, Some(jaccardSql),
      "prefix-filtered exact similarity join (PPJoin family): rare-early candidates only"),
    "q_dedup_containment" -> Q(containmentQ, Some(containmentSql),
      "asymmetric shingle containment: catches sub-document duplication jaccard misses"),
    "q_dedup_fuzzy_names" -> Q(fuzzyNamesQ, Some(fuzzyNamesSql),
      "banded fuzzy identifier match: tercet pigeonhole + hamming/lev verify" +
        " (fixed 10^3 codespace + constant-100 probe side = fixture-bound)",
      scale = graft.ScaleClass.FixtureDiagnostic("q_dedup_er_entities_scaled")),
    "q_dedup_incremental" -> Q(incrementalQ, Some(incrementalSql),
      "batch-vs-corpus exact dedup via bloom prefilter + broadcast verify"),
    "q_dedup_incremental_versioned" -> Q(incrementalVersionedQ,
      Some(incrementalSql),
      "delta-view batch vs snapshot corpus: versioned incremental dedup"),
    "q_dedup_er_entities" -> Q(erQ, Some(erSql),
      "entity resolution end-to-end: block, score (ham<=1), CC-cluster, canonicalize",
      scale = graft.ScaleClass.FixtureDiagnostic("q_dedup_er_entities_scaled")),
    "q_dedup_er_entities_scaled" -> Q(erScaledQ, Some(erScaledSql),
      "domain-scaling ER twin: codespace grows with the roster (per-copy bands, constant occupancy)"),
    "q_dedup_clusters" -> Q(clustersQ, Some(clustersSql),
      "connected-components cluster ids over verified jaccard pairs"),
    "q_dedup_cross_source_overlap" -> Q(crossSourceQ, Some(crossSourceSql),
      "source×source contamination matrix: exact shingle Jaccard between corpus slices"),
    "q_dedup_exact" -> Q(exactQ, Some(exactSql),
      "exact dedup: md5 hash-group, keep min doc_id"),
    "q_dedup_jaccard_pairs" -> Q(
      (s: SparkSession, dir: String) => jaccardPairs(s, dir, 0.7),
      Some(jaccardSql),
      "exact 3-gram-shingle jaccard similarity join (inverted index)"),
    "q_dedup_minhash_lsh" -> Q(minhashQ, Some(jaccardSql),
      "minhash 64 → 16x4 LSH bands → bucket join → exact-jaccard verify"),
    "q_dedup_simhash" -> Q(simhashQ, Some(simhashSql),
      "60-bit md5 simhash, hamming<=10 pairs (oracle rebuilds hash);" +
        " the 12x5-bit band join is pigeonhole-COMPLETE but a constant" +
        " FRACTION of all pairs (BlockingAudit measured 1.9x on this" +
        " low-entropy corpus) — quadratic-constant, fixture-bound",
      scale = graft.ScaleClass.FixtureDiagnostic("q_dedup_minhash_lsh")),
    "q_dedup_cosine_pairs" -> Q(cosineQ, Some(cosineSql),
      "embedding near-dup pairs, cosine>=0.45, double-exact fold"))
}
