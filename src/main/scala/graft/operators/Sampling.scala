package graft.operators

import graft.{Ora, Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling — the training-data-pipeline operators for
  * carving reproducible subsets out of a 100 TB corpus (task brief:
  * dataset curation ops are first-class alongside SURVEY §2).
  *
  * All three variants key off a CONTENT hash (md5 of the row's natural
  * key), never `rand()`: the sample is a pure function of the data, so
  * it is identical across runs, partitionings, cluster sizes, and
  * engines — which is also what makes a DuckDB oracle possible (both
  * engines compute the same md5 hex).
  *
  * 100 TB posture, per variant:
  * 1. Hash-Bernoulli (`q_sample_hash`): keep rows whose hash falls in
  *    a prefix range — a MAP-ONLY filter, zero shuffles, composes with
  *    scan pushdown on other predicates. Rate control = hex-prefix
  *    width (1 char = 1/16 granularity; widen the prefix for finer).
  *    Samples NEST: the 2/16 sample is a strict subset of the 4/16
  *    sample (same hash, wider range), so a pipeline can grow its
  *    sample without recomputing what it already processed (spec'd).
  * 2. Fixed-N global (`q_sample_fixed_n`): ORDER BY hash LIMIT N
  *    compiles to TakeOrderedAndProject — per-partition top-N, driver
  *    merges tasks×N candidate rows, NO global sort ever materializes.
  *    This is "give me exactly 100k uniform rows from the corpus" at
  *    scale; N·tasks rows must fit on the driver (N ≪ corpus).
  * 3. Stratified fixed-N per group (`q_sample_stratified`): row_number
  *    over (stratum, hash) — exactly N per stratum, one shuffle on the
  *    stratum key. At extreme scale the window input can be pre-pruned
  *    per partition (keep local top-N per stratum first — the same
  *    two-phase trick Spark's TakeOrdered uses) before the exchange.
  */
object Sampling extends QueryModule {

  /** Content hash of lineitem's natural key, identical in both engines:
    * md5 of "orderkey-linenumber" (ints render identically as decimal
    * strings in Spark and DuckDB varchar casts). */
  private def hkey = md5(concat_ws("-", col("l_orderkey"), col("l_linenumber")))

  private val hkeySql =
    "md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))"

  // 1. Hash-Bernoulli sample at 2/16 = 12.5%, aggregated per flag so
  // the declared result is compact; the filter itself is the operator.
  private val hashSample = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .filter(substring(hkey, 1, 1).isin("0", "1"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        Ora.dsum(Ora.money(col("l_quantity"))).as("sum_qty"))

  private val hashSampleSql =
    s"""SELECT l_returnflag, COUNT(*) AS n_sampled,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
       |FROM lineitem
       |WHERE substr($hkeySql, 1, 1) IN ('0', '1')
       |GROUP BY l_returnflag""".stripMargin

  /** Train/validation/test split — the ML-pipeline staple done the
    * only way that survives reruns and late-arriving data: assignment
    * is a PURE FUNCTION of the row's content hash (first two hex chars
    * = 256 buckets; <204 train ≈ 80%, <230 val ≈ 10%, rest test), so
    * the split is stable across runs, machines, and partitionings, a
    * row never migrates between splits as the corpus grows, and the
    * assignment is a map-only expression that composes with pushdown.
    * Output = per-split counts + decimal-exact sums (the fractions
    * land within binomial noise of 80/10/10 — the exact realized
    * counts are the compared contract). */
  // bucket compare done on the 2-hex-char PREFIX STRING ('cc' = 204,
  // 'e6' = 230): md5 hex is lowercase 0-9a-f, so lexicographic order
  // IS numeric order and both engines compare binary-identically
  private val splitExpr =
    when(substring(hkey, 1, 2) < "cc", "train")
      .when(substring(hkey, 1, 2) < "e6", "val")
      .otherwise("test")

  private val trainTestSplit = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .withColumn("split", splitExpr)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        Ora.dsum(Ora.money(col("l_quantity"))).as("sum_qty"))

  private val trainTestSplitSql =
    s"""SELECT CASE
       |  WHEN substr($hkeySql, 1, 2) < 'cc' THEN 'train'
       |  WHEN substr($hkeySql, 1, 2) < 'e6' THEN 'val'
       |  ELSE 'test' END AS split,
       |  COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_orders,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
       |FROM lineitem GROUP BY 1""".stripMargin

  // 2. Fixed-N uniform sample: deterministic "random" 100 rows.
  private val fixedN = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .withColumn("hk", hkey)
      .orderBy(col("hk"))
      .limit(100)
      .select(col("hk"), col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"))

  private val fixedNSql =
    s"""SELECT $hkeySql AS hk, l_orderkey, l_linenumber, l_returnflag
       |FROM lineitem ORDER BY hk LIMIT 100""".stripMargin

  // 3. Stratified: exactly 10 rows per returnflag, hash-ordered.
  private val stratified = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("hk"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, dir)
      .withColumn("hk", hkey)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("l_returnflag"), col("rn"), col("hk"),
        col("l_orderkey"), col("l_linenumber"))
  }

  private val stratifiedSql =
    s"""WITH k AS (
       |  SELECT l_returnflag, l_orderkey, l_linenumber, $hkeySql AS hk
       |  FROM lineitem)
       |SELECT l_returnflag, rn, hk, l_orderkey, l_linenumber FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY l_returnflag
       |    ORDER BY hk, l_orderkey, l_linenumber) AS rn
       |  FROM k)
       |WHERE rn <= 10""".stripMargin

  /** The 100 TB form of the stratified sample: the window above
    * shuffles the whole table into as many tasks as there are strata —
    * fine when strata are numerous, a funnel when they are few (3
    * returnflags). This variant first prunes EACH SCAN PARTITION to its
    * local top-10 per stratum (a bounded per-partition heap — the same
    * two-phase trick TakeOrderedAndProject uses, and the one sanctioned
    * mapPartitions use-case: genuinely imperative per-partition state),
    * so the exchange and window see ≤ 10·partitions·strata rows instead
    * of the corpus. Result-identical by construction — the global
    * top-10 of a stratum is a subset of the union of per-partition
    * top-10s — and it shares the declarative variant's oracle. */
  private val stratifiedScalable = (s: SparkSession, dir: String) => {
    import s.implicits._
    val keyed = Tables.lineitem(s, dir)
      .withColumn("hk", hkey)
      .select(col("l_returnflag"), col("hk"),
        col("l_orderkey"), col("l_linenumber"))
      .as[(String, String, Long, Int)]
    val pruned = keyed.mapPartitions { it =>
      // max-heap per stratum: evict the largest key once size > 10, so
      // the heap always holds the partition's 10 smallest
      val keep = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.PriorityQueue[(String, Long, Int)]]
      it.foreach { case (flag, hk, ok, ln) =>
        val pq = keep.getOrElseUpdate(flag,
          scala.collection.mutable.PriorityQueue.empty[(String, Long, Int)])
        pq.enqueue((hk, ok, ln))
        if (pq.size > 10) pq.dequeue()
      }
      keep.iterator.flatMap { case (flag, pq) =>
        pq.iterator.map(t => (flag, t._1, t._2, t._3))
      }
    }.toDF("l_returnflag", "hk", "l_orderkey", "l_linenumber")
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("hk"), col("l_orderkey"), col("l_linenumber"))
    pruned.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("l_returnflag"), col("rn"), col("hk"),
        col("l_orderkey"), col("l_linenumber"))
  }

  /** Epoch-deterministic training-order shuffle — the "global shuffle
    * per epoch" a training loader needs, WITHOUT a global sort: each
    * document is assigned a shard by an epoch-seeded content hash
    * (map-side) and ordered WITHIN its shard by a second hash draw, so
    * the permutation is a pure function of (epoch, doc_id): identical
    * across runs, partitionings, and engines, and a different-but-
    * equally-uniform order every epoch. The only exchange is the shard
    * key (one shuffle); readers stream shards independently — at
    * 100 TB that is "write N shard files per epoch", never "sort the
    * corpus". Changing the epoch literal reshuffles everything; the
    * spec checks two epochs produce different orders and identical
    * membership. */
  private val NumShards = 8
  private val Epoch = 3
  private def epochShuffleQ(epoch: Int): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s: SparkSession, dir: String) => {
      val hk = md5(concat_ws(":", lit(epoch), col("doc_id")))
      val shard = (conv(substring(md5(concat_ws("#", lit(epoch),
        col("doc_id"))), 1, 4), 16, 10).cast("long") % NumShards).cast("int")
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("hk"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), shard.as("shard"), hk.as("hk"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .select(col("shard"), col("rn"), col("doc_id"))
    }

  private def epochShuffleSql(epoch: Int): String =
    s"""SELECT shard, rn, doc_id FROM (
       |  SELECT doc_id,
       |    CAST(CAST(('0x' || substring(md5($epoch || '#' || doc_id), 1, 4))
       |         AS BIGINT) % $NumShards AS INT) AS shard,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY CAST(('0x' || substring(md5($epoch || '#' || doc_id), 1, 4)) AS BIGINT) % $NumShards
       |      ORDER BY md5($epoch || ':' || doc_id), doc_id) AS rn
       |  FROM documents)""".stripMargin

  /** For SamplingSpec: the same shuffle at another epoch. */
  private[graft] def epochShuffleAt(epoch: Int): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    epochShuffleQ(epoch)

  // ---- deterministic bootstrap resample (Poisson counts) ----------
  //
  // The multinomial bootstrap approximated per-row: each row's replica
  // count m ~ Poisson(1), drawn DETERMINISTICALLY by inverting the
  // Poisson CDF on the row's content-hash uniform — u is the first 8
  // md5 hex chars, compared against precomputed CDF thresholds AS HEX
  // STRINGS (lowercase fixed-width hex compares lexicographically ==
  // numerically, the same trick the Bernoulli sampler uses; no hex
  // parsing, which DuckDB lacks). Same hash → same m in both engines
  // and across reruns: the reproducibility a training pipeline needs
  // from a resample. Map-only m assignment; the bootstrap aggregate
  // weights by m instead of exploding replicas — one partial-agg
  // shuffle, zero data amplification.
  private val bootstrapQ = (s: SparkSession, dir: String) => {
    val u = substring(hkey, 1, 8)
    val m = when(u < "5e2d58d8", 0L)
      .when(u < "bc5ab1b1", 1L)
      .when(u < "eb715e1d", 2L)
      .when(u < "fb239797", 3L)
      .when(u < "ff1025f5", 4L)
      .otherwise(5L)
    Tables.lineitem(s, dir)
      .withColumn("m", m)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_orig"),
        sum(col("m")).as("n_boot"),
        Ora.dsum(Ora.money(col("l_quantity")) * col("m")).as("sum_qty_boot"),
        Ora.dsum(Ora.money(col("l_quantity"))).as("sum_qty_orig"))
  }

  private val bootstrapSql =
    s"""WITH w AS (
       |  SELECT l_returnflag, l_quantity,
       |    CASE WHEN u < '5e2d58d8' THEN 0
       |         WHEN u < 'bc5ab1b1' THEN 1
       |         WHEN u < 'eb715e1d' THEN 2
       |         WHEN u < 'fb239797' THEN 3
       |         WHEN u < 'ff1025f5' THEN 4
       |         ELSE 5 END AS m
       |  FROM (SELECT l_returnflag, l_quantity,
       |          substr($hkeySql, 1, 8) AS u FROM lineitem))
       |SELECT l_returnflag, COUNT(*) AS n_orig,
       |  CAST(SUM(m) AS BIGINT) AS n_boot,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * m) AS DOUBLE)
       |    AS sum_qty_boot,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
       |    AS sum_qty_orig
       |FROM w GROUP BY 1""".stripMargin

  // ---- contrastive negative mining --------------------------------
  //
  // The training-pair constructor for contrastive objectives
  // (SimCLR/InfoNCE/two-tower retrieval): per anchor, 3 NEGATIVES
  // drawn deterministically from the semantically-unrelated pool
  // (cosine < 0.1 — verified, not assumed), selected by a content
  // hash of the (anchor, candidate) pair — the same no-rand() contract
  // as every sampler here, so the pairs are reproducible across runs,
  // partitionings and engines. Plan: anchors broadcast (|A| rows), one
  // codegen cosine pass over the corpus, a filter to the unrelated
  // pool, and one |A|-keyed rank window over hash-ordered candidates.
  // At 100 TB the pool filter rides the ANN index (exclude the
  // bucket-adjacent candidates) — selection and rank are unchanged.
  private val negativesQ = (s: SparkSession, dir: String) => {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val anchors = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("sel"), col("neg_id").asc)
    e.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(anchors))
      .select(col("anchor_id"), col("vec_id").as("neg_id"),
        round(call_function("cosine_sim", col("embedding"), col("qe")), 6)
          .as("cos"))
      .filter(col("cos") < 0.1)
      .withColumn("sel", md5(concat_ws("|",
        col("anchor_id").cast("string"), col("neg_id").cast("string"))))
      .withColumn("rsel", row_number().over(w))
      .filter(col("rsel") <= 3)
      .select(col("anchor_id"), col("neg_id"), col("cos"), col("rsel"))
  }

  private val negativesSql =
    """WITH a AS (SELECT vec_id AS anchor_id, embedding AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT a.anchor_id, e.vec_id AS neg_id,
      |    round(
      |      list_sum(list_transform(range(1, len(e.embedding)+1),
      |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
      |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |           i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))), 6) AS cos
      |  FROM embeddings e, a WHERE e.vec_id >= 5),
      |pool AS (
      |  SELECT *, md5(CAST(anchor_id AS VARCHAR) || '|' ||
      |    CAST(neg_id AS VARCHAR)) AS sel
      |  FROM scored WHERE cos < 0.1)
      |SELECT anchor_id, neg_id, cos,
      |  CAST(rsel AS INTEGER) AS rsel
      |FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
      |        ORDER BY sel, neg_id ASC) AS rsel FROM pool)
      |WHERE rsel <= 3""".stripMargin

  /** Class-balanced downsampling — the training-set balancer: every
    * language class is capped to the SMALLEST class's count, picks
    * chosen by content-hash order (md5 of doc_id, doc_id tiebreak), so
    * the balanced set is a pure function of the data like every other
    * sampler here. The output pins the exact selection per class with
    * a sum-of-kept-doc_ids checksum rather than emitting the rows.
    *
    * 100 TB posture: one |classes|-row broadcast (the min count), one
    * class-keyed rank window over the corpus, map-side rollup after —
    * the same shape at any corpus size; a skewed giant class costs one
    * sort of its own partition, never a global one. */
  private val classBalanceQ = (s: SparkSession, dir: String) => {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"))
    val cap = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("cap"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    d.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(cap))
      .filter(col("rn") <= col("cap"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("sum_kept_ids"))
  }

  private val classBalanceSql =
    """WITH cap AS (
      |  SELECT MIN(n) AS cap FROM (
      |    SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1)),
      |r AS (
      |  SELECT doc_id, lang, row_number() OVER (
      |    PARTITION BY lang
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_kept,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_kept_ids
      |FROM r, cap WHERE rn <= cap GROUP BY 1""".stripMargin

  /** Group k-fold cross-validation assignment — the leakage-safe CV
    * split: the fold is a pure function of the GROUP key (user), so
    * every event of a user lands in one fold and no user straddles
    * train/test at any rotation (row-level splits leak user behavior
    * across folds). Reported per fold: distinct users, events, and
    * the event share in micro.
    *
    * 100 TB posture: assignment is a map-only md5 expression (composes
    * with pushdown); one 5-key rollup with a partial-distinct on
    * user. */
  private val groupKfoldQ = (s: SparkSession, dir: String) => {
    Tables.events(s, dir)
      .withColumn("fold",
        conv(substring(md5(concat(lit("kfold-v1:"),
          col("user_id").cast("string"))), 1, 6), 16, 10)
          .cast("long") % 5L)
      .groupBy(col("fold"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .crossJoin(broadcast(Tables.events(s, dir)
        .agg(count(lit(1)).as("tot"))))
      .withColumn("share_micro", expr("(1000000 * n_events) div tot"))
      .drop("tot")
  }

  private val groupKfoldSql =
    """WITH f AS (
      |  SELECT CAST(concat('0x', substr(
      |      md5('kfold-v1:' || CAST(user_id AS VARCHAR)), 1, 6))
      |    AS BIGINT) % 5 AS fold, user_id
      |  FROM events),
      |t AS (SELECT COUNT(*) AS tot FROM f)
      |SELECT fold, COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(*) AS n_events,
      |  (1000000 * COUNT(*)) // MAX(t.tot) AS share_micro
      |FROM f, t GROUP BY 1""".stripMargin

  /** Temperature-scaled corpus mixing weights (the XLM-R / mT5
    * multilingual-sampling op): per language, w = count^α at α = 1/2
    * via integer floor-sqrt — upweights low-resource languages
    * relative to proportional sampling. floor(sqrt(double)) is
    * deterministic across engines because IEEE sqrt is correctly
    * rounded (exact for counts < 4·10¹⁵ — documented bound). Shares
    * in micro; the per-epoch quota allocates a 100k-doc epoch by
    * floor share (remainder docs are the documented truncation).
    *
    * 100 TB posture: one lang-key count, then all arithmetic on the
    * |langs|-row table with the weight total broadcast back. */
  private val tempWeightsQ = (s: SparkSession, dir: String) => {
    val counts = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs").cast("double")))
        .cast("long"))
    counts.crossJoin(broadcast(
        counts.agg(sum(col("w")).as("wtot"), sum(col("n_docs")).as("ntot"))))
      .select(col("lang"), col("n_docs"), col("w"),
        expr("(1000000 * w) div wtot").as("share_micro"),
        expr("(1000000 * n_docs) div ntot").as("prop_micro"),
        expr("(100000 * w) div wtot").as("epoch_quota"))
  }

  private val tempWeightsSql =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot,
      |        CAST(SUM(n_docs) AS BIGINT) AS ntot FROM c)
      |SELECT lang, n_docs, w,
      |  (1000000 * w) // wtot AS share_micro,
      |  (1000000 * n_docs) // ntot AS prop_micro,
      |  (100000 * w) // wtot AS epoch_quota
      |FROM c, t""".stripMargin

  /** Dedup-aware train/val/test split — the eval-hygiene rule naive
    * row splits break: near-duplicate documents must land in the SAME
    * split, or test answers leak into training. Near-dup components
    * (3-gram Jaccard ≥ 0.7 pairs → [[Dedup.connectedComponents]])
    * become the split UNIT: the md5 bucket is taken of the COMPONENT
    * label (singletons are their own component), so a whole near-dup
    * family moves together — 80/10/10 by the same 256-bucket cuts as
    * the row-level split.
    *
    * 100 TB posture: pair generation is the inverted-shingle
    * discipline; CC runs over match edges; the split assignment is a
    * map-only expression of the component label. */
  private val dedupSplitQ = (s: SparkSession, dir: String) => {
    val pairs = Dedup.jaccardPairs(s, dir, 0.7)
      .select(col("ida"), col("idb"))
    val cc = Dedup.connectedComponentsStars(pairs)
    val labeled = Tables.documents(s, dir).select(col("doc_id"))
      .join(cc, col("doc_id") === cc("id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("grp"))
    labeled
      .withColumn("b", conv(substring(md5(concat(lit("ddsplit-v1:"),
        col("grp").cast("string"))), 1, 2), 16, 10).cast("long"))
      .withColumn("split",
        when(col("b") < 204L, "train")
          .when(col("b") < 230L, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("grp")).as("n_components"))
  }

  private val dedupSplitSql =
    """WITH RECURSIVE
      |toks AS (SELECT doc_id, string_split(text,' ') AS tk
      |         FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
      |       FROM toks),
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
      |          SELECT r.id, e.b FROM reach r JOIN edges e
      |          ON r.peer = e.a),
      |lab AS (SELECT id, least(id, MIN(peer)) AS label
      |        FROM reach GROUP BY id),
      |grp AS (
      |  SELECT doc.doc_id, COALESCE(lab.label, doc.doc_id) AS grp
      |  FROM documents doc LEFT JOIN lab ON doc.doc_id = lab.id),
      |assigned AS (
      |  SELECT doc_id, grp,
      |    CAST(concat('0x', substr(
      |      md5('ddsplit-v1:' || CAST(grp AS VARCHAR)), 1, 2))
      |      AS BIGINT) AS b
      |  FROM grp)
      |SELECT CASE WHEN b < 204 THEN 'train'
      |            WHEN b < 230 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT grp) AS n_components
      |FROM assigned GROUP BY 1""".stripMargin

  /** Deterministic SMOTE — synthetic-minority oversampling for class
    * rebalance: the label with the FEWEST embeddings (min-label
    * tiebreak) gets one synthetic vector per member, interpolated
    * toward its exact nearest same-label neighbor
    * (integer micro dist², min-vec_id tiebreak, self excluded):
    * synth = v + α·(nn − v). α is md5-derived per vector (the
    * content-hash discipline — rerun/engine/partitioning stable),
    * and the interpolation uses the SHIFT-floor form
    * (α·diff + 10¹³) div 10⁶ − 10⁷ so a negative diff floors
    * identically in Spark (truncating div) and DuckDB (flooring //):
    * the numerator is provably nonnegative (|α·diff| ≤ 4·10¹²).
    *
    * 100 TB posture: the NN search is |minority|²-bounded (the
    * minority class is small by definition); at scale the candidate
    * pool swaps to the ANN-bucketed recall set, same plan. */
  private val smoteQ = (s: SparkSession, dir: String) => {
    val emb = Tables.embeddings(s, dir)
    val minority = emb.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").asc, col("label").asc).limit(1)
      .select(col("label").as("mlabel"))
    val pts = emb.join(broadcast(minority), col("label") === col("mlabel"))
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("vm"))
    val a = pts.select(col("vec_id"), col("label"), col("vm"))
    val b = pts.select(col("vec_id").as("nid"), col("vm").as("nvm"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2").asc, col("nid").asc)
    a.crossJoin(b).filter(col("vec_id") =!= col("nid"))
      .withColumn("d2", expr(
        "aggregate(zip_with(vm, nvm, (x, y) -> (x - y) * (x - y))," +
          " 0L, (acc, v) -> acc + v)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .withColumn("alpha_micro",
        conv(substring(md5(concat(lit("smote-v1:"),
          col("vec_id").cast("string"))), 1, 6), 16, 10)
          .cast("long") % 1000000L)
      .withColumn("synth_arr", expr(
        "zip_with(vm, nvm, (x, y) -> x + (alpha_micro * (y - x)" +
          " + 10000000000000) div 1000000 - 10000000)"))
      // Canonical scalar rendering: the correctness driver's hasher
      // cannot sort top-level array columns, so the vector ships as a
      // comma-joined string (identical digits both engines — the
      // interpolation is integer-exact, so no float formatting risk).
      .withColumn("synth", expr(
        "array_join(transform(synth_arr, x -> cast(x as string)), ',')"))
      .select(col("label"), col("vec_id"), col("nid").as("nn_id"),
        col("d2").as("nn_dist2"), col("alpha_micro"), col("synth"))
  }

  private val smoteSql =
    """WITH mino AS (
      |  SELECT label AS mlabel FROM embeddings
      |  GROUP BY 1 ORDER BY COUNT(*) ASC, label ASC LIMIT 1),
      |pts AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x ->
      |      CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
      |  FROM embeddings JOIN mino ON label = mlabel),
      |pairs AS (
      |  SELECT a.vec_id, a.label, a.vm, b.vec_id AS nid, b.vm AS nvm,
      |    CAST(list_sum(list_transform(range(1, len(a.vm) + 1),
      |      i -> (a.vm[i] - b.vm[i]) * (a.vm[i] - b.vm[i])))
      |      AS BIGINT) AS d2
      |  FROM pts a, pts b WHERE a.vec_id <> b.vec_id),
      |nn AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY d2 ASC, nid ASC) AS rnk
      |  FROM pairs)
      |SELECT label, vec_id, nid AS nn_id, d2 AS nn_dist2,
      |  CAST(concat('0x', substr(md5('smote-v1:' ||
      |    CAST(vec_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000000
      |    AS alpha_micro,
      |  array_to_string(list_transform(range(1, len(vm) + 1),
      |    i -> CAST(vm[i] + (CAST(concat('0x', substr(md5('smote-v1:' ||
      |      CAST(vec_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000000
      |      * (nvm[i] - vm[i]) + 10000000000000) // 1000000
      |      - 10000000 AS VARCHAR)), ',') AS synth
      |FROM nn WHERE rnk = 1""".stripMargin

  /** Temporal train/test split — the anti-leakage split for anything
    * that forecasts: the cutoff is the exact P80 of event time
    * (value-domain disc on the second domain — data-relative, never a
    * wall-clock constant), train = strictly before, test = at/after.
    * Reported per event type with the USER-overlap count across the
    * boundary — the quantity a leakage review reads (user overlap is
    * EXPECTED in a temporal split, unlike in the group-kfold split
    * two queries over; the point is to measure it, not hide it).
    *
    * 100 TB posture: the cutoff comes from a value-domain cumulative
    * (distinct seconds), the split flags are map-side, and the
    * overlap is a two-grain distinct rollup (the DAU/MAU shape). */
  private val timeSplitQ = (s: SparkSession, dir: String) => {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        col("ts").cast("long").as("sec"))
    val cells = ev.groupBy(col("sec")).agg(count(lit(1)).as("cnt"))
    val wv = Window.orderBy(col("sec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.agg(sum(col("cnt")).as("n")).select(col("n"))
    val cutoff = cells.withColumn("cum", sum(col("cnt")).over(wv))
      .crossJoin(broadcast(tot))
      .filter(expr("cum * 5 >= 4 * n"))
      .agg(min(col("sec")).as("cutoff"))
    val flagged = ev.crossJoin(broadcast(cutoff))
      .withColumn("split",
        when(col("sec") < col("cutoff"), lit("train")).otherwise(lit("test")))
    val counts = flagged.groupBy(col("event_type"))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val users = flagged.select(col("event_type"), col("user_id"), col("split"))
      .distinct()
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_sides"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("n_sides") === 2L, 1L).otherwise(0L))
          .as("n_overlap_users"))
    counts.join(users, "event_type")
      .withColumn("overlap_micro",
        expr("(1000000 * n_overlap_users) div n_users"))
  }

  private val timeSplitSql =
    """WITH ev AS (
      |  SELECT event_type, user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events),
      |cells AS (SELECT sec, COUNT(*) AS cnt FROM ev GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
      |cum AS (
      |  SELECT sec, CAST(SUM(cnt) OVER (ORDER BY sec
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum
      |  FROM cells),
      |cutoff AS (
      |  SELECT MIN(sec) AS cutoff FROM cum, tot WHERE cum * 5 >= 4 * n),
      |fl AS (
      |  SELECT event_type, user_id,
      |    CASE WHEN sec < cutoff THEN 'train' ELSE 'test' END AS split
      |  FROM ev, cutoff),
      |cnts AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_train,
      |    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_test
      |  FROM fl GROUP BY 1),
      |du AS (SELECT DISTINCT event_type, user_id, split FROM fl),
      |us AS (
      |  SELECT event_type, user_id, COUNT(*) AS n_sides
      |  FROM du GROUP BY 1, 2),
      |uo AS (
      |  SELECT event_type, COUNT(*) AS n_users,
      |    CAST(SUM(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_overlap_users
      |  FROM us GROUP BY 1)
      |SELECT c.event_type, c.n_train, c.n_test, u.n_users,
      |  u.n_overlap_users,
      |  (1000000 * u.n_overlap_users) // u.n_users AS overlap_micro
      |FROM cnts c JOIN uo u ON c.event_type = u.event_type""".stripMargin

  /** Neyman optimal allocation — the survey-sampling answer to "how
    * do I spend a 1000-row label budget across strata?": sample each
    * stratum proportionally to N_h·σ_h (big AND noisy strata get
    * more). Population variance per stratum is the exact integer
    * (n·Σx² − (Σx)²) div n² in cents²; σ_h = isqrt (floor(sqrt),
    * IEEE-exact below 4·10¹⁵ — the Bollinger/temperature-weights
    * precedent); the allocation floors once per stratum.
    *
    * Magnitude bound: n·Σx² needs Σx² < 9·10¹⁸/n — with cents ≤
    * 5·10⁴ that holds to ~10⁵ rows per stratum (sf0.1 is 2·10⁴);
    * switch the moments to DECIMAL(38) beyond.
    *
    * 100 TB posture: ONE conditional-aggregate pass on the stratum
    * key; the allocation arithmetic runs on the |strata|-row table
    * (window over 5 rows). */
  private val neymanQ = (s: SparkSession, dir: String) => {
    val Budget = 1000L
    val mo = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sx"),
        sum(col("vc") * col("vc")).as("sxx"))
      .withColumn("var_cents2", expr("(n * sxx - sx * sx) div (n * n)"))
      .withColumn("sd_cents",
        floor(sqrt(col("var_cents2").cast("double"))).cast("long"))
      .withColumn("weight", col("n") * col("sd_cents"))
    val wAll = Window.partitionBy(lit(1))
    mo.withColumn("wtot", sum(col("weight")).over(wAll))
      .withColumn("alloc_n", expr(s"($Budget * weight) div wtot"))
      .select(col("event_type"), col("n"), col("sd_cents"),
        col("weight"), col("alloc_n"))
  }

  private val neymanSql =
    """WITH mo AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS sx,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)
      |      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx
      |  FROM events GROUP BY 1),
      |sd AS (
      |  SELECT event_type, n,
      |    CAST(floor(sqrt(CAST((n * sxx - sx * sx) // (n * n)
      |      AS DOUBLE))) AS BIGINT) AS sd_cents
      |  FROM mo),
      |w AS (
      |  SELECT event_type, n, sd_cents, n * sd_cents AS weight,
      |    CAST(SUM(n * sd_cents) OVER () AS BIGINT) AS wtot
      |  FROM sd)
      |SELECT event_type, n, sd_cents, weight,
      |  (1000 * weight) // wtot AS alloc_n
      |FROM w""".stripMargin

  /** Importance weights for covariate shift — reweight every OTHER
    * source so its length distribution matches the target source
    * 'src0' (the domain-adaptation primitive: train on the big
    * mixed corpus, evaluate as if drawn from the target): per
    * 100-char length bin, w = (target share)/(source share), exact
    * rational micro = (tgt_bin·src_tot·10⁶) div (tgt_tot·src_bin).
    * Bins the TARGET never covers weight to exactly 0 (those source
    * rows contribute nothing to the adapted distribution) — visible
    * in the output rather than silently clipped; bins the source
    * never covers have no rows to weight, the support gap a
    * reweighting review reads off the tgt_cnt column.
    *
    * 100 TB posture: one (source, bin) partial-agg collapse; the
    * target profile broadcasts back onto the bin table. */
  private val importanceQ = (s: SparkSession, dir: String) => {
    val binned = Tables.documents(s, dir)
      .select(col("source"), expr("n_chars div 100").as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val tgt = binned.filter(col("source") === "src0")
      .select(col("bin"), col("cnt").as("tgt_cnt"))
    val tgtTot = tgt.agg(sum(col("tgt_cnt")).as("tgt_tot"))
    val srcTot = binned.filter(col("source") =!= "src0")
      .groupBy(col("source")).agg(sum(col("cnt")).as("src_tot"))
    binned.filter(col("source") =!= "src0")
      .join(srcTot, "source")
      .join(broadcast(tgt), Seq("bin"), "left")
      .crossJoin(broadcast(tgtTot))
      .withColumn("tgt_cnt", coalesce(col("tgt_cnt"), lit(0L)))
      .withColumn("weight_micro",
        expr("(tgt_cnt * src_tot * 1000000) div (tgt_tot * cnt)"))
      .select(col("source"), col("bin"), col("cnt").as("src_cnt"),
        col("tgt_cnt"), col("weight_micro"))
  }

  private val importanceSql =
    """WITH b AS (
      |  SELECT source, n_chars // 100 AS bin, COUNT(*) AS cnt
      |  FROM documents GROUP BY 1, 2),
      |tgt AS (SELECT bin, cnt AS tgt_cnt FROM b WHERE source = 'src0'),
      |tt AS (SELECT CAST(SUM(tgt_cnt) AS BIGINT) AS tgt_tot FROM tgt),
      |st AS (
      |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS src_tot
      |  FROM b WHERE source <> 'src0' GROUP BY 1)
      |SELECT b.source, b.bin, b.cnt AS src_cnt,
      |  COALESCE(tgt.tgt_cnt, 0) AS tgt_cnt,
      |  (COALESCE(tgt.tgt_cnt, 0) * st.src_tot * 1000000)
      |    // (tt.tgt_tot * b.cnt) AS weight_micro
      |FROM b
      |JOIN st ON b.source = st.source
      |LEFT JOIN tgt ON b.bin = tgt.bin
      |CROSS JOIN tt
      |WHERE b.source <> 'src0'""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_sample_importance" -> Q(importanceQ, Some(importanceSql),
      "covariate-shift importance weights per length bin, exact rational micro"),
    "q_sample_neyman" -> Q(neymanQ, Some(neymanSql),
      "Neyman label-budget allocation: N_h*sigma_h shares, integer isqrt variance"),
    "q_sample_time_split" -> Q(timeSplitQ, Some(timeSplitSql),
      "temporal P80 train/test split with measured user overlap, value-domain cutoff"),
    "q_sample_smote" -> Q(smoteQ, Some(smoteSql),
      "deterministic SMOTE: exact-NN interpolation toward the minority class"),
    "q_sample_dedup_aware_split" -> Q(dedupSplitQ, Some(dedupSplitSql),
      "near-dup components move as one unit across train/val/test, md5 of component label"),
    "q_sample_temperature_weights" -> Q(tempWeightsQ, Some(tempWeightsSql),
      "temperature alpha=1/2 corpus mixing weights via integer floor-sqrt"),
    "q_sample_group_kfold" -> Q(groupKfoldQ, Some(groupKfoldSql),
      "leakage-safe group k-fold: fold is a pure function of the user key"),
    "q_sample_class_balance" -> Q(classBalanceQ, Some(classBalanceSql),
      "cap every class at the smallest class count, content-hash-deterministic picks"),
    "q_sample_negatives" -> Q(negativesQ, Some(negativesSql),
      "contrastive negative mining: hash-deterministic picks from the verified-unrelated pool"),
    "q_sample_bootstrap" -> Q(bootstrapQ, Some(bootstrapSql),
      "deterministic Poisson bootstrap: hash-inverted CDF replica counts, map-only"),
    "q_sample_epoch_shuffle" -> Q(epochShuffleQ(Epoch), Some(epochShuffleSql(Epoch)),
      "epoch-deterministic training-order shuffle: hash shard + in-shard rank"),
    "q_sample_train_test_split" -> Q(trainTestSplit, Some(trainTestSplitSql),
      "content-hash 80/10/10 train/val/test split: rerun-stable, map-only"),
    "q_sample_hash" -> Q(hashSample, Some(hashSampleSql),
      "deterministic hash-Bernoulli sample (map-only, nesting rates)"),
    "q_sample_fixed_n" -> Q(fixedN, Some(fixedNSql),
      "fixed-size uniform sample via TakeOrderedAndProject on a content hash"),
    "q_sample_stratified" -> Q(stratified, Some(stratifiedSql),
      "exact-N-per-stratum sample via window over (stratum, hash)"),
    "q_sample_stratified_scalable" -> Q(stratifiedScalable, Some(stratifiedSql),
      "same sample via per-partition heap prune + window over survivors"))
}
