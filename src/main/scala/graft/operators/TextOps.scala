package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 — text analysis (north-star LLM-pipeline layer) +
  * the reference's text-index analog (SURVEY §2.11: SIT_IDX_TXT built
  * into the OSD's omap; ours is an inverted-index DataFrame).
  *
  * All operators are explode/groupBy/window pipelines over `documents`
  * — no UDFs. 100 TB posture: every query is one explode (map-side,
  * linear) plus one or two hash shuffles keyed on token or doc_id;
  * token-keyed aggregates get map-side partial aggregation for free, so
  * the shuffle carries |vocab|·partitions rows, not corpus size. The
  * EDBT 2016 sentiment pattern [local: PAPERS.md:8] — lexicon join +
  * per-doc score — is the langid/quality shape below.
  */
object TextOps extends QueryModule {

  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is")

  // Token counting: whitespace tokens + BPE-ish regex word pieces.
  private val tokensQ = (s: SparkSession, dir: String) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("n_re_tokens"),
        length(col("text")).as("n_chars_computed"),
        col("n_chars"))

  private val tokensSql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_re_tokens,
      |  length(text) AS n_chars_computed, n_chars
      |FROM documents""".stripMargin

  // Global term frequency + document frequency, top-20 terms.
  private val tfQ = (s: SparkSession, dir: String) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf_global"),
        countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf_global").desc, col("term").asc)
      .limit(20)

  private val tfSql =
    """SELECT term, COUNT(*) AS tf_global, COUNT(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |GROUP BY term ORDER BY tf_global DESC, term ASC LIMIT 20""".stripMargin

  // TF-IDF: top-3 scored terms per document (docs 0..19).
  // df is derived FROM tf (one row per (doc,term) ⇒ rows-per-term =
  // docs containing the term), so the corpus is exploded and shuffled
  // once; the two consumers of tf share the identical exchange
  // (ReuseExchange) instead of re-scanning. df is vocab-sized ⇒
  // broadcast; at a vocabulary too big to broadcast this becomes a
  // term-keyed shuffle join, same plan shape. Corpus size n joins in
  // as a broadcast single-row aggregate, so the whole query is ONE
  // QueryExecution — no driver-side count() job.
  private val tfidfQ = (s: SparkSession, dir: String) => {
    val docs = Tables.documents(s, dir)
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.filter(col("doc_id") < 20)
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("doc_id", "term", "tfidf", "rnk")
  }

  private val tfidfSql =
    """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, tf.term,
      |    round(tf * ln(n * 1.0 / df), 6) AS tfidf
      |  FROM tf JOIN df ON tf.term = df.term, n
      |  WHERE doc_id < 20)
      |SELECT doc_id, term, tfidf, rnk FROM (
      |  SELECT doc_id, term, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk
      |  FROM scored) WHERE rnk <= 3""".stripMargin

  /** BM25 top-k retrieval over the inverted-index shape — the ranking
    * companion to `q_text_index_search` (boolean) and `q_text_tfidf`
    * (tf-idf). Okapi BM25 with k1 = 1.2, b = 0.75, with one variation
    * chosen for cross-engine exactness: the idf term uses the raw
    * Robertson odds ratio (N - df + 0.5)/(df + 0.5) instead of its
    * logarithm, so every per-(doc,term) score is a ratio of two exact
    * BIGINT products (both constants are rational: k1+1 = 11/5,
    * k1·(1-b) = 3/10, k1·b = 9/10; multiplying through by 10·D clears
    * all denominators) quantized once by a single floor-division —
    * no float accumulation order anywhere, like the lm-score gate.
    *
    * MAGNITUDE BOUND (documented contract): the widest intermediate,
    * 22·d_tot·tf·(2·n_docs−2·df+1)·10⁶, stays inside BIGINT only
    * while d_tot·tf·n_docs ≲ 4·10¹² — the oracle-comparable corpus
    * range. Both engines fail LOUDLY beyond it rather than diverging
    * silently: Spark 4 runs ANSI mode by default (overflow throws
    * SparkArithmeticException; no session here disables it) and DuckDB
    * errors on BIGINT overflow. A 100 TB deployment swaps the rational
    * for double-precision scoring with the identical plan shape —
    * ranking needs no cross-engine bit-exactness, only this oracle
    * does.
    *
    * 100 TB posture: the corpus explode is map-side and the
    * query-term filter runs BEFORE any aggregation, so the only
    * shuffles carry query-term hits (≤ |terms| rows per doc), never
    * the corpus; df is |terms| rows (broadcast); N and D are one-row
    * crossJoin scalars; the final ranking is a TakeOrdered top-20,
    * not a global sort. At real scale the same plan serves any |terms|
    * ≪ vocabulary; a huge query set would swap the broadcast for a
    * term-keyed shuffle join with an identical plan shape. */
  private val Bm25Terms = Seq("table", "spark", "merge")
  private val bm25Q = (s: SparkSession, dir: String) => {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
    val scal = docs.agg(countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("d_tot"))
    val hits = docs.filter(col("term").isin(Bm25Terms: _*))
    val tfs = hits.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfs = hits.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    tfs.join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(scal))
      .withColumn("q", expr(
        """(CAST(22 AS DECIMAL(38,0)) * d_tot * tf
          |   * (2 * n_docs - 2 * df + 1)) * 1000000 div
          |((CAST(10 AS DECIMAL(38,0)) * d_tot * tf
          |   + 3 * d_tot + 9 * dl * n_docs) * (2 * df + 1))"""
          .stripMargin))
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_terms"), sum(col("q")).as("score_q"))
      .select(col("doc_id"), col("dl"), col("n_terms"), col("score_q"),
        round(col("score_q") / 1e6, 4).as("bm25"))
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(20)
  }

  private val bm25Sql = {
    val list = Bm25Terms.map("'" + _ + "'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |docs AS (
       |  SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM toks),
       |scal AS (
       |  SELECT COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS d_tot
       |  FROM docs),
       |hits AS (SELECT * FROM docs WHERE term IN ($list)),
       |tfs AS (SELECT doc_id, dl, term, COUNT(*) AS tf
       |        FROM hits GROUP BY 1, 2, 3),
       |dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df
       |        FROM hits GROUP BY 1),
       |q AS (
       |  SELECT tfs.doc_id, tfs.dl,
       |    CAST((CAST(22 AS HUGEINT) * d_tot * tf
       |      * (2 * n_docs - 2 * df + 1)) * 1000000 //
       |    ((CAST(10 AS HUGEINT) * d_tot * tf
       |      + 3 * d_tot + 9 * dl * n_docs) * (2 * df + 1))
       |      AS BIGINT) AS q
       |  FROM tfs JOIN dfs ON tfs.term = dfs.term, scal)
       |SELECT doc_id, dl, COUNT(*) AS n_terms,
       |  CAST(SUM(q) AS BIGINT) AS score_q,
       |  round(CAST(SUM(q) AS BIGINT) / 1e6, 4) AS bm25
       |FROM q GROUP BY 1, 2
       |ORDER BY score_q DESC, doc_id ASC LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------------------
  // BM25 over a STORED index (r4 verdict #3): q_text_bm25_topk rebuilds
  // tf/df from the corpus on every run; a real search deployment pays
  // that cost ONCE at ingest. The index is three object-store tables:
  //   postings  (term, doc_id, dl, tf)  — range-partitioned on term, so
  //             a term-IN probe prunes whole objects via footer min/max
  //   terms     (term, df)              — one row per vocab term (tiny)
  //   stats     (n_docs, d_tot)         — one row
  // All three are additive under append (tf/df/counts add, like the
  // MERGE maintenance q_src_index_incremental proves ≡ rebuild), so a
  // 100 TB index stays fresh at delta cost. Query-time work is then
  // ∝ the probed posting lists: filter → broadcast-join the per-term
  // df → score → per-doc sum → top-20. No corpus scan, no tokenize,
  // no df aggregation at query time.
  // ------------------------------------------------------------------

  private val bm25IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per session × sfDir) the stored BM25 index; ingest-time
    * work, like the ANN index root. */
  private[graft] def bm25IndexRoot(s: SparkSession, dir: String): String =
    bm25IndexCache.computeIfAbsent(s"${System.identityHashCode(s)}|$dir", { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
          explode(col("tk")).as("term"))
      docs.groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .repartitionByRange(8, col("term"))
        .write.format("graft-objects").mode("overwrite").save(s"$root/postings")
      s.read.format("graft-objects").load(s"$root/postings")
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .coalesce(1)
        .write.format("graft-objects").mode("overwrite").save(s"$root/terms")
      docs.agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("d_tot"))
        .coalesce(1)
        .write.format("graft-objects").mode("overwrite").save(s"$root/stats")
      root
    })

  /** Identical scoring (and oracle) to bm25Q, but every input comes
    * from the stored index — retrieval cost ∝ posting lists, not the
    * corpus (TextOpsSpec asserts no documents scan in the plan). */
  private val bm25IndexedQ = (s: SparkSession, dir: String) => {
    val root = bm25IndexRoot(s, dir)
    val post = s.read.format("graft-objects").load(s"$root/postings")
      .filter(col("term").isin(Bm25Terms: _*))
    val dfs = s.read.format("graft-objects").load(s"$root/terms")
      .filter(col("term").isin(Bm25Terms: _*))
    val scal = s.read.format("graft-objects").load(s"$root/stats")
    post.join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(scal))
      .withColumn("q", expr(
        """(CAST(22 AS DECIMAL(38,0)) * d_tot * tf
          |   * (2 * n_docs - 2 * df + 1)) * 1000000 div
          |((CAST(10 AS DECIMAL(38,0)) * d_tot * tf
          |   + 3 * d_tot + 9 * dl * n_docs) * (2 * df + 1))"""
          .stripMargin))
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_terms"), sum(col("q")).as("score_q"))
      .select(col("doc_id"), col("dl"), col("n_terms"), col("score_q"),
        round(col("score_q") / 1e6, 4).as("bm25"))
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(20)
  }

  /** Positional phrase search — the inverted-index algorithm boolean
    * term search can't do: "spark merge" matches only where the terms
    * are ADJACENT. Tokens explode once with their positions; each
    * phrase term filters its posting rows BEFORE any join (posting-
    * list cost, the BM25 discipline); adjacency is then one equi-join
    * on (doc_id, position) with the second term's positions shifted by
    * −1 — the classic offset-intersection of positional posting lists,
    * an n-way chain for an n-word phrase. Exchanges carry only the two
    * filtered posting lists. At index scale the same query reads a
    * stored positional postings table exactly as q_text_bm25_indexed
    * reads its frequency postings. */
  private val PhraseW1 = "spark"
  private val PhraseW2 = "merge"
  private val phraseQ = (s: SparkSession, dir: String) => {
    val pos = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p", "w")))
    val a = pos.filter(col("w") === PhraseW1).select(col("doc_id"), col("p"))
    val b = pos.filter(col("w") === PhraseW2)
      .select(col("doc_id"), (col("p") - 1).as("p"))
    a.join(b, Seq("doc_id", "p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("p")).cast("long").as("first_pos"))
  }

  private val phraseSql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |pos AS (
       |  SELECT doc_id, i - 1 AS p, tk[i] AS w
       |  FROM toks CROSS JOIN unnest(range(1, len(tk) + 1)) AS t(i)),
       |a AS (SELECT doc_id, p FROM pos WHERE w = '$PhraseW1'),
       |b AS (SELECT doc_id, p - 1 AS p FROM pos WHERE w = '$PhraseW2')
       |SELECT a.doc_id, COUNT(*) AS n_hits,
       |  CAST(MIN(a.p) AS BIGINT) AS first_pos
       |FROM a JOIN b ON a.doc_id = b.doc_id AND a.p = b.p
       |GROUP BY 1""".stripMargin

  /** BPE merge-candidate counting — the first round of byte-pair-
    * encoding vocabulary induction (the real tokenizer-training
    * kernel): count every adjacent character pair across the corpus,
    * weighted by occurrence; the top pair is what BPE would merge
    * first. The trick that makes round 1 EMBARRASSINGLY cheap at
    * 100 TB: aggregate the corpus to (word, freq) FIRST (the word
    * vocabulary is tiny next to the corpus), then explode character
    * pairs from the vocabulary only, multiplying by freq — the pair
    * exchange carries |vocab|×|word_len| rows, never corpus tokens.
    * Later BPE rounds rewrite the (word, freq) table with the merged
    * symbol and repeat — same plan per round. */
  private val bpePairsQ = (s: SparkSession, dir: String) => {
    val words = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words
      .select(col("freq"), col("w"),
        explode(expr("sequence(1, length(w) - 1)")).as("i"))
      .select(col("freq"), expr("substring(w, i, 2)").as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(20)
  }

  private val bpePairsSql =
    """WITH words AS (
      |  SELECT w, COUNT(*) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) >= 2 GROUP BY 1),
      |pairs AS (
      |  SELECT substring(w, CAST(i AS INT), 2) AS pair, freq
      |  FROM words CROSS JOIN unnest(range(1, length(w))) AS t(i))
      |SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
      |FROM pairs GROUP BY 1
      |ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin

  // ---- BPE tokenizer training (full greedy merge loop) -----------
  //
  // The real thing the round-1 pair count (q_text_bpe_pairs) feeds:
  // 5 greedy merge rounds over the (word, freq) vocabulary — count
  // weighted adjacent symbol pairs, take the best (count, then pair
  // lexicographic — deterministic), rewrite every word's symbol
  // sequence, repeat. Output = the learned merge table.
  //
  // Symbol sequences are SPACE-JOINED strings (symbols never contain
  // spaces) and a merge applies as bounded nested `replace()` passes
  // over ' pa pb ' → ' papb ' on the padded string: replace() scans
  // left-to-right non-overlapping IDENTICALLY in both engines, and
  // each pass halves the surviving overlap chain, so 5 passes resolve
  // runs up to 2⁵ adjacent repeats — far beyond any fixture word.
  // This is the greedy-left application order real BPE uses.
  //
  // Scale posture: the loop runs on the VOCABULARY (words × freq —
  // corpus-collapsed once, the standard BPE trick), each round is one
  // pair-count exchange over vocab rows + a broadcast of the single
  // best-pair row; localCheckpoint pins the per-round plan exactly
  // like PageRank/PCA.
  private val BpeRounds = 5

  /** The shared train loop: returns (merge table, final vocabulary) —
    * the vocabulary carries (w, freq, sy) so the ENCODE view (the
    * trained tokenizer applied to every word) falls out of the same
    * pass that learned the merges. */
  private def bpeLoop(s: SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val words = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    var vocab = words.select(col("w"), col("freq"), expr(
        "concat_ws(' ', transform(sequence(1, length(w)), i -> substring(w, i, 1)))")
        .as("sy"))
      .localCheckpoint()
    var merges: org.apache.spark.sql.DataFrame = null
    for (r <- 1 to BpeRounds) {
      val best = vocab
        .select(col("freq"), split(col("sy"), " ").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS pa, a[i+1] AS pb))"))
          .as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pa").asc, col("pb").asc)
        .limit(1)
        .select(lit(r).as("round"), col("pa"), col("pb"),
          concat(col("pa"), col("pb")).as("merged"), col("n"))
        .localCheckpoint()
      merges = if (merges == null) best else merges.unionAll(best)
      val pat = concat(lit(" "), col("_pa"), lit(" "), col("_pb"), lit(" "))
      val rep = concat(lit(" "), col("_pa"), col("_pb"), lit(" "))
      var upd = vocab
        .crossJoin(broadcast(best.select(col("pa").as("_pa"), col("pb").as("_pb"))))
        .withColumn("pad", concat(lit(" "), col("sy"), lit(" ")))
      for (_ <- 1 to 5)
        upd = upd.withColumn("pad", replace(col("pad"), pat, rep))
      vocab = upd.select(col("w"), col("freq"), trim(col("pad")).as("sy"))
        .localCheckpoint()
    }
    (merges, vocab)
  }

  private val bpeTrainQ = (s: SparkSession, dir: String) => bpeLoop(s, dir)._1

  /** The trained tokenizer APPLIED: top-30 vocabulary words with their
    * BPE segmentations after the 5 learned merges — the inference side
    * (the per-word compression ratio is what a tokenizer report
    * shows). Falls out of the training pass's final vocabulary. */
  private val bpeEncodeQ = (s: SparkSession, dir: String) =>
    bpeLoop(s, dir)._2
      .select(col("w"), col("freq"),
        length(col("w")).cast("long").as("n_chars"),
        size(split(col("sy"), " ")).cast("long").as("n_tokens"),
        col("sy").as("bpe_tokens"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(30)

  private def bpeCtes: String = {
    def round(r: Int): String = {
      val rep5 = (1 to 5).foldLeft("' ' || sy || ' '") { (acc, _) =>
        s"replace($acc, ' ' || b.pa || ' ' || b.pb || ' ', ' ' || b.pa || b.pb || ' ')"
      }
      s"""p$r AS MATERIALIZED (
         |  SELECT a[CAST(i AS INT)] AS pa, a[CAST(i AS INT) + 1] AS pb,
         |    CAST(SUM(freq) AS BIGINT) AS n
         |  FROM (SELECT freq, string_split(sy, ' ') AS a FROM v${r - 1})
         |  CROSS JOIN unnest(range(1, len(a))) AS t(i)
         |  WHERE len(a) >= 2
         |  GROUP BY 1, 2),
         |b$r AS MATERIALIZED (
         |  SELECT $r AS round, pa, pb, pa || pb AS merged, n
         |  FROM p$r ORDER BY n DESC, pa ASC, pb ASC LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT w, freq, trim($rep5) AS sy FROM v${r - 1}, b$r b)"""
        .stripMargin
    }
    s"""WITH words AS (
       |  SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) >= 2 GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT w, freq, array_to_string(list_transform(
       |    range(1, length(w) + 1), i -> w[CAST(i AS INT)]), ' ') AS sy
       |  FROM words),
       |${(1 to BpeRounds).map(round).mkString(",\n")}"""
      .stripMargin
  }

  private def bpeTrainSql: String =
    s"""$bpeCtes
       |${(1 to BpeRounds).map(r => s"SELECT round, pa, pb, merged, n FROM b$r")
          .mkString("\nUNION ALL\n")}"""
      .stripMargin

  private def bpeEncodeSql: String =
    s"""$bpeCtes
       |SELECT w, freq, length(w) AS n_chars,
       |  len(string_split(sy, ' ')) AS n_tokens, sy AS bpe_tokens
       |FROM v$BpeRounds
       |ORDER BY freq DESC, w ASC LIMIT 30"""
      .stripMargin

  // Language-ID heuristic: stopword-hit ratio (lexicon-join pattern).
  private val langidQ = (s: SparkSession, dir: String) =>
    Tables.documents(s, dir)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n_stop", size(expr(
        s"filter(tk, t -> t IN (${Stopwords.map("'" + _ + "'").mkString(",")}))")))
      .withColumn("en_score", round(col("n_stop") / size(col("tk")), 6))
      .select(col("doc_id"), col("en_score"),
        when(col("en_score") >= 0.05, "en").otherwise("other").as("pred_lang"),
        col("lang"))

  private val langidSql = {
    val list = Stopwords.map("'" + _ + "'").mkString(", ")
    s"""SELECT doc_id,
       |  round(len(list_filter(string_split(text, ' '),
       |    t -> t IN ($list))) * 1.0 / len(string_split(text, ' ')), 6) AS en_score,
       |  CASE WHEN len(list_filter(string_split(text, ' '),
       |    t -> t IN ($list))) * 1.0 / len(string_split(text, ' ')) >= 0.05
       |    THEN 'en' ELSE 'other' END AS pred_lang,
       |  lang
       |FROM documents""".stripMargin
  }

  /** Truncate (not round) to 6 decimals: round-half ties resolve
    * differently across engines (HALF_UP vs half-to-even); floor of the
    * identical double is tie-free on both. */
  private def trunc6(c: org.apache.spark.sql.Column) =
    floor(c * 1000000L) / 1000000L

  // Quality scoring: length/word-shape/stopword-ratio composite.
  private val qualityQ = (s: SparkSession, dir: String) =>
    Tables.documents(s, dir)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n_tok", size(col("tk")))
      .withColumn("mean_wlen",
        trunc6((length(col("text")) - col("n_tok") + 1) / col("n_tok")))
      .withColumn("stop_ratio", trunc6(size(expr(
        s"filter(tk, t -> t IN (${Stopwords.map("'" + _ + "'").mkString(",")}))"))
        / col("n_tok")))
      .withColumn("len_ok",
        (col("n_tok") >= 20 && col("n_tok") <= 90).cast("int"))
      .withColumn("quality_score",
        trunc6(col("len_ok") * 0.5 + col("stop_ratio") * 0.25 +
          when(col("mean_wlen").between(3, 8), 0.25).otherwise(0.0)))
      .select("doc_id", "n_tok", "mean_wlen", "stop_ratio", "quality_score")

  private val qualitySql = {
    val list = Stopwords.map("'" + _ + "'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
       |m AS (SELECT doc_id, len(tk) AS n_tok,
       |  floor((length(text) - len(tk) + 1) * 1.0 / len(tk) * 1000000) / 1000000 AS mean_wlen,
       |  floor(len(list_filter(tk, x -> x IN ($list))) * 1.0 / len(tk) * 1000000) / 1000000 AS stop_ratio
       |  FROM t)
       |SELECT doc_id, n_tok, mean_wlen, stop_ratio,
       |  floor(((CASE WHEN n_tok BETWEEN 20 AND 90 THEN 1 ELSE 0 END) * 0.5
       |    + stop_ratio * 0.25
       |    + (CASE WHEN mean_wlen BETWEEN 3 AND 8 THEN 0.25 ELSE 0.0 END)) * 1000000) / 1000000
       |  AS quality_score
       |FROM m""".stripMargin
  }

  // Document fingerprint: min + max + count over md5-hashed 3-token
  // shingles (winnowing-style sketch; md5 so the oracle rebuilds it).
  private val fingerprintQ = (s: SparkSession, dir: String) =>
    Tables.documents(s, dir)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("sh", expr(
        "CASE WHEN size(tk) >= 3 THEN transform(sequence(0, size(tk) - 3), " +
          "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])) " +
          "ELSE array_repeat('', 0) END"))
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("h", conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
      .groupBy(col("doc_id"))
      .agg(min(col("h")).as("fp_min"), max(col("h")).as("fp_max"),
        countDistinct(col("h")).as("n_distinct_shingles"))

  private val fingerprintSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s FROM toks),
      |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh)
      |SELECT doc_id, min(h) AS fp_min, max(h) AS fp_max,
      |  COUNT(DISTINCT h) AS n_distinct_shingles
      |FROM h GROUP BY doc_id""".stripMargin

  // Inverted text index (reference SIT_IDX_TXT analog): term → postings.
  private val invIndexQ = (s: SparkSession, dir: String) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("n_postings"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

  private val invIndexSql =
    """SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS n_postings,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |GROUP BY term""".stripMargin

  // ------------------------------------------------------------------
  // Text-index BUILD OPTIONS (r7 verdict #6 — the reference's
  // SIT_IDX_TXT build flags surfaced as real options, each with its
  // own oracle row): ignore-case folding, unique posting collapse,
  // custom token delimiters. One parameterized builder; every option
  // is a column-expression change only, so the plan shape — explode →
  // term-keyed partial agg — and therefore the 100 TB posture of the
  // default index (token-keyed shuffles carry vocab-, not corpus-,
  // sized data) is identical at every option combination.
  //
  // The synthetic corpus is all-lowercase with single-space delimiters,
  // so the option queries first DECORATE it deterministically (even
  // doc_ids upper-cased / comma-delimited) in BOTH engines — otherwise
  // ignore-case and delimiter folding would be untested no-ops.
  // ------------------------------------------------------------------

  /** term → (df, n_postings, first/last doc) index over a tokenized
    * postings stream, with the reference's build options. */
  private def buildTextIndex(tokens: DataFrame, ignoreCase: Boolean,
      unique: Boolean): DataFrame = {
    val folded = (if (ignoreCase) tokens.withColumn("term", lower(col("term")))
                  else tokens)
      .filter(length(col("term")) > 0)
    val postings = if (unique) folded.select(col("doc_id"), col("term")).distinct()
                   else folded.select(col("doc_id"), col("term"))
    postings.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("n_postings"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  private val idxIgnoreCaseQ = (s: SparkSession, dir: String) =>
    buildTextIndex(
      Tables.documents(s, dir)
        .withColumn("t2", when(col("doc_id") % 2 === 0, upper(col("text")))
          .otherwise(col("text")))
        .select(col("doc_id"), explode(split(col("t2"), " ")).as("term")),
      ignoreCase = true, unique = false)

  private val idxIgnoreCaseSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END AS t2
      |  FROM documents),
      |t AS (SELECT doc_id, lower(unnest(string_split(t2, ' '))) AS term FROM d)
      |SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS n_postings,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM t WHERE len(term) > 0 GROUP BY term""".stripMargin

  private val idxUniqueQ = (s: SparkSession, dir: String) =>
    buildTextIndex(
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term")),
      ignoreCase = false, unique = true)

  private val idxUniqueSql =
    """WITH t0 AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |t AS (SELECT DISTINCT doc_id, term FROM t0 WHERE len(term) > 0)
      |SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS n_postings,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM t GROUP BY term""".stripMargin

  private val idxDelimsQ = (s: SparkSession, dir: String) =>
    buildTextIndex(
      Tables.documents(s, dir)
        .withColumn("t2", when(col("doc_id") % 2 === 0,
          regexp_replace(col("text"), " ", ","))
          .otherwise(col("text")))
        .select(col("doc_id"), explode(split(col("t2"), "[ ,]+")).as("term")),
      ignoreCase = false, unique = false)

  private val idxDelimsSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN replace(text, ' ', ',') ELSE text END
      |      AS t2
      |  FROM documents),
      |t AS (SELECT doc_id, unnest(string_split_regex(t2, '[ ,]+')) AS term
      |      FROM d)
      |SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS n_postings,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM t WHERE len(term) > 0 GROUP BY term""".stripMargin

  /** Index-scan analog (reference `--use-index` path, SURVEY §3.3 /
    * §2.11): answer a term lookup THROUGH the inverted index (posting
    * join) instead of a full-text scan. The oracle runs the full scan
    * (LIKE), so hash equality proves index-scan ≡ full-scan — the
    * reference's indexed-query correctness discipline. At 100 TB the
    * index path touches |postings("spark")| rows instead of the corpus.
    */
  private val searchQ = (s: SparkSession, dir: String) => {
    val docs = Tables.documents(s, dir)
    val postings = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") === "spark")
      .select("doc_id").distinct()
    docs.join(postings, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  private val searchSql =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE ' ' || text || ' ' LIKE '% spark %'""".stripMargin

  /** Bigram collocations by LIFT — n·c(ab) / (c(a)·c(b)), the
    * monotone transform of PMI that needs NO logarithm (log/ln differ
    * across libms in the last ulp; a rational score from exact integer
    * counts is one deterministic double division). Candidates are
    * min-support-gated (c(ab) ≥ 5) BEFORE the unigram joins, so the
    * join input is the interesting-pair list, not the corpus bigram
    * space; unigram counts broadcast back. Top-20 by (lift, pair). */
  private val collocationQ = (s: SparkSession, dir: String) => {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nTotal = toks.select(explode(col("tk")).as("w"))
      .agg(count(lit(1)).as("n"))
    // guard: Spark's sequence(0, -1) DESCENDS for a 1-token doc
    val bi = toks.filter(size(col("tk")) >= 2)
      .select(col("tk"), explode(expr("sequence(0, size(tk) - 2)")).as("i"))
      .select(expr("tk[i]").as("a"), expr("tk[i+1]").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 5)
    bi.join(broadcast(uni.withColumnRenamed("w", "a")
        .withColumnRenamed("c", "ca")), Seq("a"))
      .join(broadcast(uni.withColumnRenamed("w", "b")
        .withColumnRenamed("c", "cb")), Seq("b"))
      .crossJoin(broadcast(nTotal))
      .select(col("a"), col("b"), col("cab"),
        (col("n") * col("cab") / (col("ca") * col("cb"))).as("lift"))
      .orderBy(col("lift").desc, col("a").asc, col("b").asc)
      .limit(20)
  }

  private val collocationSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |uni AS (
      |  SELECT w, COUNT(*) AS c FROM (
      |    SELECT unnest(tk) AS w FROM toks) GROUP BY 1),
      |tot AS (SELECT CAST(SUM(CAST(c AS DECIMAL(18,0))) AS BIGINT) AS n
      |        FROM uni),
      |bi AS (
      |  SELECT a, b, COUNT(*) AS cab FROM (
      |    SELECT unnest(list_transform(range(1, len(tk)),
      |      i -> struct_pack(a := tk[i], b := tk[i+1])), recursive := true)
      |    FROM toks) g
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
      |SELECT bi.a, bi.b, bi.cab,
      |  tot.n * bi.cab / (ua.c * ub.c) AS lift
      |FROM bi
      |JOIN uni ua ON bi.a = ua.w
      |JOIN uni ub ON bi.b = ub.w, tot
      |ORDER BY lift DESC, bi.a ASC, bi.b ASC
      |LIMIT 20""".stripMargin

  /** Trigram-index substring search — the index that accelerates
    * arbitrary `LIKE '%pat%'` (pg_trgm's trick): a doc can contain the
    * pattern only if it contains EVERY 3-char gram of the pattern, so
    * candidates come from an equi-join of the pattern's grams against
    * the (gram, doc) posting list with an all-grams count gate, and
    * only candidates pay the verifying `contains`. The posting build
    * is the one corpus-scale pass (an ingest-time index in production
    * — the same stored-table upgrade q_text_bm25_indexed demonstrates
    * for term postings); query cost ∝ posting lists of 8 grams.
    * Oracle: the full LIKE scan — index == scan by construction. */
  private val TrigramPattern = "table scan"

  private val trigramLikeQ = (s: SparkSession, dir: String) => {
    val grams = TrigramPattern.sliding(3).toSeq.distinct
    val docs = Tables.documents(s, dir)
    val postings = docs
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, length(text) - 2)")).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 3)").as("g"))
      .filter(col("g").isin(grams: _*))
      .distinct()
    val cands = postings.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ng"))
      .filter(col("ng") === grams.length)
    docs.join(cands, Seq("doc_id"), "left_semi")
      .filter(col("text").contains(TrigramPattern))
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  private val trigramLikeSql =
    s"""SELECT doc_id, source, n_chars FROM documents
       |WHERE text LIKE '%$TrigramPattern%'""".stripMargin

  /** Sentiment scoring via lexicon join (the EDBT 2016 Spark-sentiment
    * pattern [local: PAPERS.md:8]): explode tokens, equi-join a tiny
    * polarity lexicon (broadcast — lexicons are KBs even in production),
    * sum polarities per doc, left-join back so unscored docs keep 0.
    * 100 TB posture: one map-side broadcast join + one doc_id-keyed
    * shuffle whose input is only the lexicon hits, not the corpus.
    */
  private val Lexicon = Seq("fast" -> 1, "big" -> 1, "slow" -> -1, "small" -> -1)

  private val sentimentQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    val lex = Lexicon.toDF("term", "pol")
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(lex), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("pol")).as("s"), count(lit(1)).as("h"))
    Tables.documents(s, dir).select("doc_id")
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("s"), lit(0L)).as("sentiment"),
        coalesce(col("h"), lit(0L)).as("lex_hits"))
  }

  private val sentimentSql =
    """WITH lex(term, pol) AS (VALUES ('fast',1),('big',1),('slow',-1),('small',-1)),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |sc AS (SELECT doc_id, SUM(pol) AS s, COUNT(*) AS h
      |       FROM toks JOIN lex USING(term) GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(s, 0) AS BIGINT) AS sentiment,
      |  CAST(coalesce(h, 0) AS BIGINT) AS lex_hits
      |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin

  /** Sequence packing — group documents into fixed-token-budget bins
    * (the batch-construction pass of an LLM training pipeline). Docs
    * are ordered by content hash WITHIN a hash-prefix shard, a running
    * token count assigns each doc to the bin where it starts
    * (streaming-fill packing: a bin may overflow by at most one doc,
    * the standard trade for a single-pass plan). The shard key keeps
    * the window PARTITIONED — 16-way parallel here, any width at
    * 100 TB — so no global sort ever happens; per-shard packing is the
    * same plan a 1000-executor run uses. */
  private val packQ = (s: SparkSession, dir: String) => {
    val budget = 512.0
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("hk"))
      .withColumn("shard", substring(col("hk"), 1, 1))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("n_tokens")) / budget).cast("long"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
  }

  private val packSql =
    """WITH t AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS hk
      |  FROM documents),
      |sh AS (SELECT *, substr(hk, 1, 1) AS shard FROM t),
      |c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY shard
      |        ORDER BY hk, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM sh)
      |SELECT shard, CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      |FROM c GROUP BY 1, 2""".stripMargin

  /** Context-window chunking — split each document into fixed-size
    * token windows with 50% overlap (the RAG / pretraining chunking
    * pass). One explode per doc (≤ n/stride chunks), slice per chunk —
    * all map-side except nothing: zero shuffles, scan-speed. */
  private val chunkQ = (s: SparkSession, dir: String) => {
    val ChunkSize = 64
    val Stride = 32
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .withColumn("start",
        explode(sequence(lit(0), size(col("tk")) - 1, lit(Stride))))
      .withColumn("chunk", slice(col("tk"), col("start") + 1, lit(ChunkSize)))
      .select(col("doc_id"),
        (col("start") / Stride).cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        element_at(col("chunk"), 1).as("first_token"))
  }

  private val chunkSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |c AS (
      |  SELECT doc_id, tk, unnest(range(0, len(tk), 32)) AS start FROM t)
      |SELECT doc_id, CAST(start // 32 AS BIGINT) AS chunk_id,
      |  CAST(len(list_slice(tk, start + 1, start + 64)) AS BIGINT)
      |    AS chunk_tokens,
      |  list_slice(tk, start + 1, start + 64)[1] AS first_token
      |FROM c""".stripMargin

  /** Vocabulary truncation + OOV rate — build the top-K token
    * vocabulary (frequency-ranked, ties broken lexically so the cut is
    * deterministic in both engines), broadcast it back, and score every
    * document's out-of-vocabulary rate. The tokenizer-prep shape: at
    * 100 TB the vocab build is partial-agg + TakeOrdered (K rows to the
    * driver), the scoring join is a broadcast — corpus never shuffles
    * except the per-doc aggregate. */
  private val vocabOovQ = (s: SparkSession, dir: String) => {
    val K = 20
    val tokens = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = tokens.groupBy(col("tok"))
      .agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok").asc)
      .limit(K)
      .select(col("tok"), lit(1).as("in_v"))
    tokens.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  private val vocabOovSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |vocab AS (
      |  SELECT tok FROM (
      |    SELECT tok, COUNT(*) AS f FROM tok GROUP BY tok
      |    ORDER BY f DESC, tok ASC LIMIT 20))
      |SELECT t.doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  round(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 6) AS oov_rate
      |FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
      |GROUP BY t.doc_id""".stripMargin

  /** C4-style curation gate — the composite keep/drop policy a
    * pretraining pipeline applies per document: length band, repetition
    * cap (max single-token frequency), language heuristic. First
    * failing rule becomes the drop reason (ordered CASE, so the output
    * is deterministic). Entirely per-row higher-order-function work —
    * zero shuffles, scan speed; the repetition scan is O(tokens ×
    * distinct) per doc, bounded by document length. */
  private val filterPolicyQ = (s: SparkSession, dir: String) => {
    val stopList = Stopwords.map("'" + _ + "'").mkString(",")
    Tables.documents(s, dir)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .withColumn("rep_ratio", trunc6(expr(
        "array_max(transform(array_distinct(tk), t -> size(filter(tk, x -> x = t))))")
        / col("n_tok")))
      .withColumn("en_score",
        trunc6(size(expr(s"filter(tk, t -> t IN ($stopList))")) / col("n_tok")))
      .withColumn("reason",
        when(col("n_tok") < 20, "too_short")
          .when(col("n_tok") > 90, "too_long")
          .when(col("rep_ratio") > 0.2, "repetitive")
          .when(col("en_score") < 0.05, "non_english")
          .otherwise("ok"))
      .select(col("doc_id"), col("n_tok"), col("rep_ratio"),
        col("en_score"), (col("reason") === "ok").as("keep"), col("reason"))
  }

  private val filterPolicySql = {
    val list = Stopwords.map("'" + _ + "'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |m AS (SELECT doc_id, len(tk) AS n_tok,
       |  floor(list_max(list_transform(list_distinct(tk),
       |    t -> len(list_filter(tk, x -> x = t)))) * 1.0 / len(tk) * 1000000)
       |    / 1000000 AS rep_ratio,
       |  floor(len(list_filter(tk, x -> x IN ($list))) * 1.0 / len(tk)
       |    * 1000000) / 1000000 AS en_score
       |  FROM t),
       |r AS (SELECT *, CASE WHEN n_tok < 20 THEN 'too_short'
       |                     WHEN n_tok > 90 THEN 'too_long'
       |                     WHEN rep_ratio > 0.2 THEN 'repetitive'
       |                     WHEN en_score < 0.05 THEN 'non_english'
       |                     ELSE 'ok' END AS reason FROM m)
       |SELECT doc_id, n_tok, rep_ratio, en_score, reason = 'ok' AS keep,
       |  reason
       |FROM r""".stripMargin
  }

  /** End-to-end curation pipeline — the flagship composition: C4-style
    * policy gate → exact-dup canonicalization (keep min doc_id per
    * content hash) → join to the embedding table → per-label corpus
    * stats. Every stage is an already-oracled operator; the composition
    * proves they compose (one logical plan, so Catalyst pushes the
    * policy columns down and plans the doc_id joins as one pipeline).
    * 100 TB: gate is map-only, dedup is one hash shuffle, the
    * embeddings join shuffles on the shared key — three exchanges for
    * the whole pipeline. */
  private val curateQ = (s: SparkSession, dir: String) => {
    val kept = filterPolicyQ(s, dir).filter(col("keep")).select("doc_id")
    val canonical = Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    kept.join(canonical, Seq("doc_id"))
      .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"))
  }

  private val curateSql = {
    val list = Stopwords.map("'" + _ + "'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |m AS (SELECT doc_id, len(tk) AS n_tok,
       |  floor(list_max(list_transform(list_distinct(tk),
       |    t -> len(list_filter(tk, x -> x = t)))) * 1.0 / len(tk) * 1000000)
       |    / 1000000 AS rep_ratio,
       |  floor(len(list_filter(tk, x -> x IN ($list))) * 1.0 / len(tk)
       |    * 1000000) / 1000000 AS en_score
       |  FROM t),
       |kept AS (SELECT doc_id FROM m
       |  WHERE n_tok BETWEEN 20 AND 90 AND rep_ratio <= 0.2
       |    AND en_score >= 0.05),
       |canonical AS (SELECT min(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(text))
       |SELECT label, COUNT(*) AS n_docs
       |FROM kept
       |JOIN canonical USING (doc_id)
       |JOIN embeddings ON doc_id = vec_id
       |GROUP BY label""".stripMargin
  }

  /** Character-trigram language identification + evaluation against
    * the corpus's labeled `lang` column: train per-language top-40
    * trigram profiles from the labeled text (frequency rank,
    * gram-ascending tiebreak), score each document by profile-hit
    * occurrences, predict by argmax (language-ascending tiebreak),
    * and emit the CONFUSION MATRIX — the quality gate a curation
    * pipeline runs before trusting a language filter. Every number is
    * an integer count and every tiebreak is total, so the result is
    * exact across engines.
    *
    * 100 TB posture: the trigram explode is the one corpus-sized
    * shuffle (profile build keyed (lang, gram)); the profiles
    * themselves are 5×40 rows — broadcast back — and the per-doc
    * argmax windows over ≤5 rows per doc. */
  private val langidNgramQ = (s: SparkSession, dir: String) => {
    val docs = Tables.documents(s, dir).filter(length(col("text")) >= 3)
    // r9 optimization, two rounds of measurement: (1) the original ran
    // the trigram explode TWICE (profile build + scoring join), each
    // through an interpreted transform-lambda; (2) a shared per-doc
    // gram-count checkpoint removed the double explode but introduced
    // a corpus-sized (doc, gram) exchange + materialize + re-read that
    // cost MORE than the explode it saved (OptLab: 40.8 MB exchange,
    // 2.2 + 2.0 CPU-s). Final form: keep the original two-branch shape
    // — NEITHER branch has a corpus-sized exchange (profile partials
    // collapse to vocab×langs map-side; score partials to ≤5 rows per
    // doc) — and make the explode itself codegen (positions exploded,
    // substring as a plain projection, no lambda, no array build).
    def tri = docs
      .select(col("doc_id"), col("lang"), col("text"),
        explode(expr("sequence(1, length(text) - 2)")).as("i"))
      .select(col("doc_id"), col("lang"),
        expr("substring(text, i, 3)").as("g"))
    val prof = tri.groupBy(col("lang").as("p_lang"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("p_lang"))
          .orderBy(col("cnt").desc, col("g").asc)))
      .filter(col("rk") <= 40).select(col("p_lang"), col("g"))
    val scores = tri.join(broadcast(prof), Seq("g"))
      .groupBy(col("doc_id"), col("p_lang"))
      .agg(count(lit(1)).as("score"))
    val pred = scores.withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("p_lang").asc)))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("p_lang"))
    docs.select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"), "left")
      .groupBy(col("lang"),
        coalesce(col("p_lang"), lit("und")).as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  private val langidNgramSql =
    """WITH d AS (
      |  SELECT doc_id, lang, text FROM documents WHERE length(text) >= 3),
      |tri AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(range(1, length(text) - 1),
      |      i -> substr(text, i, 3))) AS g
      |  FROM d),
      |prof AS (
      |  SELECT p_lang, g FROM (
      |    SELECT lang AS p_lang, g, COUNT(*) AS cnt,
      |      ROW_NUMBER() OVER (PARTITION BY lang
      |        ORDER BY COUNT(*) DESC, g ASC) AS rk
      |    FROM tri GROUP BY lang, g) WHERE rk <= 40),
      |sc AS (
      |  SELECT t.doc_id, p.p_lang, COUNT(*) AS score
      |  FROM tri t JOIN prof p ON t.g = p.g
      |  GROUP BY t.doc_id, p.p_lang),
      |pred AS (
      |  SELECT doc_id, p_lang FROM (
      |    SELECT doc_id, p_lang,
      |      ROW_NUMBER() OVER (PARTITION BY doc_id
      |        ORDER BY score DESC, p_lang ASC) AS rk
      |    FROM sc) WHERE rk = 1)
      |SELECT d.lang, COALESCE(p.p_lang, 'und') AS pred, COUNT(*) AS n
      |FROM d LEFT JOIN pred p ON d.doc_id = p.doc_id
      |GROUP BY 1, 2""".stripMargin

  // ---- suffix-rule stemmer + stem frequency ----------------------
  //
  // A crude, fully deterministic suffix stemmer (Porter-step-1 shape):
  // rules applied in a FIXED chain — sses→ss, ies→y, ing→∅, ed→∅,
  // then a final plural-s strip guarded to leave '…ss' intact. The
  // guard is a CASE, not a regex backreference, because replacement
  // backreference syntax differs between engines ($1 vs \1) — the
  // whole chain is engine-portable by construction. Map-only token
  // explode + one stem groupBy; top-40 with alphabetical tiebreak.
  private val stemQ = (s: SparkSession, dir: String) => {
    val words = Tables.documents(s, dir)
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")) >= 4)
    val chained = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(col("w"), "sses$", "ss"), "ies$", "y"),
      "ing$", ""), "ed$", "")
    words
      .select(when(chained.rlike("ss$"), chained)
        .otherwise(regexp_replace(chained, "s$", "")).as("stem"))
      .filter(length(col("stem")) >= 3)
      .groupBy(col("stem")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("stem").asc)
      .limit(40)
  }

  private val stemSql =
    """WITH words AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |  FROM documents),
      |chained AS (
      |  SELECT regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(w, 'sses$', 'ss'), 'ies$', 'y'),
      |    'ing$', ''), 'ed$', '') AS c
      |  FROM words WHERE length(w) >= 4),
      |stems AS (
      |  SELECT CASE WHEN regexp_matches(c, 'ss$') THEN c
      |         ELSE regexp_replace(c, 's$', '') END AS stem
      |  FROM chained)
      |SELECT stem, COUNT(*) AS n FROM stems
      |WHERE length(stem) >= 3
      |GROUP BY 1 ORDER BY n DESC, stem ASC LIMIT 40""".stripMargin

  // ---- corpus data card ------------------------------------------
  //
  // The per-(source, lang) summary a dataset release ships: volume,
  // exact-dup rate, short-doc ratio, mean length. One partial-agg
  // shuffle on the report key; the only non-algebraic term is
  // count(DISTINCT text), which Spark plans as the standard two-phase
  // expand — at 100 TB you'd swap it for approx_count_distinct or a
  // pre-hashed column, and the rest of the report is unchanged. All
  // ratios are integer-ratio → one double division → round.
  private val corpusReportQ = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir)
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_dup_texts"),
        sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"))
      .select(col("source"), col("lang"), col("n_docs"), col("total_chars"),
        round(col("total_chars") / col("n_docs"), 2).as("avg_chars"),
        col("n_dup_texts"),
        round(col("n_short") * 100.0 / col("n_docs"), 2).as("pct_short"))
  }

  private val corpusReportSql =
    """SELECT source, lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  round(CAST(SUM(n_chars) AS BIGINT) / COUNT(*), 2) AS avg_chars,
      |  COUNT(*) - COUNT(DISTINCT text) AS n_dup_texts,
      |  round(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) * 100.0
      |    / COUNT(*), 2) AS pct_short
      |FROM documents GROUP BY 1, 2""".stripMargin

  // ---- greedy bigram-LM generation --------------------------------
  //
  // The generative twin of Curation's bigram-LM scorer: train the
  // count LM (one corpus pass: array-pair explode, groupBy (src,dst)
  // with map-side partials), reduce it to the vocab-bounded argmax
  // successor table (window over the AGGREGATED table, count-major /
  // token-minor tie-break = deterministic decoding), seed with the
  // corpus's most frequent token, then walk [[GenSteps]] greedy steps.
  // Each step is a 1-row broadcast probe into the successor table —
  // the corpus is touched exactly twice (bigrams + seed), ever; a
  // dead-end token (no observed successor) simply ends the walk early
  // on both engines. The oracle unrolls the identical walk as chained
  // 1-row CTEs over the same MATERIALIZED argmax table.
  private val GenSteps = 8

  private val lmGenerateQ = (s: SparkSession, dir: String) => {
    val toks = Tables.documents(s, dir)
      .select(split(col("text"), " ").as("tk"))
    val big = toks.filter(size(col("tk")) >= 2)
      .select(col("tk"), explode(expr("sequence(0, size(tk)-2)")).as("i"))
      .select(expr("struct(tk[i] AS src, tk[i+1] AS dst)").as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
    val bw = Window.partitionBy(col("src"))
      .orderBy(col("c").desc, col("dst").asc)
    val best = big.withColumn("rn", row_number().over(bw))
      .filter(col("rn") === 1).select(col("src"), col("dst"))
      .localCheckpoint()
    val seed = toks.select(explode(col("tk")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tc"))
      .orderBy(col("tc").desc, col("tok").asc).limit(1)
    var cur = seed.select(lit(0).as("step"), col("tok"))
    var walk = cur
    for (st <- 1 to GenSteps) {
      cur = broadcast(cur).join(best, cur("tok") === best("src"))
        .select(lit(st).as("step"), col("dst").as("tok"))
        .localCheckpoint()
      walk = walk.unionAll(cur)
    }
    walk
  }

  private def lmGenerateSql: String = {
    def step(n: Int): String =
      s"""g${n + 1} AS (
         |  SELECT ${n + 1} AS step, b.dst AS tok
         |  FROM g$n JOIN best b ON b.src = g$n.tok)""".stripMargin
    s"""WITH toks AS MATERIALIZED (
       |  SELECT string_split(text, ' ') AS tk FROM documents),
       |big AS MATERIALIZED (
       |  SELECT p.src AS src, p.dst AS dst, COUNT(*) AS c FROM (
       |    SELECT unnest(list_transform(range(1, len(tk)),
       |      i -> {'src': tk[i], 'dst': tk[i+1]})) AS p
       |    FROM toks) GROUP BY 1, 2),
       |best AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (
       |      PARTITION BY src ORDER BY c DESC, dst ASC) AS rn
       |    FROM big) WHERE rn = 1),
       |seed AS (
       |  SELECT tok FROM (SELECT unnest(tk) AS tok FROM toks)
       |  GROUP BY tok ORDER BY COUNT(*) DESC, tok ASC LIMIT 1),
       |g0 AS (SELECT 0 AS step, tok FROM seed),
       |${(0 until GenSteps).map(step).mkString(",\n")}
       |${(0 to GenSteps).map(n => s"SELECT step, tok FROM g$n")
        .mkString("\nUNION ALL\n")}"""
      .stripMargin
  }

  // ---- KWIC concordance -------------------------------------------
  //
  // Keyword-in-context: every occurrence of the target token with its
  // ±2-token context window — the corpus-linguistics view a curator
  // uses to audit how a term is actually used before writing filter
  // rules about it. Pure map-side array work (posexplode + slice);
  // output is bounded by the term's frequency, and the only exchange
  // is the driver-side collect of those rows. Positions are 0-based
  // on both engines.
  private val KwicTerm = "spark"

  private val kwicQ = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(col("tk")).as(Seq("pos", "tok")))
      .filter(col("tok") === KwicTerm)
      .select(col("doc_id"), col("pos"),
        expr("array_join(slice(tk, greatest(pos - 2, 0) + 1, " +
          "least(pos + 2, size(tk) - 1) - greatest(pos - 2, 0) + 1), ' ')")
          .as("context"))
  }

  private val kwicSql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |hits AS (
       |  SELECT doc_id, t.i - 1 AS pos, tk
       |  FROM toks, LATERAL unnest(generate_series(1, len(tk))) AS t(i)
       |  WHERE tk[t.i] = '$KwicTerm')
       |SELECT doc_id, pos,
       |  array_to_string(tk[greatest(pos - 1, 1): least(pos + 3, len(tk))],
       |    ' ') AS context
       |FROM hits""".stripMargin

  // ---- windowed co-occurrence -------------------------------------
  //
  // GloVe-style counting: unordered token pairs co-occurring within a
  // ±3 window, min-support 10, top-20 by count — the statistic word-
  // vector training and collocation mining both start from. The pair
  // fan-out is MAP-SIDE array comprehension (each position emits ≤3
  // pairs — linear in corpus length, never a self-join), followed by
  // one count exchange with map-side partials and a top-k heap merge.
  private val cooccurQ = (s: SparkSession, dir: String) => {
    // r9: positional double explode + codegen projections — the
    // flatten/transform/filter lambda nest evaluated interpreted per
    // (position x offset); same pair multiset (i + d < size guard).
    Tables.documents(s, dir)
      .select(split(col("text"), " ").as("tk"))
      .select(col("tk"), explode(expr("sequence(0, size(tk) - 1)")).as("i"))
      .select(col("tk"), col("i"), explode(expr("sequence(1, 3)")).as("d"))
      .filter(expr("i + d < size(tk) AND i >= 0"))
      .select(expr("least(tk[i], tk[i+d])").as("w1"),
        expr("greatest(tk[i], tk[i+d])").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 10)
      .orderBy(col("c").desc, col("w1").asc, col("w2").asc)
      .limit(20)
  }

  private val cooccurSql =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS tk FROM documents),
      |pairs AS (
      |  SELECT unnest(flatten(list_transform(range(1, len(tk) + 1), i ->
      |    list_filter(list_transform([1, 2, 3], d ->
      |      CASE WHEN i + d <= len(tk)
      |      THEN {'w1': least(tk[i], tk[i+d]),
      |            'w2': greatest(tk[i], tk[i+d])}
      |      ELSE NULL END), x -> x IS NOT NULL)))) AS p
      |  FROM toks)
      |SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c
      |FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 10
      |ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 20""".stripMargin

  // ---- feature hashing (the hashing trick) ------------------------
  //
  // The fixed-width featurizer linear models train on at corpus scale
  // (Vowpal-Wabbit style): every token hashes into one of 64 buckets
  // (md5-derived — the oracle rebuilds the identical hash), with the
  // next hash bit supplying the ±1 sign that unbiases collisions.
  // Pure map-side hashing + one count exchange with map-side partials;
  // projected to 3 docs here, the full corpus featurization is the
  // same plan. No vocabulary, no fit step — the point of the trick.
  private val FhBuckets = 64

  private val featHashQ = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir).filter(col("doc_id") < 3)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      .withColumn("bucket", col("h") % FhBuckets)
      .withColumn("sign",
        when(expr(s"(h div $FhBuckets) % 2") === 0L, 1L).otherwise(-1L))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col("sign")).as("val_signed"))
  }

  private val featHashSql =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents WHERE doc_id < 3),
       |h AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
       |  FROM t)
       |SELECT doc_id, h % $FhBuckets AS bucket, COUNT(*) AS cnt,
       |  CAST(SUM(CASE WHEN (h // $FhBuckets) % 2 = 0 THEN 1 ELSE -1 END)
       |    AS BIGINT) AS val_signed
       |FROM h GROUP BY 1, 2""".stripMargin

  // ---- T5-style span corruption -----------------------------------
  //
  // The denoising-objective pair constructor: ~20% of tokens are
  // selected by a CONTENT hash (md5(doc:pos) — reproducible across
  // runs, partitionings and engines; never rand()), adjacent picks
  // merge into spans (gaps-and-islands on the masked subset), and each
  // doc yields the (input, target) pair T5 trains on — input with each
  // span collapsed to its <extra_id_N> sentinel, target with the
  // sentinel-prefixed span contents. One token explode, two windows
  // keyed on doc_id, two ordered string rollups — every exchange is
  // keyed on the doc, so the plan is embarrassingly parallel over the
  // corpus (projected to 5 docs here; the full corpus is the same
  // plan).
  private val spanCorruptQ = (s: SparkSession, dir: String) => {
    val toks = Tables.documents(s, dir).filter(col("doc_id") < 5)
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "tok")))
      .withColumn("masked",
        conv(substring(md5(concat_ws(":", col("doc_id").cast("string"),
          col("pos").cast("string"))), 1, 8), 16, 10).cast("long") % 5 === 0)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = toks.withColumn("cummask",
        sum(when(col("masked"), 1L).otherwise(0L)).over(wDoc))
      .withColumn("grp", when(col("masked"), col("pos") - col("cummask")))
    val spans = marked.filter(col("masked"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start"))
      .withColumn("idx", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("start").asc)) - 1)
    val joined = marked.join(spans, Seq("doc_id", "grp"), "left")
    def rollup(df: DataFrame, outCol: String): DataFrame =
      df.groupBy(col("doc_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("piece")))),
          x => x.getField("piece")), " ").as(outCol))
    val sentinel = concat(lit("<extra_id_"), col("idx").cast("string"), lit(">"))
    val input = rollup(joined.withColumn("piece",
      when(!col("masked"), col("tok"))
        .when(col("pos") === col("start"), sentinel))
      .filter(col("piece").isNotNull), "input_text")
    val target = joined.filter(col("masked"))
      .withColumn("piece",
        when(col("pos") === col("start"),
          concat(sentinel, lit(" "), col("tok"))).otherwise(col("tok")))
    val targetAgg = rollup(target, "target_text")
      .join(target.groupBy(col("doc_id"))
        .agg(countDistinct(col("grp")).as("n_spans")), Seq("doc_id"))
    input.join(targetAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        col("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"))
  }

  private val spanCorruptSql =
    """WITH toks AS (
      |  SELECT doc_id, t.i - 1 AS pos, tk[t.i] AS tok,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
      |      CAST(t.i - 1 AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0 AS masked
      |  FROM (SELECT doc_id, string_split(text, ' ') AS tk
      |        FROM documents WHERE doc_id < 5),
      |    LATERAL unnest(generate_series(1, len(tk))) AS t(i)),
      |marked AS (
      |  SELECT *,
      |    CASE WHEN masked THEN pos - CAST(SUM(CASE WHEN masked THEN 1
      |      ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    END AS grp
      |  FROM toks),
      |spans AS (
      |  SELECT doc_id, grp, MIN(pos) AS start,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY MIN(pos) ASC) AS INTEGER) - 1 AS idx
      |  FROM marked WHERE masked GROUP BY 1, 2),
      |j AS (
      |  SELECT m.*, s.start, s.idx
      |  FROM marked m LEFT JOIN spans s
      |    ON m.doc_id = s.doc_id AND m.grp = s.grp),
      |input AS (
      |  SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS input_text
      |  FROM (SELECT doc_id, pos,
      |          CASE WHEN NOT masked THEN tok
      |            WHEN pos = start THEN
      |              '<extra_id_' || CAST(idx AS VARCHAR) || '>'
      |          END AS piece
      |        FROM j)
      |  WHERE piece IS NOT NULL GROUP BY 1),
      |tgt AS (
      |  SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS target_text,
      |    COUNT(DISTINCT grp) AS n_spans
      |  FROM (SELECT doc_id, pos, grp,
      |          CASE WHEN pos = start THEN
      |            '<extra_id_' || CAST(idx AS VARCHAR) || '> ' || tok
      |          ELSE tok END AS piece
      |        FROM j WHERE masked)
      |  GROUP BY 1)
      |SELECT i.doc_id, COALESCE(t.n_spans, 0) AS n_spans,
      |  i.input_text, COALESCE(t.target_text, '') AS target_text
      |FROM input i LEFT JOIN tgt t ON i.doc_id = t.doc_id""".stripMargin

  /** Flesch-style readability scoring — the classic corpus-quality
    * signal beside [[qualityQ]]'s ratio gates: per document, words
    * (the corpus token regex), sentences (maximal [.!?]+ runs, floor
    * 1) and syllables (maximal vowel-group runs — the standard
    * regex-only heuristic), then the Flesch reading-ease formula kept
    * ENTIRELY in integer micro-units: 206.835 − 1.015·(W/S) −
    * 84.6·(SY/W) becomes 206835000 − (1015000·W) div S −
    * (84600000·SY) div W — floor division, identical in both engines,
    * no float anywhere. Rolled up per (lang, band) so the output is
    * the curation-policy view: how much of each language's corpus is
    * easy/medium/hard.
    *
    * 100 TB posture: three map-side regex counts + one low-cardinality
    * partial-agg shuffle — embarrassingly parallel over the corpus. */
  private val readabilityQ = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0)"))
          .cast("long").as("n_words"),
        greatest(lit(1L),
          size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"))
          .as("n_sentences"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast("long").as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("flesch_micro",
        lit(206835000L)
          - expr("(1015000 * n_words) div n_sentences")
          - expr("(84600000 * n_syllables) div n_words"))
      .withColumn("band",
        when(col("flesch_micro") >= 60000000L, "easy")
          .when(col("flesch_micro") >= 30000000L, "medium")
          .otherwise("hard"))
      .groupBy(col("lang"), col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("flesch_micro")).as("sum_flesch_micro"),
        min(col("flesch_micro")).as("min_flesch_micro"),
        max(col("flesch_micro")).as("max_flesch_micro"))
  }

  private val readabilitySql =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS n_words,
      |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
      |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      |  FROM documents),
      |f AS (
      |  SELECT lang,
      |    206835000 - (1015000 * n_words) // n_sentences
      |      - (84600000 * n_syllables) // n_words AS flesch_micro
      |  FROM d WHERE n_words > 0)
      |SELECT lang,
      |  CASE WHEN flesch_micro >= 60000000 THEN 'easy'
      |       WHEN flesch_micro >= 30000000 THEN 'medium'
      |       ELSE 'hard' END AS band,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(flesch_micro) AS BIGINT) AS sum_flesch_micro,
      |  MIN(flesch_micro) AS min_flesch_micro,
      |  MAX(flesch_micro) AS max_flesch_micro
      |FROM f GROUP BY 1, 2""".stripMargin

  /** N-gram novelty scoring — the training-data diversity gate beside
    * the dedup family: for each document, the share of its DISTINCT
    * 3-gram shingles that appear in NO earlier document (first
    * occurrence = min doc_id over the corpus — ingestion order). Low
    * novelty = the document is mostly recombined boilerplate even when
    * no single source passes a pairwise dedup threshold; the curation
    * policy reads `novelty_micro` exactly like q_text_quality's
    * ratios. Integer-exact: counts and a floor-div micro ratio.
    *
    * 100 TB posture: one gram exchange for the distinct, one for the
    * global first-occurrence map, one doc-keyed rollup — fan-out is
    * bounded by gram df exactly as in the jaccard inverted index.
    *
    * The rollup needs NO gram-keyed join (the r8 sf10 tier caught the
    * original `grams ⋈ first` — a corpus×corpus sort-merge join on
    * ~30-byte string keys whose per-task sort spills once the fixture
    * outgrows the fixed local shuffle width: 131→1 874 CPU-s for the
    * sf1→sf10 decade, ~14× per 10× data). A gram's min-doc row already
    * says which single document earns the novel count, so per-doc
    * novel counts are a doc-keyed aggregate OF `first` itself, and
    * per-doc gram counts a doc-keyed aggregate of `grams` — the only
    * join left is doc-cardinality ⋈ doc-cardinality on a LONG key. */
  private val noveltyQ = (s: SparkSession, dir: String) => {
    // shared corpus shingle edge list (see boilerplateQ note)
    val grams = graft.operators.Dedup.sharedShingleEdges(s, dir)
      .withColumnRenamed("s", "g")
    val perDoc = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val novel = grams.groupBy(col("g"))
      .agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, perDoc("doc_id") === novel("first_doc"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_micro",
        expr("(1000000 * n_novel) div n_grams"))
  }

  private val noveltySql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk
      |             FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
      |       FROM toks),
      |d AS (SELECT DISTINCT doc_id, g FROM sh),
      |f AS (SELECT g, min(doc_id) AS first_doc FROM d GROUP BY 1)
      |SELECT d.doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_novel,
      |  (1000000 * CAST(SUM(CASE WHEN f.first_doc = d.doc_id
      |     THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*) AS novelty_micro
      |FROM d JOIN f ON d.g = f.g
      |GROUP BY 1""".stripMargin

  /** Preference-pair construction (the DPO/RLHF data op): within each
    * (lang, source) bucket, pair the HIGHEST-quality document as
    * `chosen` against the LOWEST as `rejected` — quality is an
    * integer-micro twin of [[qualityQ]]'s score (length gate ×500k +
    * stopword-mass ×250k + word-length gate ×250k, all floor-div
    * rationals), ties broken to the smaller doc_id on both ends, and
    * buckets emit only when the gap is strictly positive (a pair with
    * no preference signal is worthless to the trainer).
    *
    * 100 TB posture: scoring is map-side; the argmax/argmin collapse
    * is one partial-agg shuffle of struct-ordered extrema per bucket —
    * never a sort, never a window over the corpus. */
  private val preferencePairsQ = (s: SparkSession, dir: String) => {
    val list = Stopwords.map("'" + _ + "'").mkString(",")
    val scored = Tables.documents(s, dir)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .withColumn("stop_n",
        size(expr(s"filter(tk, t -> t IN ($list))")).cast("long"))
      .withColumn("wlen10",
        expr("(10 * (length(text) - n_tok + 1)) div n_tok"))
      .withColumn("score_micro",
        when(col("n_tok").between(20L, 90L), 500000L).otherwise(0L)
          + expr("(250000 * stop_n) div n_tok")
          + when(col("wlen10").between(30L, 80L), 250000L).otherwise(0L))
    scored.groupBy(col("lang"), col("source"))
      .agg(
        max(struct(col("score_micro"), (-col("doc_id")).as("nd")))
          .as("hi"),
        min(struct(col("score_micro"), col("doc_id"))).as("lo"),
        count(lit(1)).as("n_docs"))
      .select(col("lang"), col("source"), col("n_docs"),
        (-col("hi.nd")).as("chosen_doc"),
        col("hi.score_micro").as("chosen_score"),
        col("lo.doc_id").as("rejected_doc"),
        col("lo.score_micro").as("rejected_score"))
      .withColumn("gap",
        col("chosen_score") - col("rejected_score"))
      .filter(col("gap") > 0)
  }

  private val preferencePairsSql = {
    val list = Stopwords.map("'" + _ + "'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id, lang, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      x -> x IN ($list))) AS BIGINT) AS stop_n,
       |    length(text) AS n_ch
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id, lang, source,
       |    (CASE WHEN n_tok BETWEEN 20 AND 90 THEN 500000 ELSE 0 END)
       |    + (250000 * stop_n) // n_tok
       |    + (CASE WHEN (10 * (n_ch - n_tok + 1)) // n_tok
       |        BETWEEN 30 AND 80 THEN 250000 ELSE 0 END) AS score_micro
       |  FROM m),
       |r AS (
       |  SELECT lang, source, doc_id, score_micro,
       |    row_number() OVER (PARTITION BY lang, source
       |      ORDER BY score_micro DESC, doc_id ASC) AS rh,
       |    row_number() OVER (PARTITION BY lang, source
       |      ORDER BY score_micro ASC, doc_id ASC) AS rl,
       |    COUNT(*) OVER (PARTITION BY lang, source) AS n_docs
       |  FROM sc)
       |SELECT h.lang, h.source, h.n_docs,
       |  h.doc_id AS chosen_doc, h.score_micro AS chosen_score,
       |  l.doc_id AS rejected_doc, l.score_micro AS rejected_score,
       |  h.score_micro - l.score_micro AS gap
       |FROM (SELECT * FROM r WHERE rh = 1) h
       |JOIN (SELECT * FROM r WHERE rl = 1) l
       |  ON h.lang = l.lang AND h.source = l.source
       |WHERE h.score_micro - l.score_micro > 0""".stripMargin
  }

  /** Extractive summarization (TextRank degree form): split each
    * document into 10-token chunks, score every chunk by its
    * token-overlap centrality — Σ over sibling chunks of
    * |distinct-tokens ∩ distinct-tokens| (the degree row of the
    * TextRank similarity graph; integer, so the ranking can never
    * diverge) — and keep the top-2 chunks per document as its
    * summary, earliest-chunk tie-break. The fixture corpus carries no
    * sentence punctuation, so fixed-width chunks are the honest
    * sentence analog (same contract as q_text_chunk).
    *
    * 100 TB posture: everything keys on doc_id — the overlap self-join
    * fans out per (doc, token) by within-doc chunk count only; no
    * cross-document edge exists anywhere in the plan. */
  private val extractiveSummaryQ = (s: SparkSession, dir: String) => {
    val chunks = Tables.documents(s, dir)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("ci", explode(expr(
        "sequence(0, (size(tk) - 1) div 10)")))
      .select(col("doc_id"), col("ci"),
        expr("slice(tk, ci * 10 + 1, 10)").as("ctk"))
    val toks = chunks
      .select(col("doc_id"), col("ci"), explode(col("ctk")).as("t"))
      .distinct()
    val overlap = toks
      .join(toks.select(col("doc_id"), col("ci").as("cj"), col("t")),
        Seq("doc_id", "t"))
      .filter(col("ci") =!= col("cj"))
      .groupBy(col("doc_id"), col("ci"))
      .agg(count(lit(1)).as("centrality"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("centrality").desc, col("ci").asc)
    overlap.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .join(chunks, Seq("doc_id", "ci"))
      .select(col("doc_id"), col("rnk"), col("ci").as("chunk_idx"),
        col("centrality"), array_join(col("ctk"), " ").as("summary_chunk"))
  }

  private val extractiveSummarySql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |chunks AS (
      |  SELECT doc_id, i AS ci, tk[i * 10 + 1 : i * 10 + 10] AS ctk
      |  FROM toks CROSS JOIN
      |    unnest(range(0, (len(tk) - 1) // 10 + 1)) AS t(i)),
      |ct AS (
      |  SELECT DISTINCT doc_id, ci, unnest(ctk) AS t FROM chunks),
      |ov AS (
      |  SELECT a.doc_id, a.ci, COUNT(*) AS centrality
      |  FROM ct a JOIN ct b
      |    ON a.doc_id = b.doc_id AND a.t = b.t AND a.ci <> b.ci
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT doc_id, ci, centrality, row_number() OVER (
      |    PARTITION BY doc_id
      |    ORDER BY centrality DESC, ci ASC) AS rnk
      |  FROM ov)
      |SELECT r.doc_id, r.rnk, r.ci AS chunk_idx, r.centrality,
      |  array_to_string(c.ctk, ' ') AS summary_chunk
      |FROM r JOIN chunks c ON r.doc_id = c.doc_id AND r.ci = c.ci
      |WHERE r.rnk <= 2""".stripMargin

  /** Boilerplate detection (the CCNet-adjacent signal [[noveltyQ]]
    * doesn't carry): a gram is BOILERPLATE when it appears in ≥ 3
    * distinct documents; each document reports the fraction of its
    * distinct 3-grams that are boilerplate (floor-div micro) and the
    * `is_template` flag above 80% — the menus/footers/license-header
    * class that survives pairwise dedup because no two pages are
    * similar ENOUGH, yet the corpus is saturated with the same lines.
    *
    * 100 TB posture: same inverted-gram discipline as novelty — one
    * distinct, one df map keyed on the gram, one doc rollup. */
  private val boilerplateQ = (s: SparkSession, dir: String) => {
    // the corpus (doc, gram) edge list is the SAME distinct-shingle
    // table the dedup family maintains - read the explicit shared
    // cache instead of rebuilding it (see Dedup.sharedShingleEdges:
    // this query used to hit that cache only by canonical-plan luck)
    val grams = graft.operators.Dedup.sharedShingleEdges(s, dir)
      .withColumnRenamed("s", "g")
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    grams.join(df, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") >= 3L, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_micro", expr("(1000000 * n_boiler) div n_grams"))
      .withColumn("is_template", expr("5 * n_boiler > 4 * n_grams"))
  }

  private val boilerplateSql =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk
      |             FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
      |       FROM toks),
      |d AS (SELECT DISTINCT doc_id, g FROM sh),
      |f AS (SELECT g, COUNT(*) AS gdf FROM d GROUP BY 1)
      |SELECT d.doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN f.gdf >= 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_boiler,
      |  (1000000 * CAST(SUM(CASE WHEN f.gdf >= 3 THEN 1 ELSE 0 END)
      |    AS BIGINT)) // COUNT(*) AS boiler_micro,
      |  (5 * CAST(SUM(CASE WHEN f.gdf >= 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    > 4 * COUNT(*)) AS is_template
      |FROM d JOIN f ON d.g = f.g
      |GROUP BY 1""".stripMargin

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases
    * are the maximal stopword-free token runs; a word's degree is the
    * summed length of every phrase occurrence containing it, its
    * score deg/freq in floor-div micro. Top 15 corpus keywords,
    * ties broken by word.
    *
    * 100 TB posture: phrase segmentation is a per-doc position window
    * (doc-keyed — co-partitioned with the explode); the word rollup
    * is one |vocab|-key shuffle; top-15 is a TakeOrdered merge. */
  private val rakeStop = Seq("a", "the", "of", "and", "in", "to", "is")

  private val rakeQ = (s: SparkSession, dir: String) => {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("is_stop", col("w").isin(rakeStop: _*))
    val run = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phrWords = toks
      .withColumn("pid",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(run))
      .filter(!col("is_stop"))
    val plen = Window.partitionBy(col("doc_id"), col("pid"))
    phrWords
      .withColumn("plen", count(lit(1)).over(plen))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      .withColumn("score_micro", expr("(1000000 * degree) div freq"))
      .orderBy(col("score_micro").desc, col("w").asc)
      .limit(15)
  }

  private val rakeSql = {
    val stops = rakeStop.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |pos AS (
       |  SELECT doc_id, i AS pos, tk[i] AS w,
       |    tk[i] IN ($stops) AS is_stop
       |  FROM toks CROSS JOIN unnest(range(1, len(tk) + 1)) AS t(i)),
       |seg AS (
       |  SELECT doc_id, pos, w, is_stop,
       |    CAST(SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS pid
       |  FROM pos),
       |pw AS (
       |  SELECT doc_id, pid, w,
       |    COUNT(*) OVER (PARTITION BY doc_id, pid) AS plen
       |  FROM seg WHERE NOT is_stop)
       |SELECT w, COUNT(*) AS freq,
       |  CAST(SUM(plen) AS BIGINT) AS degree,
       |  (1000000 * CAST(SUM(plen) AS BIGINT)) // COUNT(*)
       |    AS score_micro
       |FROM pw GROUP BY 1
       |ORDER BY score_micro DESC, w ASC
       |LIMIT 15""".stripMargin
  }

  /** Lexical richness — type-token ratio and hapax legomena per
    * document: n_tokens, n_types (distinct), n_hapax (tokens used
    * exactly once IN the doc), ttr and hapax share in floor-div
    * micro. The complement to [[qualityQ]]'s surface ratios: a
    * low-TTR doc is repetitive even when its punctuation/stopword
    * profile looks clean.
    *
    * 100 TB posture: one (doc, token) partial-count shuffle, one
    * doc rollup — both doc-keyed. */
  private val ttrQ = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr_micro", expr("(1000000 * n_types) div n_tokens"))
      .withColumn("hapax_micro", expr("(1000000 * n_hapax) div n_types"))
  }

  private val ttrSql =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_types,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_hapax,
      |  (1000000 * COUNT(*)) // CAST(SUM(c) AS BIGINT) AS ttr_micro,
      |  (1000000 * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT)) // COUNT(*) AS hapax_micro
      |FROM c GROUP BY 1""".stripMargin

  /** Term burstiness — the index of dispersion D = var/mean of a
    * term's per-document counts over ALL docs (zeros included; they
    * cost nothing: D = (N·Σc² − tot²)/(N·tot) needs only the non-zero
    * postings). D ≈ 1 is Poisson scatter; D ≫ 1 marks content-bearing
    * bursty terms, the classic Church-Gale signal tf-idf's df alone
    * misses. Top-20 corpus terms reported, ties by term.
    *
    * 100 TB posture: one (doc, term) partial-count shuffle, one
    * term rollup, a 1-row doc-count broadcast; top-20 TakeOrdered. */
  private val burstinessQ = (s: SparkSession, dir: String) => {
    val counts = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("nd"))
    counts.groupBy(col("w"))
      .agg(sum(col("c")).as("tot"), count(lit(1)).as("df"),
        sum(col("c") * col("c")).as("s2"))
      .crossJoin(broadcast(nDocs))
      .withColumn("d_micro", expr(
        "(1000000 * (nd * s2 - tot * tot)) div (nd * tot)"))
      .withColumn("bursty", col("d_micro") > 1000000L)
      .select("w", "tot", "df", "d_micro", "bursty")
      .orderBy(col("tot").desc, col("w").asc)
      .limit(20)
  }

  private val burstinessSql =
    """WITH c AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |pc AS (SELECT doc_id, w, COUNT(*) AS c FROM c GROUP BY 1, 2),
      |nd AS (SELECT COUNT(*) AS nd FROM documents),
      |t AS (
      |  SELECT w, CAST(SUM(c) AS BIGINT) AS tot, COUNT(*) AS df,
      |    CAST(SUM(c * c) AS BIGINT) AS s2
      |  FROM pc GROUP BY 1)
      |SELECT w, tot, df,
      |  (1000000 * (nd.nd * s2 - tot * tot)) // (nd.nd * tot)
      |    AS d_micro,
      |  (1000000 * (nd.nd * s2 - tot * tot)) // (nd.nd * tot) > 1000000
      |    AS bursty
      |FROM t, nd
      |ORDER BY tot DESC, w ASC
      |LIMIT 20""".stripMargin

  /** Encoding-integrity audit per source — the mojibake/corruption
    * gate a crawl-scale training-data acquisition runs before
    * anything downstream trusts the bytes: documents containing
    * U+FFFD replacement characters (a decoder already gave up),
    * documents containing C0 control characters (binary leakage;
    * tab/LF/CR exempt), and the per-source non-ASCII character share
    * (a spike against the source's declared-language baseline is the
    * classic double-encoding signature). On the clean fixture corpus
    * the counts are exact ZEROS — the audit proves absence, and the
    * spec plants corruption to prove detection.
    *
    * 100 TB posture: map-only per-document flags (regex inside
    * codegen), one source-keyed partial agg. */
  private val mojibakeQ = (s: SparkSession, dir: String) => {
    Tables.documents(s, dir)
      .select(col("source"),
        length(col("text")).cast("long").as("len"),
        length(regexp_replace(col("text"), "[\\x00-\\x7F]", ""))
          .cast("long").as("non_ascii"),
        col("text").contains("�").cast("long").as("has_repl"),
        col("text").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")
          .cast("long").as("has_ctrl"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("has_repl")).as("n_replacement"),
        sum(col("has_ctrl")).as("n_control"),
        sum(col("non_ascii")).as("non_ascii_chars"),
        sum(col("len")).as("total_chars"))
      .withColumn("non_ascii_micro",
        expr("(1000000 * non_ascii_chars) div greatest(total_chars, 1)"))
  }

  private val mojibakeSql =
    """WITH d AS (
      |  SELECT source, length(text) AS len,
      |    length(regexp_replace(text, '[\x00-\x7F]', '', 'g'))
      |      AS non_ascii,
      |    CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END
      |      AS has_repl,
      |    CASE WHEN regexp_matches(text,
      |        '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END
      |      AS has_ctrl
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(has_repl) AS BIGINT) AS n_replacement,
      |  CAST(SUM(has_ctrl) AS BIGINT) AS n_control,
      |  CAST(SUM(non_ascii) AS BIGINT) AS non_ascii_chars,
      |  CAST(SUM(len) AS BIGINT) AS total_chars,
      |  (1000000 * CAST(SUM(non_ascii) AS BIGINT))
      |    // greatest(CAST(SUM(len) AS BIGINT), 1) AS non_ascii_micro
      |FROM d GROUP BY 1""".stripMargin

  /** Heaps'-law vocabulary-growth audit — how fast does the corpus
    * stop teaching the tokenizer new words? At 8 corpus-order octile
    * checkpoints (rank over doc_id — data-relative, never absolute
    * ids), report cumulative tokens, cumulative DISTINCT vocabulary,
    * and the cumulative TTR. Vocabulary at a checkpoint is counted
    * WITHOUT re-scanning prefixes: each term collapses to its FIRST
    * occurrence rank (the novelty-index discipline), so vocab(cut) is
    * just count(first_rank ≤ cut) — one pass over the term domain per
    * checkpoint, 8 checkpoints from one ×8 fan-out.
    *
    * 100 TB posture: one explode→(term) collapse (the inverted-index
    * shuffle) + one doc-domain rollup; the ×8 fan-outs run on the
    * collapsed term/doc domains. */
  /** Eval-set n-gram coverage — the inverse of decontamination: how
    * much of a HELD-OUT slice's 3-gram surface does the train slice
    * support? Low coverage means the eval probes genuinely novel
    * text; near-1.0 coverage warns the eval is paraphrase-close to
    * train even when no document-level contamination fires. The
    * holdout is deterministic (doc_id % 19 = 0 — a pure data
    * function, so both engines slice identically). Per language:
    * eval docs, distinct eval shingles, how many appear anywhere in
    * train, coverage in micro.
    *
    * 100 TB posture: distinct-shingle collapse on both slices, one
    * LEFT SEMI equi-join keyed on the shingle (bloom-prefilterable —
    * the decontam discipline), a |langs| rollup. */
  private val ngramCoverageQ = (s: SparkSession, dir: String) => {
    val docs = Tables.documents(s, dir)
    def grams(df: DataFrame) = df
      .withColumn("tk", split(col("text"), " "))
      .withColumn("sh", expr(
        "CASE WHEN size(tk) >= 3 THEN transform(sequence(0, size(tk) - 3), " +
          "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])) " +
          "ELSE array_repeat('', 0) END"))
      .select(col("lang"), explode(col("sh")).as("s"))
      .distinct()
    val evalG = grams(docs.filter(col("doc_id") % 19L === 0L))
    val trainG = grams(docs.filter(col("doc_id") % 19L =!= 0L))
      .select(col("s")).distinct()
    val covered = evalG.join(trainG, Seq("s"), "left_semi")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_covered"))
    val evalDocs = docs.filter(col("doc_id") % 19L === 0L)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_eval_docs"))
    evalG.groupBy(col("lang")).agg(count(lit(1)).as("n_eval_shingles"))
      .join(covered, Seq("lang"), "left")
      .join(evalDocs, Seq("lang"))
      .select(col("lang"), col("n_eval_docs"), col("n_eval_shingles"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
      .withColumn("coverage_micro",
        expr("(1000000 * n_covered) div n_eval_shingles"))
  }

  private val ngramCoverageSql =
    """WITH toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS tk
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(range(1, len(tk) - 1),
      |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
      |  FROM toks),
      |ev AS (SELECT DISTINCT lang, s FROM sh WHERE doc_id % 19 = 0),
      |tr AS (SELECT DISTINCT s FROM sh WHERE doc_id % 19 <> 0),
      |cov AS (
      |  SELECT lang, COUNT(*) AS n_covered
      |  FROM ev WHERE EXISTS (SELECT 1 FROM tr WHERE tr.s = ev.s)
      |  GROUP BY 1),
      |ed AS (SELECT lang, COUNT(*) AS n_eval_docs
      |       FROM documents WHERE doc_id % 19 = 0 GROUP BY 1),
      |es AS (SELECT lang, COUNT(*) AS n_eval_shingles
      |       FROM ev GROUP BY 1)
      |SELECT es.lang, ed.n_eval_docs, es.n_eval_shingles,
      |  COALESCE(cov.n_covered, 0) AS n_covered,
      |  (1000000 * COALESCE(cov.n_covered, 0)) // es.n_eval_shingles
      |    AS coverage_micro
      |FROM es JOIN ed ON es.lang = ed.lang
      |LEFT JOIN cov ON es.lang = cov.lang""".stripMargin

  /** Pairwise source divergence — "did this source drift from that
    * one?" in the distribution sense a mixing schedule cares about:
    * TOTAL-VARIATION distance between per-source unigram
    * distributions, computed entirely in integer micro (KL needs
    * logarithms — the cross-engine float hazard this codebase bans;
    * TV is the log-free f-divergence and bounds KL via Pinsker).
    * Identity used: Σ_w |p−q| = Σp + Σq − 2·Σ_w min(p,q), so the
    * only per-word work is an INNER join on shared words (absent
    * words contribute through the Σp/Σq constants) — no outer-join
    * fan-out. Reported as tv2_micro = 2·TV·10⁶ (integer exact).
    *
    * 100 TB posture: one (source, word) partial-agg collapse, one
    * |vocab|-bounded inner self-join keyed on the word, a |sources|²
    * rollup. */
  private val sourceDivQ = (s: SparkSession, dir: String) => {
    val counts = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val p = counts.join(totals, "source")
      .select(col("source"), col("w"),
        expr("(1000000 * c) div n").as("p"))
    val sums = p.groupBy(col("source")).agg(sum(col("p")).as("sp"))
    val minSum = p.select(col("source").as("sa"), col("w"), col("p").as("pa"))
      .join(p.select(col("source").as("sb"), col("w"), col("p").as("pb")),
        Seq("w"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(sum(least(col("pa"), col("pb"))).as("smin"),
        count(lit(1)).as("n_shared_words"))
    minSum
      .join(sums.select(col("source").as("sa"), col("sp").as("spa")), Seq("sa"))
      .join(sums.select(col("source").as("sb"), col("sp").as("spb")), Seq("sb"))
      .select(col("sa"), col("sb"), col("n_shared_words"),
        (col("spa") + col("spb") - lit(2L) * col("smin")).as("tv2_micro"))
  }

  private val sourceDivSql =
    """WITH counts AS (
      |  SELECT source, w, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w
      |    FROM documents)
      |  WHERE len(w) > 0 GROUP BY 1, 2),
      |totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
      |           FROM counts GROUP BY 1),
      |p AS (
      |  SELECT c.source, c.w, (1000000 * c.c) // t.n AS p
      |  FROM counts c JOIN totals t ON c.source = t.source),
      |sums AS (SELECT source, CAST(SUM(p) AS BIGINT) AS sp
      |         FROM p GROUP BY 1),
      |ms AS (
      |  SELECT a.source AS sa, b.source AS sb,
      |    CAST(SUM(least(a.p, b.p)) AS BIGINT) AS smin,
      |    COUNT(*) AS n_shared_words
      |  FROM p a JOIN p b ON a.w = b.w AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT ms.sa, ms.sb, ms.n_shared_words,
      |  xa.sp + xb.sp - 2 * ms.smin AS tv2_micro
      |FROM ms JOIN sums xa ON ms.sa = xa.source
      |JOIN sums xb ON ms.sb = xb.source""".stripMargin

  /** Zipf rank-frequency profile, octave-bucketed — the power-law
    * diagnostic every corpus report opens with, WITHOUT floating
    * logarithms (log/ln differ across engines — the cooccur lesson):
    * words rank by (freq DESC, word ASC); ranks bucket into octaves
    * [2^k, 2^{k+1}); each octave reports word count, total frequency
    * mass, and its top word. A Zipfian corpus shows ~flat per-octave
    * mass (each octave doubles the words and halves the frequency);
    * a TRUNCATED or templated corpus shows mass collapsing — the
    * shape is the diagnostic, no slope float needed.
    *
    * 100 TB posture: one token groupBy (partial-agg), a |vocab|-row
    * rank window, then a ≤64-octave rollup. */
  private val zipfQ = (s: SparkSession, dir: String) => {
    val freq = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    // vocabulary grows with the corpus (Heaps' law — sublinear but
    // unbounded), so the rank runs distributed too (GlobalOrder)
    val ranked = GlobalOrder.rowNumbered(freq,
      Seq(col("f").desc, col("w").asc), "rnk")
    ranked
      // octave = bit length − 1: integer-exact floor(log2(rank)) —
      // float log2 is NOT exact at power-of-two boundaries in every
      // engine (Math.log(x)/Math.log(2) ≠ C log2), so no float logs
      .withColumn("octave",
        (length(bin(col("rnk"))) - 1).cast("long"))
      .groupBy(col("octave"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("f")).as("mass"),
        min(struct(col("rnk"), col("w"))).as("tw"))
      .select(col("octave"), col("n_words"), col("mass"),
        col("tw.w").as("top_word"))
  }

  private val zipfSql =
    """WITH freq AS (
      |  SELECT w, COUNT(*) AS f FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0 GROUP BY 1),
      |ranked AS (
      |  SELECT w, f, row_number() OVER (ORDER BY f DESC, w ASC) AS rnk
      |  FROM freq)
      |SELECT CAST(len(bin(rnk)) - 1 AS BIGINT) AS octave,
      |  COUNT(*) AS n_words, CAST(SUM(f) AS BIGINT) AS mass,
      |  arg_min(w, rnk) AS top_word
      |FROM ranked GROUP BY 1""".stripMargin

  private val heapsQ = (s: SparkSession, dir: String) => {
    // distributed corpus-order position (the r6 verdict's swap): range
    // partition on doc_id + per-partition row numbers + broadcast
    // offsets — no global window over the SF-scaling documents table
    val (docs, nd) = GlobalOrder.rowNumberedWithCount(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      Seq(col("doc_id").asc), "rn")
    val perDoc = docs.select(col("rn"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val firsts = docs
      .select(col("rn"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(min(col("rn")).as("first_rn"))
    // nd is free from the offset pass (r7 verdict #5) — the 8-row cut
    // table is pure driver arithmetic, no corpus agg + explode plan
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, IntegerType, StructField, StructType}
    val cuts = s.createDataFrame(
      java.util.Arrays.asList((1 to 8).map(j =>
        Row(j, nd * j / 8)): _*),
      StructType(Seq(StructField("j", IntegerType),
        StructField("cut", LongType))))
    val toks = perDoc.crossJoin(broadcast(cuts))
      .filter(col("rn") <= col("cut"))
      .groupBy(col("j"), col("cut"))
      .agg(sum(col("n_tok")).as("tokens"))
    val vocab = firsts.crossJoin(broadcast(cuts))
      .filter(col("first_rn") <= col("cut"))
      .groupBy(col("j")).agg(count(lit(1)).as("vocab"))
    toks.join(vocab, "j")
      .withColumn("ttr_micro", expr("(1000000 * vocab) div tokens"))
      .select(col("j"), col("cut").as("n_docs"), col("tokens"),
        col("vocab"), col("ttr_micro"))
  }

  private val heapsSql =
    """WITH docs AS (
      |  SELECT doc_id, text,
      |    CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS rn
      |  FROM documents),
      |per_doc AS (
      |  SELECT rn, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM docs),
      |firsts AS (
      |  SELECT term, MIN(rn) AS first_rn
      |  FROM (SELECT rn, unnest(string_split(text, ' ')) AS term
      |        FROM docs)
      |  GROUP BY 1),
      |nd AS (SELECT COUNT(*) AS nd FROM per_doc),
      |cuts AS (
      |  SELECT j, (nd * j) // 8 AS cut
      |  FROM nd CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7,8]) AS j) js),
      |toks AS (
      |  SELECT j, cut, CAST(SUM(n_tok) AS BIGINT) AS tokens
      |  FROM per_doc, cuts WHERE rn <= cut GROUP BY 1, 2),
      |voc AS (
      |  SELECT j, COUNT(*) AS vocab
      |  FROM firsts, cuts WHERE first_rn <= cut GROUP BY 1)
      |SELECT toks.j, cut AS n_docs, tokens, vocab,
      |  (1000000 * vocab) // tokens AS ttr_micro
      |FROM toks JOIN voc ON toks.j = voc.j""".stripMargin

  /** Next-word suggestion index — the query-completion table a
    * search box materializes: for every typed word, the top-3 most
    * frequent NEXT words in the corpus (count-desc, word-asc
    * tiebreak) with the candidate-set size. This is the bigram-LM
    * argmax table (q_text_lm_generate walks it greedily) surfaced as
    * a servable index rather than a decoder.
    *
    * 100 TB posture: one map-side bigram fan-out + (w1, w2)
    * collapse; the rank runs on the collapsed bigram domain, never
    * corpus rows — the §4.2(c) bounded-heap rewrite applies when
    * the window becomes the bottleneck. */
  private val autocompleteQ = (s: SparkSession, dir: String) => {
    val bigrams = Tables.documents(s, dir)
      .select(split(col("text"), " ").as("tk"))
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2)," +
          " i -> struct(tk[i] AS w1, tk[i+1] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    val wp = Window.partitionBy(col("w1"))
    val wr = Window.partitionBy(col("w1"))
      .orderBy(col("cnt").desc, col("w2").asc)
    bigrams
      .withColumn("n_candidates", count(lit(1)).over(wp))
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= 3)
      .select(col("w1"), col("rnk"), col("w2").as("suggestion"),
        col("cnt"), col("n_candidates"))
  }

  private val autocompleteSql =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS tk FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(range(1, len(tk)),
      |    i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b
      |  FROM toks),
      |c AS (
      |  SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS cnt
      |  FROM bg GROUP BY 1, 2),
      |r AS (
      |  SELECT w1, w2, cnt,
      |    COUNT(*) OVER (PARTITION BY w1) AS n_candidates,
      |    ROW_NUMBER() OVER (PARTITION BY w1
      |      ORDER BY cnt DESC, w2 ASC) AS rnk
      |  FROM c)
      |SELECT w1, CAST(rnk AS INT) AS rnk, w2 AS suggestion, cnt,
      |  n_candidates
      |FROM r WHERE rnk <= 3""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_text_autocomplete" -> Q(autocompleteQ, Some(autocompleteSql),
      "next-word suggestion index: top-3 bigram completions per word"),
    "q_text_ngram_coverage" -> Q(ngramCoverageQ, Some(ngramCoverageSql),
      "holdout n-gram coverage: eval shingle support in train, semi-join keyed on the shingle"),
    "q_text_source_divergence" -> Q(sourceDivQ, Some(sourceDivSql),
      "pairwise source drift: total-variation distance of unigram distributions, integer micro"),
    "q_text_zipf" -> Q(zipfQ, Some(zipfSql),
      "Zipf rank-frequency profile, octave-bucketed via integer bit length (no float logs)"),
    "q_text_heaps" -> Q(heapsQ, Some(heapsSql),
      "Heaps-law vocabulary growth at 8 corpus octiles via first-occurrence ranks"),
    "q_text_mojibake" -> Q(mojibakeQ, Some(mojibakeSql),
      "encoding-integrity audit: replacement/control-char flags, non-ASCII share"),
    "q_text_burstiness" -> Q(burstinessQ, Some(burstinessSql),
      "term burstiness: index of dispersion over per-doc counts, top-20 terms"),
    "q_text_ttr" -> Q(ttrQ, Some(ttrSql),
      "lexical richness per doc: type-token ratio + hapax share, integer micro"),
    "q_text_rake" -> Q(rakeQ, Some(rakeSql),
      "RAKE keywords: stopword-run phrase segmentation, deg/freq micro score, top 15"),
    "q_text_boilerplate" -> Q(boilerplateQ, Some(boilerplateSql),
      "per-doc boilerplate-gram fraction (df >= 3), template flag at 80%"),
    "q_text_extractive_summary" -> Q(extractiveSummaryQ,
      Some(extractiveSummarySql),
      "top-2 chunks per doc by token-overlap centrality (TextRank degree form)"),
    "q_sample_preference_pairs" -> Q(preferencePairsQ, Some(preferencePairsSql),
      "DPO-style chosen/rejected pairs per (lang, source): integer quality extrema"),
    "q_text_ngram_novelty" -> Q(noveltyQ, Some(noveltySql),
      "per-document share of corpus-first 3-gram shingles, integer-exact"),
    "q_text_readability" -> Q(readabilityQ, Some(readabilitySql),
      "integer-exact Flesch readability bands per language"),
    "q_text_span_corruption" -> Q(spanCorruptQ, Some(spanCorruptSql),
      "T5 denoising pairs: content-hash span masking, sentinel input/target rollups"),
    "q_text_feature_hashing" -> Q(featHashQ, Some(featHashSql),
      "hashing-trick featurization: 64 signed buckets, no vocabulary, map-side"),
    "q_text_kwic" -> Q(kwicQ, Some(kwicSql),
      "keyword-in-context concordance: map-side slice windows around the target term"),
    "q_text_cooccur" -> Q(cooccurQ, Some(cooccurSql),
      "GloVe-style windowed co-occurrence counts: map-side pair fan-out, top-20"),
    "q_text_lm_generate" -> Q(lmGenerateQ, Some(lmGenerateSql),
      "greedy bigram-LM decoding: argmax successor walk from the corpus mode token"),
    "q_text_langid_confusion" -> Q(langidNgramQ, Some(langidNgramSql),
      "trigram-profile language ID + confusion matrix vs labeled lang"),
    "q_pipeline_curate" -> Q(curateQ, Some(curateSql),
      "flagship composition: policy gate → exact dedup → embedding join"),
    "q_text_chunk" -> Q(chunkQ, Some(chunkSql),
      "context-window chunking: 64-token windows, stride 32, map-only"),
    "q_text_vocab_oov" -> Q(vocabOovQ, Some(vocabOovSql),
      "top-K vocabulary + per-doc OOV rate (broadcast vocab join)"),
    "q_text_pack_sequences" -> Q(packQ, Some(packSql),
      "sequence packing: docs → fixed-token-budget bins, shard-parallel"),
    "q_text_stem_topk" -> Q(stemQ, Some(stemSql),
      "suffix-rule stemming: rule-chained regexp collapse, top-40 stems"),
    "q_text_collocations" -> Q(collocationQ, Some(collocationSql),
      "bigram collocations by rational lift (PMI without the log), min-support gated"),
    "q_text_corpus_report" -> Q(corpusReportQ, Some(corpusReportSql),
      "per-(source,lang) corpus data card: volume, dup rate, short-doc ratio"),
    "q_text_index_search" -> Q(searchQ, Some(searchSql),
      "term lookup via inverted-index semi-join == full LIKE scan"),
    "q_text_trigram_like" -> Q(trigramLikeQ, Some(trigramLikeSql),
      "trigram-index substring search: all-grams candidate gate + verify == LIKE scan"),
    "q_text_bpe_pairs" -> Q(bpePairsQ, Some(bpePairsSql),
      "BPE round-1 merge candidates: pair counts from the (word,freq) vocab, not the corpus"),
    "q_text_bpe_train" -> Q(bpeTrainQ, Some(bpeTrainSql),
      "BPE tokenizer training: 5 greedy merge rounds over the vocab, learned merge table"),
    "q_text_bpe_encode" -> Q(bpeEncodeQ, Some(bpeEncodeSql),
      "the trained BPE applied: top-30 words with segmentations + compression"),
    "q_text_phrase_search" -> Q(phraseQ, Some(phraseSql),
      "positional phrase match: offset-intersection of filtered posting lists"),
    "q_text_bm25_indexed" -> Q(bm25IndexedQ, Some(bm25Sql),
      "BM25 over the STORED postings index: cost ∝ posting lists, no corpus scan"),
    "q_text_bm25_topk" -> Q(bm25Q, Some(bm25Sql),
      "Okapi BM25 top-20 retrieval, integer-exact rational scoring"),
    "q_text_tokens" -> Q(tokensQ, Some(tokensSql),
      "token counting: whitespace + regex word pieces"),
    "q_text_tf" -> Q(tfQ, Some(tfSql), "global term/document frequency top-20"),
    "q_text_tfidf" -> Q(tfidfQ, Some(tfidfSql), "tf-idf top-3 terms per doc"),
    "q_text_sentiment" -> Q(sentimentQ, Some(sentimentSql),
      "lexicon-join sentiment scoring per document"),
    "q_text_filter_policy" -> Q(filterPolicyQ, Some(filterPolicySql),
      "C4-style curation gate: length/repetition/langid rules + reason"),
    "q_text_langid" -> Q(langidQ, Some(langidSql),
      "language-ID heuristic: stopword-hit ratio"),
    "q_text_quality" -> Q(qualityQ, Some(qualitySql),
      "quality scoring: length/word-shape/stopword composite"),
    "q_text_fingerprint" -> Q(fingerprintQ, Some(fingerprintSql),
      "md5 shingle fingerprint sketch (winnowing-style)"),
    "q_text_inverted_index" -> Q(invIndexQ, Some(invIndexSql),
      "inverted text index: term -> df/postings (reference SIT_IDX_TXT)"),
    "q_text_index_ignorecase" -> Q(idxIgnoreCaseQ, Some(idxIgnoreCaseSql),
      "SIT_IDX_TXT ignore-case build option: case-folded index over a mixed-case corpus"),
    "q_text_index_unique" -> Q(idxUniqueQ, Some(idxUniqueSql),
      "SIT_IDX_TXT unique build option: one posting per (term, doc)"),
    "q_text_index_delims" -> Q(idxDelimsQ, Some(idxDelimsSql),
      "SIT_IDX_TXT delimiter build option: custom [ ,]+ tokenizer over a mixed-delimiter corpus"))
}
