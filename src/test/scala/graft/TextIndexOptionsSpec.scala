package graft

import org.apache.spark.sql.functions._

/** SIT_IDX_TXT build-option semantics (r7 verdict #6): each option must
  * CHANGE the index the way the reference's flag does — not merely run.
  * The oracle rows prove engine parity; these tests prove the options'
  * defining properties hold on the decorated corpus.
  */
class TextIndexOptionsSpec extends SparkSpec {

  test("ignore-case: no upper-case term survives; df merges across case") {
    val idx = run("q_text_index_ignorecase")
    assert(idx.filter(col("term") =!= lower(col("term"))).count() === 0L)
    // folding merged the even-doc UPPER tokens back into the same vocab
    // as the default index (the corpus is lowercase underneath)
    val defVocab = run("q_text_inverted_index").select("term")
    assert(idx.select("term").except(defVocab).count() === 0L)
    assert(defVocab.except(idx.select("term")).count() === 0L)
  }

  test("unique: exactly one posting per (term, doc) — n_postings == df") {
    val idx = run("q_text_index_unique")
    assert(idx.count() > 0)
    assert(idx.filter(col("n_postings") =!= col("df")).count() === 0L)
    // and it is a REAL collapse: the multiset index has repeats
    val multi = run("q_text_inverted_index")
    assert(multi.filter(col("n_postings") > col("df")).count() > 0)
  }

  test("delims: comma-delimited docs tokenize identically to space-delimited") {
    // the decorated corpus only swaps the delimiter, so the custom
    // tokenizer must reproduce the default index exactly
    val idx = run("q_text_index_delims").orderBy("term")
    val base = run("q_text_inverted_index").orderBy("term")
    assert(idx.collect().toSeq === base.collect().toSeq)
  }
}
