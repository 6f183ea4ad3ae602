package graft

import org.apache.spark.sql.functions._

/** Trigram substring index: the all-grams candidate gate must be a
  * true superset filter (no false negatives vs the LIKE scan — the
  * oracle proves equality; here we prove the gate actually PRUNES and
  * that verification is what removes the false positives). */
class TrigramIndexSpec extends SparkSpec {

  test("candidate gate prunes the corpus; verify step removes false positives") {
    val docs = Tables.documents(spark, sf)
    val pattern = "table scan"
    val grams = pattern.sliding(3).toSeq.distinct
    val postings = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
        .as("g"))
      .filter(col("g").isin(grams: _*))
      .distinct()
    val cands = postings.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ng"))
      .filter(col("ng") === grams.length)
      .count()
    val total = docs.count()
    val answer = run("q_text_trigram_like").count()
    val scan = docs.filter(col("text").contains(pattern)).count()
    assert(answer == scan, "index result must equal the LIKE scan")
    assert(answer <= cands, "every match must survive the gate (no false negatives)")
    assert(cands < total,
      s"gate must prune: $cands candidates of $total docs")
  }
}
