package graft

import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("token counts: ws tokens == regex tokens on space-delimited soup") {
    val rows = run("q_text_tokens").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"doc ${r.getLong(0)}")
      assert(r.getInt(3) == r.getLong(4), "n_chars metadata mismatch")
    }
  }

  test("tf/df: df <= tf_global and df <= corpus size") {
    val n = Tables.documents(spark, sf).count()
    run("q_text_tf").collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(2) <= n)
    }
  }

  test("tfidf: 3 ranked terms per doc, scores non-increasing") {
    val byDoc = run("q_text_tfidf").collect().groupBy(_.getLong(0))
    assert(byDoc.size == 20)
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      val scores = sorted.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("quality score components stay in [0,1]") {
    run("q_text_quality").collect().foreach { r =>
      val score = r.getDouble(r.fieldIndex("quality_score"))
      assert(score >= 0.0 && score <= 1.0)
      val stop = r.getDouble(r.fieldIndex("stop_ratio"))
      assert(stop >= 0.0 && stop <= 1.0)
    }
  }

  test("inverted index covers the whole vocabulary, postings sum to token count") {
    val idx = run("q_text_inverted_index").collect()
    val totalPostings = idx.map(_.getLong(2)).sum
    val totalTokens = Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(totalPostings == totalTokens)
  }

  test("fingerprint: identical docs would collide (hash is content-pure)") {
    // same text --> same fingerprint: verify by fingerprinting a
    // self-unioned corpus and checking per-doc stability
    val fp1 = run("q_text_fingerprint").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fp2 = run("q_text_fingerprint").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp1 == fp2)
  }
}
