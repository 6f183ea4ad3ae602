package graft

import org.apache.spark.sql.functions._

/** Round-5 fourteenth wave: MMR diversified rerank and integer-exact
  * Flesch readability bands. Exactness is the DuckDB oracle; these pin
  * the semantics against independent recomputation. */
class Round5WaveFourteenSpec extends SparkSpec {

  test("mmr: greedy selection matches an independent reimplementation") {
    val out = run("q_sim_mmr").collect()
      .map(r => (r.getInt(r.fieldIndex("mmr_rank")),
        r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("rel"))))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (1 to 5))
    assert(out.map(_._2).distinct.length == 5, "five distinct picks")

    // rebuild the candidate set + rounded sims with the same primitive
    val e = Tables.embeddings(spark, sf)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val cands = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(graft.functions.VectorOps.cosine(col("embedding"), col("qe")), 6)
          .as("rel"),
        col("embedding"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(20)
    val candRows = cands.collect()
    val rel = candRows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ids = candRows.map(_.getLong(0))
    val simRows = cands.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(cands.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(graft.functions.VectorOps.cosine(col("ea"), col("eb")), 6)
          .as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // independent greedy
    var picked = Vector(ids.minBy(id => (-rel(id), id)))
    while (picked.length < 5) {
      val next = ids.filterNot(picked.contains).minBy { c =>
        val ms = picked.map(p => simRows((c, p))).max
        (-(0.7 * rel(c) - 0.3 * ms), c)
      }
      picked :+= next
    }
    assert(out.map(_._2).toSeq == picked, "greedy trace matches")
    // rank 1 is the pure-relevance argmax; later picks trade it away
    assert(out.head._3 == rel(picked.head))
    assert(out.map(_._3).max == out.head._3)
  }

  test("readability: bands partition the corpus, bounds respected") {
    val rows = run("q_text_readability").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .filter(size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0)")) > 0)
      .count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum == docs,
      "bands partition the scored corpus")
    rows.foreach { r =>
      val band = r.getString(r.fieldIndex("band"))
      val n = r.getLong(r.fieldIndex("n_docs"))
      val mn = r.getLong(r.fieldIndex("min_flesch_micro"))
      val mx = r.getLong(r.fieldIndex("max_flesch_micro"))
      val sm = r.getLong(r.fieldIndex("sum_flesch_micro"))
      assert(mn <= mx && n * mn <= sm && sm <= n * mx)
      band match {
        case "easy"   => assert(mn >= 60000000L)
        case "medium" => assert(mn >= 30000000L && mx < 60000000L)
        case "hard"   => assert(mx < 30000000L)
      }
    }
    assert(rows.map(_.getString(rows.head.fieldIndex("band"))).distinct
      .length >= 2, "fixture exercises more than one band")
  }
}
