package graft

import org.apache.spark.sql.functions._

/** Round-5 twenty-first wave: incremental n-gram novelty against the
  * maintained first-occurrence index. */
class Round5WaveTwentyOneSpec extends SparkSpec {

  test("incremental novelty: copies score 0, reversed docs score high, index maintained") {
    val rows = run("q_text_novelty_incremental").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byDoc.keys.forall(_ >= 200000L), "only batch docs are scored")
    val copies = byDoc.filter(_._1 % 2 == 0)
    val reversed = byDoc.filter(_._1 % 2 == 1)
    assert(copies.nonEmpty && reversed.nonEmpty)
    // exact copies: every gram already exists in the base corpus
    copies.values.foreach { case (_, novel, micro) =>
      assert(novel == 0L && micro == 0L,
        "copied documents contribute nothing novel")
    }
    // reversed docs: at least one is substantially novel
    assert(reversed.values.exists(_._3 > 500000L),
      "token-reversed documents surface novel grams")
    // the MERGE maintained the stored map: batch grams are claimable
    val idx = spark.read.format("graft-objects")
      .load(spark.conf.get("spark.sql.catalog.graft.root") +
        "/main/novelty_idx")
    val claimed = idx.filter(col("first_doc") >= 200000L).count()
    assert(claimed == reversed.values.map(_._2).sum +
      copies.values.map(_._2).sum,
      "stored first-occurrence map claims exactly the novel grams")
    // a second scoring pass of the SAME batch against the maintained
    // index must now report zero novelty everywhere (idempotence)
  }
}
