package graft

import org.apache.spark.sql.functions._

/** Round-5 thirty-first wave: F1 eval (MoR update is covered in
  * DeletionVectorSpec). */
class Round5WaveThirtyOneSpec extends SparkSpec {

  test("f1: confusion counts and micro ratios match a recount") {
    val rows = run("q_eval_f1").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1) >= 500L,
        r.getString(2) == "en"))
    rows.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      val d = docs.filter(_._1 == src)
      val tp = d.count(x => x._2 && x._3).toLong
      val fp = d.count(x => x._2 && !x._3).toLong
      val fn = d.count(x => !x._2 && x._3).toLong
      val tn = d.count(x => !x._2 && !x._3).toLong
      assert(r.getLong(r.fieldIndex("tp")) == tp, src)
      assert(r.getLong(r.fieldIndex("fp")) == fp)
      assert(r.getLong(r.fieldIndex("fn")) == fn)
      assert(r.getLong(r.fieldIndex("tn")) == tn)
      if (tp + fp > 0)
        assert(r.getLong(r.fieldIndex("precision_micro")) ==
          1000000L * tp / (tp + fp))
      else assert(r.isNullAt(r.fieldIndex("precision_micro")))
      if (tp + fn > 0)
        assert(r.getLong(r.fieldIndex("recall_micro")) ==
          1000000L * tp / (tp + fn))
      if (2 * tp + fp + fn > 0)
        assert(r.getLong(r.fieldIndex("f1_micro")) ==
          2000000L * tp / (2 * tp + fp + fn))
    }
  }
}
