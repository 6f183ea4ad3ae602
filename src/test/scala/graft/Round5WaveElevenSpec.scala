package graft

/** Round-5 eleventh wave: contrastive negative mining and T5-style
  * span corruption — training-pair constructors. Exactness is the
  * DuckDB oracle; these pin the pair semantics. */
class Round5WaveElevenSpec extends SparkSpec {

  test("negatives: 3 per anchor, verified-unrelated, reproducible") {
    val rows = run("q_sample_negatives").collect()
    assert(rows.length == 15, "5 anchors x 3 negatives")
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("cos")) < 0.1, "pool is verified-unrelated")
      assert(r.getLong(r.fieldIndex("neg_id")) >= 5, "anchors never sampled")
      val rk = r.getInt(r.fieldIndex("rsel"))
      assert(rk >= 1 && rk <= 3)
    }
    val again = run("q_sample_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getLong(1))).toSet,
      "content-hash selection is a pure function of the data")
  }

  test("span corruption: sentinels align, target replays exactly the masked spans") {
    val rows = run("q_text_span_corruption").collect()
    assert(rows.length == 5)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id < 5").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).toMap
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_spans"))
      val input = r.getString(r.fieldIndex("input_text")).split(" ")
      val target = r.getString(r.fieldIndex("target_text")).split(" ")
      val sentinels = (0 until n.toInt).map(i => s"<extra_id_$i>")
      // each sentinel appears exactly once in input, in order, and once
      // in target as a span opener
      assert(sentinels.forall(s => input.count(_ == s) == 1))
      assert(sentinels.forall(s => target.count(_ == s) == 1))
      assert(input.filter(_.startsWith("<extra_id_")).toSeq == sentinels,
        "input sentinels in span order")
      // reconstruction: substituting each sentinel in input with its
      // target span recovers the original token stream exactly
      val spanOf = {
        val m = scala.collection.mutable.Map.empty[String, Vector[String]]
        var cur: String = null
        target.foreach { t =>
          if (t.startsWith("<extra_id_")) { cur = t; m(cur) = Vector() }
          else m(cur) = m(cur) :+ t
        }
        m.toMap
      }
      val rebuilt = input.flatMap { t =>
        if (t.startsWith("<extra_id_")) spanOf(t) else Seq(t)
      }
      assert(rebuilt.mkString(" ") == docs(r.getLong(0)),
        "input+target must reconstruct the document")
      assert(n >= 1, "a 60+-token doc at 20% mask rate always has a span")
    }
  }
}
