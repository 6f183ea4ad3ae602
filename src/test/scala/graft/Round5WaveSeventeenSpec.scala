package graft

import org.apache.spark.sql.functions._

/** Round-5 seventeenth wave: DPO preference-pair construction and
  * common-neighbor link-prediction features. */
class Round5WaveSeventeenSpec extends SparkSpec {

  private val stop = Set("the", "a", "of", "to", "and", "in", "is")
  private def scoreMicro(text: String): Long = {
    val tk = text.split(" ", -1)
    val nTok = tk.length.toLong
    val stopN = tk.count(stop).toLong
    val wlen10 = (10L * (text.length - nTok + 1)) / nTok
    (if (nTok >= 20 && nTok <= 90) 500000L else 0L) +
      (250000L * stopN) / nTok +
      (if (wlen10 >= 30 && wlen10 <= 80) 250000L else 0L)
  }

  test("preference pairs: extrema match an independent scorer, gap positive") {
    val rows = run("q_sample_preference_pairs").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val byBucket = docs.groupBy(d => (d._2, d._3))
    rows.foreach { r =>
      val key = (r.getString(r.fieldIndex("lang")),
        r.getString(r.fieldIndex("source")))
      val bucket = byBucket(key).map(d => (d._1, scoreMicro(d._4)))
      val chosen = bucket.minBy { case (id, s) => (-s, id) }
      val rejected = bucket.minBy { case (id, s) => (s, id) }
      assert(r.getLong(r.fieldIndex("chosen_doc")) == chosen._1)
      assert(r.getLong(r.fieldIndex("chosen_score")) == chosen._2)
      assert(r.getLong(r.fieldIndex("rejected_doc")) == rejected._1)
      assert(r.getLong(r.fieldIndex("rejected_score")) == rejected._2)
      assert(r.getLong(r.fieldIndex("gap")) > 0)
      assert(r.getLong(r.fieldIndex("n_docs")) == bucket.length.toLong)
    }
    // zero-gap buckets (if any) are excluded by construction
    val emitted = rows.map(r => (r.getString(r.fieldIndex("lang")),
      r.getString(r.fieldIndex("source")))).toSet
    byBucket.foreach { case (key, ds) =>
      val ss = ds.map(d => scoreMicro(d._4))
      if (ss.max == ss.min) assert(!emitted(key))
      else assert(emitted(key))
    }
  }

  test("common neighbors: matches an independent adjacency recomputation") {
    val rows = run("q_graph_common_neighbors").collect()
    assert(rows.nonEmpty)
    val und = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey"))
          .cast("long").as("a"),
        greatest(col("c_nationkey"), col("s_nationkey"))
          .cast("long").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = adj.keys.toSeq.combinations(2).map(_.sorted)
      .flatMap { case Seq(x, y) =>
        val cn = (adj(x) & adj(y)).size.toLong
        if (cn == 0) None
        else Some((x, y) -> (cn,
          1000000L * cn / (adj(x).size + adj(y).size - cn),
          und((x, y))))
      }.toMap
    val got = rows.map { r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))
    }.toMap
    assert(got == expected)
  }
}
