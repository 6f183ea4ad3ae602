package graft

import org.apache.spark.sql.functions._

/** Round-5 nineteenth wave: chunk-centrality extractive summary and
  * embedding OOD detection. */
class Round5WaveNineteenSpec extends SparkSpec {

  test("extractive summary: centrality matches an independent recount") {
    val rows = run("q_text_extractive_summary").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def chunksOf(text: String): Vector[Vector[String]] =
      text.split(" ", -1).toVector.grouped(10).toVector
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (docId, rs) =>
      val ch = chunksOf(docs(docId))
      val sets = ch.map(_.toSet)
      val centrality = sets.indices.map { i =>
        i -> sets.indices.filter(_ != i)
          .map(j => (sets(i) & sets(j)).size.toLong).sum
      }.toMap
      val expectedTop = centrality.toSeq
        .sortBy { case (i, c) => (-c, i) }.take(2)
      rs.sortBy(_.getInt(1)).zip(expectedTop).foreach {
        case (r, (ci, c)) =>
          assert(r.getLong(r.fieldIndex("chunk_idx")) == ci.toLong)
          assert(r.getLong(r.fieldIndex("centrality")) == c)
          assert(r.getString(r.fieldIndex("summary_chunk")) ==
            ch(ci).mkString(" "))
      }
    }
    // every doc with >= 2 chunks that overlap at all gets a summary
    assert(byDoc.forall(_._2.length <= 2))
  }

  test("ood: distances match an independent integer recomputation") {
    val rows = run("q_vec_ood").collect()
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val byLabel = vecs.groupBy(_._2)
    val expected = byLabel.toSeq.flatMap { case (label, vs) =>
      val dim = vs.head._3.length
      val micro = vs.map { case (id, _, e) =>
        id -> e.map(x => math.floor(x.toDouble * 1000000L).toLong)
      }
      val cent = (0 until dim).map { d =>
        micro.map(_._2(d)).sum / micro.length
      }
      val d2 = micro.map { case (id, m) =>
        (label, id) -> (0 until dim).map { d =>
          val diff = m(d) - cent(d); diff * diff
        }.sum
      }
      d2.sortBy { case ((_, id), dd) => (-dd, id) }.take(5)
        .zipWithIndex.map { case (((l, id), dd), i) => (l, i + 1, id, dd) }
    }.toSet
    val got = rows.map(r => (r.getInt(0), r.getInt(1),
      r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }
}
