package graft

import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decode: schema is the typed contract; output deterministic") {
    val df = run("q_mm_decode")
    assert(df.columns.toSeq ==
      Seq("doc_id", "media_type", "width", "height", "channels", "f1"))
    val a = df.collect().map(_.toString).sorted
    val b = run("q_mm_decode").collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sf).count())
  }

  test("decode: one output row per input row, dims in stub range") {
    run("q_mm_decode").collect().foreach { r =>
      val w = r.getInt(2); val h = r.getInt(3)
      assert(w >= 16 && w < 80 && h >= 16 && h < 80)
      assert(r.getInt(4) == 3)
      assert(r.getDouble(5) > 0) // stripe-sum of nonempty payload
    }
  }

  test("decode preserves input partitioning (no repartition/coalesce)") {
    // one fixture file = one split; the invariant is that decode adds
    // no exchange: output partitions == input partitions
    val in = Tables.documents(spark, sf).rdd.getNumPartitions
    val out = run("q_mm_decode").rdd.getNumPartitions
    assert(out == in, s"decode changed partitioning $in -> $out")
    val plan = run("q_mm_decode").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("frames: only video docs, every 4th frame, valid checksums") {
    val rows = run("q_mm_frames").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 3 == 2) // video = doc_id % 3 == 2
      assert(r.getInt(1) % 4 == 0)
      assert(r.getString(2).length == 32) // md5 hex
    }
  }

  test("media stats account for every byte of the corpus") {
    val total = run("q_mm_stats").collect().map(_.getLong(2)).sum
    val expect = Tables.documents(spark, sf)
      .select(sum(length(col("text")))).collect()(0).getLong(0)
    assert(total == expect)
  }
}
