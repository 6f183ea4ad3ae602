package graft

/** Round-5 sixty-fourth wave: streaming SPC twin, ABC classes. */
class Round5WaveSixtyFourSpec extends SparkSpec {

  test("stream_control_chart: batch-equal to q_ts_control_chart") {
    def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
      val cols = df.columns.sorted
      df.select(cols.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*).collect().map(_.toSeq).toSet
    }
    val batch = canon(run("q_ts_control_chart"))
    val stream = canon(run("q_stream_control_chart"))
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("abc: classes partition parts; shares ordered and consistent") {
    val rows = run("q_agg_abc").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("A", "B", "C"))
    val rev = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey",
        "CAST(round(l_extendedprice * 100) AS LONG) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val tc = rev.values.sum
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_parts"))).sum ==
      rev.size.toLong)
    assert(rows.map(_.getLong(rows.head.fieldIndex("revenue"))).sum == tc)
    // recount class boundaries from the sorted domain
    val sorted = rev.toSeq.sortBy { case (k, c) => (-c, k) }
    var cum = 0L
    val cls = sorted.map { case (_, c) =>
      cum += c
      if (cum * 100 <= 80 * tc) "A"
      else if (cum * 100 <= 95 * tc) "B" else "C"
    }
    val exp = cls.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_parts")) ==
        exp.getOrElse(r.getString(0), 0L), r.getString(0))
    }
    // A holds the most revenue per part by construction
    val byCls = rows.map(r => r.getString(0) ->
      (r.getLong(r.fieldIndex("revenue")),
        r.getLong(r.fieldIndex("n_parts")))).toMap
    val aRate = byCls("A")._1 / byCls("A")._2
    val cRate = byCls("C")._1 / byCls("C")._2
    assert(aRate > cRate)
  }
}
