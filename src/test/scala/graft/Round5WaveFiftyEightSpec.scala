package graft

/** Round-5 fifty-eighth wave: streaming outage twin. */
class Round5WaveFiftyEightSpec extends SparkSpec {

  test("stream_outages: batch-equal to q_ts_outages") {
    def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
      val cols = df.columns.sorted
      df.select(cols.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*)
        .collect().map(_.toSeq).toSet
    }
    val batch = canon(run("q_ts_outages"))
    val stream = canon(run("q_stream_outages"))
    assert(stream == batch)
    assert(batch.nonEmpty, "fixture must contain outage-class gaps")
  }
}
