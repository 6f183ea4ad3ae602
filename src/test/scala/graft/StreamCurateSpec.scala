package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming curation pipeline, driven end-to-end THROUGH the
  * custom object store: documents ingested as graft objects, read back
  * incrementally by the DSv2 micro-batch source, gated + deduped, and
  * the survivors committed to an object-store sink with the
  * exactly-once epoch discipline — then read back as a batch and
  * compared to the pure-batch computation. This is the continuous-
  * ingest story of the reference (objects arrive, queries keep up)
  * composed with the curation operators.
  */
class StreamCurateSpec extends SparkSpec {

  private val stopList = Seq("the", "a", "of", "to", "and", "in", "is")
    .map("'" + _ + "'").mkString(",")

  /** The q_stream_curate gate, applied to any documents frame. */
  private def gate(df: DataFrame): DataFrame = df
    .withColumn("tk", split(col("text"), " "))
    .withColumn("n_tok", size(col("tk")).cast("long"))
    .withColumn("rep_ratio", expr(
      "array_max(transform(array_distinct(tk), t -> size(filter(tk, x -> x = t))))")
      / col("n_tok"))
    .withColumn("en_score",
      size(expr(s"filter(tk, t -> t IN ($stopList))")) / col("n_tok"))
    .filter(col("n_tok") >= 20 && col("n_tok") <= 90 &&
      col("rep_ratio") <= 0.2 && col("en_score") >= 0.05)

  test("q_stream_curate equals the batch gate+dedup+stats") {
    val streamed = run("q_stream_curate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = gate(Tables.documents(spark, sf))
      .groupBy(col("source"), md5(col("text")).as("h"))
      .agg(max(col("n_tok")).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("total_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("curation through the object store: obj readStream -> gate+dedup -> obj writeStream == batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-curate").toString
    val src = s"$dir/documents"
    val dst = s"$dir/curated"
    Tables.documents(spark, sf).repartition(4)
      .write.format("graft-objects").mode("overwrite").save(src)

    val q = gate(spark.readStream.format("graft-objects").load(src))
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .dropDuplicates("source", "h")
      .writeStream.format("graft-objects")
      .option("path", dst)
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // sink objects are well-formed and carry exactly the batch-gated,
    // batch-deduped survivors (dedup keeps one row per (source, hash);
    // with no exact dups in the fixture the row set is fully determined)
    val objs = graft.sources.GraftObjectTable.listObjects(dst)
    assert(objs.nonEmpty &&
      objs.forall(p => graft.sources.ObjectFormat.verifyObject(p)))
    val got = spark.read.format("graft-objects").load(dst)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = gate(Tables.documents(spark, sf))
      .groupBy(col("source"), md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // if the fixture ever grows true cross-row duplicates, the streaming
    // winner within a (source, hash) group is arbitrary — compare group
    // keys then, not doc_ids; today doc_ids are exact
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }
}
