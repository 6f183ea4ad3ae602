package graft

import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("csv roundtrip: full row-level fidelity (anti-join both ways empty)") {
    // run the query once to (re)write the csv for this sf dir
    run("q_src_csv_roundtrip").collect()
    val out = "/tmp/graft_csv_" + sf.replaceAll("[^a-zA-Z0-9]", "_")
    val schema = Tables.lineitem(spark, sf).schema
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    val orig = Tables.lineitem(spark, sf)
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }

  test("rid: dense, unique, key-ordered") {
    val rows = run("q_src_rid").collect()
    assert(rows.nonEmpty)
    val rids = rows.map(_.getInt(0))
    assert(rids.distinct.length == rids.length)
    rids.foreach(r => assert(r % 1000 == 1))
    // rid order == key order on the sample
    val keys = rows.sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getInt(2)))
    assert(keys.sameElements(keys.sorted))
  }

  test("relayout preserves content and produces the requested files") {
    run("q_src_relayout").collect()
    val out = "/tmp/graft_relayout_" + sf.replaceAll("[^a-zA-Z0-9]", "_")
    val back = spark.read.parquet(out)
    val orig = Tables.orders(spark, sf)
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
    assert(back.rdd.getNumPartitions <= 4)
  }
}
