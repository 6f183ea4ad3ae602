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
    val rids = rows.map(_.getLong(0)) // LongType since the GlobalOrder swap
    assert(rids.distinct.length == rids.length)
    rids.foreach(r => assert(r % 1000 == 1))
    // rid order == key order on the sample
    val keys = rows.sortBy(_.getLong(0)).map(r => (r.getLong(1), r.getInt(2)))
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

  test("bloom value index: filter metadata written, lookup prunable and correct") {
    // run the query once so the indexed copy exists on disk
    val viaIndex = run("q_src_bloom_index").collect()
    assert(viaIndex.length == 1 && viaIndex.head.getLong(1) > 0)
    // the parquet footer must carry a bloom filter for l_suppkey
    val out = new java.io.File("/tmp").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_bloomidx_"))
      .maxBy(_.lastModified).getPath
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    val conf = new org.apache.hadoop.conf.Configuration()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(parts.head.getPath), conf))
    try {
      import scala.jdk.CollectionConverters._
      val cols = reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
      val suppCols = cols.filter(_.getPath.toDotString == "l_suppkey")
      assert(suppCols.nonEmpty)
      info(cols.map(c => c.getPath.toDotString + "=" + c.getBloomFilterOffset).mkString(", "))
      assert(suppCols.exists(_.getBloomFilterOffset >= 0),
        "expected a bloom filter on l_suppkey in the parquet footer")
    } finally reader.close()
    // and the key-sorted layout gives disjoint min/max ranges: a point
    // lookup is prunable to (at most) one file's row groups
    val rows = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("l_suppkey") === 7)
      .count()
    assert(rows == viaIndex.head.getLong(1))
  }
}
