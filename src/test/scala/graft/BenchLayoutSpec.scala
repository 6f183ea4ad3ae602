package graft

import org.apache.spark.sql.functions._

/** Bench.objectify rewrites the single-row-group fixtures into the
  * multi-object layout the bench queries actually scan — this spec
  * pins that the rewrite is content-preserving (same rows, bit-exact),
  * so the headline numbers are measured on the same data. */
class BenchLayoutSpec extends SparkSpec {

  test("objectified bench layout is content-identical to the raw fixtures") {
    val objDir = Bench.objectify(spark, sf)
    Tables.names.foreach { t =>
      val raw = spark.read.parquet(s"$sf/$t.parquet")
      val obj = spark.read.parquet(s"$objDir/$t.parquet")
      assert(obj.count() == raw.count(), s"$t row count changed")
      // order-insensitive content hash over every column, both sides
      def contentHash(df: org.apache.spark.sql.DataFrame): BigDecimal = {
        val h = xxhash64(df.columns.sorted.map(c => col(c).cast("string")): _*)
        BigDecimal(df.select(sum(h.cast("decimal(38,0)")).as("s"))
          .head().getDecimal(0))
      }
      assert(contentHash(obj) == contentHash(raw), s"$t content changed")
    }
  }

  test("range-partitioned facts carry disjoint per-object key ranges") {
    val objDir = Bench.objectify(spark, sf)
    // per input file: min/max of the range column must not interleave
    val byFile = spark.read.parquet(s"$objDir/lineitem.parquet")
      .groupBy(input_file_name().as("f"))
      .agg(min(unix_micros(col("l_shipdate").cast("timestamp"))).as("lo"),
        max(unix_micros(col("l_shipdate").cast("timestamp"))).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(byFile.length > 1)
    byFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"object ranges interleave: $hi1 > $lo2")
      case _ =>
    }
  }
}
