package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r9 optimization pin: q_src_rle_advice's single-pass mapPartitions
  * kernel (range exchange → sorted stream → per-partition summary →
  * driver boundary fold) must count exactly what the original
  * window+bounds form counted. The spec recomputes the ORIGINAL
  * two-pass plan inline (partitioned lag window + min/max-struct
  * bounds collect + boundary correction) and asserts row equality,
  * on the fixture and on a deliberately boundary-heavy frame (a
  * constant column and an alternating column, 32 partitions over
  * 4k rows — every partition boundary is a potential correction).
  */
class RleAdviceKernelSpec extends SparkSpec {

  /** The pre-r9 window form, verbatim semantics. */
  private def windowForm(src: DataFrame): Map[String, (Long, Long)] = {
    val sortCols = Seq(col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"), col("l_linestatus"), col("ship_day"),
      col("l_suppkey"))
    val audited = Seq("l_returnflag", "l_linestatus", "ship_day",
      "l_suppkey")
    val li = src
      .repartitionByRange(32, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    def newRun(c: String) =
      when(row_number().over(w) === 1, 1L)
        .otherwise(when(col(c) <=> lag(col(c), 1).over(w), 0L)
          .otherwise(1L)).as(s"nr_$c")
    val keyStruct = struct(sortCols: _*)
    val bounds = li.groupBy(col("_pid"))
      .agg(min(keyStruct).as("lo"), max(keyStruct).as("hi"))
      .collect().sortBy(_.getInt(0))
    val fieldIdx = Map("l_returnflag" -> 2, "l_linestatus" -> 3,
      "ship_day" -> 4, "l_suppkey" -> 5)
    val corrections: Map[String, Long] = audited.map { c =>
      val i = fieldIdx(c)
      c -> bounds.sliding(2).count {
        case Array(a, b) => a.getStruct(2).get(i) == b.getStruct(1).get(i)
        case _ => false
      }.toLong
    }.toMap
    val row = li.select(col("_pid") +: sortCols :+ newRun("l_returnflag") :+
        newRun("l_linestatus") :+ newRun("ship_day") :+
        newRun("l_suppkey"): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("nr_l_returnflag")).as("s1"),
        sum(col("nr_l_linestatus")).as("s2"),
        sum(col("nr_ship_day")).as("s3"),
        sum(col("nr_l_suppkey")).as("s4"))
      .collect().head
    val n = row.getLong(0)
    audited.zipWithIndex.map { case (c, i) =>
      c -> (row.getLong(i + 1) - corrections(c), n)
    }.toMap
  }

  private def kernelForm(name: String): Map[String, (Long, Long)] =
    run(name).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("kernel == window form on the fixture") {
    val src = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate").cast("date").as("ship_day"),
        col("l_suppkey"))
    assert(kernelForm("q_src_rle_advice") === windowForm(src))
  }

  test("kernel == window form on a boundary-heavy synthetic frame") {
    // every value of l_returnflag identical (1 global run — maximum
    // boundary corrections), l_linestatus alternates every row (zero
    // corrections possible), ship_day in coarse blocks, suppkey dense
    val src = spark.range(0, 4000).selectExpr(
      "id AS l_orderkey",
      "CAST(id % 3 AS INT) AS l_linenumber",
      "'A' AS l_returnflag",
      "CASE WHEN id % 2 = 0 THEN 'O' ELSE 'F' END AS l_linestatus",
      "DATE_ADD(DATE'1995-01-01', CAST(id DIV 100 AS INT)) AS ship_day",
      "id % 7 AS l_suppkey")
    val expected = windowForm(src)
    // route the kernel over the same frame by writing it as a tiny
    // parquet "lineitem" in a scratch sf dir
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rle-kernel").toString
    src.selectExpr("l_orderkey", "l_linenumber", "l_returnflag",
        "l_linestatus", "CAST(ship_day AS TIMESTAMP) AS l_shipdate",
        "l_suppkey",
        // pad the remaining lineitem columns Tables.lineitem reads
        "CAST(0 AS BIGINT) AS l_partkey",
        "CAST(1.0 AS DOUBLE) AS l_quantity",
        "CAST(1.0 AS DOUBLE) AS l_extendedprice",
        "CAST(0.0 AS DOUBLE) AS l_discount",
        "CAST(0.0 AS DOUBLE) AS l_tax",
        "CAST(NULL AS TIMESTAMP) AS l_commitdate",
        "CAST(NULL AS TIMESTAMP) AS l_receiptdate",
        "'x' AS l_shipinstruct", "'x' AS l_shipmode", "'x' AS l_comment")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_src_rle_advice")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === expected)
  }
}
