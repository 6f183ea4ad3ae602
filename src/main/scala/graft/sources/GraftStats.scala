package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `runstats` surfaced as data (SURVEY §2.4/§4.1):
  * a per-column statistics report answered ENTIRELY from object
  * footers — row and null counts (exact), merged min/max bounds
  * (exact for integral/floating, parquet-truncation-valid for
  * strings), and a merged-KMV NDV estimate (exact below the sketch
  * size, ±~6% beyond). No object body is ever read: a 100 TB profile
  * costs one footer read per object — the same metadata pass query
  * planning already does, here exposed as a queryable DataFrame the
  * way `ANALYZE TABLE`/DESCRIBE output would be.
  *
  * Driver-side by design: footers are bytes-per-object metadata. If a
  * table had so many objects the driver loop mattered, the same merge
  * is associative and would run as a parallelize-over-footers job.
  */
object GraftStats {

  /** One row per requested column:
    * (col_name, row_count, null_count, min_v, max_v, ndv_est).
    * min/max render as strings (Long/Double/UTF8String toString) so
    * one schema carries every column kind; null when the table has no
    * stats for the column (all-null, NaN-disabled, or non-stat type). */
  def profile(spark: SparkSession, dir: String,
      cols: Seq[String]): DataFrame = {
    val footers = GraftObjectTable.listObjects(dir)
      .map(ObjectFormat.readFooter)
    val rows = cols.map { c =>
      val rowCount = footers.map(_.rowCount.toLong).sum
      // exact only when EVERY footer carries stats for the column; an
      // object whose footer omits them (e.g. all-null object) has an
      // unknown null count, so the profile reports NULL rather than an
      // undercount that reads as exact
      val withStats = footers.flatMap(_.stats.get(c))
      val nullCount: Any =
        if (withStats.length == footers.length)
          Long.box(withStats.map(_.nullCount.toLong).sum)
        else null
      val bounds = footers.flatMap(_.stats.get(c))
        .filter(s => s.min != null && s.max != null)
      def render(v: Any): String = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      val minV = bounds.map(_.min).reduceOption { (a, b) =>
        if (ObjectFormat.cmpExact(a, b).exists(_ <= 0)) a else b
      }.map(render).orNull
      val maxV = bounds.map(_.max).reduceOption { (a, b) =>
        if (ObjectFormat.cmpExact(a, b).exists(_ >= 0)) a else b
      }.map(render).orNull
      val ndv = ObjectFormat.ndvEstimate(
        footers.flatMap(_.ndvSketch.get(c)))
      Row(c, rowCount, nullCount, minV, maxV,
        ndv.map(Long.box).orNull)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, StructType.fromDDL(
      "col_name STRING, row_count BIGINT, null_count BIGINT, " +
        "min_v STRING, max_v STRING, ndv_est BIGINT"))
  }
}
