package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r9 optimization pin: the native cosine_argmax_cell expression must
  * reproduce the aggregate() fold it replaced in assignCells — first
  * strict maximum in array order (ties -> smallest cell on the sorted
  * array), seed (-2.0, -1), NaN cosines never displace the best.
  * Checked on fixture embeddings against synthetic centroid tables
  * with planted exact-duplicate centroids and a zero (NaN-cosine)
  * centroid. */
class CellArgmaxSpec extends SparkSpec {

  private def hofCell(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    df.withColumn("cell_hof", aggregate(
      col("cents"),
      struct(lit(-2.0).as("c"), lit(-1).as("cell")),
      (acc, ct) => {
        val c = call_function("cosine_sim",
          col("embedding"), ct.getField("centroid"))
        when(c > acc.getField("c"),
          struct(c.as("c"), ct.getField("cell").as("cell")))
          .otherwise(acc)
      }).getField("cell"))
  }

  private def compareForms(cents: DataFrame): Array[org.apache.spark.sql.Row] =
    hofCell(Tables.embeddings(spark, sf).crossJoin(broadcast(cents)))
      .withColumn("cell_native", call_function("cosine_argmax_cell",
        col("embedding"), col("cents")))
      .select("vec_id", "cell_hof", "cell_native").collect()

  test("native == HOF fold; exact-duplicate centroids tie to the smaller cell") {
    graft.functions.GraftFunctions.register(spark)
    // 5 centroids: 0 and 1 IDENTICAL (tie -> cell 0), rest distinct;
    // centroids double, vectors float
    val cents = spark.sql(
      """SELECT array_sort(collect_list(struct(cell, centroid))) AS cents
        |FROM (
        |  SELECT cell,
        |    CASE WHEN cell = 1 THEN transform(sequence(1, 64),
        |           i -> cast(0 * 7 + i AS DOUBLE))
        |         ELSE transform(sequence(1, 64),
        |           i -> cast(cell * 7 + i AS DOUBLE)) END AS centroid
        |  FROM (SELECT explode(sequence(0, 4)) AS cell))""".stripMargin)
    val rows = compareForms(cents)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"vec ${r.get(0)}")
      assert(r.getInt(2) != 1) // the duplicate always loses to cell 0
    }
  }

  test("native == HOF fold on a NaN (zero) centroid — Spark orders NaN above all") {
    graft.functions.GraftFunctions.register(spark)
    // cell 2 is all-zero -> NaN cosine; Spark's `>` ranks NaN above
    // every non-NaN, so the fold lets it displace the running best —
    // the native expression must reproduce that, not Java ordering
    val cents = spark.sql(
      """SELECT array_sort(collect_list(struct(cell, centroid))) AS cents
        |FROM (
        |  SELECT cell,
        |    CASE WHEN cell = 2 THEN transform(sequence(1, 64), i -> 0.0d)
        |         ELSE transform(sequence(1, 64),
        |           i -> cast(cell * 7 + i AS DOUBLE)) END AS centroid
        |  FROM (SELECT explode(sequence(0, 3)) AS cell))""".stripMargin)
    val rows = compareForms(cents)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"vec ${r.get(0)}")
      assert(r.getInt(2) == 2) // NaN wins in BOTH forms
    }
  }
}
