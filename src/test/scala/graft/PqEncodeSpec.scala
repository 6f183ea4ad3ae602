package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r9 optimization pin: the native pq_encode_codes expression must be
  * bit-identical to the interpreted HOF spelling it replaced —
  * distances as strict left-to-right (a-b)² folds, argmin in codebook
  * array order with strict <, ties to the smallest cell, empty
  * subspace -> -1. Checked on the fixture embeddings (float vectors)
  * and on synthetic double vectors with planted exact ties and a
  * missing subspace. */
class PqEncodeSpec extends SparkSpec {

  private val nSub = 8
  private val subDim = 8

  private def hofCodes(df: DataFrame): DataFrame = {
    val distExpr =
      s"""aggregate(zip_with(slice(embedding, c.sub * $subDim + 1, $subDim),
         |  c.centroid, (a, b) -> (cast(a as double) - b) * (cast(a as double) - b)),
         |  cast(0 as double), (x, y) -> x + y)""".stripMargin
    df.withColumn("codes_hof", expr(
      s"""transform(sequence(0, ${nSub - 1}), s ->
         |  aggregate(
         |    transform(filter(cb, c -> c.sub = s),
         |      c -> struct($distExpr as d, c.cell as cell)),
         |    struct(cast(1e18 as double) as d, -1 as cell),
         |    (acc, x) -> if(x.d < acc.d, x, acc)).cell)""".stripMargin))
  }

  private def bothForms(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    hofCodes(df).withColumn("codes_native",
      call_function("pq_encode_codes",
        col("embedding"), col("cb"), lit(nSub), lit(subDim)))
  }

  test("native == HOF on fixture float embeddings x synthetic codebook") {
    // deterministic codebook: 16 cells per subspace from fixture rows
    val cb = Tables.embeddings(spark, sf).limit(16)
      .select(col("vec_id").cast("int").as("cell"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .select((col("pos") / subDim).cast("int").as("sub"), col("cell"),
        col("v"))
      .groupBy(col("sub"), col("cell"))
      .agg(collect_list(col("v")).as("centroid"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cell"),
        col("centroid")))).as("cb"))
    val rows = bothForms(
      Tables.embeddings(spark, sf).crossJoin(broadcast(cb)))
      .select("vec_id", "codes_hof", "codes_native").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"vec ${r.get(0)}")
    }
  }

  test("native == HOF on planted ties, empty subspace, double vectors") {
    // two cells with IDENTICAL centroids in sub 0 (tie -> smaller cell);
    // sub 7 has NO entries (-> -1); vectors are array<double>
    val cb = spark.sql(
      s"""SELECT array_sort(collect_list(struct(sub, cell, centroid))) AS cb
         |FROM (
         |  SELECT s.sub, c.cell,
         |    transform(sequence(1, $subDim),
         |      i -> cast(s.sub * 1.5 + i AS DOUBLE)) AS centroid
         |  FROM (SELECT explode(sequence(0, ${nSub - 2})) AS sub) s
         |  CROSS JOIN (SELECT explode(sequence(0, 3)) AS cell) c)
         |""".stripMargin)
    val vecs = spark.range(0, 50).selectExpr("id AS vec_id",
      s"transform(sequence(1, ${nSub * subDim}), " +
        "i -> cast((id * 37 + i * 13) % 29 AS DOUBLE)) AS embedding")
    val rows = bothForms(vecs.crossJoin(broadcast(cb)))
      .select("vec_id", "codes_hof", "codes_native").collect()
    rows.foreach { r =>
      val hof = r.getSeq[Int](1); val nat = r.getSeq[Int](2)
      assert(hof == nat, s"vec ${r.get(0)}: $hof vs $nat")
      assert(nat.last == -1) // the empty subspace
      assert(nat.head == 0)  // identical centroids per sub -> smallest cell
    }
  }
}
