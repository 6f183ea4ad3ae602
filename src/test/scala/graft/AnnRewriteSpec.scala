package graft

import graft.functions.{GraftFunctions, VectorOps}
import graft.plans.{AnnTopKRewrite, RhpBucket}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY §4.2(b): the ANN top-k optimizer rule + the native bucket
  * expression backing it. */
class AnnRewriteSpec extends SparkSpec {

  private def queryVec: Array[Float] = {
    val r = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0).select("embedding").head()
    r.getSeq[Float](0).toArray
  }

  test("RhpBucket expression is bit-identical to the HOF rhpBucket") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
    val both = e.select(
      VectorOps.rhpBucket(col("embedding"), 64, 16).as("hof"),
      call_function("rhp_bucket", col("embedding"),
        lit(64), lit(16), lit(42L)).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("rule rewrites literal-query cosine top-k into a bucket-pruned plan") {
    GraftFunctions.register(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AnnTopKRewrite
    val qv = queryVec
    def topK = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        round(call_function("cosine_sim", col("embedding"),
          typedLit(qv.toSeq)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(5)
    try {
      // OFF (default): exact plan, no bucket filter
      val exact = topK.collect()
      assert(!topK.queryExecution.optimizedPlan.toString.contains("rhp_bucket"))
      // ON: filter inserted, self still found at rank 1, high recall
      spark.conf.set(AnnTopKRewrite.ConfKey, "true")
      val plan = topK.queryExecution.optimizedPlan.toString
      assert(plan.contains("rhp_bucket") && plan.contains("INSET"),
        s"expected bucket-pruned plan, got:\n${plan.take(1500)}")
      val approx = topK.collect()
      assert(approx.head.getLong(0) == 0L,
        "query vector itself must survive pruning (same bucket, cos=1)")
      // the rewrite must be EXACTLY the explicit multiprobe query:
      // same candidates (hamming <= 3 of the query bucket), same order
      val qb = VectorOps.bucketOfVector(qv, 16)
      val manual = Tables.embeddings(spark, sf)
        .withColumn("b", VectorOps.rhpBucket(col("embedding"), 64, 16))
        .filter(bit_count(col("b").bitwiseXOR(lit(qb))) <= 3)
        .select(col("vec_id"),
          round(call_function("cosine_sim", col("embedding"),
            typedLit(qv.toSeq)), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(5).collect()
      assert(approx.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        manual.map(r => (r.getLong(0), r.getDouble(1))).toSeq,
        "rewritten plan must equal the explicit multiprobe query")
      // exactness sanity: the true best neighbor set overlaps on self
      assert(exact.map(_.getLong(0)).contains(0L))
    } finally {
      spark.conf.unset(AnnTopKRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == AnnTopKRewrite)
    }
  }

  test("rule never touches an unlimited ORDER BY (exactness preserved)") {
    GraftFunctions.register(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AnnTopKRewrite
    try {
      spark.conf.set(AnnTopKRewrite.ConfKey, "true")
      val qv = queryVec
      val full = Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          round(call_function("cosine_sim", col("embedding"),
            typedLit(qv.toSeq)), 6).as("cos"))
        .orderBy(col("cos").desc)
      assert(!full.queryExecution.optimizedPlan.toString.contains("rhp_bucket"))
      assert(full.count() == Tables.embeddings(spark, sf).count())
    } finally {
      spark.conf.unset(AnnTopKRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == AnnTopKRewrite)
    }
  }
}
