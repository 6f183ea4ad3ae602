package graft

import graft.functions.{GraftFunctions, VectorOps}
import graft.plans.AnnTopKRewrite
import org.apache.spark.sql.functions._

/** The MATERIALIZED ANN index (Similarity.annIndexRoot): stored
  * bucket/cell columns written at ingest, consumed by the indexed
  * queries and the AnnTopKRewrite rule — no corpus-side hash/argmax
  * recompute at query time, and object-level stats prune on the
  * stored bucket. */
class AnnIndexSpec extends SparkSpec {

  private lazy val root = graft.operators.Similarity.annIndexRoot(spark, sf)
  private lazy val corpus =
    spark.read.format("graft-objects").load(s"$root/corpus")

  test("index layout: stored bucket/cell columns, bucket-ranged objects") {
    assert(corpus.columns.toSet == Set("vec_id", "embedding", "cell", "bucket"))
    val objs = graft.sources.GraftObjectTable.listObjects(s"$root/corpus")
    assert(objs.size > 1, "corpus must span multiple objects")
    // stored bucket equals the recomputed hash for every row
    val mismatch = corpus
      .withColumn("b2", VectorOps.rhpBucket(col("embedding"), 64, 16))
      .filter(col("bucket") =!= col("b2")).count()
    assert(mismatch == 0, "stored bucket must equal the ingest-time hash")
    // range partitioning on bucket ⇒ a single-bucket probe prunes
    // whole objects via footer min/max stats
    val some = corpus.select("bucket").head().getLong(0)
    val pruned = corpus.filter(col("bucket") === some)
    assert(pruned.rdd.getNumPartitions < objs.size,
      s"bucket-equality probe must prune objects " +
        s"(${pruned.rdd.getNumPartitions} of ${objs.size} scanned)")
  }

  test("indexed LSH/IVF queries scan the stored columns (no corpus recompute)") {
    Seq("q_sim_ann_lsh_indexed" -> "bucket", "q_sim_ann_ivf_indexed" -> "cell")
      .foreach { case (q, keyCol) =>
        val df = run(q)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("GraftObjectScan"),
          s"$q must read the object-store index:\n${plan.take(600)}")
        assert(plan.contains(s"$keyCol:"),
          s"$q must scan the STORED $keyCol column")
        // the CORPUS join is keyed on the stored column: a broadcast
        // hash join, never a nested-loop over the corpus. (IVF's probe
        // SIDE legitimately cross-joins 20 queries × NCells broadcast
        // centroids — constant-size work, so only LSH asserts no BNLJ
        // anywhere.)
        assert(plan.contains("BroadcastHashJoin"), s"$q must hash-join on $keyCol")
        if (q.contains("lsh"))
          assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q must not BNLJ")
        // planted ground truth: every query finds its exact clone
        val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got.size == 20 && got.forall { case (q0, b) => b == q0 + 10000 },
          s"$q must retrieve the planted clone for all 20 queries")
      }
  }

  test("indexed PQ: stored codes scanned, no query-time encode/train over corpus") {
    // layout: codes sidecar holds exactly (vec_id, 8 codes in [0,16)),
    // one row per corpus vector; codebook sidecar holds 8 subs x 16
    // cells x 8 positions
    val codes = spark.read.format("graft-objects").load(s"$root/pq_codes")
    assert(codes.columns.toSet == Set("vec_id", "codes"))
    assert(codes.count() == Tables.embeddings(spark, sf).count())
    assert(codes.filter(size(col("codes")) =!= 8).count() == 0)
    val cb = spark.read.format("graft-objects").load(s"$root/pq_codebook")
    assert(cb.select("sub", "cell", "spos").distinct().count() == 8L * 16 * 8)

    val df = run("q_sim_ann_pq_indexed")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftObjectScan"),
      s"indexed PQ must read the object-store sidecars:\n${plan.take(600)}")
    // corpus side = codes only: the encode fold's signature is an L2
    // slice over the corpus `embedding` column — its absence (while the
    // query side's slice(qe…) remains) proves no pqEncode at query time;
    // no md5 means no trainPq seed pass either
    assert(!plan.contains("slice(embedding"),
      "query plan must not re-encode the corpus embeddings")
    assert(!plan.contains("md5("), "query plan must not re-train the codebook")
    // identical output to the train-at-query-time path (same oracle)
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    val ref = run("q_sim_ann_pq").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    assert(got == ref, "stored-code ADC must equal the full-training path")
  }

  test("AnnTopKRewrite consumes the stored bucket column and prunes objects") {
    // The production registration path: a session built with
    // spark.sql.extensions=GraftExtensions injects the rule into the
    // operator-optimization batch, which runs BEFORE Spark's early
    // scan pushdown — so the inserted InSet(bucket, …) reaches the
    // DSv2 source as a pushed In filter and prunes whole objects.
    // (extraOptimizations — the AnnRewriteSpec path — runs after
    // pushdown: correct plans, but no source pruning.) The session
    // shares this JVM's SparkContext.
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    try {
      s2.conf.set(AnnTopKRewrite.ConfKey, "true")
      val corpus2 = s2.read.format("graft-objects").load(s"$root/corpus")
      val qv = Tables.embeddings(spark, sf)
        .filter(col("vec_id") === 0).select("embedding").head()
        .getSeq[Float](0).toArray
      def topK = corpus2
        .select(col("vec_id"),
          round(call_function("cosine_sim", col("embedding"),
            typedLit(qv.toSeq)), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(5)
      val optimized = topK.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("rhp_bucket"),
        s"stored bucket attribute must replace the hash recompute:\n" +
          optimized.take(1000))
      // the InSet over the stored column reaches the source as a pushed
      // In filter ⇒ object-level pruning at planning time
      val executed = topK.queryExecution.executedPlan.toString
      assert(executed.contains("PushedFilters: [In(bucket"),
        s"bucket probes must push into the object scan:\n${executed.take(1200)}")
      val total = graft.sources.GraftObjectTable.listObjects(s"$root/corpus").size
      assert(topK.rdd.getNumPartitions < total,
        s"probe buckets must prune objects " +
          s"(${topK.rdd.getNumPartitions} of $total scanned)")
      val rows = topK.collect()
      // self and its planted clone share the bucket: both survive at cos 1
      assert(rows.take(2).map(_.getLong(0)).toSet == Set(0L, 10000L))
      // row-equal to the explicit multiprobe over the same stored corpus
      val qb = VectorOps.bucketOfVector(qv, 16)
      val manual = corpus2
        .filter(bit_count(col("bucket").bitwiseXOR(lit(qb))) <= 3)
        .select(col("vec_id"),
          round(call_function("cosine_sim", col("embedding"),
            typedLit(qv.toSeq)), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(5).collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        manual.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
