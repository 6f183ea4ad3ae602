package graft

import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("exact dedup is idempotent and keeps one row per hash") {
    val kept = run("q_dedup_exact")
    val n = kept.count()
    assert(n == kept.select("text_hash").distinct().count())
    // multiplicities sum back to table size
    val total = kept.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("minhash LSH recall: verified LSH pairs == exact jaccard pairs") {
    val lsh = run("q_dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("q_dedup_jaccard_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
  }

  test("jaccard pairs are symmetric-safe (ida < idb) and above threshold") {
    run("q_dedup_jaccard_pairs").collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.7)
    }
  }

  test("simhash: near-dup pairs (jaccard>=0.7) have small hamming distance") {
    val nearDups = run("q_dedup_jaccard_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hamming = run("q_dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // simhash is a probabilistic sketch: expect high (not perfect) recall
    val caught = nearDups.count(hamming.contains)
    assert(caught >= nearDups.size * 0.9,
      s"simhash caught only $caught of ${nearDups.size} near-dups")
  }

  test("clusters: consistent with pairs, labeled by component-min doc_id") {
    val pairs = run("q_dedup_jaccard_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val label = run("q_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty && label.nonEmpty)
    // every pair endpoint is labeled, and both ends share a cluster
    pairs.foreach { case (a, b) =>
      assert(label.contains(a) && label.contains(b))
      assert(label(a) == label(b), s"pair ($a,$b) split across clusters")
    }
    // each cluster's id IS its min member (the canonical representative)
    label.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid min=${members.keys.min}")
    }
    // exactly the docs that appear in some pair are clustered
    assert(label.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("incremental dedup: equals plain anti-join; both joins broadcast, no corpus merge join") {
    import org.apache.spark.sql.functions._
    val df = run("q_dedup_incremental")
    // reference computation: plain batch-anti-corpus on the text hash
    val docs = Tables.documents(spark, sf).withColumn("text_hash", md5(col("text")))
    val exp = docs.filter(col("doc_id") % 5 === 0)
      .join(docs.filter(col("doc_id") % 5 =!= 0).select("text_hash").distinct(),
        Seq("text_hash"), "left_anti")
      .select("doc_id", "text_hash")
    val canon = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => s"${r.get(0)}|${r.get(1)}").sorted.toSeq
    assert(canon(df) == canon(exp))
    assert(df.count() > 0, "fixture batch must have novel rows")

    // scale shape: the corpus is never sort-merge-joined or exchanged
    // into a join — both the verify semi and the final anti broadcast
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not be merge-joined:\n${plan.take(1500)}")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"semi + anti must both broadcast:\n${plan.take(1500)}")
  }

  test("large-star/small-star CC equals min-label propagation on random " +
      "graphs and converges fast on a deep chain") {
    val s = spark
    import s.implicits._
    def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rnd = new scala.util.Random(7)
    (0 until 5).foreach { trial =>
      val n = 40 + trial * 30
      val edges = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .toDF("ida", "idb")
      val stars = labelsOf(graft.operators.Dedup.connectedComponentsStars(edges))
      val minl = labelsOf(graft.operators.Dedup.connectedComponents(edges))
      assert(stars == minl, s"trial $trial: algorithms disagree")
      // labels really are component minima: every label labels itself
      stars.values.foreach(l => assert(stars(l) == l))
    }
    // a 256-node path: diameter 255 (min-label would need ~255 rounds);
    // the alternating rounds must label the whole chain with node 0
    val chain = (0L until 255L).map(i => (i, i + 1)).toDF("ida", "idb")
    val lab = labelsOf(graft.operators.Dedup.connectedComponentsStars(chain))
    assert(lab.size == 256 && lab.values.forall(_ == 0L),
      "deep chain must collapse to one component labeled 0")
  }

  test("cosine pairs: bounded by 1, above threshold, deterministic rerun") {
    val once = run("q_dedup_cosine_pairs").collect()
    once.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= 0.45 && c <= 1.000001)
    }
    val again = run("q_dedup_cosine_pairs").collect()
    assert(once.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
