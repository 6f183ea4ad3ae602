package graft

import org.apache.spark.sql.functions._

/** Round-5 analytics additions: degree-oriented triangle counting,
  * rolling z-score anomaly flags, weekly cohort retention, the
  * cross-source contamination matrix, and the ANN recall@5 eval.
  * Each query's exactness is the driver's DuckDB oracle; these specs
  * pin the structural invariants and plan shapes. */
class Round5OpsSpec extends SparkSpec {

  test("triangles: equi-join enumeration, per-node count bounded by C(deg,2)") {
    val df = run("q_graph_triangles")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle enumeration must be equi-joins:\n${plan.take(800)}")
    val rows = df.collect()
    assert(rows.length == 25, "one row per nation")
    rows.foreach { r =>
      val (deg, tri) = (r.getLong(1), r.getLong(2))
      assert(tri <= deg * (deg - 1) / 2,
        s"${r.getString(0)}: $tri triangles exceeds C($deg,2)")
      assert(tri >= 0 && deg >= 0)
    }
    // a closed wedge needs every corner to touch both others
    assert(rows.exists(_.getLong(2) > 0), "trade graph has triangles")
  }

  test("anomaly flags: causal trailing window, every output flagged, 5<=n<=10") {
    val rows = run("q_ts_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("is_anomaly")))
      val n = r.getLong(r.fieldIndex("n_window"))
      assert(n >= 5 && n <= 10, s"window count $n outside [5,10]")
    }
    // flags are a strict subset of the scored population
    val scored = Tables.events(spark, sf).filter(col("user_id") < 40).count()
    assert(rows.length < scored, "an anomaly detector that flags everything is broken")
  }

  test("retention: offset-0 cell is the cohort itself; cells never exceed cohort") {
    val rows = run("q_win_retention").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, active, cohort) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(active <= cohort, "active users cannot exceed the cohort")
      assert(off >= 0)
      if (off == 0) {
        assert(active == cohort, "everyone is active in their own first week")
        assert(r.getDouble(4) == 1.0)
      }
    }
    assert(rows.exists(_.getLong(1) == 0), "every cohort has its own first week")
  }

  test("cross-source overlap: jaccard in [0,1], intersection bounded, pairs canonical") {
    val rows = run("q_dedup_cross_source_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, s"pair ($a,$b) not canonical")
      val (i, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(i <= math.min(na, nb), "intersection exceeds a side")
      val j = r.getDouble(5)
      assert(j >= 0.0 && j <= 1.0, s"jaccard $j out of range")
      assert(math.abs(j - math.round(i.toDouble / (na + nb - i) * 1e6) / 1e6)
        < 1e-9, "jaccard inconsistent with its own counts")
    }
  }

  test("attribution: channels closed set, every purchase credited exactly once") {
    val rows = run("q_win_attribution").collect()
    val channels = rows.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("view", "click", "none")),
      s"unexpected channels: $channels")
    val total = rows.map(_.getLong(1)).sum
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(total == purchases,
      s"credited $total of $purchases purchases — attribution must partition them")
  }

  test("copurchase: canonical pairs, support >= 2, non-increasing") {
    val rows = run("q_agg_copurchase").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not canonical")
      assert(r.getLong(2) >= 2, "support threshold violated")
    }
    val supports = rows.map(_.getLong(2)).toSeq
    assert(supports == supports.sortBy(-_), "top-k not ordered by support")
  }

  test("phrase search: every reported hit is a real token adjacency") {
    val rows = run("q_text_phrase_search").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute from the raw text: count adjacent (spark, merge) pairs
    val truth = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ")
        val hits = toks.indices.dropRight(1)
          .filter(i => toks(i) == "spark" && toks(i + 1) == "merge")
        r.getLong(0) -> hits
      }.filter(_._2.nonEmpty).toMap
    assert(rows.keySet == truth.keySet, "hit doc sets differ")
    truth.foreach { case (doc, hits) =>
      assert(rows(doc) == ((hits.length.toLong, hits.head.toLong)),
        s"doc $doc: got ${rows(doc)}, want (${hits.length}, ${hits.head})")
    }
  }

  test("silhouette: all vectors scored, averages in [-1,1], misfits bounded") {
    val rows = run("q_vec_silhouette").collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.embeddings(spark, sf).count(), "every vector scored once")
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= -1.0 && s <= 1.0, s"avg silhouette $s out of range")
      assert(r.getLong(3) <= r.getLong(1), "misfits exceed label size")
    }
  }

  test("scene cuts: deltas exceed threshold, first frame never a cut") {
    val rows = run("q_mm_scene_cuts").collect()
    rows.foreach { r =>
      assert(math.abs(r.getLong(3)) > 250, "delta under threshold")
      assert(r.getLong(1) >= 1, "frame 0 has no predecessor to cut from")
      val e = r.getLong(2)
      assert(e >= 0 && e <= 64L * 255, s"energy $e outside byte-sum bounds")
    }
  }

  test("streaming anomaly equals the batch detector row-for-row") {
    def canon(name: String) = run(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(canon("q_stream_anomaly") == canon("q_ts_anomaly"),
      "ring-buffer streaming state must reproduce the batch window exactly")
  }

  test("bpe pairs: counts non-increasing, top pair verified against raw text") {
    val rows = run("q_text_bpe_pairs").collect()
    assert(rows.length == 20)
    val ns = rows.map(_.getLong(1)).toSeq
    assert(ns == ns.sortBy(-_), "not ordered by count")
    rows.foreach(r => assert(r.getString(0).length == 2))
    // recompute the champion from raw text (corpus is small at sf0.001)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sf).select("text").collect().foreach { r =>
      r.getString(0).split(" ").filter(_.length >= 2).foreach { w =>
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1
        }
      }
    }
    val champion = counts.toSeq.sortBy { case (p, n) => (-n, p) }.head
    assert((rows(0).getString(0), rows(0).getLong(1)) == champion,
      s"top pair ${rows(0).getString(0)} disagrees with raw-text $champion")
  }

  test("kmv intersect: sketch algebra consistent and near the exact answer") {
    val r = run("q_agg_kmv_intersect").collect()
    assert(r.length == 1)
    val row = r(0)
    def g(n: String) = row.getLong(row.fieldIndex(n))
    assert(g("est_both") <= g("est_union"), "intersection exceeds union")
    assert(g("est_union") >= math.max(g("est_click"), g("est_purchase")) * 9 / 10,
      "union estimate below its own parts")
    // k=64 KMV: relative error ~1/sqrt(k) = 12.5%; assert a loose 3x belt
    Seq(("est_click", "exact_click"), ("est_purchase", "exact_purchase"))
      .foreach { case (e, x) =>
        val (est, exact) = (g(e), g(x))
        assert(math.abs(est - exact) <= math.max(3, exact * 38 / 100),
          s"$e=$est too far from $x=$exact")
      }
  }

  test("ann recall eval: one row per probe query, self always retrieved") {
    val rows = run("q_sim_ann_recall").collect()
    assert(rows.length == 20, "one row per probe query")
    rows.foreach { r =>
      val hit = r.getLong(1)
      // the query's own bucket is always probed (mask 0) and self ranks
      // first in both arms at cos 1 — so recall is never zero
      assert(hit >= 1 && hit <= 5, s"n_hit $hit outside [1,5]")
      assert(r.getDouble(2) == hit / 5.0)
    }
  }
}
