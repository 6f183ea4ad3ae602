package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}

import graft.sources.{GraftVersions, ObjectStoreMaintenance}

/** Round-6 first wave: (1) every path that archives a live object
  * folds its deletion vector first, so time travel and the change
  * feed can never resurrect MoR-deleted rows across a later CoW
  * rewrite (the r5 ADVICE high item); (2) the de-broadcast contract —
  * no forced broadcast over SF-scaling tables. */
class Round6WaveOneSpec extends SparkSpec {

  private def freshTable(tag: String, n: Long = 200): String = {
    val dir = Files.createTempDirectory(s"graft-r6-$tag").toString + "/t"
    spark.range(0, n).selectExpr("id", "id * 2 AS v",
      "concat('r', id) AS s")
      .repartition(4)
      .write.format("graft-objects").mode("overwrite").save(dir)
    dir
  }

  private def idsAt(path: String): Seq[Long] =
    spark.read.format("graft-objects").load(path)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq

  test("snapshot between MoR delete and compaction stays exact") {
    val dir = freshTable("dvcompact")
    ObjectStoreMaintenance.deleteMoR(dir, Array(LessThanOrEqual("id", 49L)))
    val vdv = GraftVersions.currentVersion(dir)
    assert(idsAt(dir) == (50L until 200L))
    ObjectStoreMaintenance.compact(spark, dir, 2)
    // live state unchanged by compaction
    assert(idsAt(dir) == (50L until 200L))
    // the snapshot AT the MoR-delete version must NOT resurrect the
    // 50 deleted rows: the compaction archive folded the DV first
    assert(idsAt(s"$dir@v$vdv") == (50L until 200L),
      "archived pre-compaction object must be its logical state")
    // and the pre-delete snapshot is still full
    assert(idsAt(s"$dir@v${vdv - 1}") == (0L until 200L))
  }

  test("snapshot between MoR delete and a later CoW DELETE stays exact") {
    val dir = freshTable("dvcow")
    ObjectStoreMaintenance.deleteMoR(dir, Array(LessThanOrEqual("id", 19L)))
    val vdv = GraftVersions.currentVersion(dir)
    val t = new graft.sources.GraftObjectTable(
      spark.read.format("graft-objects").load(dir).schema, dir)
    t.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("id", 180L)))
    assert(idsAt(dir) == (20L until 180L))
    assert(idsAt(s"$dir@v$vdv") == (20L until 200L),
      "CoW DELETE's archived pre-image must not resurrect MoR rows")
  }

  test("snapshot between MoR delete and TRUNCATE stays exact") {
    val dir = freshTable("dvtrunc")
    ObjectStoreMaintenance.deleteMoR(dir, Array(LessThanOrEqual("id", 49L)))
    val vdv = GraftVersions.currentVersion(dir)
    val t = new graft.sources.GraftObjectTable(
      spark.read.format("graft-objects").load(dir).schema, dir)
    t.truncateTable()
    assert(idsAt(dir).isEmpty)
    assert(idsAt(s"$dir@v$vdv") == (50L until 200L),
      "TRUNCATE's archive must fold the DV, not store raw bytes")
  }

  test("changes() window crossing a post-DV compaction is a no-op diff") {
    val dir = freshTable("dvfeed")
    ObjectStoreMaintenance.deleteMoR(dir, Array(LessThanOrEqual("id", 49L)))
    val vdv = GraftVersions.currentVersion(dir)
    ObjectStoreMaintenance.compact(spark, dir, 2)
    val vc = GraftVersions.currentVersion(dir)
    val feed = GraftVersions.changes(spark, dir, vdv, vc)
    // the raw feed reports the physical churn (old objects out, new
    // objects in); the LOGICAL content must cancel exactly — before
    // the fold-before-archive fix, the pre-state side read the 50
    // MoR-deleted rows back from the raw archived bytes and the net
    // diff showed 50 phantom deletes
    val ins = feed.filter(col("_change_type") === "insert")
      .drop("_change_type")
    val del = feed.filter(col("_change_type") === "delete")
      .drop("_change_type")
    assert(ins.exceptAll(del).count() == 0,
      "compaction net feed: no phantom inserts")
    assert(del.exceptAll(ins).count() == 0,
      "compaction net feed: no phantom deletes (resurrected MoR rows)")
  }

  test("de-broadcast: q_agg_new_returning is join-free (window min)") {
    val df = run("q_agg_new_returning")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"),
      s"per-customer first-year must be a window, not a broadcast join:\n" +
        plan.take(600))
    assert(df.collect().nonEmpty)
  }

  test("de-broadcast: no forced broadcast hints over SF-scaling tables") {
    // every remaining ResolvedHint in these plans must sit over a
    // bounded-domain side (nation/region or a 1-row aggregate), never
    // over customer/supplier/part/orders/lineitem columns
    val scalingPrefixes = Seq("c_", "s_", "p_", "o_", "l_")
    Seq("q_join_q3", "q_join_q5", "q_tpch_q10", "q_dq_expectations")
      .foreach { name =>
        val df = run(name)
        val hints = df.queryExecution.analyzed.collect {
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
            h
        }
        hints.foreach { h =>
          val bad = h.child.output.map(_.name)
            .filter(c => scalingPrefixes.exists(c.startsWith))
          assert(bad.isEmpty,
            s"$name: forced broadcast over SF-scaling columns $bad")
        }
      }
  }
}
