package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{GraftObjectTable, GraftVersions}

/** Table versioning: snapshots, VERSION AS OF time travel, vacuum
  * retention, and the commit-serialization fixes that ride along
  * (monotonic sequence allocation, append-after-delete collision).
  */
class GraftVersionsSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-versions").toString
    spark.conf.set("spark.sql.catalog.gver", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gver.root", r)
    r
  }

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-ver-$tag").toString + "/t"

  private def writeRange(dir: String, from: Int, until: Int,
      mode: String): Unit = {
    import SparkSpec.spark.implicits._
    (from until until).map(i => (i.toLong, s"row$i")).toDF("k", "s")
      .repartitionByRange(2, col("k"))
      .write.format("graft-objects").mode(mode).save(dir)
  }

  private def keysAt(path: String): Seq[Long] =
    spark.read.format("graft-objects").load(path)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("every version of an append/delete/overwrite chain stays " +
      "exactly materializable via path@vN") {
    val dir = freshDir("chain")
    writeRange(dir, 0, 10, "overwrite") // v1: 0..9
    writeRange(dir, 10, 15, "append")   // v2: 0..14
    // v3: DELETE k >= 12 (partial rewrite of the tail object)
    val t = new graft.sources.GraftObjectTable(
      spark.read.format("graft-objects").load(dir).schema, dir)
    t.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 12L)))
    writeRange(dir, 100, 103, "overwrite") // v4: truncate to 100..102

    assert(GraftVersions.currentVersion(dir) == 4)
    assert(keysAt(s"$dir@v1") == (0L until 10L))
    assert(keysAt(s"$dir@v2") == (0L until 15L))
    assert(keysAt(s"$dir@v3") == (0L until 12L))
    assert(keysAt(s"$dir@v4") == (100L until 103L))
    assert(keysAt(dir) == (100L until 103L)) // live == latest
  }

  test("snapshot reads serve archived content even after the live " +
      "objects are gone (content isolation, not name aliasing)") {
    val dir = freshDir("isolate")
    writeRange(dir, 0, 6, "overwrite")  // v1
    writeRange(dir, 50, 53, "overwrite") // v2: truncate, fresh names
    // live t.0/t.1 now hold 50..52; v1 must come from the archive
    assert(keysAt(s"$dir@v1") == (0L until 6L))
    val archived = new File(dir, "_archive").listFiles()
    assert(archived != null && archived.nonEmpty,
      "superseded generation must be archived, not deleted")
  }

  test("full pushdown surface works on a snapshot: filters, column " +
      "pruning, footer aggregates") {
    val dir = freshDir("pushdown")
    writeRange(dir, 0, 20, "overwrite")
    writeRange(dir, 20, 40, "append")
    val snap = spark.read.format("graft-objects").load(s"$dir@v1")
    assert(snap.filter(col("k") >= 15).count() == 5)
    val agg = snap.agg(min("k"), max("k"), count(lit(1))).collect()(0)
    assert(agg.getLong(0) == 0 && agg.getLong(1) == 19 &&
      agg.getLong(2) == 20)
  }

  test("snapshots are read-only: writes and DELETE refuse") {
    val dir = freshDir("ro")
    writeRange(dir, 0, 5, "overwrite")
    import SparkSpec.spark.implicits._
    val ex = intercept[Exception] {
      Seq((99L, "x")).toDF("k", "s").write.format("graft-objects")
        .mode("append").save(s"$dir@v1")
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      c.getMessage
    }
    assert(rootMsg(ex).contains("read-only"))
  }

  test("SQL time travel through the catalog: VERSION AS OF") {
    root // force catalog registration
    spark.sql("""CREATE TABLE gver.main.tt (k BIGINT, s STRING)
                |USING `graft-objects`""".stripMargin)
    spark.sql("INSERT INTO gver.main.tt VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gver.main.tt VALUES (3, 'c')")
    spark.sql("DELETE FROM gver.main.tt WHERE k = 1")
    val now = spark.table("gver.main.tt")
      .select("k").collect().map(_.getLong(0)).sorted
    assert(now.toSeq == Seq(2L, 3L))
    val v1 = spark.sql("SELECT k FROM gver.main.tt VERSION AS OF 1")
      .collect().map(_.getLong(0)).sorted
    assert(v1.toSeq == Seq(1L, 2L))
    val v2 = spark.sql("SELECT k FROM gver.main.tt VERSION AS OF 2")
      .collect().map(_.getLong(0)).sorted
    assert(v2.toSeq == Seq(1L, 2L, 3L))
  }

  test("UPDATE through the catalog is a version: pre-image readable") {
    root
    spark.sql("""CREATE TABLE gver.main.up (k BIGINT, s STRING)
                |USING `graft-objects`""".stripMargin)
    spark.sql("INSERT INTO gver.main.up VALUES (1, 'a'), (2, 'b')")
    spark.sql("UPDATE gver.main.up SET s = 'Z' WHERE k = 2")
    val before = spark.sql(
      "SELECT s FROM gver.main.up VERSION AS OF 1 WHERE k = 2")
      .collect().map(_.getString(0))
    assert(before.toSeq == Seq("b"))
    val after = spark.sql("SELECT s FROM gver.main.up WHERE k = 2")
      .collect().map(_.getString(0))
    assert(after.toSeq == Seq("Z"))
  }

  test("vacuum drops only pre-floor versions; later ones stay exact") {
    val dir = freshDir("vac")
    writeRange(dir, 0, 5, "overwrite")   // v1
    writeRange(dir, 0, 7, "overwrite")   // v2
    writeRange(dir, 0, 9, "overwrite")   // v3
    GraftVersions.vacuum(dir, keepFrom = 1)
    intercept[Exception] { keysAt(s"$dir@v1") }
    assert(keysAt(s"$dir@v2") == (0L until 7L))
    assert(keysAt(s"$dir@v3") == (0L until 9L))
  }

  test("append after a gap-leaving DELETE cannot collide with a " +
      "surviving object name") {
    val dir = freshDir("gap")
    writeRange(dir, 0, 12, "overwrite")
    val t = new graft.sources.GraftObjectTable(
      spark.read.format("graft-objects").load(dir).schema, dir)
    // delete the FIRST range-partition object wholesale -> live names
    // have a gap at the front; a size-based base would now collide
    t.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.LessThan("k", 6L)))
    val before = keysAt(dir)
    writeRange(dir, 200, 203, "append")
    assert(keysAt(dir) == before ++ (200L until 203L),
      "append must not replace a surviving object")
    val names = GraftObjectTable.listObjects(dir)
      .map(p => new File(p).getName)
    assert(names.distinct.size == names.size)
  }

  test("concurrent appenders serialize on the commit lock: all " +
      "objects land, none replaced") {
    val dir = freshDir("conc")
    writeRange(dir, 0, 2, "overwrite")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = (0 until 4).map { i => Future {
      writeRange(dir, 10 * (i + 1), 10 * (i + 1) + 3, "append")
    }}
    writes.foreach(Await.result(_, Duration.Inf))
    val ks = keysAt(dir)
    assert(ks == (0L until 2L) ++
      (1 to 4).flatMap(i => 10L * i until (10L * i + 3)))
  }

  test("delta view @vA..B reads exactly what arrived in (A,B], " +
      "content as of B; empty windows read empty") {
    val dir = freshDir("delta")
    writeRange(dir, 0, 6, "overwrite")  // v1
    writeRange(dir, 6, 9, "append")     // v2
    writeRange(dir, 9, 12, "append")    // v3
    assert(keysAt(s"$dir@v1..3") == (6L until 12L))
    assert(keysAt(s"$dir@v2..3") == (9L until 12L))
    assert(keysAt(s"$dir@v0..2") == (0L until 9L)) // from 0 = snapshot
    assert(keysAt(s"$dir@v1..1") == Seq.empty)     // no-change window
  }

  test("delta view excludes objects that arrived and died inside the " +
      "window; rewrites count as changes") {
    val dir = freshDir("deltamut")
    writeRange(dir, 0, 6, "overwrite")  // v1: two objects
    writeRange(dir, 6, 12, "append")    // v2: two more
    val t = new graft.sources.GraftObjectTable(
      spark.read.format("graft-objects").load(dir).schema, dir)
    // v3: kills one v2 object whole (9..11), rewrites the other (6..8)
    t.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 8L)))
    // added-in-window objects that died in-window are not part of the
    // delta at its end; the surviving rewritten one serves v3 content
    assert(keysAt(s"$dir@v1..3") == Seq(6L, 7L))
  }

  test("history(): one row per version with object-count deltas") {
    val dir = freshDir("hist")
    writeRange(dir, 0, 6, "overwrite")
    writeRange(dir, 6, 9, "append")
    writeRange(dir, 0, 4, "overwrite")
    val h = GraftVersions.history(spark, dir)
      .orderBy(col("version")).collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(h(0).getInt(1) == 2 && h(0).getInt(2) == 0) // +2 objects
    assert(h(1).getInt(1) == 2 && h(1).getInt(2) == 0)
    assert(h(2).getInt(1) == 2 && h(2).getInt(2) == 4) // truncate
  }

  test("catalog delta: VERSION AS OF 'a..b' serves the increment") {
    root
    spark.sql("""CREATE TABLE gver.main.inc (k BIGINT, s STRING)
                |USING `graft-objects`""".stripMargin)
    spark.sql("INSERT INTO gver.main.inc VALUES (1, 'a')")
    spark.sql("INSERT INTO gver.main.inc VALUES (2, 'b'), (3, 'c')")
    val delta = spark.sql(
      "SELECT k FROM gver.main.inc VERSION AS OF '1..2'")
      .collect().map(_.getLong(0)).sorted
    assert(delta.toSeq == Seq(2L, 3L))
  }

  test("a frozen delta view streams: readStream over @vA..B replays " +
      "exactly the increment as micro-batches") {
    val dir = freshDir("dstream")
    writeRange(dir, 0, 6, "overwrite")  // v1
    writeRange(dir, 6, 12, "append")    // v2
    val schema = spark.read.format("graft-objects").load(dir).schema
    val ckpt = Files.createTempDirectory("graft-dstream-ckpt").toString
    val q = spark.readStream.format("graft-objects").schema(schema)
      .load(s"$dir@v1..2")
      .writeStream.format("memory").queryName("dstream_sink")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("dstream_sink")
      .select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (6L until 12L))
  }

  test("TIMESTAMP AS OF resolves to the latest commit at or before " +
      "the instant") {
    root
    spark.sql("""CREATE TABLE gver.main.tsv (k BIGINT)
                |USING `graft-objects`""".stripMargin)
    spark.sql("INSERT INTO gver.main.tsv VALUES (1)")
    Thread.sleep(25)
    val mid = System.currentTimeMillis()
    Thread.sleep(25)
    spark.sql("INSERT INTO gver.main.tsv VALUES (2)")
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(mid))
    val rows = spark.sql(
      s"SELECT k FROM gver.main.tsv TIMESTAMP AS OF '$lit'")
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(1L))
    val now = spark.sql(
      "SELECT k FROM gver.main.tsv").collect().map(_.getLong(0)).sorted
    assert(now.toSeq == Seq(1L, 2L))
  }

  test("cloneVersion materializes an independent table from a snapshot") {
    val dir = freshDir("clonesrc")
    writeRange(dir, 0, 6, "overwrite")   // v1
    writeRange(dir, 6, 9, "append")      // v2
    val tgt = freshDir("clonedst")
    GraftVersions.cloneVersion(dir, 1, tgt)
    assert(keysAt(tgt) == (0L until 6L))
    // independent: mutating the source leaves the clone alone
    writeRange(dir, 100, 103, "overwrite")
    assert(keysAt(tgt) == (0L until 6L))
    // the clone's history starts at version 1 and grows on its own
    assert(GraftVersions.currentVersion(tgt) == 1)
    writeRange(tgt, 50, 52, "append")
    assert(GraftVersions.currentVersion(tgt) == 2)
    assert(keysAt(s"$tgt@v1") == (0L until 6L))
  }

  test("version log survives table RENAME (history travels)") {
    root
    spark.sql("""CREATE TABLE gver.main.rn (k BIGINT, s STRING)
                |USING `graft-objects`""".stripMargin)
    spark.sql("INSERT INTO gver.main.rn VALUES (1, 'a')")
    spark.sql("INSERT INTO gver.main.rn VALUES (2, 'b')")
    spark.sql("ALTER TABLE gver.main.rn RENAME TO gver.main.rn2")
    val v1 = spark.sql("SELECT k FROM gver.main.rn2 VERSION AS OF 1")
      .collect().map(_.getLong(0))
    assert(v1.toSeq == Seq(1L))
  }

  test("row-level change feed: UPDATE surfaces as delete+insert pair " +
      "from the rewritten object's archive diff") {
    root
    spark.sql("""CREATE TABLE gver.main.cdf (k BIGINT, s STRING)
                |USING `graft-objects`""".stripMargin)
    spark.sql("INSERT INTO gver.main.cdf VALUES (1,'a'), (2,'b'), (3,'c')")
    val dir = s"$root/main/cdf"
    val v0 = graft.sources.GraftVersions.currentVersion(dir)
    spark.sql("UPDATE gver.main.cdf SET s = 'B' WHERE k = 2")
    val v1 = graft.sources.GraftVersions.currentVersion(dir)
    assert(v1 > v0)
    val ch = graft.sources.GraftVersions.changes(spark, dir, v0, v1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    // exactly the touched row, both directions; untouched rows silent
    assert(ch == Set((2L, "b", "delete"), (2L, "B", "insert")), s"got $ch")
  }

  test("optimistic commit: two interleaved lock-free committers, " +
      "serialized history, no lost commit") {
    import graft.sources.GraftVersions
    val dir = java.nio.file.Files
      .createTempDirectory("graft-occ").toString
    val perWriter = 20
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val done = new java.util.concurrent.CountDownLatch(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // two "hosts": no shared JVM monitor, no _lock file — only the
    // atomic-exclusive _log.d/<v> link arbitrates
    (0 until 2).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try {
            (0 until perWriter).foreach { i =>
              GraftVersions.commitOptimistic(dir) { v =>
                GraftVersions.Commit(v, Seq(s"t.w${w}i$i"), Nil, Nil,
                  None, System.currentTimeMillis())
              }
            }
          } catch { case t: Throwable => errs.add(t) }
          finally done.countDown()
        }
      })
    }
    done.await(120, java.util.concurrent.TimeUnit.SECONDS)
    pool.shutdown()
    assert(errs.isEmpty, s"committer failed: ${errs.peek()}")
    val log = GraftVersions.readLog(dir)
    // serialized: versions are exactly 1..40, each minted once
    assert(log.map(_.v) == (1 to 2 * perWriter).toList,
      s"history not serialized: ${log.map(_.v)}")
    // no lost commit: every writer's every object is named
    val added = log.flatMap(_.add).toSet
    for (w <- 0 until 2; i <- 0 until perWriter)
      assert(added.contains(s"t.w${w}i$i"), s"lost commit w${w}i$i")
  }

  test("validated commit: interleaved rewrite of the read set aborts, " +
      "disjoint interleave rebases") {
    import graft.sources.GraftVersions
    val dir = java.nio.file.Files
      .createTempDirectory("graft-occv").toString
    GraftVersions.commitOptimistic(dir) { v =>
      GraftVersions.Commit(v, Seq("t.0"), Nil, Nil, None,
        System.currentTimeMillis()) }
    // writer A read t.0 at v1; an interleaved commit rewrites t.0 ⇒
    // A's staged result is stale and MUST abort (nothing published)
    GraftVersions.commitOptimistic(dir) { v =>
      GraftVersions.Commit(v, Nil, Nil, Seq("t.0"), None,
        System.currentTimeMillis()) }
    intercept[GraftVersions.ConcurrentWriteException] {
      GraftVersions.commitValidated(dir, readVersion = 1, Set("t.0")) { v =>
        GraftVersions.Commit(v, Seq("t.1"), Nil, Nil, None,
          System.currentTimeMillis()) }
    }
    assert(GraftVersions.currentVersion(dir) == 2, "abort must publish nothing")
    // an interleaved commit touching OTHER objects commutes: rebase
    val c = GraftVersions.commitValidated(dir, readVersion = 2,
      Set("t.unrelated")) { v =>
      GraftVersions.Commit(v, Seq("t.1"), Nil, Nil, None,
        System.currentTimeMillis()) }
    assert(c.v == 3)
  }

  test("validated commit: two interleaved replace-object writers on the " +
      "same key lose no update") {
    import graft.sources.GraftVersions
    val base = java.nio.file.Files.createTempDirectory("graft-occm")
    val dir = base.toString
    def now = System.currentTimeMillis()
    // seed: counter object at value 0 (every later writer has a
    // nonempty read set, so validation is always armed)
    GraftVersions.commitOptimistic(dir) { v =>
      java.nio.file.Files.writeString(base.resolve(s"t.seed"), "0")
      GraftVersions.Commit(v, Seq("t.seed"), Nil, Nil, None, now) }
    def state(): (Int, String, Int) = {
      val rv = GraftVersions.currentVersion(dir)
      val cur = GraftVersions.readLog(dir).filter(_.v <= rv).last.add.head
      (rv, cur, java.nio.file.Files.readString(base.resolve(cur)).trim.toInt)
    }
    val perWriter = 10
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val done = new java.util.concurrent.CountDownLatch(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val aborts = new java.util.concurrent.atomic.AtomicInteger
    (0 until 2).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try {
            // each increment is a MERGE shape: read the counter object,
            // stage a replacement, commit del(old)+add(new) declaring
            // the read; on conflict re-read the new tip and REBUILD
            (0 until perWriter).foreach { _ =>
              var committed = false
              while (!committed) {
                val (rv, prev, old) = state()
                try {
                  GraftVersions.commitValidated(dir, rv, Set(prev)) { v =>
                    val name = s"t.w${w}v$v"
                    java.nio.file.Files.writeString(
                      base.resolve(name), (old + 1).toString)
                    GraftVersions.Commit(v, Seq(name), Seq(prev), Nil,
                      None, now)
                  }
                  committed = true
                } catch {
                  case _: GraftVersions.ConcurrentWriteException =>
                    aborts.incrementAndGet() // stale read — rebuild
                }
              }
            }
          } catch { case t: Throwable => errs.add(t) }
          finally done.countDown()
        }
      })
    }
    done.await(120, java.util.concurrent.TimeUnit.SECONDS)
    pool.shutdown()
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    // every successful increment minted exactly one version...
    val log = GraftVersions.readLog(dir)
    assert(log.map(_.v) == (1 to 2 * perWriter + 1).toList,
      s"history not serialized: ${log.map(_.v)}")
    // ...and NO update was lost: the final counter saw all 20
    val (_, _, fin) = state()
    assert(fin == 2 * perWriter,
      s"lost updates: final counter $fin of ${2 * perWriter} " +
        s"(${aborts.get()} validated aborts)")
  }

  test("log encoding rejects names the unescaped format cannot carry") {
    // a quote/comma/bracket in an object name would silently corrupt
    // the hand-encoded log; the charset guard must fail loudly instead
    val dir = java.nio.file.Files
      .createTempDirectory("graft-vname").toString
    Seq("""t".0""", "t,x.1", "t]x.2", "t\\x.3").foreach { bad =>
      intercept[IllegalArgumentException] {
        graft.sources.GraftVersions.record(dir, 1, Seq(bad),
          Seq.empty, Seq.empty, None)
      }
    }
  }
}
