package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Table versioning for the graft object store — snapshots, time
  * travel and retention over the `<table>.<seq>` object layout
  * (SURVEY §1.1/§2.11; the capability a 100 TB training-data pipeline
  * needs that plain object sequences don't give: "train on the exact
  * corpus snapshot v12 while ingest and curation keep running", and
  * the reproducibility story that goes with it).
  *
  * Mechanism — three sidecars per table directory, all invisible to
  * `listObjects`' `<table>.<seq>` pattern:
  *
  *  - `_log`: append-only JSON lines, one per committed mutation.
  *    Line k (version k) records the object names the commit added
  *    (`add`), removed (`del`) and rewrote in place (`rw`), plus the
  *    streaming epoch id when the commit was a streaming sink epoch
  *    (for replay idempotence). The first logged commit on a table
  *    that predates logging bootstraps line 1 as a baseline `add` of
  *    the then-live objects.
  *  - `_archive/`: content superseded by later versions. A removed
  *    object is MOVED to `_archive/<name>@v<k>`; an in-place rewrite
  *    (DELETE's partial-object path) first COPIES the old content
  *    there. `<k>` is the version that superseded the content, so
  *    name reuse across generations (e.g. re-append after TRUNCATE)
  *    stays unambiguous.
  *  - `_lock`: commit mutex. Every mutation commits under an OS file
  *    lock on it, which serializes concurrent appenders' sequence
  *    allocation (two writers can no longer both compute the same
  *    `<table>.<seq>` base) — the CAS discipline a shared object
  *    store would provide natively.
  *
  * Reading a snapshot: `path@v<k>` anywhere a table path is accepted
  * (`load("…/t@v3")`, or SQL `VERSION AS OF 3` through GraftCatalog).
  * `GraftObjectTable.listObjects` resolves the suffix here: replay
  * `_log` through version k for the live name set, then map each name
  * to its content location — the archive copy written by the SMALLEST
  * version > k that superseded the name, or the live file when none
  * did. Because resolution happens inside the one listing function
  * every scan path shares, the full read surface (footer pruning,
  * aggregate/limit pushdown, clustered reads, membership indexes,
  * streaming a frozen snapshot) works on old versions unchanged.
  *
  * Retention: `vacuum(dir, keepFrom)` deletes archive content only
  * reachable from versions <= keepFrom and records the floor in
  * `_vacuum`; resolving at-or-below the floor refuses loudly rather
  * than answering from partial state.
  *
  * Crash window: a commit's file operations (archive moves, staged
  * renames) precede its log append, so a crash mid-commit can leave
  * the live state transitioned but unlogged — the same single-writer
  * staged-rename caveat the store documents for every commit path; on
  * a real object store a manifest CAS would close it. The lock file
  * bounds the damage to one torn commit, never interleaved ones.
  *
  * 100 TB posture: the log is names-only metadata (bytes per commit,
  * not per row); snapshot resolution is a driver-side metadata step
  * of the same order as directory listing; archive moves are renames
  * within one directory tree, and the one content COPY (pre-rewrite
  * archival) is bounded by a single object's size.
  */
object GraftVersions {

  /** One `_log` line. `rw` names kept their `<table>.<seq>` name but
    * changed content at this version (in-place partial-DELETE
    * rewrite); their pre-image lives at `_archive/<name>@v<this>`.
    * `t` is the commit wall-clock (epoch millis; 0 for lines written
    * before timestamps existed) — what TIMESTAMP AS OF resolves
    * against. */
  case class Commit(v: Int, add: Seq[String], del: Seq[String],
      rw: Seq[String], epoch: Option[Long], t: Long = 0L)

  /** A version-suffixed read view. `Snapshot(k)` = `path@v<k>`, the
    * table exactly as of version k. `Delta(a, b)` = `path@v<a>..<b>`,
    * the INCREMENTAL view: objects first added (or rewritten) in
    * versions (a, b] that are still live at b, content as of b — the
    * "process only what arrived since the last run" primitive an
    * incremental 100 TB pipeline schedules on (checkpoint = the last
    * processed version number, a single int). `a = 0` degenerates to
    * the full snapshot at b. */
  sealed trait Ref { def to: Int }
  final case class Snapshot(to: Int) extends Ref
  final case class Delta(from: Int, to: Int) extends Ref

  private val AsOfRe = "^(.*)@v(\\d+)(?:\\.\\.(\\d+))?$".r

  /** Split a possibly version-suffixed table path. */
  def split(path: String): (String, Option[Ref]) = path match {
    case AsOfRe(base, v, null) => (base, Some(Snapshot(v.toInt)))
    case AsOfRe(base, a, b) => (base, Some(Delta(a.toInt, b.toInt)))
    case _ => (path, None)
  }

  def isSnapshot(path: String): Boolean = split(path)._2.isDefined

  private def logFile(dir: String) = new File(dir, "_log")
  private def vacuumFile(dir: String) = new File(dir, "_vacuum")
  private def archiveDir(dir: String) = new File(dir, "_archive")

  // ---- log encoding: one JSON object per line, names-only ----------

  // The log is hand-encoded JSON with NO string escaping, and
  // renameTable rewrites it with a raw prefix replace — both are only
  // sound when object/table names can never contain a quote, comma,
  // bracket, or backslash. Enforce that closed-world charset at every
  // encode AND decode, so a hostile or accidental name fails loudly at
  // commit time instead of silently corrupting version resolution.
  private val NameOk = "^[A-Za-z0-9._@-]+$".r
  private def checkName(s: String): String = {
    require(NameOk.pattern.matcher(s).matches(),
      s"versions: object name '$s' outside [A-Za-z0-9._@-]; " +
        "refusing to write/read an unescapable log line")
    s
  }

  private def jarr(ss: Seq[String]): String =
    ss.map(s => "\"" + checkName(s) + "\"").mkString("[", ",", "]")

  private def enc(c: Commit): String =
    s"""{"v":${c.v},"t":${c.t},"add":${jarr(c.add)},"del":${jarr(c.del)},""" +
      s""""rw":${jarr(c.rw)}""" +
      c.epoch.map(e => s""","epoch":$e""").getOrElse("") + "}"

  private def field(line: String, name: String): Seq[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + name + "\":\\[(.*?)\\]").matcher(line)
    if (!m.find()) Seq.empty
    else m.group(1).split(",").toSeq.map(_.trim)
      .filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\""))
      .map(checkName)
  }

  private def dec(line: String): Commit = {
    val vm = java.util.regex.Pattern
      .compile("\"v\":(\\d+)").matcher(line)
    require(vm.find(), s"versions: malformed log line: $line")
    val em = java.util.regex.Pattern
      .compile("\"epoch\":(-?\\d+)").matcher(line)
    val tm = java.util.regex.Pattern
      .compile("\"t\":(\\d+)").matcher(line)
    Commit(vm.group(1).toInt, field(line, "add"), field(line, "del"),
      field(line, "rw"), if (em.find()) Some(em.group(1).toLong) else None,
      if (tm.find()) tm.group(1).toLong else 0L)
  }

  private def logDirFile(dir: String) = new File(dir, "_log.d")

  def readLog(dir: String): Seq[Commit] = {
    val f = logFile(dir)
    val appended =
      if (!f.isFile) Seq.empty[Commit]
      else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty).map(dec)
    // optimistic commits live as one file per version under _log.d
    // (see commitOptimistic); merge both channels ordered by version.
    // A version present in both is one logical commit written through
    // the locked path then compacted — the appended line wins.
    val d = logDirFile(dir)
    val perVersion =
      Option(d.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.isFile && f.getName.matches("\\d+"))
        .sortBy(_.getName.toInt)
        .map(vf => dec(new String(Files.readAllBytes(vf.toPath),
          StandardCharsets.UTF_8).trim))
    val seen = appended.map(_.v).toSet
    (appended ++ perVersion.filterNot(c => seen(c.v))).sortBy(_.v)
  }

  /** Latest committed version; 0 = never logged (pre-versioning
    * tables read as their live listing only). */
  def currentVersion(dir: String): Int =
    readLog(dir).lastOption.map(_.v).getOrElse(0)

  def vacuumFloor(dir: String): Int = {
    val f = vacuumFile(dir)
    if (!f.isFile) 0
    else new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim.toInt
  }

  // ---- commit protocol ---------------------------------------------

  /** Run `body` holding the table's commit lock. Reentrant use inside
    * one JVM is serialized per (canonical) table path; cross-process,
    * the OS file lock arbitrates. */
  def withTableLock[T](dir: String)(body: => T): T = {
    new File(dir).mkdirs()
    val monitor = jvmLocks.computeIfAbsent(
      new File(dir).getCanonicalPath, _ => new Object)
    monitor.synchronized {
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(dir, "_lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try { val l = ch.lock(); try body finally l.release() }
      finally ch.close()
    }
  }
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Next free object sequence number — `max(live)+1`, computed under
    * the caller's lock. NOT `live.size`: after a partial DELETE the
    * live sequence has gaps, and a size-based base would rename a new
    * object ONTO a surviving name (silent replacement). */
  def nextSeq(dir: String): Int = {
    val table = new File(dir).getName
    GraftObjectTable.listObjects(dir)
      .map(p => new File(p).getName.substring(table.length + 1).toInt)
      .maxOption.map(_ + 1).getOrElse(0)
  }

  /** The version the in-flight commit (under lock) will get, i.e. the
    * one to stamp on archive names before calling `record`. Bootstraps
    * the baseline line for a pre-versioning table so snapshots of the
    * pre-existing content resolve too. */
  def nextVersion(dir: String): Int = {
    val cur = currentVersion(dir)
    if (cur == 0) {
      val live = GraftObjectTable.listObjects(dir)
        .map(p => new File(p).getName)
      if (live.nonEmpty) {
        appendLine(dir, enc(Commit(1, live, Nil, Nil, None,
          System.currentTimeMillis())))
        return 2
      }
    }
    cur + 1
  }

  /** Append the commit line for version `v` (from `nextVersion`). */
  def record(dir: String, v: Int, add: Seq[String], del: Seq[String],
      rw: Seq[String] = Nil, epoch: Option[Long] = None): Unit =
    appendLine(dir, enc(Commit(v, add, del, rw, epoch,
      System.currentTimeMillis())))

  private def appendLine(dir: String, line: String): Unit =
    Files.write(logFile(dir).toPath,
      (line + "\n").getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)

  def hasEpoch(dir: String, epoch: Long): Boolean =
    readLog(dir).exists(_.epoch.contains(epoch))

  /** Thrown when `maxRetries` successive version claims were lost to
    * concurrent committers. */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** OPTIMISTIC cross-host commit — the protocol for writers that do
    * NOT share the `_lock` file's advisory-lock semantics (object
    * stores, NFS variants, separate hosts): no lock is ever taken.
    *
    * Each attempt reads the current version, lets `mk` build the
    * commit for `v = current + 1` (stage data files FIRST — they are
    * invisible until the log names them), and publishes by atomically
    * hard-linking a staged temp file to `_log.d/<v>`. Link creation
    * is atomic-exclusive on POSIX: if another writer claimed `v`
    * first, this writer gets FileAlreadyExistsException, re-reads the
    * log (now including the winner), and retries against the new tip
    * — the Delta/Iceberg commit-loop shape. History is therefore
    * SERIALIZED by construction: every version number names exactly
    * one commit, and no commit is ever lost, only re-based.
    *
    * `mk` may be invoked several times (once per attempt) and must be
    * idempotent in its side effects — stage under names derived from
    * the attempt version or content, as the object writer does.
    *
    * Protocol constraint (documented, Delta-style): ALL concurrent
    * writers of one table must use the SAME channel — either the
    * locked append path or this optimistic path. A locked writer
    * appends its version to `_log` without claiming `_log.d/<v>`, so
    * racing it against an optimistic writer could mint the same
    * version twice. Sequential migration between channels is safe
    * (readLog merges both, ordered by version). */
  def commitOptimistic(dir: String, maxRetries: Int = 50)
      (mk: Int => Commit): Commit =
    commitValidated(dir, readVersion = -1, readSet = Set.empty, maxRetries)(mk)

  /** Thrown when an interleaved commit invalidated this writer's read
    * set — the write-write conflict Delta/Iceberg surface as
    * ConcurrentModificationException. NOT retried internally: the
    * writer's staged result is based on stale bytes, so only the
    * CALLER can recover, by re-reading the new tip and rebuilding. */
  final class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  /** `commitOptimistic` plus READ-SET VALIDATION (r4 verdict #5): the
    * version-claim link serializes history, but a row-level MERGE that
    * staged its output from a snapshot read can still lose an update —
    * writer B claims the next version with output built from bytes
    * writer A rewrote in between. Callers that rebase rather than
    * rebuild declare the snapshot they read (`readVersion`) and the
    * object names their staged result depends on (`readSet`, for a
    * MERGE: every object it scanned); each claim attempt then checks
    * the commits that landed in (readVersion, tip] — if any deleted or
    * rewrote a read object, the staged result is stale and the commit
    * ABORTS with ConcurrentWriteException (nothing published — staged
    * data files are invisible until the log names them). Disjoint
    * interleaved commits rebase safely: the histories commute, so the
    * claim proceeds against the new tip. `readVersion = -1` skips
    * validation (blind appends — content-addressed inserts — commute
    * with everything). */
  def commitValidated(dir: String, readVersion: Int,
      readSet: Set[String], maxRetries: Int = 50)
      (mk: Int => Commit): Commit = {
    val d = logDirFile(dir); d.mkdirs()
    var tries = 0
    while (tries < maxRetries) {
      val cur = currentVersion(dir)
      if (readVersion >= 0 && cur > readVersion && readSet.nonEmpty) {
        val clash = readLog(dir).iterator
          .filter(c => c.v > readVersion && c.v <= cur)
          .flatMap(c => c.del.iterator ++ c.rw.iterator)
          .toSet.intersect(readSet)
        if (clash.nonEmpty)
          throw new ConcurrentWriteException(
            s"versions: commits ${readVersion + 1}..$cur rewrote/deleted " +
              s"objects this writer read (${clash.toSeq.sorted.take(5).mkString(", ")}" +
              s"${if (clash.size > 5) ", …" else ""}); re-read v$cur and rebuild")
      }
      val v = cur + 1
      val c = mk(v)
      require(c.v == v, s"versions: mk built v=${c.v}, expected $v")
      val tmp = Files.createTempFile(d.toPath, s".v$v-", ".tmp")
      try {
        Files.write(tmp, (enc(c) + "\n").getBytes(StandardCharsets.UTF_8))
        Files.createLink(d.toPath.resolve(v.toString), tmp)
        return c
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          tries += 1 // lost the race for v — re-read the tip, retry
      } finally Files.deleteIfExists(tmp)
    }
    throw new CommitConflictException(
      s"versions: lost $maxRetries successive version claims in $dir")
  }

  /** MOVE a superseded live object into the archive (removal path). */
  def archiveMove(dir: String, obj: File, v: Int): Unit = {
    val ad = archiveDir(dir); ad.mkdirs()
    Files.move(obj.toPath,
      new File(ad, s"${obj.getName}@v$v").toPath,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** COPY a to-be-rewritten object's pre-image into the archive
    * (in-place rewrite path — the live name survives with new
    * content). */
  def archiveCopy(dir: String, obj: File, v: Int): Unit = {
    val ad = archiveDir(dir); ad.mkdirs()
    Files.copy(obj.toPath,
      new File(ad, s"${obj.getName}@v$v").toPath,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- snapshot resolution -----------------------------------------

  /** Object paths (live or archived) for a version reference, in
    * sequence order — the listing `listObjects` returns for a
    * `path@v<k>` / `path@v<a>..<b>` table. */
  def resolve(dir: String, ref: Ref): Seq[String] = {
    val log = readLog(dir)
    require(log.nonEmpty,
      s"versions: $dir has no version log (no logged commit yet)")
    val latest = log.last.v
    val v = ref.to
    require(v >= 1 && v <= latest,
      s"versions: $dir has versions 1..$latest, asked for $v")
    require(v > vacuumFloor(dir),
      s"versions: $dir vacuumed through version ${vacuumFloor(dir)}; " +
        s"version $v is no longer materializable")
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    log.takeWhile(_.v <= v).foreach { c =>
      // del BEFORE add: a TRUNCATE commit both removes a name and
      // re-adds it (sequence restarts at 0) — the re-added name is
      // live at this version
      live --= c.del.toSet; live ++= c.add
    }
    val wanted = ref match {
      case Snapshot(_) => live.toSeq
      case Delta(from, _) =>
        require(from >= 0 && from <= v,
          s"versions: delta bounds must satisfy 0 <= $from <= $v")
        // names whose content first appeared (add) or changed (rw)
        // inside the window, still live at the window's end
        val touched = log.iterator
          .filter(c => c.v > from && c.v <= v)
          .flatMap(c => c.add.iterator ++ c.rw.iterator).toSet
        live.toSeq.filter(touched)
    }
    val later = log.dropWhile(_.v <= v)
    val table = new File(dir).getName
    wanted
      .sortBy(n => n.substring(table.length + 1).toInt)
      .map { n =>
        later.find(c => c.del.contains(n) || c.rw.contains(n)) match {
          case Some(c) => new File(archiveDir(dir), s"$n@v${c.v}").getPath
          case None => new File(dir, n).getPath
        }
      }
  }

  /** Object paths at a version, keyed by live object NAME. */
  private def resolveNamed(dir: String, v: Int): Map[String, String] = {
    val table = new File(dir).getName
    resolve(dir, Snapshot(v)).map { p =>
      val base = new File(p).getName
      val name = base.lastIndexOf("@v") match {
        case -1 => base
        case i => base.substring(0, i)
      }
      name -> p
    }.toMap
  }

  /** ROW-LEVEL change feed over the version log (the CDF analog the
    * object-granularity `@vA..B` delta view cannot express): every row
    * inserted or deleted between versions `from` and `to`, tagged with
    * `_change_type` ('insert' | 'delete'). An UPDATE surfaces as its
    * delete+insert pair — the canonical CDF encoding.
    *
    * The diff is METADATA-BOUNDED: the log names which objects were
    * added, removed, or rewritten in the window, and only THOSE
    * objects are read — added objects' rows are inserts and removed
    * objects' pre-image rows are deletes outright (map-side, no
    * exchange), while rewritten objects (same name, different content
    * path) pay one multiset `exceptAll` each way over the rewritten
    * rows only. At 100 TB the cost is proportional to the churn in
    * the window, never the table — the same discipline as the delta
    * view, extended to row granularity through the archive.
    *
    * Reading a specific object subset reuses the normal reader over a
    * staging dir of hard links inside the table's `_cdf` sidecar
    * (metadata-only, content shared; copies if the fs refuses links —
    * underscore-prefixed dirs are invisible to object listing). */
  def changes(spark: org.apache.spark.sql.SparkSession, dir: String,
      from: Int, to: Int): org.apache.spark.sql.DataFrame = {
    require(from >= 1 && to >= from,
      s"versions: changes bounds must satisfy 1 <= $from <= $to")
    val a = resolveNamed(dir, from)
    val b = resolveNamed(dir, to)
    val addedN = (b.keySet -- a.keySet).toSeq.sorted
    val removedN = (a.keySet -- b.keySet).toSeq.sorted
    val changedN = (a.keySet & b.keySet).toSeq.sorted
      .filter(n => a(n) != b(n))
    // Per-CALL staging dir: a concurrent changes() on the same table
    // must not wipe links a previously returned (lazily evaluated)
    // DataFrame still reads. Stale stagings are bounded — links only —
    // and reaped on JVM exit plus opportunistically here (only dirs
    // older than an hour, so no live reader can lose its links).
    val cdfRoot = new File(dir, "_cdf")
    def rmTree(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
      f.delete()
    }
    val cutoff = System.currentTimeMillis() - 3600 * 1000L
    Option(cdfRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.lastModified() < cutoff)
      .foreach(rmTree)
    val callRoot = new File(cdfRoot,
      java.util.UUID.randomUUID().toString.take(8))
    sys.addShutdownHook { try rmTree(callRoot) catch { case _: Throwable => } }
    def stage(tag: String, names: Seq[String],
        pick: Map[String, String]): File = {
      val d = new File(callRoot, tag); d.mkdirs()
      names.zipWithIndex.foreach { case (n, i) =>
        val src = Paths.get(pick(n))
        val dst = new File(d, s"${d.getName}.$i").toPath
        try Files.createLink(dst, src)
        catch { case _: UnsupportedOperationException =>
          Files.copy(src, dst)
        }
        // merge-on-read: a live object's valid deletion vector must
        // travel with the staged object — the staged name differs, so
        // the DV is REWRITTEN against the staged file's own
        // (length, mtime) fingerprint rather than linked: on a
        // filesystem where the object staging above fell back to
        // Files.copy, the copy's fresh mtime would invalidate a
        // linked DV and the post-state would read its deleted rows
        // back, collapsing the feed diff to empty. Without any DV the
        // same collapse happens; DVs are tiny, so rewriting is cheap.
        DeleteVectors.read(src.toString).foreach { bs =>
          val ords = Array.newBuilder[Int]
          var i = bs.nextSetBit(0)
          while (i >= 0) { ords += i; i = bs.nextSetBit(i + 1) }
          DeleteVectors.write(dst.toString, ords.result())
        }
      }
      d
    }
    import org.apache.spark.sql.functions.lit
    def readGroup(tag: String, names: Seq[String],
        pick: Map[String, String]) = {
      val d = stage(tag, names, pick)
      spark.read.format("graft-objects").load(d.getPath)
    }
    // an empty group still needs the table schema: read the `to`
    // snapshot's (always-resolvable) shape with a false filter
    lazy val empty = spark.read.format("graft-objects")
      .load(s"$dir@v$to").limit(0)
    def grp(tag: String, names: Seq[String],
        pick: Map[String, String]) =
      if (names.isEmpty) empty else readGroup(tag, names, pick)
    val inserts = grp("ins", addedN, b)
      .unionByName(grp("chgb", changedN, b)
        .exceptAll(grp("chga0", changedN, a)))
    val deletes = grp("del", removedN, a)
      .unionByName(grp("chga1", changedN, a)
        .exceptAll(grp("chgb1", changedN, b)))
    inserts.withColumn("_change_type", lit("insert"))
      .unionByName(deletes.withColumn("_change_type", lit("delete")))
  }

  /** Drop archive content reachable only from versions <= `keepFrom`
    * and record the floor. An archive file `<name>@v<j>` serves
    * exactly the versions BEFORE j, so it survives iff j-1 > keepFrom. */
  def vacuum(dir: String, keepFrom: Int): Unit = withTableLock(dir) {
    val latest = currentVersion(dir)
    require(keepFrom <= latest,
      s"versions: cannot vacuum through $keepFrom, latest is $latest")
    val ad = archiveDir(dir)
    Option(ad.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName.split("@v") match {
        case Array(_, j) if j.forall(_.isDigit) && j.toInt - 1 <= keepFrom =>
          f.delete()
        case _ =>
      }
    }
    Files.write(vacuumFile(dir).toPath,
      keepFrom.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** TIMESTAMP AS OF resolution: the latest version committed at or
    * before `tsMillis`. Commits are wall-clock-ordered by appendix
    * (serialized under the table lock), so a binary search would do;
    * the log is small enough that a scan is clearer. */
  def versionAt(dir: String, tsMillis: Long): Int = {
    val log = readLog(dir)
    require(log.nonEmpty,
      s"versions: $dir has no version log (no logged commit yet)")
    val at = log.filter(c => c.t != 0L && c.t <= tsMillis)
    require(at.nonEmpty,
      s"versions: $dir has no commit at or before timestamp $tsMillis " +
        s"(earliest is ${log.find(_.t != 0L).map(_.t).getOrElse(0L)})")
    at.last.v
  }

  /** Shallow-ish CLONE: materialize version `v` of `dir` as a brand-new
    * independent table at `target` (content copied object-by-object,
    * names re-prefixed to the target table name, fresh log with the
    * clone as version 1). The 100 TB form would reference-count shared
    * objects instead of copying; the semantics here are the ones that
    * matter — the clone is a fully standalone table whose history
    * starts at the snapshot. */
  def cloneVersion(dir: String, v: Int, target: String): Unit = {
    val paths = resolve(dir, Snapshot(v))
    val srcTable = new File(dir).getName
    val dstDir = new File(target)
    val dstTable = dstDir.getName
    require(!dstDir.exists() ||
      GraftObjectTable.listObjects(target).isEmpty,
      s"versions: clone target $target is not empty")
    dstDir.mkdirs()
    val seqRe = (java.util.regex.Pattern.quote(srcTable) +
      "\\.(\\d+)(?:@v\\d+)?$").r
    val added = paths.map { p =>
      val name = new File(p).getName
      val seq = seqRe.findFirstMatchIn(name)
        .getOrElse(sys.error(s"versions: unparseable object name $name"))
        .group(1)
      val dst = new File(dstDir, s"$dstTable.$seq")
      Files.copy(Paths.get(p), dst.toPath,
        StandardCopyOption.REPLACE_EXISTING)
      dst.getName
    }
    withTableLock(target) {
      record(target, 1, added, Nil)
    }
  }

  /** Commit history as data (the DESCRIBE HISTORY analog): one row
    * per version with object-count deltas — driver-side metadata only
    * (the log is names, never rows), sized in commits not data. */
  def history(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = readLog(dir).map { c =>
      org.apache.spark.sql.Row(c.v, c.add.size, c.del.size, c.rw.size,
        c.epoch.map(Long.box).orNull, c.t)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "version INT, n_added INT, n_removed INT, n_rewritten INT, " +
          "epoch BIGINT, commit_ms BIGINT"))
  }

  /** Table rename support: re-prefix archived object names and log
    * entries from `oldName` to `newName` (object names embed the
    * table name — same contract the live rename honors). */
  def renameTable(dir: String, oldName: String, newName: String): Unit = {
    checkName(oldName); checkName(newName)
    val ad = archiveDir(dir)
    Option(ad.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(oldName + "."))
      .foreach { f =>
        require(f.renameTo(new File(ad,
          newName + f.getName.substring(oldName.length))),
          s"versions: cannot re-prefix archive ${f.getName}")
      }
    val lf = logFile(dir)
    if (lf.isFile) {
      val rewritten =
        new String(Files.readAllBytes(lf.toPath), StandardCharsets.UTF_8)
          .replace("\"" + oldName + ".", "\"" + newName + ".")
      Files.write(lf.toPath, rewritten.getBytes(StandardCharsets.UTF_8))
    }
    val ld = logDirFile(dir)
    Option(ld.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.matches("\\d+"))
      .foreach { f =>
        val rewritten =
          new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
            .replace("\"" + oldName + ".", "\"" + newName + ".")
        Files.write(f.toPath, rewritten.getBytes(StandardCharsets.UTF_8))
      }
  }
}
