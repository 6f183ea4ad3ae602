package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named BRANCHES over a versioned object-store table (SURVEY §1.1 /
  * §2.11 versioning, extended): the "experiment on the corpus without
  * touching prod, then land it atomically" workflow a training-data
  * pipeline runs daily — try a new curation pass on a branch, eyeball
  * the result, merge or drop.
  *
  * Model — a branch is a snapshot ref plus an overlay table:
  *
  *  - `_branches/<name>/_meta` pins the MAIN version the branch forked
  *    from (`base`). Underscore-prefixed, so invisible to object
  *    listing like every other sidecar.
  *  - `_branches/<name>/objects/` is a full graft-objects table of its
  *    own (own `_log`, own sequence): branch writes go through the
  *    ordinary DSv2 writer against the overlay path — every write
  *    feature (stats footers, clustered layout, CHECK gates wired by
  *    the caller) works on a branch because a branch IS a table.
  *  - Branch read = `main@v<base>` ∪ overlay — the branch sees the
  *    frozen fork-point snapshot regardless of how far main's live
  *    state has moved since, plus everything appended to the branch.
  *    Branch semantics are APPEND-ONLY relative to base (the overlay
  *    cannot mask base rows — no tombstones in v1; a DELETE-on-branch
  *    would add the archive-backed tombstone object kind).
  *  - Merge = under the table lock, link every overlay object into
  *    main under fresh `<table>.<seq>` names and record ONE commit
  *    (`add` = the linked names). Appends commute with any interleaved
  *    main commits, so an append-only merge needs no read-set
  *    validation and can never lose an update; atomicity is the log
  *    append (readers see all linked objects or none, exactly like a
  *    writer commit). The branch ref is dropped after the merge.
  *
  * 100 TB posture: create/merge/drop are METADATA operations — a few
  * file links and one log line, never a data copy (`Files.createLink`;
  * content-copy only if the filesystem refuses links). The overlay is
  * a plain table, so branch writes scale exactly like main writes.
  */
object GraftBranches {

  private def checkName(name: String): String = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"branches: name '$name' outside [A-Za-z0-9._-]")
    name
  }

  private def branchDir(dir: String, name: String) =
    new File(new File(dir, "_branches"), checkName(name))
  private def metaFile(dir: String, name: String) =
    new File(branchDir(dir, name), "_meta")
  private def overlayDir(dir: String, name: String) =
    new File(branchDir(dir, name), "objects")

  def exists(dir: String, name: String): Boolean =
    metaFile(dir, name).isFile

  /** Fork `name` from the CURRENT version of `dir`. The table must
    * have at least one committed/committable version — an empty,
    * never-written table has no snapshot to pin. Returns the base
    * version the branch sees. */
  def create(dir: String, name: String): Int =
    GraftVersions.withTableLock(dir) {
      require(!exists(dir, name), s"branches: '$name' already exists")
      // bootstrap the baseline log line for a pre-versioning table so
      // the fork point resolves (same bootstrap every commit path uses)
      GraftVersions.nextVersion(dir)
      val base = GraftVersions.currentVersion(dir)
      require(base >= 1,
        s"branches: $dir has no committed version to fork from")
      val bd = branchDir(dir, name)
      overlayDir(dir, name).mkdirs()
      Files.write(metaFile(dir, name).toPath,
        s"""{"base":$base}""".getBytes(StandardCharsets.UTF_8))
      base
    }

  def baseVersion(dir: String, name: String): Int = {
    require(exists(dir, name), s"branches: no branch '$name' in $dir")
    val s = new String(Files.readAllBytes(metaFile(dir, name).toPath),
      StandardCharsets.UTF_8)
    """"base":(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"branches: unreadable _meta for '$name'"))
  }

  /** All branches of a table with their fork points. */
  def list(dir: String): Seq[(String, Int)] = {
    val root = new File(dir, "_branches")
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && new File(f, "_meta").isFile)
      .map(f => f.getName -> baseVersion(dir, f.getName))
      .sortBy(_._1).toSeq
  }

  /** Append a DataFrame to the branch overlay through the ordinary
    * object writer (stats footers and all). */
  def append(df: DataFrame, dir: String, name: String): Unit = {
    require(exists(dir, name), s"branches: no branch '$name' in $dir")
    df.write.format("graft-objects").mode("append")
      .save(overlayDir(dir, name).getPath)
  }

  /** The branch view: frozen fork-point snapshot ∪ overlay appends. */
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val base = baseVersion(dir, name)
    val snap = spark.read.format("graft-objects").load(s"$dir@v$base")
    val ov = overlayDir(dir, name)
    if (GraftObjectTable.listObjects(ov.getPath).isEmpty) snap
    else snap.unionByName(
      spark.read.format("graft-objects").load(ov.getPath))
  }

  /** Land the branch on main atomically and drop the ref. Returns the
    * merge commit's version (or the current version if the overlay is
    * empty — an empty merge commits nothing). Overlay objects are
    * linked (not copied) in deterministic sequence order. */
  def merge(dir: String, name: String): Int =
    GraftVersions.withTableLock(dir) {
      require(exists(dir, name), s"branches: no branch '$name' in $dir")
      val ov = overlayDir(dir, name)
      val table = new File(dir).getName
      val objs = GraftObjectTable.listObjects(ov.getPath)
        .sortBy(p => new File(p).getName.split('.').last.toInt)
      if (objs.isEmpty) {
        drop(dir, name)
        GraftVersions.currentVersion(dir)
      } else {
        val v = GraftVersions.nextVersion(dir)
        var seq = GraftVersions.nextSeq(dir)
        val added = objs.map { p =>
          val dst = new File(dir, s"$table.$seq"); seq += 1
          try Files.createLink(dst.toPath, new File(p).toPath)
          catch { case _: UnsupportedOperationException =>
            Files.copy(new File(p).toPath, dst.toPath)
          }
          dst.getName
        }
        GraftVersions.record(dir, v, added, Nil)
        drop(dir, name)
        v
      }
    }

  /** Remove the branch ref and its overlay (content linked into main
    * by a prior merge survives — links, not the branch dir, own it). */
  def drop(dir: String, name: String): Unit = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(branchDir(dir, name))
  }
}
