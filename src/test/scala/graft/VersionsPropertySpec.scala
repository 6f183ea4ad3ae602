package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThan}

import graft.sources.{GraftObjectTable, GraftVersions}

/** Model-based randomized check of the version log: drive a random
  * mutation history (append / range-delete / truncate) against both
  * the real object store and a trivial in-memory key-set model, then
  * require EVERY recorded version to materialize exactly the model's
  * snapshot — live objects, in-place rewrites and archive content all
  * resolving through `path@vN`.
  */
class VersionsPropertySpec extends SparkSpec {

  private def writeKeys(dir: String, keys: Seq[Long], mode: String): Unit = {
    import SparkSpec.spark.implicits._
    keys.map(k => (k, s"row$k")).toDF("k", "s")
      .repartitionByRange(2, col("k"))
      .write.format("graft-objects").mode(mode).save(dir)
  }

  private def keysAt(path: String): Seq[Long] =
    spark.read.format("graft-objects").load(path)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq

  Seq(11, 23, 47).foreach { seed =>
    test(s"random append/delete/truncate history materializes " +
        s"exactly at every version (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-vprop$seed").toString + "/t"
      var nextKey = 0L
      var live = Set.empty[Long]
      val snapshots = mutable.ArrayBuffer.empty[Set[Long]]

      def freshKeys(n: Int): Seq[Long] = {
        val ks = (nextKey until nextKey + n); nextKey += n; ks
      }

      // version 1: initial generation
      val init = freshKeys(4 + rnd.nextInt(6))
      writeKeys(dir, init, "overwrite")
      live = init.toSet; snapshots += live

      (0 until 7).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => // append
            val ks = freshKeys(2 + rnd.nextInt(5))
            writeKeys(dir, ks, "append")
            live ++= ks; snapshots += live
          case 1 => // range delete [a, b)
            val a = rnd.nextLong(nextKey + 1)
            val b = math.min(nextKey.toLong, a + 1 + rnd.nextInt(6))
            val hit = live.exists(k => k >= a && k < b)
            val t = new graft.sources.GraftObjectTable(
              spark.read.format("graft-objects").load(dir).schema, dir)
            t.deleteWhere(Array[Filter](
              GreaterThanOrEqual("k", a), LessThan("k", b)))
            if (hit) { // only a matching delete commits a version
              live = live.filterNot(k => k >= a && k < b)
              snapshots += live
            }
          case 2 => // truncate to a fresh generation
            val ks = freshKeys(2 + rnd.nextInt(4))
            writeKeys(dir, ks, "overwrite")
            live = ks.toSet; snapshots += live
        }
      }

      assert(GraftVersions.currentVersion(dir) == snapshots.size,
        "one recorded version per effective mutation")
      snapshots.zipWithIndex.foreach { case (expect, i) =>
        assert(keysAt(s"$dir@v${i + 1}") == expect.toSeq.sorted,
          s"version ${i + 1} must materialize the model snapshot")
      }
      assert(keysAt(dir) == live.toSeq.sorted)
    }
  }
}
