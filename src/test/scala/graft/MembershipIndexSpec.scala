package graft

import java.io.File

import graft.sources.{GraftObjectTable, ObjectFormat}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}
import org.apache.spark.sql.types._

/** Codec-v4 per-object membership index — the object-local value
  * index for point lookups where min/max ranges cannot prune (high-NDV
  * keys scattered across objects). Tier 1: a never-overflowed KMV
  * sketch is the COMPLETE distinct-hash set, so equality/IN
  * membership is exact and free. Tier 2: columns opted in via
  * `bloomFilterColumns` carry a bloom filter sized for the observed
  * NDV. Neither tier has false negatives, so a miss skips the object
  * without reading its body — proven here by corrupting the bodies of
  * objects the index must exclude.
  */
class MembershipIndexSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Flip one byte mid-body (footer stays intact — see StringStatsSpec). */
  private def corruptBody(path: String): Unit = {
    val raf = new java.io.RandomAccessFile(path, "rw")
    raf.readInt(); raf.readInt()
    val ddlLen = raf.readUnsignedShort(); raf.skipBytes(ddlLen)
    val bodyLen = raf.readInt()
    val at = raf.getFilePointer + bodyLen / 2
    raf.seek(at); val b = raf.read(); raf.seek(at); raf.write(b ^ 0xff)
    raf.close()
  }

  test("complete-sketch membership prunes where min/max ranges cannot") {
    val dir = tmp("graft-member"); val tgt = s"$dir/t"
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("s", StringType), StructField("v", LongType)))
    new File(tgt).mkdirs()
    // both objects span [0..98/99] — range pruning is useless; the
    // value SETS are disjoint (evens vs odds), well under the sketch
    // size, so the complete sketch proves membership exactly
    ObjectFormat.writeObject(s"$tgt/t.0", schema,
      (0L until 100L by 2).map(i => Row(i, s"even-$i", i * 10)).iterator)
    ObjectFormat.writeObject(s"$tgt/t.1", schema,
      (1L until 100L by 2).map(i => Row(i, s"odd-$i", i * 10)).iterator)

    val f0 = ObjectFormat.readFooter(s"$tgt/t.0")
    val f1 = ObjectFormat.readFooter(s"$tgt/t.1")
    assert(f0.colIndex("k").complete && f1.colIndex("k").complete)
    assert(ObjectFormat.mightMatch(EqualTo("k", 4L), f0))
    assert(!ObjectFormat.mightMatch(EqualTo("k", 4L), f1),
      "4 is absent from the odd object's complete sketch")
    // string membership uses the same machinery
    assert(!ObjectFormat.mightMatch(EqualTo("s", "even-4"), f1))
    // IN prunes only when EVERY probe value is provably absent
    assert(!ObjectFormat.mightMatch(In("k", Array(4L, 10L)), f1))
    assert(ObjectFormat.mightMatch(In("k", Array(4L, 11L)), f1))

    // end-to-end: corrupt the odd object; equality on an even key must
    // answer without opening it
    corruptBody(s"$tgt/t.1")
    val got = spark.read.format("graft-objects").load(tgt)
      .filter(col("k") === 4L).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(40L))
    assert(spark.read.format("graft-objects").load(tgt)
      .filter(col("s") === "even-10").count() == 1)
  }

  test("a complete empty sketch proves an all-null column matches nothing") {
    val dir = tmp("graft-membernull"); val tgt = s"$dir/t"
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType)))
    new File(tgt).mkdirs()
    ObjectFormat.writeObject(s"$tgt/t.0", schema,
      (0L until 50L).map(i => Row(null, i)).iterator)
    corruptBody(s"$tgt/t.0")
    // no non-null values ⇒ equality is unsatisfiable ⇒ zero objects read
    assert(spark.read.format("graft-objects").load(tgt)
      .filter(col("k") === 7L).count() == 0)
  }

  test("sketch overflow disables exact membership (no wrong prune past k)") {
    val dir = tmp("graft-memberovf"); val tgt = s"$dir/t"
    val schema = StructType(Seq(StructField("k", LongType)))
    new File(tgt).mkdirs()
    // 1000 distinct > k=256: the sketch is a sample; membership must
    // NOT claim absence for any value, present or not
    ObjectFormat.writeObject(s"$tgt/t.0", schema,
      (0L until 2000L by 2).map(Row(_)).iterator)
    val f = ObjectFormat.readFooter(s"$tgt/t.0")
    assert(!f.colIndex("k").complete)
    assert(ObjectFormat.mightMatch(EqualTo("k", 3L), f),
      "overflowed sketch without bloom must stay conservative")
  }

  test("opt-in bloom prunes high-NDV point lookups at the target FPP") {
    val dir = tmp("graft-bloom"); val tgt = s"$dir/t"
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType)))
    new File(tgt).mkdirs()
    // two objects, interleaved ranges, 5000 distinct keys each — far
    // past the sketch; the bloom carries membership
    ObjectFormat.writeObject(s"$tgt/t.0", schema,
      (0L until 10000L by 2).map(i => Row(i, i)).iterator, Set("k"))
    ObjectFormat.writeObject(s"$tgt/t.1", schema,
      (1L until 10000L by 2).map(i => Row(i, i)).iterator, Set("k"))

    val f0 = ObjectFormat.readFooter(s"$tgt/t.0")
    assert(!f0.colIndex("k").complete && f0.colIndex("k").bloomK > 0)
    // no false negatives: every present key passes
    assert((0L until 10000L by 2).forall(i =>
      ObjectFormat.mightContain(f0, "k", i)))
    // absent keys prune at ~the 1% target rate (deterministic given
    // the fixed hash; 3% bound leaves slack)
    val fps = (1L until 2000L by 2).count(i =>
      ObjectFormat.mightContain(f0, "k", i))
    assert(fps <= 30, s"bloom FPs $fps/1000 exceed 3%")

    // end-to-end: pick an odd key the even object's bloom provably
    // rejects, corrupt the even object, and look it up
    val probe = (1L until 10000L by 2)
      .find(i => !ObjectFormat.mightContain(f0, "k", i)).get
    corruptBody(s"$tgt/t.0")
    val got = spark.read.format("graft-objects").load(tgt)
      .filter(col("k") === probe).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(probe))
  }

  test("bloomFilterColumns threads through the DataFrame writer") {
    val dir = tmp("graft-bloomdf"); val tgt = s"$dir/t"
    spark.range(0, 3000).select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartition(2)
      .write.format("graft-objects")
      .option("bloomFilterColumns", "k")
      .option("bloomFilterFpp", "0.02")
      .mode("overwrite").save(tgt)
    val footers = GraftObjectTable.listObjects(tgt).map(ObjectFormat.readFooter)
    assert(footers.forall(f => f.colIndex("k").bloomK > 0),
      "every object must carry the opted-in bloom")
    assert(footers.forall(f => f.colIndex("v").bloomK == 0),
      "un-opted columns carry no bloom")
    // round-trip unaffected
    assert(spark.read.format("graft-objects").load(tgt).count() == 3000)
  }
}
