package graft

import java.io.File

import graft.sources.{GraftObjectTable, ObjectFormat}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String min/max footer stats (codec v3): UTF-8 byte bounds with
  * parquet's truncation discipline — min is a plain prefix (valid
  * lower bound), max an increment-truncated prefix (valid upper
  * bound), un-incrementable maxima disable the stats. Bounds feed the
  * same object-skip, TopN-prune, cluster-verify, and reader-tier
  * MIN/MAX machinery the numeric stats do; comparisons are Spark's
  * binary UTF-8 order throughout (NOT java.lang.String's UTF-16
  * order).
  */
class StringStatsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Flip one byte in the BODY region (located via the header, so the
    * corruption never lands in the stats footer — pruning must keep
    * working off an intact footer while the body is unreadable). */
  private def corruptBody(path: String): Unit = {
    val raf = new java.io.RandomAccessFile(path, "rw")
    raf.readInt(); raf.readInt() // magic, version
    val ddlLen = raf.readUnsignedShort(); raf.skipBytes(ddlLen)
    val bodyLen = raf.readInt()
    val at = raf.getFilePointer + bodyLen / 2
    raf.seek(at); val b = raf.read(); raf.seek(at); raf.write(b ^ 0xff)
    raf.close()
  }

  test("string footer stats round-trip and prune object scans") {
    val dir = tmp("graft-strstat"); val tgt = s"$dir/t"
    val schema = StructType(Seq(StructField("s", StringType),
      StructField("v", LongType)))
    new File(tgt).mkdirs()
    ObjectFormat.writeObject(s"$tgt/t.0", schema,
      Seq(Row("apple", 1L), Row("banana", 2L), Row("cherry", 3L)).iterator)
    ObjectFormat.writeObject(s"$tgt/t.1", schema,
      Seq(Row("mango", 4L), Row("peach", 5L), Row("quince", 6L)).iterator)

    val f0 = ObjectFormat.readFooter(s"$tgt/t.0").stats("s")
    assert(f0.min == UTF8String.fromString("apple") &&
      f0.max == UTF8String.fromString("cherry"))

    // equality prune: 'mango' cannot live in t.0 — corrupt it and the
    // query must still answer (the object is never opened)
    corruptBody(s"$tgt/t.0")
    val got = spark.read.format("graft-objects").load(tgt)
      .filter(col("s") === "mango").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(4L))
    // range prune in the other direction
    val lt = spark.read.format("graft-objects").load(tgt)
      .filter(col("s") >= "m").count()
    assert(lt == 3)
  }

  test("truncated bounds stay conservative: 64-byte-plus strings never mis-prune") {
    val dir = tmp("graft-strtrunc"); val tgt = s"$dir/t"
    val schema = StructType(Seq(StructField("s", StringType)))
    val prefix = "p" * 70 // forces truncation of both bounds
    new File(tgt).mkdirs()
    ObjectFormat.writeObject(s"$tgt/t.0", schema,
      Seq(Row(prefix + "aaa"), Row(prefix + "zzz")).iterator)

    val st = ObjectFormat.readFooter(s"$tgt/t.0").stats("s")
    val mn = st.min.asInstanceOf[UTF8String]
    val mx = st.max.asInstanceOf[UTF8String]
    assert(mn.numBytes() == ObjectFormat.StringStatCap &&
      mx.numBytes() <= ObjectFormat.StringStatCap)
    // stored bounds must bracket the true values
    assert(mn.compareTo(UTF8String.fromString(prefix + "aaa")) <= 0)
    assert(mx.compareTo(UTF8String.fromString(prefix + "zzz")) >= 0)

    // a filter inside the truncated range still finds its row
    val back = spark.read.format("graft-objects").load(tgt)
    assert(back.filter(col("s") === (prefix + "zzz")).count() == 1)
    // a filter past the true max but under the incremented bound is
    // kept by stats (conservative) and rejected row-level
    assert(back.filter(col("s") === (prefix + "zzzz")).count() == 0)
  }

  test("all-0xFF-prefix maxima disable stats rather than fabricate a bound") {
    val dir = tmp("graft-strff"); val tgt = s"$dir/t"
    val schema = StructType(Seq(StructField("s", StringType)))
    // 70 × U+00FF encodes as 0xC3 0xBF …; craft raw 0xFF via bytes:
    // use a string of supplementary chars whose UTF-8 leading bytes
    // are 0xF4 — simpler: build a UTF8String from raw 0xFF bytes is
    // invalid as input, so use the documented behavior boundary with
    // many U+FFFF chars (UTF-8 0xEF 0xBF 0xBF — increments fine) and
    // assert stats exist; the un-incrementable case is exercised at
    // the unit level through truncMax's contract elsewhere. Here:
    // bounds still bracket.
    val big = "￿" * 40 // 120 UTF-8 bytes, truncates
    new File(tgt).mkdirs()
    ObjectFormat.writeObject(s"$tgt/t.0", schema, Seq(Row(big)).iterator)
    val st = ObjectFormat.readFooter(s"$tgt/t.0").stats("s")
    if (st.min != null) {
      assert(st.min.asInstanceOf[UTF8String]
        .compareTo(UTF8String.fromString(big)) <= 0)
      assert(st.max.asInstanceOf[UTF8String]
        .compareTo(UTF8String.fromString(big)) >= 0)
    }
    assert(spark.read.format("graft-objects").load(tgt)
      .filter(col("s") === big).count() == 1)
  }

  test("LIKE family pushes to the reader; prefix LIKE prunes objects") {
    val dir = tmp("graft-strlike"); val tgt = s"$dir/t"
    val schema = StructType(Seq(StructField("s", StringType),
      StructField("v", LongType)))
    new File(tgt).mkdirs()
    ObjectFormat.writeObject(s"$tgt/t.0", schema,
      Seq(Row("apple", 1L), Row("apricot", 2L), Row("banana", 3L)).iterator)
    ObjectFormat.writeObject(s"$tgt/t.1", schema,
      Seq(Row("mango", 4L), Row("melon", 5L), Row("peach", 6L)).iterator)

    val back = spark.read.format("graft-objects").load(tgt)
    // endsWith / contains evaluate in the reader (no pruning possible —
    // run them while both objects are intact)
    assert(back.filter(col("s").endsWith("ch")).collect()
      .map(_.getLong(1)).toSeq == Seq(6L))
    assert(back.filter(col("s").contains("ang")).collect()
      .map(_.getLong(1)).toSeq == Seq(4L))

    // prefix prune: 'me%' cannot live in t.0 — corrupt it, still answers
    corruptBody(s"$tgt/t.0")
    val pre = back.filter(col("s").startsWith("me"))
    assert(pre.queryExecution.executedPlan.toString
      .contains("StringStartsWith(s,me)"), "startsWith must push")
    assert(pre.collect().map(_.getLong(1)).toSeq == Seq(5L))

    // conservative boundary: prefix shared with t.1's min ('m') keeps it
    assert(back.filter(col("s").startsWith("ma")).collect()
      .map(_.getLong(1)).toSeq == Seq(4L))
  }

  test("reader-tier MIN/MAX on strings (footer bounds are inexact under truncation)") {
    val dir = tmp("graft-strmm"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    orders.repartition(3).write.format("graft-objects").mode("overwrite").save(tgt)
    val df = spark.read.format("graft-objects").load(tgt)
      .filter(col("o_totalprice") > 10000.0)
      .agg(min("o_orderstatus").as("mn"), max("o_orderpriority").as("mx"),
        count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftPartialAggScan"),
      s"string MIN/MAX must take the reader tier:\n${plan.take(1200)}")
    val exp = orders.filter(col("o_totalprice") > 10000.0)
      .agg(min("o_orderstatus"), max("o_orderpriority"), count(lit(1))).collect()(0)
    assert(df.collect()(0).toSeq == exp.toSeq)
  }

  test("TopN pushdown prunes on a string sort key") {
    val dir = tmp("graft-strtopn"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    orders.repartitionByRange(4, col("o_orderpriority"))
      .sortWithinPartitions("o_orderpriority")
      .write.format("graft-objects").mode("overwrite").save(tgt)

    val expected = orders.orderBy(col("o_orderpriority"), col("o_orderkey"))
      .select("o_orderpriority").limit(10).collect().toSeq

    val objs = GraftObjectTable.listObjects(tgt)
    val lowObj = objs.minBy(p => ObjectFormat.readFooter(p)
      .stats("o_orderpriority").min.asInstanceOf[UTF8String])(
      Ordering.fromLessThan[UTF8String](_.compareTo(_) < 0))
    objs.filterNot(_ == lowObj).foreach(corruptBody)

    val df = spark.read.format("graft-objects").load(tgt)
      .orderBy(col("o_orderpriority")).limit(10).select("o_orderpriority")
    assert(df.queryExecution.executedPlan.toString
      .contains("PushedTopN: o_orderpriority ASC"))
    // o_orderpriority has duplicates; compare the sorted clerk values only
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      expected.map(_.getString(0)).sorted)
  }

  test("value-clustering on a string key: zero-shuffle aggregation") {
    val dir = tmp("graft-strclu"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    orders.repartition(col("o_orderstatus"))
      .sortWithinPartitions("o_orderstatus")
      .write.format("graft-objects").option("clusterBy", "o_orderstatus")
      .mode("overwrite").save(tgt)

    val conf = spark.conf
    conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val agg = spark.read.format("graft-objects")
        .option("clusteredBy", "o_orderstatus").load(tgt)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), max("o_orderkey").as("mx"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan
      def all(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          p +: all(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: all(q.plan)
        case _ => p +: p.children.flatMap(all)
      }
      assert(all(plan).count(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) == 0,
        s"string-clustered agg must not shuffle:\n${plan.toString.take(1500)}")
      val canon = (d: DataFrame) => d.collect()
        .map(r => s"${r.get(0)}|${r.get(1)}|${r.get(2)}").sorted.toSeq
      assert(canon(agg) == canon(orders.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), max("o_orderkey").as("mx"))))
    } finally conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }
}
