package graft

import graft.sources.GraftObjectTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LIMIT / ORDER-BY-LIMIT pushdown into the object scan (the
  * reference's object-index-assisted early exit: the per-object index
  * bounds prove most objects irrelevant before a body byte is read).
  *
  * The corruption trick mirrors ObjectStoreFeaturesSpec: flipping a
  * byte in an object BODY makes any row decode of that object garbage
  * or a crash, so "query still answers correctly" proves the pruned
  * objects were never opened.
  */
class LimitPushdownSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def corruptBody(path: String): Unit = {
    val raf = new java.io.RandomAccessFile(path, "rw")
    raf.seek(raf.length() / 2)
    val b = raf.read(); raf.seek(raf.length() / 2); raf.write(b ^ 0xff)
    raf.close()
  }

  private def objRead(tgt: String): DataFrame =
    spark.read.format("graft-objects").load(tgt)

  test("plain LIMIT truncates the object list: later objects never opened") {
    val dir = tmp("graft-limit"); val tgt = s"$dir/orders"
    Tables.load(spark, sf, "orders")
      .repartition(4).write.format("graft-objects").mode("overwrite").save(tgt)

    val objs = GraftObjectTable.listObjects(tgt)
    assert(objs.size == 4)
    // first object holds far more than 5 rows; corrupt every LATER one
    objs.drop(1).foreach(corruptBody)

    val df = objRead(tgt).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 5"),
      s"limit must reach the scan:\n${plan.take(1200)}")
    val got = df.collect()
    assert(got.length == 5 && got.forall(!_.isNullAt(0)),
      "LIMIT over a pruned scan must surface 5 intact rows")
  }

  test("LIMIT composes with pushed filters: per-reader early exit, exact count") {
    val dir = tmp("graft-limitf"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    orders.repartition(3).write.format("graft-objects").mode("overwrite").save(tgt)

    val total = orders.filter(col("o_totalprice") > 1000.0).count()
    val k = math.min(7, total).toInt
    val df = objRead(tgt).filter(col("o_totalprice") > 1000.0).limit(k)
    assert(df.queryExecution.executedPlan.toString.contains(s"PushedLimit: $k"))
    assert(df.count() == k,
      "limit after pushed filter must count qualifying rows")
  }

  test("TopN ASC prune: only the low-range object is opened") {
    val dir = tmp("graft-topn"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    // range layout on the sort key: objects carry disjoint key ranges,
    // the 100 TB posture where index-assisted top-k pays off
    orders.repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.format("graft-objects").mode("overwrite").save(tgt)

    val expected = orders.orderBy(col("o_orderkey")).limit(10).collect().toSeq

    // identify the object holding the 10 smallest keys, corrupt the rest
    val objs = GraftObjectTable.listObjects(tgt)
    val lowObj = objs.minBy { p =>
      graft.sources.ObjectFormat.readFooter(p)
        .stats("o_orderkey").min.asInstanceOf[java.lang.Long].longValue()
    }
    objs.filterNot(_ == lowObj).foreach(corruptBody)

    val df = objRead(tgt).orderBy(col("o_orderkey")).limit(10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: o_orderkey ASC"),
      s"top-k must reach the scan:\n${plan.take(1200)}")
    assert(df.collect().toSeq == expected,
      "index-assisted top-k must equal the full sort")
  }

  test("TopN DESC prune: only the high-range object is opened") {
    val dir = tmp("graft-topnd"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    orders.repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.format("graft-objects").mode("overwrite").save(tgt)

    val expected = orders.orderBy(col("o_orderkey").desc).limit(10).collect().toSeq

    val objs = GraftObjectTable.listObjects(tgt)
    val highObj = objs.maxBy { p =>
      graft.sources.ObjectFormat.readFooter(p)
        .stats("o_orderkey").max.asInstanceOf[java.lang.Long].longValue()
    }
    objs.filterNot(_ == highObj).foreach(corruptBody)

    val df = objRead(tgt).orderBy(col("o_orderkey").desc).limit(10)
    assert(df.queryExecution.executedPlan.toString
      .contains("PushedTopN: o_orderkey DESC"))
    assert(df.collect().toSeq == expected)
  }

  test("TopN NULLS FIRST: enough nulls means value-only objects stay closed") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft-topnn"); val tgt = s"$dir/t"
    // object 0: all-null sort key; object 1: values (appended second)
    val nulls = Seq.fill(20)((Option.empty[Long], "n")).toDF("k", "tag")
    val vals = (1L to 50L).map(i => (Option(i), "v")).toDF("k", "tag")
    nulls.coalesce(1).write.format("graft-objects").mode("overwrite").save(tgt)
    vals.coalesce(1).write.format("graft-objects").mode("append").save(tgt)

    val objs = GraftObjectTable.listObjects(tgt)
    assert(objs.size == 2)
    // the value-bearing object must never be opened: ASC defaults to
    // NULLS FIRST and 10 ≤ 20 nulls
    val valObj = objs.find(p =>
      graft.sources.ObjectFormat.readFooter(p).stats("k").nullCount == 0).get
    corruptBody(valObj)

    val got = objRead(tgt).orderBy(col("k")).limit(10).collect()
    assert(got.length == 10 && got.forall(_.isNullAt(0)),
      "top-10 under NULLS FIRST with 20 nulls is 10 null rows")
  }

  test("TopN falls back safely when filters are pushed (no object prune)") {
    val dir = tmp("graft-topnf"); val tgt = s"$dir/orders"
    val orders = Tables.load(spark, sf, "orders")
    orders.repartitionByRange(3, col("o_orderkey"))
      .write.format("graft-objects").mode("overwrite").save(tgt)

    val expected = orders.filter(col("o_totalprice") > 1000.0)
      .orderBy(col("o_orderkey")).limit(10).collect().toSeq
    val df = objRead(tgt).filter(col("o_totalprice") > 1000.0)
      .orderBy(col("o_orderkey")).limit(10)
    // filter pushed ⇒ pushTopN refuses ⇒ no PushedTopN in the plan,
    // result still exact through the ordinary scan
    assert(!df.queryExecution.executedPlan.toString.contains("PushedTopN"))
    assert(df.collect().toSeq == expected)
  }
}
