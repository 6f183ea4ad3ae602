package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{GraftScanBuilder, ObjectStoreIngest}

/** Object-granular TABLESAMPLE pushdown (`option("sample.objects",
  * "k/n")`): the sample is a pure function of object names, unkept
  * objects are pruned before their footers are read, and aggregate
  * pushdown is held off so Spark aggregates the sampled rows. */
class ObjectSampleSpec extends SparkSpec {

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft-sample").toString
    ObjectStoreIngest.ingest(spark, sf, dir,
      objects = Map("customer" -> 6).withDefaultValue(1))
    dir
  }

  private def read(opts: (String, String)*) = {
    val r = spark.read.format("graft-objects")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
      .load(s"$root/customer")
  }

  test("n/n keeps everything; 0/n keeps nothing") {
    val full = read().count()
    assert(full == Tables.customer(spark, sf).count())
    assert(read("sample.objects" -> "4/4").count() == full)
    assert(read("sample.objects" -> "0/4").count() == 0L)
  }

  test("k/n keeps exactly the hash-selected objects, deterministically") {
    val tagged = read().select(col("_object"), col("c_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = tagged.filter { case (obj, _) =>
      GraftScanBuilder.sampleBucket(obj, 3) < 1
    }.map(_._2).toSet
    assert(expected.nonEmpty && expected.size < tagged.length,
      "fixture layout must split the sample non-trivially")
    val got = read("sample.objects" -> "1/3")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // stable across reads
    val again = read("sample.objects" -> "1/3")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("sampled aggregates run over sampled rows, not footers") {
    val sampled = read("sample.objects" -> "2/3")
    // the plan must be a plain sampled scan (no pushed aggregates)
    val agg = sampled.agg(count(lit(1)).as("n"),
      sum(col("c_acctbal").cast("decimal(18,2)")).as("s")).collect().head
    val tagged = read().select(col("_object"), col("c_acctbal")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .filter { case (obj, _) =>
        GraftScanBuilder.sampleBucket(obj, 3) < 2
      }
    assert(agg.getLong(0) == tagged.length.toLong)
    assert(math.abs(agg.getDecimal(1).doubleValue() -
      tagged.map(x => BigDecimal(x._2).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble) < 1e-6)
    // and the scan description advertises the sample
    val desc = sampled.queryExecution.executedPlan.toString()
    assert(desc.contains("SampledObjects: 2/3"))
  }

  test("malformed sample options are refused loudly") {
    intercept[Exception] { read("sample.objects" -> "banana").count() }
    intercept[Exception] { read("sample.objects" -> "5/4").count() }
    intercept[Exception] { read("sample.objects" -> "1/0").count() }
  }
}
