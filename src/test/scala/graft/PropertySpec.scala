package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** SURVEY §5.2 property-based layer: algebraic invariants that must
  * hold for ANY predicate/partitioning, checked over generated inputs
  * (fixed seeds — ScalaCheck default params are deterministic here
  * because generators derive from the initial seed per run).
  */
class PropertySpec extends SparkSpec {

  /** Run a ScalaCheck property with n successful cases (deterministic
    * initial seed) and assert it passed. */
  private def holds(n: Int)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(res.passed, res.status.toString)
  }

  // NOT cached: a cached bare-table scan is substituted (via the shared
  // CacheManager) into every other suite's lineitem plan, breaking their
  // PushedFilters/FileScan plan assertions when suites run in parallel.
  private lazy val li = Tables.lineitem(spark, sf)

  test("filter partition invariant holds for arbitrary quantity thresholds") {
    holds(10)(Prop.forAll(Gen.choose(0.0, 55.0)) { t =>
      val p = col("l_quantity") > t
      val yes = li.filter(p).count()
      val no = li.filter(!p).count()
      yes + no == li.count()
    })
  }

  test("decimal agg is partitioning-independent for arbitrary partition counts") {
    holds(5)(Prop.forAll(Gen.choose(1, 16)) { n =>
      val d = li.select(col("l_extendedprice").cast("decimal(12,2)").as("p"))
      d.repartition(n).agg(sum("p")).collect()(0).getDecimal(0) ==
        d.coalesce(1).agg(sum("p")).collect()(0).getDecimal(0)
    })
  }

  test("top-k is a prefix: topK ⊆ topK+m for arbitrary k, m") {
    holds(5)(Prop.forAll(Gen.choose(1, 30), Gen.choose(1, 30)) { (k, m) =>
      def top(n: Int) = li
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(n)
        .select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      top(k).subsetOf(top(k + m))
    })
  }

  test("exact dedup is idempotent under self-union multiplicity") {
    // duplicating the corpus n times never changes the kept set
    holds(3)(Prop.forAll(Gen.choose(2, 4)) { n =>
      val docs = Tables.documents(spark, sf)
      val dup = (1 until n).foldLeft(docs)((acc, _) => acc.unionAll(docs))
      val keptOnce = docs.groupBy(md5(col("text"))).agg(min("doc_id"))
        .collect().map(_.getLong(1)).toSet
      val keptDup = dup.groupBy(md5(col("text"))).agg(min("doc_id"))
        .collect().map(_.getLong(1)).toSet
      keptOnce == keptDup
    })
  }

  test("union/intersect/except algebra on generated key subsets") {
    holds(5)(Prop.forAll(Gen.choose(0, 24), Gen.choose(0, 24)) { (a, b) =>
      val lo = math.min(a, b); val hi = math.max(a, b)
      val x = Tables.customer(spark, sf)
        .filter(col("c_nationkey") <= hi).select(col("c_nationkey").as("k")).distinct()
      val y = Tables.customer(spark, sf)
        .filter(col("c_nationkey") >= lo).select(col("c_nationkey").as("k")).distinct()
      val inter = x.intersect(y).count()
      val exc = x.except(y).count()
      inter + exc == x.count()
    })
  }

  test("property: object codec roundtrips arbitrary rows bit-for-bit") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType),
      StructField("s", StringType), StructField("v", ArrayType(FloatType))))
    val genRow: Gen[Row] = for {
      id <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      x <- Gen.oneOf(
        Gen.chooseNum(-1e18, 1e18),
        Gen.oneOf(Double.NaN, Double.PositiveInfinity,
          Double.NegativeInfinity, -0.0, Double.MinPositiveValue))
      xOrNull <- Gen.oneOf(null: java.lang.Double, x: java.lang.Double)
      s <- Gen.oneOf(Gen.const(null), Gen.const(""),
        Gen.asciiPrintableStr, Gen.const("unicode-\u00fc\u00f1\u00ef-tab\t-end"))
      n <- Gen.chooseNum(0, 8)
      v <- Gen.oneOf(Gen.const(null),
        Gen.listOfN(n, Gen.chooseNum(-1e6f, 1e6f)).map(_.toArray))
    } yield Row(id, xOrNull, s, v)
    val prop = Prop.forAll(Gen.listOfN(20, genRow)) { rows =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      val tgt = s"$dir/t"; new java.io.File(tgt).mkdirs()
      graft.sources.ObjectFormat.writeObject(s"$tgt/t.0", schema, rows.iterator)
      val back = spark.read.format("graft-objects").load(tgt).collect()
      def key(r: Row): String = (0 until 4).map { i =>
        if (r.isNullAt(i)) "NULL"
        else r.get(i) match {
          case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
          case a: Array[Float] => a.map(java.lang.Float.floatToRawIntBits).mkString(",")
          case sq: scala.collection.Seq[_] =>
            sq.map(f => java.lang.Float.floatToRawIntBits(f.asInstanceOf[Float])).mkString(",")
          case other => other.toString
        }
      }.mkString("|")
      back.length == rows.length &&
        back.map(key).sorted.sameElements(rows.map(key).sorted)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
