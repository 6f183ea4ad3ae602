package graft

import graft.functions.SpaceSavingBuf
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property layer for the round-5 native components: the Space-Saving
  * buffer's sketch invariants under arbitrary streams, splits and
  * merge orders, and the bounded-heap top-k operator's equivalence to
  * the window form on arbitrary grouped data. */
class NativeOpsPropertySpec extends SparkSpec {

  private def holds(n: Int)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(4242L)), p)
    assert(res.passed, res.status.toString)
  }

  private val streamGen: Gen[List[Int]] =
    Gen.listOfN(400, Gen.frequency(
      (6, Gen.choose(0, 4)),     // heavy head
      (3, Gen.choose(5, 30)),    // mid
      (1, Gen.choose(31, 120)))) // long tail

  test("space-saving: est-err <= true <= est for ANY stream, split and merge order") {
    holds(40)(Prop.forAll(streamGen, Gen.choose(2, 6), Gen.choose(2, 12)) {
      (xs, nSplits, cap) =>
        val parts = xs.grouped(math.max(1, xs.size / nSplits)).toList
        val bufs = parts.map { p =>
          val b = new SpaceSavingBuf(cap)
          p.foreach(x => b.insert(s"i$x"))
          b
        }
        // left-fold merge (arbitrary grouping is covered by varying
        // nSplits; merge is not assumed commutative in result CONTENT,
        // only in invariant preservation)
        val merged = bufs.reduceLeft { (a, b) => a.merge(b); a }
        val truth = xs.groupBy(identity).map { case (k, v) => s"i$k" -> v.size.toLong }
        merged.m.forall { case (item, (est, err)) =>
          val t = truth.getOrElse(item, 0L)
          t <= est && est - err <= t
        } && merged.m.size <= cap
    })
  }

  test("space-saving: exact regime (cap >= NDV) recovers exact counts under any split") {
    holds(30)(Prop.forAll(streamGen, Gen.choose(1, 8)) { (xs, nSplits) =>
      val cap = xs.distinct.size.max(1)
      val parts = xs.grouped(math.max(1, xs.size / nSplits)).toList
      val bufs = parts.map { p =>
        val b = new SpaceSavingBuf(cap); p.foreach(x => b.insert(s"i$x")); b
      }
      val merged = bufs.reduceLeft { (a, b) => a.merge(b); a }
      val truth = xs.groupBy(identity).map { case (k, v) => s"i$k" -> v.size.toLong }
      merged.m.size == truth.size &&
        merged.m.forall { case (item, (est, err)) =>
          err == 0L && est == truth(item)
        }
    })
  }

  test("space-saving: guaranteed hitters (freq > n/cap) always retained") {
    holds(30)(Prop.forAll(streamGen, Gen.choose(3, 10)) { (xs, cap) =>
      val b = new SpaceSavingBuf(cap)
      xs.foreach(x => b.insert(s"i$x"))
      val truth = xs.groupBy(identity).map { case (k, v) => s"i$k" -> v.size.toLong }
      val guaranteed = truth.filter(_._2 > xs.size.toLong / cap).keySet
      guaranteed.subsetOf(b.m.keySet)
    })
  }

  test("bounded-heap top-k == window row_number filter on arbitrary grouped data") {
    graft.plans.TopKPerGroup.register(spark)
    val rowsGen = Gen.listOfN(300,
      Gen.zip(Gen.choose(0, 12), Gen.choose(-1000, 1000)))
    holds(8)(Prop.forAll(rowsGen, Gen.choose(1, 5)) { (xs, k) =>
      val s = spark
      import s.implicits._
      // unique id = total-order tiebreak (the operator's contract)
      val df = xs.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"v".desc, $"id".asc)
      def query(flag: Boolean): Set[(Int, Int, Long)] = {
        spark.conf.set(graft.plans.TopKPerGroupRewrite.ConfKey, flag.toString)
        try {
          import org.apache.spark.sql.functions.{col, row_number}
          df.select(col("g"), col("v"), col("id"),
              row_number().over(w).as("rn"))
            .filter(col("rn") <= k).drop("rn")
            .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
        } finally spark.conf.unset(graft.plans.TopKPerGroupRewrite.ConfKey)
      }
      query(true) == query(false)
    })
  }
}
