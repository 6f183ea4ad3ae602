package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The native Space-Saving aggregate beyond the oracle's exact
  * regime: overestimate invariant under eviction pressure, heavy
  * hitters surviving a tiny cap, merge across partitions, and the
  * partial/final plan shape. */
class FreqItemsSpec extends SparkSpec {

  private def planted = {
    val s = spark
    import s.implicits._
    // zipf-ish: item k appears ~ 6000/k times for k in 1..50 — heavy
    // head, long tail, far more distinct items than the sketch cap
    (1 to 50).flatMap(k => Seq.fill(6000 / k)(f"item$k%02d"))
      .toDF("item")
      .repartition(8) // force multi-partition partials + merge
  }

  test("approximate regime: est-err <= true <= est; heavy hitters survive cap=8") {
    GraftFunctions.register(spark)
    val df = planted
    val exact = df.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = df.agg(expr("freq_items_sketch(item, 8)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect()
    assert(sk.length == 8, "sketch retains exactly cap entries under pressure")
    sk.foreach { r =>
      val (item, est, err) = (r.getString(0), r.getLong(1), r.getLong(2))
      val t = exact(item)
      assert(t <= est, s"$item: true $t must not exceed estimate $est")
      assert(est - err <= t, s"$item: est-err ${est - err} must not exceed true $t")
    }
    // the undisputed top items (frequency > total/cap can never be
    // evicted — the Space-Saving guarantee) must all be present
    val total = exact.values.sum
    val guaranteed = exact.filter(_._2 > total / 8).keySet
    val kept = sk.map(_.getString(0)).toSet
    assert(guaranteed.subsetOf(kept),
      s"guaranteed heavy hitters ${guaranteed -- kept} missing from sketch")
  }

  test("exact regime: partitioning-independent, equals groupBy counts, zero err") {
    GraftFunctions.register(spark)
    for (parts <- Seq(1, 7)) {
      val sk = planted.repartition(parts)
        .agg(expr("freq_items_sketch(item, 64)").as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.est"), col("e.err"))
        .collect()
      assert(sk.length == 50)
      assert(sk.forall(_.getLong(2) == 0L), "cap >= NDV: no error ever")
      val exact = planted.groupBy("item").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      sk.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
    }
  }

  test("plan: partial/final aggregate pair — sketches cross the exchange, not rows") {
    GraftFunctions.register(spark)
    val df = planted.agg(expr("freq_items_sketch(item, 8)"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("freq_items_sketch"),
      "native aggregate must appear in the physical plan")
    assert("(?s)partial_freq_items_sketch|ObjectHashAggregate|SortAggregate".r
      .findFirstIn(plan).isDefined,
      s"expected a two-phase object aggregate:\n${plan.take(800)}")
  }
}
