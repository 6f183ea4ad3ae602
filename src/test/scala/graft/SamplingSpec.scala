package graft

import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def liCount = Tables.lineitem(spark, sf).count()

  test("hash sample: deterministic across runs, rate near 2/16") {
    val a = run("q_sample_hash").collect().sortBy(_.getString(0))
    val b = run("q_sample_hash").collect().sortBy(_.getString(0))
    assert(a.toSeq == b.toSeq)
    val n = a.map(_.getLong(1)).sum
    val total = liCount
    // binomial(total, 0.125): mean 750 at sf0.001, sd ~25 — ±6 sd
    val exp = total * 0.125
    assert(math.abs(n - exp) < 6 * math.sqrt(exp * 0.875), s"n=$n exp=$exp")
  }

  test("hash samples nest: 2/16 sample is a subset of the 4/16 sample") {
    def keysAt(prefixes: Seq[String]) =
      Tables.lineitem(spark, sf)
        .withColumn("hk",
          md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))))
        .filter(substring(col("hk"), 1, 1).isin(prefixes: _*))
        .select("l_orderkey", "l_linenumber")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val narrow = keysAt(Seq("0", "1"))
    val wide = keysAt(Seq("0", "1", "2", "3"))
    assert(narrow.nonEmpty && narrow.subsetOf(wide))
    assert(wide.size > narrow.size)
  }

  test("fixed-N sample: exactly 100 rows, TakeOrdered plan (no global sort)") {
    val df = run("q_sample_fixed_n")
    assert(df.count() == 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
    // rows are genuine corpus rows
    val joined = df.join(Tables.lineitem(spark, sf),
      Seq("l_orderkey", "l_linenumber"), "left_anti")
    assert(joined.count() == 0)
  }

  test("stratified sample: exactly 10 per stratum, deterministic") {
    val rows = run("q_sample_stratified").collect()
    val perFlag = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perFlag.values.toSet == Set(10), perFlag)
    val again = run("q_sample_stratified").collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("scalable stratified == declarative stratified, row for row") {
    def canon(name: String) = run(name).collect()
      .map(_.toString).sorted.toSeq
    assert(canon("q_sample_stratified_scalable") ==
      canon("q_sample_stratified"))
    // the pruned path still shuffles only once (the window exchange)
    val plan = run("q_sample_stratified_scalable")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"want 1 hash exchange, got $exchanges")
  }

  test("epoch shuffle: same membership, different order per epoch, " +
      "single shard exchange") {
    import org.apache.spark.sql.functions.col
    def run(e: Int) = graft.operators.Sampling.epochShuffleAt(e)(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val e3 = run(3); val e4 = run(4)
    // every doc appears exactly once in every epoch
    assert(e3.map(_._3).sorted.toSeq == e4.map(_._3).sorted.toSeq)
    assert(e3.map(_._3).distinct.length == e3.length)
    // the permutation actually changes between epochs
    val pos3 = e3.map(t => t._3 -> (t._1, t._2)).toMap
    val moved = e4.count(t => pos3(t._3) != ((t._1, t._2)))
    assert(moved > e4.length / 2,
      s"epoch change must reshuffle most docs, moved only $moved/${e4.length}")
    // rerun-deterministic
    assert(run(3).toSeq == e3.toSeq)
    // one exchange: the shard-key window shuffle (plus nothing global)
    val plan = graft.operators.Sampling.epochShuffleAt(3)(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"no global sort allowed in the epoch shuffle:\n${plan.take(600)}")
  }

  test("hash sample plan: filter is map-side (single agg exchange only)") {
    val plan = run("q_sample_hash").queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"want <=2 exchange mentions (partial+final agg), got $exchanges\n$plan")
  }
}
