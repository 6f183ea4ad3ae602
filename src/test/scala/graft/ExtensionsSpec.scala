package graft

import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("UDAF merge is associative: repartitioned result identical") {
    val a = run("q_ext_udaf").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // recompute with a different partitioning; Aggregator merge must
    // produce the identical exact result
    import org.apache.spark.sql.expressions.Aggregator
    val b = Tables.orders(spark, sf)
      .repartition(7)
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_orderstatus")
      .agg(round(sum(col("cents")) / count(lit(1)) / 100.0, 4).as("avg"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("UDTF: installment amounts sum back to order totals") {
    val parts = run("q_ext_udtf").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val totals = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(parts == totals)
  }

  test("sql entry point returns same rows as the DataFrame API version") {
    val viaSql = run("q_ext_sql_entry").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaSql.nonEmpty)
    val viaDf = {
      val l = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      val c = Tables.customer(spark, sf)
      val n = Tables.nation(spark, sf)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_lines"),
          Ora.dsum(Ora.money(col("l_extendedprice"))).as("revenue"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(viaSql == viaDf)
  }
}
