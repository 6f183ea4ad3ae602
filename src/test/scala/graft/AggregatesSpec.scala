package graft

import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {

  test("group_multi: 3 flags, counts sum to table size") {
    val rows = run("q_agg_group_multi").collect()
    assert(rows.length == 3)
    val total = rows.map(_.getLong(rows.head.fieldIndex("cnt"))).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("approx_count_distinct envelope: exact count + in-bounds flag") {
    val row = run("q_agg_approx_cd").collect()(0)
    val exact = Tables.lineitem(spark, sf)
      .select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(row.getLong(row.fieldIndex("n_part_exact")) == exact)
    assert(row.getBoolean(row.fieldIndex("approx_ok")))
  }

  test("approx_percentile envelope holds in every group") {
    val rows = run("q_agg_approx_pctl").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getBoolean(rows.head.fieldIndex("approx_ok"))))
  }

  test("rollup adds subtotal + grand-total rows over plain groupBy") {
    val plain = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus").count().count()
    val rolled = run("q_agg_rollup").count()
    // + one subtotal per returnflag (3) + one grand total
    assert(rolled == plain + 3 + 1)
  }

  test("cube adds all grouping combinations") {
    val cube = run("q_agg_cube").collect()
    // (3+1) flags x (2+1) status = 12 combos
    assert(cube.length == 12)
    val grand = cube.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 &&
      grand(0).getLong(2) == Tables.lineitem(spark, sf).count())
  }

  test("agg merge associativity: partial sums equal single-partition sum") {
    val li = Tables.lineitem(spark, sf).select(col("l_quantity").cast("decimal(12,2)").as("q"))
    val many = li.repartition(8).agg(sum("q")).collect()(0).getDecimal(0)
    val one = li.coalesce(1).agg(sum("q")).collect()(0).getDecimal(0)
    assert(many == one)
  }

  test("variance formula matches Spark's var_samp within float tolerance") {
    val ours = run("q_agg_stats").collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("var_qty"))).toMap
    val ref = Tables.lineitem(spark, sf).groupBy("l_linestatus")
      .agg(var_samp(col("l_quantity"))).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) < 1e-6 * math.max(1.0, math.abs(v)))
    }
  }
}
