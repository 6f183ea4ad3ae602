package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q1_agg returns the 6 returnflag×linestatus groups with sane sums") {
    val rows = run("q1_agg").collect()
    assert(rows.length == 6)
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(flags.subsetOf(Set(("A","F"),("N","F"),("N","O"),("R","F"))) ||
      flags.size == 6) // fixture domains: {A,N,R} x {F,O}
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_qty")) > 0)
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
      val avg = r.getDouble(r.fieldIndex("avg_qty"))
      assert(avg > 0 && avg < 51)
    }
  }

  test("q_agg_global merges partials like the reference client (1 row)") {
    val r = run("q_agg_global").collect()
    assert(r.length == 1)
    assert(r(0).getDouble(0) <= r(0).getDouble(1)) // min <= max
    assert(r(0).getLong(3) > 0)
  }

  test("q_scan_project_filter projects exactly 4 columns, filter holds") {
    val df = run("q_scan_project_filter")
    assert(df.columns.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"))
    assert(df.filter(col("l_extendedprice") <= 71000.0).count() == 0)
  }

  test("pushdown on/off equivalence (the reference's --use-cls discipline)") {
    // SkyhookDM's primary correctness signal: the same query with
    // storage pushdown enabled vs disabled must agree (SURVEY §5.1).
    def rows() = run("q_scan_project_filter").collect().map(_.toString).sorted
    val withPushdown = rows()
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    try {
      val without = rows()
      assert(withPushdown.sameElements(without))
    } finally spark.conf.set("spark.sql.parquet.filterPushdown", "true")
  }

  test("filter + projection are pushed into the parquet scan") {
    val df = run("q_scan_project_filter")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_extendedprice"), plan)
    // pruned read schema: only the 4 needed columns reach the scan
    assert(plan.contains("l_extendedprice") && !plan.contains("l_comment"))
  }
}
