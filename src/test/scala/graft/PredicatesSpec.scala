package graft

import org.apache.spark.sql.functions._

class PredicatesSpec extends SparkSpec {

  test("between/in bounds hold on every returned row") {
    val rows = run("q_pred_between_in").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getDouble(r.fieldIndex("l_quantity"))
      assert(q >= 5 && q <= 10)
      assert(Set(1, 3, 5)(r.getInt(r.fieldIndex("l_linenumber"))))
      assert(r.getString(r.fieldIndex("l_returnflag")) != "A")
    }
  }

  test("like/regex rows all match one of the disjuncts") {
    val rows = run("q_pred_like_regex").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(r.fieldIndex("p_type"))
      val b = r.getString(r.fieldIndex("p_brand"))
      val n = r.getString(r.fieldIndex("p_name"))
      assert(t.startsWith("PROMO") ||
        (b.matches(".*Brand#1[0-9].*") && n.contains("widget")))
    }
  }

  test("filter partition invariant: p + !p + null(p) == total") {
    val li = Tables.lineitem(spark, sf)
    val p = col("l_quantity") > 25.0
    val total = li.count()
    val yes = li.filter(p).count()
    val no = li.filter(!p).count()
    val nul = li.filter(p.isNull).count()
    assert(yes + no + nul == total)
  }

  test("null 3VL: st is only F or null, flag column consistent") {
    val rows = run("q_pred_null3vl").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val isNull = r.isNullAt(r.fieldIndex("st"))
      assert(isNull || r.getString(r.fieldIndex("st")) == "F")
      assert(r.getBoolean(r.fieldIndex("st_is_null")) == isNull)
    }
  }

  test("predicates are pushed to parquet for the compound query") {
    val df = run("q_pred_between_in")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_quantity,5.0)") ||
      plan.contains("l_quantity"), plan)
  }
}
