package graft

import org.apache.spark.sql.functions._

/** Round-5 fifty-ninth wave: boxplot summary, FK-integrity audit. */
class Round5WaveFiftyNineSpec extends SparkSpec {

  test("boxplot: five-number recount; fences and outlier counts exact") {
    val rows = run("q_agg_boxplot").collect()
    assert(rows.length == 5)
    val byType = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val vs = byType(t).map(_._2).sorted
      val n = vs.length.toLong
      val dom = vs.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (v, g) => (v, g.size.toLong) }
      def disc(mult: Long, of: Long): Long = {
        var cum = 0L
        dom.foreach { case (v, c) =>
          cum += c; if (cum * of >= mult * n) return v }
        dom.last._1
      }
      val q1 = disc(1, 4); val med = disc(1, 2); val q3 = disc(3, 4)
      assert(r.getLong(r.fieldIndex("v_min")) == vs.head, t)
      assert(r.getLong(r.fieldIndex("v_max")) == vs.last, t)
      assert(r.getLong(r.fieldIndex("q1")) == q1, t)
      assert(r.getLong(r.fieldIndex("med")) == med, t)
      assert(r.getLong(r.fieldIndex("q3")) == q3, t)
      assert(q1 <= med && med <= q3)
      val iqr = q3 - q1
      assert(r.getLong(r.fieldIndex("iqr")) == iqr)
      val lo2 = 2 * q1 - 3 * iqr; val hi2 = 2 * q3 + 3 * iqr
      assert(r.getLong(r.fieldIndex("n_low_outliers")) ==
        vs.count(v => 2 * v < lo2).toLong, t)
      assert(r.getLong(r.fieldIndex("n_high_outliers")) ==
        vs.count(v => 2 * v > hi2).toLong, t)
    }
  }

  test("fk_audit: healthy fixture reports zero orphans everywhere") {
    val rows = run("q_dq_fk_audit").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_orphan_keys")) == 0L,
        r.getString(0))
      assert(r.getLong(r.fieldIndex("n_orphan_rows")) == 0L)
      assert(r.getLong(r.fieldIndex("orphan_micro")) == 0L)
      assert(r.getLong(r.fieldIndex("n_child_keys")) <=
        r.getLong(r.fieldIndex("n_child_rows")))
    }
  }

  test("fk_audit: a broken FK is detected by the same probe shape") {
    // plant orphans: drop half the parents, re-run the anti-join probe
    val child = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey AS k")
    val parent = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 2 === 0)
      .selectExpr("o_orderkey AS k")
    val orphans = child.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))
      .join(parent, Seq("k"), "left_anti")
    val nOrphan = orphans.count()
    assert(nOrphan > 0, "halved parent set must orphan some children")
    // every orphan key is genuinely odd (the dropped half)
    orphans.select("k").collect().foreach { r =>
      assert(r.getLong(0) % 2 != 0)
    }
  }
}
