package graft

import org.apache.spark.sql.functions._

/** Round-5 twenty-third wave: the Audit module — exact ROC AUC,
  * k-anonymity/l-diversity, chi-square contingency, DQ expectations. */
class Round5WaveTwentyThreeSpec extends SparkSpec {

  test("auc: grouped rank form equals brute pairwise counting") {
    val rows = run("q_eval_auc").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "en"))
    rows.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      val pos = docs.filter(d => d._1 == src && d._3).map(_._2)
      val neg = docs.filter(d => d._1 == src && !d._3).map(_._2)
      assert(r.getLong(r.fieldIndex("pos_n")) == pos.length.toLong)
      assert(r.getLong(r.fieldIndex("neg_n")) == neg.length.toLong)
      // brute Mann-Whitney in halves-avoiding 2x units: win=2, tie=1
      val num2 = (for { p <- pos; g <- neg } yield {
        if (p > g) 2L else if (p == g) 1L else 0L
      }).sum
      assert(r.getLong(r.fieldIndex("num2")) == num2)
      if (pos.nonEmpty && neg.nonEmpty) {
        assert(r.getLong(r.fieldIndex("auc_micro")) ==
          1000000L * num2 / (2L * pos.length * neg.length))
      } else assert(r.isNullAt(r.fieldIndex("auc_micro")))
    }
  }

  test("kanon: class sizes and diversity match a recount; both flag kinds occur") {
    val rows = run("q_priv_kanon").collect()
    val cust = Tables.customer(spark, sf)
      .select("c_nationkey", "c_acctbal", "c_mktsegment").collect()
      .map(r => (r.getInt(0), math.floor(r.getDouble(1) / 2000d).toLong,
        r.getString(2)))
    val classes = cust.groupBy(c => (c._1, c._2))
    assert(rows.length == classes.size)
    rows.foreach { r =>
      val key = (r.getInt(r.fieldIndex("c_nationkey")),
        r.getLong(r.fieldIndex("bal_band")))
      val members = classes(key)
      assert(r.getLong(r.fieldIndex("k_size")) == members.length.toLong)
      assert(r.getLong(r.fieldIndex("l_div")) ==
        members.map(_._3).distinct.length.toLong)
      assert(r.getBoolean(r.fieldIndex("viol_k")) == (members.length < 5))
      assert(r.getBoolean(r.fieldIndex("viol_l")) ==
        (members.map(_._3).distinct.length < 2))
    }
    // the fixture exercises the audit: some classes violate, some don't
    assert(rows.exists(_.getBoolean(rows.head.fieldIndex("viol_k"))))
    assert(rows.exists(r => !r.getBoolean(r.fieldIndex("viol_l")))
      || rows.exists(_.getBoolean(rows.head.fieldIndex("viol_l"))))
  }

  test("contingency: chi2 micro matches a full-cross recount with zero cells") {
    val r = run("q_agg_contingency").collect().head
    val cust = Tables.customer(spark, sf)
      .select("c_mktsegment", "c_nationkey").collect()
      .map(x => (x.getString(0), x.getInt(1)))
    val n = cust.length.toLong
    val obs = cust.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rt = cust.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ct = cust.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val chi2 = (for { (seg, rr) <- rt; (nat, cc) <- ct } yield {
      val o = obs.getOrElse((seg, nat), 0L)
      val d = n * o - rr * cc
      1000000L * d * d / (n * rr * cc)
    }).sum
    assert(r.getLong(r.fieldIndex("n")) == n)
    assert(r.getLong(r.fieldIndex("r_cats")) == rt.size.toLong)
    assert(r.getLong(r.fieldIndex("c_cats")) == ct.size.toLong)
    assert(r.getLong(r.fieldIndex("chi2_micro")) == chi2)
    assert(r.getLong(r.fieldIndex("dof")) ==
      (rt.size - 1).toLong * (ct.size - 1).toLong)
    assert(r.getLong(r.fieldIndex("v2_micro")) ==
      chi2 / (n * math.min(rt.size - 1, ct.size - 1)))
  }

  test("dq expectations: five verdict rows, counts match recounts") {
    val rows = run("q_dq_expectations").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    assert(rows.size == 5)
    val o = Tables.orders(spark, sf).collect()
    val total = o.length.toLong
    val custKeys = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val expect = Map(
      "orderdate_not_null" ->
        o.count(_.isNullAt(o.head.fieldIndex("o_orderdate"))).toLong,
      "totalprice_positive" ->
        o.count(r => r.isNullAt(r.fieldIndex("o_totalprice"))
          || r.getDouble(r.fieldIndex("o_totalprice")) <= 0d).toLong,
      "orderstatus_in_domain" ->
        o.count(r => r.isNullAt(r.fieldIndex("o_orderstatus"))
          || !Set("O", "F", "P")(r.getString(r.fieldIndex("o_orderstatus"))))
          .toLong,
      "orderkey_unique" -> (total -
        o.map(_.getLong(o.head.fieldIndex("o_orderkey"))).distinct.length),
      "custkey_references_customer" ->
        o.count(r => !custKeys(r.getLong(r.fieldIndex("o_custkey")))).toLong)
    expect.foreach { case (name, v) =>
      val (viol, tot, passed) = rows(name)
      assert(viol == v, name)
      assert(tot == total, name)
      assert(passed == (v == 0L), name)
    }
  }
}
