package graft

/** Round-5 sixty-first wave: mix-shift decomposition, importance
  * weights. */
class Round5WaveSixtyOneSpec extends SparkSpec {

  test("mix_shift: decomposition identity holds; residual bounded") {
    val rows = run("q_agg_mix_shift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val delta = r.getLong(r.fieldIndex("delta"))
      val vol = r.getLong(r.fieldIndex("volume_effect"))
      val rate = r.getLong(r.fieldIndex("rate_effect"))
      val resid = r.getLong(r.fieldIndex("floor_residual"))
      assert(delta == vol + rate + resid)
      val n0 = r.getLong(r.fieldIndex("n0"))
      val n1 = r.getLong(r.fieldIndex("n1"))
      // flooring loses < 1 cent per averaged order on each side
      assert(math.abs(resid) <= n0 + n1)
      assert(r.getLong(r.fieldIndex("rev0")) ==
        r.getLong(r.fieldIndex("avg0")) * n0 +
          r.getLong(r.fieldIndex("rev0")) % n0)
    }
    // recount one segment from raw orders
    val o = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("c_mktsegment",
        "year(CAST(o_orderdate AS TIMESTAMP)) AS yr",
        "CAST(round(o_totalprice * 100) AS LONG) AS cents")
      .collect().map(x => (x.getString(0), x.getInt(1), x.getLong(2)))
    val seg = rows.head.getString(0)
    val xs = o.filter(_._1 == seg)
    val r0 = xs.filter(_._2 == 1999); val r1 = xs.filter(_._2 == 2000)
    val row = rows.head
    assert(row.getLong(row.fieldIndex("n0")) == r0.length.toLong)
    assert(row.getLong(row.fieldIndex("rev1")) == r1.map(_._3).sum)
  }

  test("importance: weighted source mass reproduces the target shares") {
    val rows = run("q_sample_importance").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "n_chars div 100 AS bin").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val tgt = docs.filter(_._1 == "src0").groupBy(_._2)
      .map { case (b, v) => b -> v.size.toLong }
    val tgtTot = tgt.values.sum
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val srcBins = docs.filter(_._1 == src).groupBy(_._2)
        .map { case (b, v) => b -> v.size.toLong }
      val srcTot = srcBins.values.sum
      // every source bin appears exactly once
      assert(rs.map(_.getLong(1)).toSet == srcBins.keySet, src)
      var reweighted = 0L
      rs.foreach { r =>
        val bin = r.getLong(1)
        val sc = r.getLong(r.fieldIndex("src_cnt"))
        val tc = r.getLong(r.fieldIndex("tgt_cnt"))
        assert(sc == srcBins(bin))
        assert(tc == tgt.getOrElse(bin, 0L))
        val w = r.getLong(r.fieldIndex("weight_micro"))
        assert(w == (tc * srcTot * 1000000L) / (tgtTot * sc))
        reweighted += w * sc
      }
      // sum(w * src_cnt) ~= 10^6 * src_tot * (target mass covered by
      // the source's bins) / tgt_tot — equality up to flooring
      val covered = srcBins.keySet.toSeq
        .map(b => tgt.getOrElse(b, 0L)).sum
      val ideal = 1000000L * srcTot * covered / tgtTot
      // each bin's floored weight loses < 1 micro, amplified by that
      // bin's src_cnt => total drift < sum(src_cnt) = srcTot
      assert(reweighted <= ideal + rs.length.toLong)
      assert(reweighted >= ideal - srcTot, src)
    }
  }
}
