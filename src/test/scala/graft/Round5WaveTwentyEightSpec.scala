package graft

import org.apache.spark.sql.functions._

/** Round-5 twenty-eighth wave: HHI concentration, Theil-Sen trend,
  * lexical richness. */
class Round5WaveTwentyEightSpec extends SparkSpec {

  test("hhi: basis-point shares match an exact-cents recount") {
    val rows = run("q_agg_hhi").collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_extendedprice").collect()
      .map { r =>
        val cents = (BigDecimal(r.getDouble(2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        (r.getLong(0), r.getLong(1), cents)
      }
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seg = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nat = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cells = li.map { case (ok, sk, c) => ((seg(ord(ok)), nat(sk)), c) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    rows.foreach { r =>
      val sg = r.getString(r.fieldIndex("c_mktsegment"))
      val mine = cells.filter(_._1._1 == sg)
      val tot = mine.values.sum
      val bps = mine.values.map(c => 10000L * c / tot)
      assert(r.getLong(r.fieldIndex("n_supplier_nations")) ==
        mine.size.toLong)
      assert(r.getLong(r.fieldIndex("seg_cents")) == tot)
      assert(r.getLong(r.fieldIndex("max_share_bp")) == bps.max)
      val bp2 = bps.map(b => b * b).sum
      assert(r.getLong(r.fieldIndex("sum_bp2")) == bp2)
      assert(r.getLong(r.fieldIndex("hhi")) == bp2 / 10000L)
      assert(r.getLong(r.fieldIndex("hhi")) <= 10000L)
    }
  }

  test("theil-sen: med2 matches a brute pairwise-slope recount") {
    val rows = run("q_ts_theilsen").collect()
    assert(rows.length == 5)
    val ev = Tables.events(spark, sf)
      .select("event_type", "ts", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
        math.floor(r.getDouble(2)).toLong))
    rows.foreach { r =>
      val t = r.getString(r.fieldIndex("event_type"))
      val grid = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (h, xs) => (h, xs.map(_._3).sum / xs.length) }
        .sortBy(_._1)
      val slopes = (for {
        i <- grid.indices; j <- (i + 1) until grid.length
      } yield {
        val dv = grid(j)._2 - grid(i)._2
        val dh = grid(j)._1 - grid(i)._1
        (dv.toDouble / dh, dv, dh)
      }).sortBy(x => (x._1, x._2, x._3))
      val np = slopes.length
      assert(r.getLong(r.fieldIndex("n_pairs")) == np.toLong)
      val lo = slopes((np + 1) / 2 - 1)._1
      val hi = slopes((np + 2) / 2 - 1)._1
      val med2 = BigDecimal(lo + hi)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(r.fieldIndex("med2_slope")) - med2)
        < 1e-9, t)
    }
  }

  test("ttr: richness ratios match a token recount") {
    val rows = run("q_text_ttr").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = docs(r.getLong(0)).split(" ", -1).toSeq
      val byTok = toks.groupBy(identity)
      val hapax = byTok.count(_._2.length == 1).toLong
      assert(r.getLong(r.fieldIndex("n_tokens")) == toks.length.toLong)
      assert(r.getLong(r.fieldIndex("n_types")) == byTok.size.toLong)
      assert(r.getLong(r.fieldIndex("n_hapax")) == hapax)
      assert(r.getLong(r.fieldIndex("ttr_micro")) ==
        1000000L * byTok.size / toks.length)
      assert(r.getLong(r.fieldIndex("hapax_micro")) ==
        1000000L * hapax / byTok.size)
    }
  }
}
