package graft

import org.apache.spark.sql.functions._

/** Round-5 twenty-ninth wave: temperature mixing weights, MRR@10,
  * max drawdown. */
class Round5WaveTwentyNineSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("temperature weights: sqrt upweights low-resource langs") {
    val rows = run("q_sample_temperature_weights").collect()
    val counts = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == counts.size)
    val ws = counts.map { case (l, n) =>
      l -> math.floor(math.sqrt(n.toDouble)).toLong
    }
    val wtot = ws.values.sum; val ntot = counts.values.sum
    rows.foreach { r =>
      val l = r.getString(r.fieldIndex("lang"))
      assert(r.getLong(r.fieldIndex("n_docs")) == counts(l))
      assert(r.getLong(r.fieldIndex("w")) == ws(l))
      assert(r.getLong(r.fieldIndex("share_micro")) ==
        1000000L * ws(l) / wtot)
      assert(r.getLong(r.fieldIndex("prop_micro")) ==
        1000000L * counts(l) / ntot)
      assert(r.getLong(r.fieldIndex("epoch_quota")) ==
        100000L * ws(l) / wtot)
    }
    // temperature flattens: smallest lang gains share, largest loses
    val minL = counts.minBy(_._2)._1; val maxL = counts.maxBy(_._2)._1
    def row(l: String) = rows.find(_.getString(0) == l).get
    if (counts(minL) != counts(maxL)) {
      assert(row(minL).getLong(row(minL).fieldIndex("share_micro")) >=
        row(minL).getLong(row(minL).fieldIndex("prop_micro")))
      assert(row(maxL).getLong(row(maxL).fieldIndex("share_micro")) <=
        row(maxL).getLong(row(maxL).fieldIndex("prop_micro")))
    }
  }

  test("mrr: first relevant rank matches a recount; misses score 0") {
    val rows = run("q_eval_mrr").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.min(4L, r.getLong(2) / 250L)))
    rows.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      val ranked = docs.filter(_._1 == src)
        .sortBy(d => (md5hex(s"rank-v1:${d._2}"), d._2))
      val first = ranked.take(10).zipWithIndex
        .collectFirst { case ((_, _, rel), i) if rel >= 3 => i + 1L }
      first match {
        case Some(k) =>
          assert(r.getLong(r.fieldIndex("first_rel_rank")) == k, src)
          assert(r.getLong(r.fieldIndex("rr_micro")) == 1000000L / k)
        case None =>
          assert(r.isNullAt(r.fieldIndex("first_rel_rank")), src)
          assert(r.getLong(r.fieldIndex("rr_micro")) == 0L)
      }
    }
  }

  test("drawdown: peak-minus-cum maximum matches an exact-cents recount") {
    val rows = run("q_win_drawdown").collect()
    assert(rows.length == 5)
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map { r =>
        (r.getLong(0), (BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
      }
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        date_trunc("day", col("o_orderdate")).as("day")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.get(2)))
      .toMap
    val seg = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val daily = li.map { case (ok, c) =>
      val (ck, day) = ord(ok); ((seg(ck), day.toString), c)
    }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    rows.foreach { r =>
      val sg = r.getString(r.fieldIndex("c_mktsegment"))
      val series = daily.filter(_._1._1 == sg).toSeq
        .map { case ((_, d), c) => (d, c) }.sortBy(_._1)
      var cum = 0L; var peak = 0L; var mdd = 0L
      series.foreach { case (_, c) =>
        cum += c; peak = math.max(peak, cum)
        mdd = math.max(mdd, peak - cum)
      }
      assert(r.getLong(r.fieldIndex("n_days")) == series.length.toLong, sg)
      assert(r.getLong(r.fieldIndex("final_peak_cents")) == peak, sg)
      assert(r.getLong(r.fieldIndex("max_drawdown_cents")) == mdd, sg)
    }
  }
}
