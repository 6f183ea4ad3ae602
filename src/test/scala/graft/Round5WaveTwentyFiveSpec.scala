package graft

import org.apache.spark.sql.functions._

/** Round-5 twenty-fifth wave: DP geometric release, A/B Welch t²,
  * monthly VWAP. */
class Round5WaveTwentyFiveSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dp release: noise is the geometric inverse-CDF draw, clamped at 0") {
    val rows = run("q_priv_dp_release").collect()
    val truth = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == truth.size)
    val weights = (-8 to 8).map(k => k -> (1L << (8 - math.abs(k))))
    val cum = weights.scanLeft(0L)(_ + _._2).init
    val table = weights.zip(cum).map { case ((k, w), lo) => (k, lo, lo + w) }
    rows.foreach { r =>
      val lang = r.getString(r.fieldIndex("lang"))
      val n = r.getLong(r.fieldIndex("n_true"))
      assert(n == truth(lang))
      val u = java.lang.Long.parseLong(
        md5hex(s"dp-v1:$lang").take(6), 16) % 766L
      val k = table.find(t => u >= t._2 && u < t._3).get._1.toLong
      assert(r.getLong(r.fieldIndex("noise")) == k, lang)
      assert(r.getLong(r.fieldIndex("n_released")) == math.max(0L, n + k))
      assert(k >= -8L && k <= 8L)
    }
  }

  test("ab test: one-pass moments match a per-arm recount") {
    val rows = run("q_eval_ab_test").collect()
    val ev = Tables.events(spark, sf)
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) % 2 == 0,
        math.floor(r.getDouble(2) * 100d).toLong))
    rows.foreach { r =>
      val t = r.getString(r.fieldIndex("event_type"))
      def arm(isA: Boolean) = {
        val xs = ev.filter(e => e._1 == t && e._2 == isA).map(_._3)
        val n = xs.length.toLong
        (n, xs.sum, xs.map(x => x * x).sum)
      }
      val (na, s1a, s2a) = arm(true); val (nb, s1b, s2b) = arm(false)
      assert(r.getLong(r.fieldIndex("n_a")) == na)
      assert(r.getLong(r.fieldIndex("n_b")) == nb)
      val ma = s1a / na; val mb = s1b / nb
      assert(r.getLong(r.fieldIndex("mean_a_centi")) == ma)
      assert(r.getLong(r.fieldIndex("mean_b_centi")) == mb)
      val va = (na * s2a - s1a * s1a) / (na * (na - 1))
      val vb = (nb * s2b - s1b * s1b) / (nb * (nb - 1))
      assert(r.getLong(r.fieldIndex("var_a")) == va)
      assert(r.getLong(r.fieldIndex("var_b")) == vb)
      val se2 = va / na + vb / nb
      if (se2 > 0) {
        val t2 = 1000000L * (ma - mb) * (ma - mb) / se2
        assert(r.getLong(r.fieldIndex("t2_micro")) == t2)
        assert(r.getBoolean(r.fieldIndex("significant")) == (t2 > 3841459L))
      } else assert(!r.getBoolean(r.fieldIndex("significant")))
    }
  }

  test("vwap: exact-cent weighted mean matches a BigDecimal recount") {
    val rows = run("q_ts_vwap").collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select(date_trunc("month", col("l_shipdate")).as("m"),
        col("l_extendedprice"), col("l_quantity")).collect()
      .map { r =>
        val cents = BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100
        (r.get(0), cents.toLongExact, r.getDouble(2).toLong)
      }
    val byM = li.groupBy(_._1)
    assert(rows.length == byM.size)
    rows.foreach { r =>
      val xs = byM(r.get(r.fieldIndex("month")))
      val qtyTot = xs.map(_._3).sum
      assert(r.getLong(r.fieldIndex("n")) == xs.length.toLong)
      assert(r.getLong(r.fieldIndex("qty_tot")) == qtyTot)
      assert(r.getLong(r.fieldIndex("vwap_cents")) ==
        xs.map(x => x._2 * x._3).sum / qtyTot)
      assert(r.getLong(r.fieldIndex("avg_cents")) ==
        xs.map(_._2).sum / xs.length)
    }
  }
}
