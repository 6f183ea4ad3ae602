package graft

/** Round-5 sixty-fifth wave: variance ratio, rolling correlation. */
class Round5WaveSixtyFiveSpec extends SparkSpec {

  private lazy val daily: Map[String, Seq[(Long, Long)]] =
    Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS LONG) div 86400 AS day",
        "CAST(round(value * 100) AS LONG) AS c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (d, ys) => (d, ys.map(_._3).sum / ys.size) }
      }

  test("variance_ratio: common-window moment recount per type") {
    val rows = run("q_ts_variance_ratio").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val t = r.getString(0)
      val ys = daily(t).map(_._2)
      val pairs = (4 until ys.length).map(i =>
        (ys(i) - ys(i - 1), ys(i) - ys(i - 4)))
      val n = pairs.length.toLong
      val s1 = pairs.map(_._1).sum; val q1 = pairs.map(p => p._1 * p._1).sum
      val s4 = pairs.map(_._2).sum; val q4 = pairs.map(p => p._2 * p._2).sum
      val dd1 = n * q1 - s1 * s1; val dd4 = n * q4 - s4 * s4
      assert(r.getLong(r.fieldIndex("n")) == n, t)
      assert(r.getLong(r.fieldIndex("dd1")) == dd1, t)
      assert(r.getLong(r.fieldIndex("dd4")) == dd4, t)
      if (dd1 > 0) {
        val vr = r.getLong(r.fieldIndex("vr_micro"))
        assert(vr == (1000000L * dd4) / (4 * dd1), t)
        assert(vr >= 0L)
      }
    }
  }

  test("rolling_corr: r in [-1, 1]; one window recount") {
    val rows = run("q_ts_rolling_corr").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getDouble(r.fieldIndex("r_14d"))
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
    }
    // recount the last full window from raw daily totals (not means)
    val cx = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.expr(
        "event_type = 'click'"))
      .selectExpr("CAST(ts AS LONG) div 86400 AS day",
        "CAST(round(value * 100) AS LONG) AS c").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (d, v) => d -> v.map(_._2).sum }
    val py = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.expr(
        "event_type = 'purchase'"))
      .selectExpr("CAST(ts AS LONG) div 86400 AS day",
        "CAST(round(value * 100) AS LONG) AS c").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (d, v) => d -> v.map(_._2).sum }
    val days = (cx.keySet & py.keySet).toSeq.sorted
    val last = rows.last
    val window = days.filter(_ <= last.getLong(0)).takeRight(14)
    assert(window.length == 14)
    val xs = window.map(cx); val ys0 = window.map(py)
    val n = 14.0
    val sx = xs.sum.toDouble; val sy = ys0.sum.toDouble
    val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
    val syy = ys0.map(y => BigInt(y) * BigInt(y)).sum.toDouble
    val sxy = xs.zip(ys0).map(p => BigInt(p._1) * BigInt(p._2)).sum.toDouble
    val exp = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(last.getDouble(last.fieldIndex("r_14d")) - exp) < 1e-9)
  }
}
