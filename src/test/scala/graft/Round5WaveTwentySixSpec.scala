package graft

import org.apache.spark.sql.functions._

/** Round-5 twenty-sixth wave: dominant color, group k-fold, DAU/MAU,
  * hourly peak detection. */
class Round5WaveTwentySixSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dominant color: kernel result matches a closed-form recount") {
    val rows = run("q_mm_dominant_color").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
      def base(c: Int) = ((id * 7 + c * 50) % 240).toInt
      val triples = (0 until w).map(x =>
        ((base(0) + x) / 16, (base(1) + x) / 16, (base(2) + x) / 16))
      val counts = triples.groupBy(identity)
        .map { case (k, xs) => k -> xs.length.toLong * h }
      val best = counts.toSeq.minBy { case ((b, g, rr), n) => (-n, b, g, rr) }
      assert(r.getLong(r.fieldIndex("qb")) == best._1._1.toLong, s"doc $id")
      assert(r.getLong(r.fieldIndex("qg")) == best._1._2.toLong)
      assert(r.getLong(r.fieldIndex("qr")) == best._1._3.toLong)
      assert(r.getLong(r.fieldIndex("pix_count")) == best._2)
    }
  }

  test("group kfold: no user straddles folds; totals add up") {
    val rows = run("q_sample_group_kfold").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val ev = Tables.events(spark, sf).select("user_id").collect()
      .map(_.getLong(0))
    val foldOf = ev.distinct.map { u =>
      u -> java.lang.Long.parseLong(md5hex(s"kfold-v1:$u").take(6), 16) % 5L
    }.toMap
    val tot = ev.length.toLong
    rows.foreach { r =>
      val f = r.getLong(r.fieldIndex("fold"))
      val users = foldOf.filter(_._2 == f).keys.toSet
      assert(r.getLong(r.fieldIndex("n_users")) == users.size.toLong)
      val nEv = ev.count(users).toLong
      assert(r.getLong(r.fieldIndex("n_events")) == nEv)
      assert(r.getLong(r.fieldIndex("share_micro")) == 1000000L * nEv / tot)
    }
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_events"))).sum == tot)
  }

  test("dau/mau: ratios match a distinct recount") {
    val rows = run("q_agg_dau_mau").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select("ts", "user_id").collect()
      .map { r =>
        val ms = r.getTimestamp(0).getTime
        (ms / 86400000L, ms, r.getLong(1))
      }
    // month key via UTC calendar
    def monthOf(ms: Long): (Int, Int) = {
      val c = java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC)
      (c.getYear, c.getMonthValue)
    }
    val mau = ev.groupBy(e => monthOf(e._2))
      .map { case (m, xs) => m -> xs.map(_._3).distinct.length.toLong }
    rows.foreach { r =>
      val dayMs = r.getTimestamp(r.fieldIndex("day")).getTime
      val dayUsers = ev.filter(_._1 == dayMs / 86400000L).map(_._3).distinct
      assert(r.getLong(r.fieldIndex("dau")) == dayUsers.length.toLong)
      val m = mau(monthOf(dayMs))
      assert(r.getLong(r.fieldIndex("mau")) == m)
      assert(r.getLong(r.fieldIndex("stickiness_micro")) ==
        1000000L * dayUsers.length / m)
    }
  }

  test("peaks: every reported peak is a strict local max above the mean") {
    val rows = run("q_ts_peaks").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select("event_type", "ts", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
        math.floor(r.getDouble(2)).toLong))
    val grids = ev.groupBy(_._1).map { case (t, xs) =>
      t -> xs.groupBy(_._2).toSeq
        .map { case (h, ys) => (h, ys.map(_._3).sum / ys.length) }
        .sortBy(_._1)
    }
    val expected = grids.toSeq.flatMap { case (t, g) =>
      val mean = g.map(_._2).sum / g.length
      g.sliding(3).collect {
        case Seq((_, p), (h, v), (_, nx))
          if v > p && v > nx && v > mean => (t, h)
      }
    }.toSet
    val got = rows.map(r => (r.getString(r.fieldIndex("event_type")),
      r.getTimestamp(r.fieldIndex("hour")).getTime / 3600000L)).toSet
    assert(got == expected)
  }
}
