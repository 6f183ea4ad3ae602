package graft

import org.apache.spark.sql.functions._

/** Round-5 thirty-eighth wave: lagged cross-correlation, Kendall tau,
  * alert debounce. */
class Round5WaveThirtyEightSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def grids(): Map[String, Seq[(Long, Long)]] = {
    val ev = Tables.events(spark, sf).select("event_type", "ts", "value")
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime / 3600000L,
        math.floor(r.getDouble(2)).toLong))
    ev.groupBy(_._1).map { case (t, xs) =>
      t -> xs.groupBy(_._2).toSeq
        .map { case (h, ys) => (h, ys.map(_._3).sum / ys.length) }
        .sortBy(_._1)
    }
  }

  test("xcorr: integer covariances and best lags match a recount") {
    val rows = run("q_ts_xcorr").collect()
    assert(rows.nonEmpty)
    val g = grids()
    val byPair = rows.groupBy(r => (r.getString(0), r.getString(1)))
    byPair.foreach { case ((ta, tb), prs) =>
      assert(ta < tb)
      val ga = g(ta).toMap; val gb = g(tb).toMap
      val cells = (-3L to 3L).map { lag =>
        val joined = ga.toSeq.flatMap { case (hi, x) =>
          gb.get(hi + lag).map(y => (x, y))
        }
        val n = joined.length.toLong
        val sx = joined.map(_._1).sum; val sy = joined.map(_._2).sum
        val sxy = joined.map(p => p._1 * p._2).sum
        lag -> (n, n * sxy - sx * sy)
      }.toMap
      val best = cells.toSeq.minBy { case (lag, (_, xc)) => (-xc, lag) }._1
      prs.foreach { r =>
        val lag = r.getLong(r.fieldIndex("lag"))
        val (n, xc) = cells(lag)
        assert(r.getLong(r.fieldIndex("n")) == n, s"$ta-$tb lag $lag")
        assert(r.getLong(r.fieldIndex("xcov")) == xc)
        assert(r.getBoolean(r.fieldIndex("is_best_lag")) == (lag == best))
      }
    }
  }

  test("kendall: tau matches a brute pair count; bounds hold") {
    val rows = run("q_eval_kendall").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val src = r.getString(0)
      val d = docs.filter(_._1 == src)
        .map(x => (x._2, x._3, md5hex(s"rank-v1:${x._2}")))
      var conc = 0L; var total = 0L
      for (i <- d.indices; j <- (i + 1) until d.length) {
        val (id1, a1, h1) = d(i); val (id2, a2, h2) = d(j)
        val (lo, hi) = if (id1 < id2) (d(i), d(j)) else (d(j), d(i))
        val gtA = lo._2 > hi._2 || (lo._2 == hi._2 && lo._1 > hi._1)
        val gtB = lo._3 > hi._3 || (lo._3 == hi._3 && lo._1 > hi._1)
        if (gtA == gtB) conc += 1
        total += 1
      }
      assert(r.getLong(r.fieldIndex("n_pairs")) == total, src)
      assert(r.getLong(r.fieldIndex("concordant")) == conc)
      val tau = 2000000L * conc / total - 1000000L
      assert(r.getLong(r.fieldIndex("tau_micro")) == tau)
      assert(tau >= -1000000L && tau <= 1000000L)
    }
  }

  test("debounce: every interval is >=3 consecutive breaches at max run length") {
    val rows = run("q_win_debounce").collect()
    assert(rows.nonEmpty)
    val g = grids()
    rows.groupBy(_.getString(0)).foreach { case (t, ivs) =>
      val grid = g(t)
      val mean = grid.map(_._2).sum / grid.length
      val flags = grid.map(_._2 > mean)
      // recompute maximal runs of breaches
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var start = -1
      flags.zipWithIndex.foreach { case (f, i) =>
        if (f && start < 0) start = i
        if (!f && start >= 0) { runs += ((start, i - 1)); start = -1 }
      }
      if (start >= 0) runs += ((start, flags.length - 1))
      val expected = runs.filter(r => r._2 - r._1 + 1 >= 3).map { case (a, b) =>
        (grid(a)._1, grid(b)._1, (b - a + 1).toLong,
          grid.slice(a, b + 1).map(_._2).max)
      }.toSet
      val got = ivs.map(r => (
        r.getTimestamp(r.fieldIndex("start_hour")).getTime / 3600000L,
        r.getTimestamp(r.fieldIndex("end_hour")).getTime / 3600000L,
        r.getLong(r.fieldIndex("len")),
        r.getLong(r.fieldIndex("peak_hm")))).toSet
      assert(got == expected, t)
    }
  }
}
