package graft

import org.apache.spark.sql.functions._

/** Round-5 thirty-third wave: ER pipeline, SRM check, LTOB
  * downsampling. */
class Round5WaveThirtyThreeSpec extends SparkSpec {

  test("er: every planted typo lands in its source's entity") {
    val rows = run("q_dedup_er_entities").collect()
    assert(rows.nonEmpty)
    // brute recount: roster, pairwise ham<=1 (codes are 7 chars,
    // sf0.001 roster ~158 rows -> full pairwise is fine here)
    val ks = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0))
    def codeOf(k: Long): String = f"${k * 7919L % 10000000L}%07d"
    def typo(c: String): String =
      c.substring(0, 2) + ((c.charAt(2) - '0' + 1) % 10).toString +
        c.substring(3)
    val roster = ks.map(k => k -> codeOf(k)) ++
      ks.filter(_ % 20 == 0).map(k => (k + 10000000L) -> typo(codeOf(k)))
    def ham(a: String, b: String): Int =
      a.zip(b).count(p => p._1 != p._2)
    val ids = roster.map(_._1)
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    for (i <- roster.indices; j <- (i + 1) until roster.length)
      if (ham(roster(i)._2, roster(j)._2) <= 1) {
        adj(roster(i)._1) += roster(j)._1
        adj(roster(j)._1) += roster(i)._1
      }
    // union-find closure
    val label = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    var changed = true
    while (changed) {
      changed = false
      adj.foreach { case (a, ns) =>
        ns.foreach { b =>
          val m = math.min(label(a), label(b))
          if (label(a) != m || label(b) != m) {
            label(a) = m; label(b) = m; changed = true
          }
        }
      }
    }
    val expected = ids.groupBy(label).filter(_._2.length >= 2)
      .map { case (l, ms) => l -> ms.length.toLong }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      assert(expected(r.getLong(r.fieldIndex("entity"))) ==
        r.getLong(r.fieldIndex("n_records")))
    }
    // every planted typo shares an entity with its source record
    ks.filter(_ % 20 == 0).foreach { k =>
      assert(label(k) == label(k + 10000000L), s"typo of $k split off")
    }
  }

  test("srm: chi-square matches the parity recount") {
    val rows = run("q_eval_srm").collect()
    val ev = Tables.events(spark, sf).select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1) % 2 == 0))
    rows.foreach { r =>
      val t = r.getString(0)
      val na = ev.count(e => e._1 == t && e._2).toLong
      val nb = ev.count(e => e._1 == t && !e._2).toLong
      assert(r.getLong(r.fieldIndex("n_a")) == na)
      assert(r.getLong(r.fieldIndex("n_b")) == nb)
      val chi2 = 1000000L * (na - nb) * (na - nb) / (na + nb)
      assert(r.getLong(r.fieldIndex("srm_chi2_micro")) == chi2)
      assert(r.getBoolean(r.fieldIndex("srm_flag")) == (chi2 > 3841459L))
    }
  }

  test("lttb: each bucket keeps its max-area point") {
    val rows = run("q_ts_lttb").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select("event_type", "ts", "value")
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime / 3600000L,
        math.floor(r.getDouble(2)).toLong))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val grid = xs.groupBy(_._2).toSeq
        .map { case (h, ys) => (h, ys.map(_._3).sum / ys.length) }
        .sortBy(_._1)
      grid.zipWithIndex.drop(1).dropRight(1).map { case ((h, v), i) =>
        val (px, py) = grid(i - 1); val (nx, ny) = grid(i + 1)
        val area2 = math.abs((h - px) * (ny - py) - (nx - px) * (v - py))
        (t, i.toLong / 12L, h, v, area2) // i = 1-based pos - 1... see below
      }
      // candidate row index i corresponds to row_number i+1; the
      // query buckets by (rn-1) div 12 over the FULL grid
        .map { case (tt, _, h, v, a) =>
          val rn = grid.indexWhere(_._1 == h) + 1
          (tt, (rn - 1).toLong / 12L, h, v, a)
        }
    }.groupBy(x => (x._1, x._2)).map { case (k, cand) =>
      k -> cand.minBy(c => (-c._5, c._3))
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(r.fieldIndex("bucket")))
      val (_, _, h, v, a) = expected(key)
      assert(r.getTimestamp(r.fieldIndex("hour")).getTime / 3600000L == h,
        key)
      assert(r.getLong(r.fieldIndex("hm")) == v)
      assert(r.getLong(r.fieldIndex("area2")) == a)
    }
  }
}
