package graft

import org.apache.spark.sql.functions._

/** Round-5 fortieth wave: Nelson-Aalen hazard, Newman modularity. */
class Round5WaveFortySpec extends SparkSpec {

  test("hazard: risk sets and cumulative sum match a recount") {
    val rows = run("q_ts_hazard").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime / 1000L))
    val hz = ev.map(_._3).max
    val ttes = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val su = xs.filter(_._2 == "signup").map(_._3)
        .sorted.headOption
      su.map { s =>
        val pu = xs.filter(e => e._2 == "purchase" && e._3 >= s)
          .map(_._3).sorted.headOption
        pu match {
          case Some(p) => ((p - s) / 3600L, true)
          case None => ((hz - s) / 3600L, false)
        }
      }
    }
    val cells = ttes.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, xs) =>
        (t, xs.count(_._2).toLong, xs.length.toLong)
      }
    var cum = 0L
    val expected = cells.zipWithIndex.collect {
      case ((t, d, _), i) if d > 0 =>
        val atRisk = cells.drop(i).map(_._3).sum
        val step = 1000000L * d / atRisk
        cum += step
        (t, d, atRisk, step, cum)
    }
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == expected)
    // hazard is nondecreasing
    assert(got.map(_._5).zip(got.map(_._5).tail)
      .forall { case (a, b) => b >= a })
  }

  test("modularity: contributions match a community recount and sum globally") {
    val rows = run("q_graph_modularity").collect()
    assert(rows.nonEmpty)
    // rebuild undirected weighted edges + thresholded CC communities
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cNat = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val sNat = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val und = li.map { case (ok, sk) =>
      val (a, b) = (cNat(ord(ok)), sNat(sk))
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2)
      .groupBy(identity).map { case (e, xs) => e -> xs.length.toLong }
    val tw = und.values.sum; val ne = und.size.toLong
    val kept = und.filter { case (_, w) => w * ne >= 2 * tw }.keys.toSet
    // CC over kept
    val label = scala.collection.mutable.Map((0L until 25L).map(i => i -> i): _*)
    var changed = true
    while (changed) {
      changed = false
      kept.foreach { case (a, b) =>
        val m = math.min(label(a), label(b))
        if (label(a) != m || label(b) != m) {
          label(a) = m; label(b) = m; changed = true
        }
      }
    }
    val m = tw
    val comms = (0L until 25L).groupBy(label)
    val expected = comms.map { case (c, nodes) =>
      val ns = nodes.toSet
      val wIn = und.collect {
        case ((a, b), w) if ns(a) && ns(b) => w
      }.sum
      val deg = und.collect {
        case ((a, b), w) if ns(a) || ns(b) =>
          w * (Seq(a, b).count(ns) : Int)
      }.sum
      val contrib = 1000000L * wIn / m -
        1000000L * deg * deg / (4 * m * m)
      c -> (nodes.length.toLong, wIn, deg, contrib)
    }
    val totalQ = expected.values.map(_._4).sum
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, wIn, deg, contrib) = expected(r.getLong(0))
      assert(r.getLong(r.fieldIndex("n_nations")) == n)
      assert(r.getLong(r.fieldIndex("w_in")) == wIn)
      assert(r.getLong(r.fieldIndex("deg")) == deg)
      assert(r.getLong(r.fieldIndex("q_contrib_micro")) == contrib)
      assert(r.getLong(r.fieldIndex("modularity_micro")) == totalQ)
    }
  }
}
