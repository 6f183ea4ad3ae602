package graft

import org.apache.spark.sql.functions._

/** Round-5 forty-sixth wave: SQ8 quantization recall, greedy
  * k-center selection, deterministic SMOTE. */
class Round5WaveFortySixSpec extends SparkSpec {

  private def micro(xs: Seq[Float]): Array[Long] =
    xs.map(x => math.floor(x.toDouble * 1000000L).toLong).toArray

  private lazy val vecs: Map[Long, (Array[Long], Int)] =
    Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => r.getLong(0) ->
        ((micro(r.getSeq[Float](1)), r.getInt(2)))).toMap

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("sq8: ranks are valid, codes bounded, reconstruction error bounded") {
    val rows = run("q_vec_sq8").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 10))
    val ov = rows.head.getLong(rows.head.fieldIndex("overlap10"))
    assert(ov >= 0L && ov <= 10L)
    // full-precision dots are non-increasing with rank
    val dots = rows.sortBy(_.getInt(0))
      .map(_.getLong(rows.head.fieldIndex("full_dot")))
    dots.sliding(2).foreach { case Array(x, y) => assert(x >= y); case _ => }
    // the quantizer itself: every reconstructed midpoint stays inside
    // its dimension's [mn, mx] band
    val dims = vecs.values.map(_._1).toSeq
    val d = dims.head.length
    (0 until d).foreach { i =>
      val col0 = dims.map(_(i))
      val (mn, mx) = (col0.min, col0.max)
      val w = mx - mn + 1
      col0.foreach { vm =>
        val q = ((vm - mn) * 256) / w
        assert(q >= 0 && q <= 255)
        val rm = mn + ((2 * q + 1) * w) / 512
        assert(rm >= mn && rm <= mx + w / 512 + 1)
      }
    }
  }

  test("kcenter: greedy recount matches; radii non-increasing") {
    val rows = run("q_sim_kcenter").collect().sortBy(_.getInt(0))
    assert(rows.length == 5)
    assert(rows.head.getInt(0) == 1 &&
      rows.head.getLong(rows.head.fieldIndex("vec_id")) == 0L)
    var centers = List(0L)
    (2 to 5).foreach { k =>
      val dmin = vecs.map { case (id, (vm, _)) =>
        id -> centers.map(c => d2(vm, vecs(c)._1)).min
      }
      val pick = dmin.toSeq.sortBy { case (id, dd) => (-dd, id) }.head
      val r = rows(k - 1)
      assert(r.getLong(r.fieldIndex("vec_id")) == pick._1, s"round $k")
      assert(r.getLong(r.fieldIndex("sel_dist2")) == pick._2, s"round $k")
      centers ::= pick._1
    }
    // farthest-first property: selection distances are non-increasing
    val radii = rows.drop(1).map(_.getLong(rows.head.fieldIndex("sel_dist2")))
    radii.sliding(2).foreach { case Array(x, y) => assert(x >= y); case _ => }
  }

  test("smote: synthetic points sit on the v->nn segment, minority only") {
    val rows = run("q_sample_smote").collect()
    assert(rows.nonEmpty)
    // one synthetic row per minority member
    val counts = vecs.values.groupBy(_._2).map { case (l, v) => l -> v.size }
    val minLabel = counts.toSeq.sortBy { case (l, c) => (c, l) }.head._1
    assert(rows.length == counts(minLabel))
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("label")) == minLabel)
      val vid = r.getLong(r.fieldIndex("vec_id"))
      val nid = r.getLong(r.fieldIndex("nn_id"))
      val alpha = r.getLong(r.fieldIndex("alpha_micro"))
      assert(alpha >= 0L && alpha < 1000000L)
      // nn is the exact nearest same-label neighbor
      val sameLabel = vecs.filter(v => v._2._2 == minLabel && v._1 != vid)
      val best = sameLabel.map { case (id, (vm, _)) =>
        id -> d2(vecs(vid)._1, vm)
      }.toSeq.sortBy { case (id, dd) => (dd, id) }.head
      assert(nid == best._1 && r.getLong(r.fieldIndex("nn_dist2")) == best._2)
      // synth recomputes exactly, and lies between v and nn per dim
      // (shipped as a canonical comma-joined string — the correctness
      // driver's hasher cannot sort top-level array columns)
      val v = vecs(vid)._1; val n = vecs(nid)._1
      val synth = r.getString(r.fieldIndex("synth"))
        .split(",").map(_.toLong).toSeq
      v.indices.foreach { i =>
        val exp = v(i) +
          (alpha * (n(i) - v(i)) + 10000000000000L) / 1000000L - 10000000L
        assert(synth(i) == exp)
        val lo = math.min(v(i), n(i)) - 1
        val hi = math.max(v(i), n(i)) + 1
        assert(synth(i) >= lo && synth(i) <= hi)
      }
    }
  }
}
