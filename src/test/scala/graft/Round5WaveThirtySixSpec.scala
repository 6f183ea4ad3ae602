package graft

import org.apache.spark.sql.functions._

/** Round-5 thirty-sixth wave: k-anon generalization fixer,
  * dedup-aware split, runs test. */
class Round5WaveThirtySixSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("generalize: minimal width per nation matches a lattice recount") {
    val rows = run("q_priv_generalize").collect()
    assert(rows.length == 25)
    val cust = Tables.customer(spark, sf)
      .select("c_nationkey", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    rows.foreach { r =>
      val nat = r.getInt(r.fieldIndex("c_nationkey"))
      val mine = cust.filter(_._1 == nat).map(_._2)
      val minOk = Seq(2000, 4000, 8000, 16000).find { w =>
        mine.groupBy(b => math.floor(b / w).toLong)
          .values.forall(_.length >= 5)
      }
      val expected = minOk.map(_.toString).getOrElse("suppress")
      assert(r.getString(r.fieldIndex("generalization")) == expected,
        s"nation $nat")
    }
  }

  test("dedup-aware split: no near-dup pair straddles splits; totals add up") {
    val rows = run("q_sample_dedup_aware_split").collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum == total)
    // independently verify the invariant: for every jaccard>=0.7 pair,
    // both docs land in the same split
    val pairs = run("q_dedup_jaccard_pairs").collect()
      .map(r => (r.getLong(r.fieldIndex("ida")),
        r.getLong(r.fieldIndex("idb"))))
    // reconstruct components
    val label = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = label.getOrElse(x, x)
      if (p == x) x else { val r = find(p); label(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) label(math.max(ra, rb)) = math.min(ra, rb)
    }
    def splitOf(grp: Long): String = {
      val b = java.lang.Long.parseLong(
        md5hex(s"ddsplit-v1:$grp").take(2), 16)
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    pairs.foreach { case (a, b) =>
      assert(splitOf(find(a)) == splitOf(find(b)),
        s"near-dup pair ($a,$b) straddles splits")
    }
    assert(pairs.nonEmpty, "fixture has near-dup pairs to protect")
  }

  test("runs test: R, n1, n2 and z-squared match a recount") {
    val rows = run("q_ts_runs_test").collect()
    assert(rows.length == 5)
    val ev = Tables.events(spark, sf).select("event_type", "ts", "value")
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).getTime / 86400000L,
        math.floor(r.getDouble(2)).toLong))
    rows.foreach { r =>
      val t = r.getString(0)
      val grid = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (d, xs) => (d, xs.map(_._3).sum) }.sortBy(_._1)
      val byV = grid.sortBy(x => (x._2, x._1)).map(_._2)
      val nn = byV.length
      val med2 = byV((nn + 1) / 2 - 1) + byV((nn + 2) / 2 - 1)
      val signs = grid.filter(g => 2 * g._2 != med2)
        .map(g => if (2 * g._2 > med2) 1L else 0L)
      val n = signs.length.toLong
      val n1 = signs.sum; val n2 = n - n1
      val runs = 1L + signs.zip(signs.tail).count(p => p._1 != p._2)
      assert(r.getLong(r.fieldIndex("n")) == n, t)
      assert(r.getLong(r.fieldIndex("n1")) == n1)
      assert(r.getLong(r.fieldIndex("n2")) == n2)
      assert(r.getLong(r.fieldIndex("runs")) == runs)
      val den = 2 * n1 * n2 * (2 * n1 * n2 - n)
      if (den > 0) {
        val d = runs * n - 2 * n1 * n2 - n
        val z2 = 1000000L * d * d * (n - 1) / den
        assert(r.getLong(r.fieldIndex("z2_micro")) == z2)
        assert(r.getBoolean(r.fieldIndex("nonrandom")) == (z2 > 3841459L))
      }
    }
  }
}
