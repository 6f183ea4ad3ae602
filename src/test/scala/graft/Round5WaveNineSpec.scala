package graft

/** Round-5 ninth wave: Pareto/ABC concentration cut and the hashing-
  * trick featurizer. Exactness is the DuckDB oracle; these pin the
  * business invariants. */
class Round5WaveNineSpec extends SparkSpec {

  test("pareto cut: prefix is minimal, covers >= 80%, strictly less without the last supplier") {
    val rows = run("q_agg_pareto_cut").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTotal = r.getLong(r.fieldIndex("n_total"))
      val nTop = r.getLong(r.fieldIndex("n_top80"))
      val cut = r.getLong(r.fieldIndex("cut_revenue_cents"))
      val tot = r.getLong(r.fieldIndex("total_cents"))
      assert(nTop >= 1 && nTop <= nTotal)
      assert(5L * cut >= 4L * tot, "the kept prefix reaches the 80% line")
      // near-uniform supplier revenue ⇒ the 80% set is ~80% of suppliers,
      // never a tiny head; concentration would show here if planted
      assert(nTop * 100 / nTotal >= 50, s"$nTop of $nTotal suspicious")
    }
  }

  test("feature hashing: buckets in range, |signed| <= count, tf conserved") {
    val rows = run("q_text_feature_hashing").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == Set(0L, 1L, 2L))
    rows.foreach { r =>
      val b = r.getLong(r.fieldIndex("bucket"))
      val c = r.getLong(r.fieldIndex("cnt"))
      val v = r.getLong(r.fieldIndex("val_signed"))
      assert(b >= 0 && b < 64)
      assert(math.abs(v) <= c, "signed sum is bounded by the count")
      assert((c - math.abs(v)) % 2 == 0 || math.abs(v) <= c,
        "sign sum parity consistent with count")
    }
    // token mass is conserved: bucket counts per doc sum to the doc's
    // token count
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id < 3").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text")).split(" ").length.toLong).toMap
    byDoc.foreach { case (d, rs) =>
      assert(rs.map(_.getLong(rs.head.fieldIndex("cnt"))).sum == docs(d),
        s"doc $d: hashing must conserve token mass")
    }
  }
}
