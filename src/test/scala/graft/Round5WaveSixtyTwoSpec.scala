package graft

/** Round-5 sixty-second wave: affinity lift, Fano factor. */
class Round5WaveSixtyTwoSpec extends SparkSpec {

  test("affinity: lift-weighted cell mass is conserved per margin") {
    val rows = run("q_agg_affinity").collect()
    assert(rows.nonEmpty)
    // the cross is complete: |segments| x |brands|
    val segs = rows.map(_.getString(0)).distinct
    val brands = rows.map(_.getString(1)).distinct
    assert(rows.length == segs.length * brands.length)
    val nTot = {
      val perSeg = rows.groupBy(_.getString(0)).map { case (_, rs) =>
        rs.map(_.getLong(rs.head.fieldIndex("n_cell"))).sum
      }
      perSeg.sum
    }
    rows.foreach { r =>
      val nCell = r.getLong(r.fieldIndex("n_cell"))
      val nSeg = r.getLong(r.fieldIndex("n_seg"))
      val nBrand = r.getLong(r.fieldIndex("n_brand"))
      assert(nCell <= math.min(nSeg, nBrand))
      assert(r.getLong(r.fieldIndex("lift_micro")) ==
        (nCell * nTot * 1000000L) / (nSeg * nBrand))
    }
    // margins recount: per segment, sum of cells == n_seg
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sumCells = rs.map(_.getLong(rs.head.fieldIndex("n_cell"))).sum
      assert(sumCells == rs.head.getLong(rs.head.fieldIndex("n_seg")))
    }
  }

  test("fano: moment recount with zero-hour completion") {
    val rows = run("q_ts_fano").collect()
    assert(rows.length == 5)
    val hourly = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS LONG) div 3600 AS h")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val byHour = hourly(t).groupBy(_._2)
        .map { case (h, v) => h -> v.size.toLong }
      val mn = byHour.keys.min; val mx = byHour.keys.max
      val counts = (mn to mx).map(byHour.getOrElse(_, 0L))
      val n = counts.length.toLong
      val s0 = counts.sum
      val ss = counts.map(c => c * c).sum
      assert(r.getLong(r.fieldIndex("n_hours")) == n, t)
      assert(r.getLong(r.fieldIndex("n_events")) == s0, t)
      assert(r.getLong(r.fieldIndex("fano_micro")) ==
        (1000000L * (n * ss - s0 * s0)) / (n * s0), t)
    }
  }
}
