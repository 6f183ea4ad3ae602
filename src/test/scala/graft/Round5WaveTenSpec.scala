package graft

/** Round-5 tenth wave: linear grid interpolation and the bitwise
  * scalar surface. Exactness is the DuckDB oracle; these pin the
  * numeric invariants. */
class Round5WaveTenSpec extends SparkSpec {

  test("interp: observed hours exact, interpolated hours between brackets") {
    val rows = run("q_ts_interp_linear").collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val iObs = rs.head.fieldIndex("obs")
      val iV = rs.head.fieldIndex("interp_micro_cents")
      val sorted = rs.sortBy(_.getTimestamp(rs.head.fieldIndex("h")).getTime)
      // first and last grid hours are observation hours by construction
      assert(!sorted.head.isNullAt(iObs) && !sorted.last.isNullAt(iObs))
      sorted.foreach { r =>
        if (!r.isNullAt(iObs)) {
          assert(r.getLong(iV) == r.getLong(iObs) * 1000000L,
            "observed hours carry the exact observation")
          assert(!r.getBoolean(r.fieldIndex("interpolated")))
        } else if (!r.isNullAt(iV)) {
          assert(r.getBoolean(r.fieldIndex("interpolated")))
        }
      }
      // every interior interpolated value lies within [min, max] of the
      // user's observed values (linear interpolation never overshoots)
      val obs = sorted.filter(!_.isNullAt(iObs)).map(_.getLong(iObs) * 1000000L)
      val (lo, hi) = (obs.min, obs.max)
      sorted.filter(r => r.isNullAt(iObs) && !r.isNullAt(iV)).foreach { r =>
        val v = r.getLong(iV)
        assert(v >= lo - 1 && v <= hi + 1, s"interp $v outside [$lo,$hi]")
      }
    }
  }

  test("bitwise: identities hold on every row") {
    val rows = run("q_scalar_bitwise").collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val k = r.getLong(r.fieldIndex("o_orderkey"))
      assert(r.getInt(r.fieldIndex("pc")) == java.lang.Long.bitCount(k))
      assert(r.getLong(r.fieldIndex("band")) == (k & 255L))
      assert(r.getLong(r.fieldIndex("bor")) == (k | 4096L))
      assert(r.getLong(r.fieldIndex("bxor")) == (k ^ 1365L))
      assert(r.getLong(r.fieldIndex("shl")) == (k << 3))
      assert(r.getLong(r.fieldIndex("shr")) == (k >> 2))
      assert(r.getLong(r.fieldIndex("bnot")) == ~k)
    }
  }
}
