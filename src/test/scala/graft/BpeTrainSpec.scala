package graft

/** BPE training invariants: greedy best-pair counts are non-increasing
  * across rounds (a pair born of a merge occurs at most as often as
  * the merge that created its symbol), merges are distinct, and the
  * merged symbol is the concatenation. */
class BpeTrainSpec extends SparkSpec {

  test("merge table: 5 rounds, non-increasing counts, concatenated symbols") {
    val rows = run("q_text_bpe_train").collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2),
        "merged symbol must be pa || pb")
      assert(r.getLong(4) > 0)
    }
    val counts = rows.map(_.getLong(4))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"greedy best counts must be non-increasing: ${counts.mkString(",")}")
    assert(rows.map(r => (r.getString(1), r.getString(2))).distinct.length == 5,
      "the same pair cannot be merged twice")
  }
}
