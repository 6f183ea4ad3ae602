package graft

/** The prefix-filter theorem in action: the rarity-ordered prefix
  * index must produce strictly fewer candidate pairs than the full
  * inverted index while losing NO true pair (equality with the full
  * jaccard join is the shared oracle; re-proven here directly). */
class PrefixFilterSpec extends SparkSpec {

  test("prefix candidates prune the full index; answer identical to the exact join") {
    val (pref, full) = graft.operators.Dedup.prefixCandidateCounts(spark, sf)
    assert(pref < full,
      s"prefix filter must prune candidate pairs: $pref vs $full")
    val a = run("q_dedup_jaccard_prefix").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = run("q_dedup_jaccard_pairs").collect()
      .map(r => (r.getLong(r.fieldIndex("ida")), r.getLong(r.fieldIndex("idb")),
        r.getDouble(r.fieldIndex("jaccard")))).toSet
    assert(a == b, "prefix filtering must never lose a qualifying pair")
    assert(a.nonEmpty, "fixture plants near-duplicate pairs")
  }
}
