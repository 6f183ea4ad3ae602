package graft

import org.apache.spark.sql.functions._

/** Round-8 sf10-tier follow-ups: the domain-scaled ER twin and the
  * novelty rollup rewrite (corpus-join-free). */
class Round8TierSpec extends SparkSpec {

  test("scaled ER: single-band fixture reproduces erQ's entity structure") {
    // all sf0.001 custkeys < 10⁷ → one band; the scaled twin must find
    // the SAME entities as q_dedup_er_entities (labels are min rid =
    // always a real custkey; only the typo-rid offset and the banded
    // name spelling differ)
    val base = run("q_dedup_er_entities")
      .select("entity", "n_records", "min_rid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val scaled = run("q_dedup_er_entities_scaled")
      .select("entity", "n_records", "min_rid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(scaled == base)
  }

  test("scaled ER: entities never span code bands") {
    val rows = run("q_dedup_er_entities_scaled").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val entity = r.getLong(0); val maxRid = r.getLong(4)
      // rid bands: real rids share the entity label's band; typo rids
      // are +10¹⁰ of a key in the same band
      val band = entity / 10000000L
      val maxBand = (if (maxRid >= 10000000000L) maxRid - 10000000000L
                     else maxRid) / 10000000L
      assert(maxBand == band,
        s"entity $entity (band $band) contains rid $maxRid (band $maxBand)")
    }
  }

  test("scaled ER: typo rows pair with their source record") {
    val df = run("q_dedup_er_entities_scaled")
    // every 20th custkey plants a typo at hamming distance 1, so at
    // least those pairs must resolve: every planted typo rid belongs
    // to an entity whose label is its source key
    val withTypos = df.filter(col("max_rid") >= 10000000000L)
    val n = withTypos.count()
    assert(n > 0, "planted typo entities exist")
    withTypos.collect().foreach { r =>
      val entity = r.getLong(0)
      assert(r.getLong(1) >= 2L)
      assert(entity < 10000000000L, "canonical label is a real rid")
    }
  }
}
