package graft

import org.apache.spark.sql.DataFrame

/** The SF-scaling graph family's adaptive-routing contract: the
  * distributed bounded-round loop and the driver-local finish must be
  * BIT-EQUAL on the same fixture (the oracle only ever sees one route
  * per SF, so this spec is what proves the other route). Also checks
  * the plans: the distributed route must contain per-round exchanges,
  * and the guarded nation-domain collect must refuse an over-cutoff
  * reuse (simulated via the override).
  */
class GraphScaledSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // DynamicVariable.withValue scopes the pin to THIS thread (the route
  // decision runs on the calling thread at query-construction time),
  // so a concurrently executing suite's scaled-graph query keeps the
  // production cutoff.
  private def bothRoutes(name: String): (Set[(Long, Long)], Set[(Long, Long)]) = {
    val local = graft.operators.Graph.scaledCutoffOverride
      .withValue(Some(Long.MaxValue)) { rows(run(name)) }
    val dist = graft.operators.Graph.scaledCutoffOverride
      .withValue(Some(0L)) { rows(run(name)) }
    (local, dist)
  }

  test("pagerank_scaled: distributed rounds == driver-local finish") {
    val (local, dist) = bothRoutes("q_graph_pagerank_scaled")
    assert(local.nonEmpty)
    assert(local == dist)
  }

  test("labelprop_scaled: distributed rounds == driver-local finish") {
    val (local, dist) = bothRoutes("q_graph_labelprop_scaled")
    assert(local.nonEmpty)
    assert(local == dist)
    // labels are component-prefix: every label is <= its node id
    assert(local.forall { case (node, l) => l <= node })
  }

  test("kcore_scaled: distributed rounds == driver-local finish; peel is monotone") {
    val (local, dist) = bothRoutes("q_graph_kcore_scaled")
    assert(local.nonEmpty)
    assert(local == dist)
    // every survivor kept >= k neighbors in the final round
    assert(local.forall(_._2 >= 3L))
  }

  test("ranks conserve the teleport floor and react to edges") {
    val (local, _) = bothRoutes("q_graph_pagerank_scaled")
    assert(local.forall(_._2 >= 150000L)) // teleport term is the floor
    assert(local.exists(_._2 > 150000L)) // some node receives mass
  }
}
