package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession

/** SURVEY.md §4.1 — subquery decorrelation (built-in Catalyst rules the
  * reference has no analog for; PARITY surface for the oracle's query
  * classes). These run through the SQL entry point on BOTH engines —
  * the identical text is the oracle — so what's exercised is Catalyst's
  * `RewriteCorrelatedScalarSubquery` / `RewritePredicateSubquery`
  * turning subqueries into aggregate-join / semi-join plans.
  *
  * 100 TB posture: the scalar subquery becomes a 1-row broadcast; the
  * correlated scalar becomes one nationkey-keyed aggregate (25 rows)
  * broadcast-joined back to customer; IN becomes a left-semi hash join
  * on the (small) filtered build side. No per-row re-execution
  * anywhere — decorrelation is exactly what makes these scale.
  *
  * Numeric discipline: averages are computed as exact decimal SUM /
  * COUNT surfaced as one double division (see graft.Ora), so both
  * engines compare against the bit-identical threshold.
  */
object Subqueries extends QueryModule {

  private def sqlQ(text: String) = (s: SparkSession, dir: String) => {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  // Uncorrelated scalar subquery: global-average threshold.
  private val scalarSql =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal)
      |  FROM customer)""".stripMargin

  // Correlated scalar subquery: per-nation average threshold.
  private val correlatedSql =
    """SELECT c.c_custkey, c.c_nationkey, c.c_acctbal FROM customer c
      |WHERE c.c_acctbal > (
      |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c2.c_acctbal)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin

  // IN subquery over a filtered build side (rewrites to left-semi).
  private val inSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_sub_scalar" -> Q(sqlQ(scalarSql), Some(scalarSql),
      "uncorrelated scalar subquery (1-row broadcast threshold)"),
    "q_sub_correlated" -> Q(sqlQ(correlatedSql), Some(correlatedSql),
      "correlated scalar subquery, decorrelated to agg + join"),
    "q_sub_in" -> Q(sqlQ(inSql), Some(inSql),
      "IN subquery rewritten to left-semi join"))
}
