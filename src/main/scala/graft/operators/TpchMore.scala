package graft.operators

import graft.{Ora, Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite TPC-H-shape queries beyond q1/q3/q5/q6 — the reference's
  * own benchmark domain (SURVEY §3.1: TPC-H lineitem is what SkyhookDM
  * demos run), adapted to the fixture's columns. Each composes
  * already-proven primitives (semi-join, star join, conditional agg,
  * ratio-of-sums) into the canonical decision-support shapes a
  * reference user would port, plus the remaining rank-family window
  * functions (percent_rank / cume_dist / nth_value).
  *
  * 100 TB posture, per query: q4 is a semi-join (build side = matching
  * lineitem keys, never materializing the join); q10 joins facts once
  * on orderkey and broadcasts the dimensions, TakeOrdered for the
  * top-20; q12/q14 are single-pass conditional aggregations over one
  * fact scan (map-side partials, shuffle carries group rows); the
  * window query shuffles once on the partition key.
  */
object TpchMore extends QueryModule {

  private def revenue = Ora.money(col("l_extendedprice")) *
    (lit(1) - Ora.rate(col("l_discount"))).cast("decimal(4,2)")

  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  // Q4 analog: priority count of orders in a quarter with at least one
  // line shipped after the order date (the fixture has no commitdate/
  // receiptdate; "late-shipped" keeps Q4's EXISTS shape).
  private val q4 = (s: SparkSession, dir: String) => {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  // Q10 analog: top-20 customers by returned-item revenue in a quarter.
  private val q10 = (s: SparkSession, dir: String) => {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"))
      .agg(Ora.dsum(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  private val q10Sql =
    s"""SELECT c_custkey, c_name, n_name, c_acctbal,
       |  CAST(SUM($revenueSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
       |GROUP BY c_custkey, c_name, n_name, c_acctbal
       |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin

  // Q12 analog: per linestatus (fixture has no shipmode), count of
  // high- vs low-priority orders shipped in 1997 — Q12's conditional
  // double-count over one fact scan.
  private val q12 = (s: SparkSession, dir: String) => {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
  }

  private val q12Sql =
    """SELECT l_linestatus,
      |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS high_line_count,
      |  SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_linestatus""".stripMargin

  // Q14 analog: promo revenue share for one month — ratio of two
  // conditional decimal sums, surfaced as one rounded double.
  private val q14 = (s: SparkSession, dir: String) => {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) * sum(when(col("p_type") === "PROMO", revenue)
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double")
          / sum(revenue).cast("double"), 6).as("promo_revenue_pct"))
  }

  private val q14Sql =
    s"""SELECT round(100.0 *
       |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revenueSql
       |           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       |  / CAST(SUM($revenueSql) AS DOUBLE), 6) AS promo_revenue_pct
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""".stripMargin

  // Remaining rank-family window functions: percent_rank, cume_dist,
  // nth_value — per market segment over account balance (unique
  // tiebreak on c_custkey makes every rank deterministic).
  private val winPct = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("third_key", nth_value(col("c_custkey"), 3).over(w))
      .filter(col("pct_rank") <= 0.02)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        col("pct_rank"), col("cume"), col("third_key"))
  }

  private val winPctSql =
    """SELECT c_mktsegment, c_custkey, c_acctbal, pct_rank, cume, third_key
      |FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    round(percent_rank() OVER w, 6) AS pct_rank,
      |    round(cume_dist() OVER w, 6) AS cume,
      |    nth_value(c_custkey, 3) OVER w AS third_key
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment
      |               ORDER BY c_acctbal DESC, c_custkey ASC))
      |WHERE pct_rank <= 0.02""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_tpch_q4" -> Q(q4, Some(q4Sql),
      "Q4 shape: EXISTS semi-join, priority counts over a quarter"),
    "q_tpch_q10" -> Q(q10, Some(q10Sql),
      "Q10 shape: returned-item revenue top-20 customers"),
    "q_tpch_q12" -> Q(q12, Some(q12Sql),
      "Q12 shape: conditional double-count per linestatus"),
    "q_tpch_q14" -> Q(q14, Some(q14Sql),
      "Q14 shape: promo revenue share, ratio of conditional sums"),
    "q_win_pct_rank" -> Q(winPct, Some(winPctSql),
      "percent_rank / cume_dist / nth_value per market segment"))
}
