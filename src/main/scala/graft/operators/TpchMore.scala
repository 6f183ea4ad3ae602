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
      .join(c, o("o_custkey") === c("c_custkey"))
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
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
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
      .join(Tables.part(s, dir),
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

  // ---------------------------------------------------------------
  // Round-3 completion wave: the remaining TPC-H shapes expressible
  // without a partsupp table (the fixture has none, which rules out
  // Q2/Q9/Q11/Q16/Q20 — documented in SURVEY §3.1 delta). Parameters
  // are adapted to the fixture's value domains (regions AFRICA..MIDDLE
  // EAST, Brand#1..25, integral quantities 1..50) and chosen so every
  // query is non-empty at sf0.001/0.01/0.1.
  // ---------------------------------------------------------------

  // Q7 analog: shipping volume between two regions (fixture nations are
  // too sparse at sf0.001 for the canonical nation pair), per ship year.
  // 100 TB: nation/region/supplier broadcast; one shuffle join each for
  // orders and customer; decimal partials keep the sums exact.
  private val q7 = (s: SparkSession, dir: String) => {
    val n1 = Tables.nation(s, dir).select(
      col("n_nationkey").as("s_nk"), col("n_regionkey").as("s_rk"))
    val r1 = Tables.region(s, dir).select(
      col("r_regionkey").as("s_rk"), col("r_name").as("supp_region"))
    val n2 = Tables.nation(s, dir).select(
      col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val r2 = Tables.region(s, dir).select(
      col("r_regionkey").as("c_rk"), col("r_name").as("cust_region"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(r1), "s_rk")
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r2), "c_rk")
      .filter((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
        (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
      .groupBy(col("supp_region"), col("cust_region"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Ora.dsum(revenue).as("revenue"))
  }

  private val q7Sql =
    s"""SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
       |  year(l_shipdate) AS l_year,
       |  CAST(SUM($revenueSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
       |WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
       |    OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
       |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
       |GROUP BY r1.r_name, r2.r_name, year(l_shipdate)""".stripMargin

  // Q8 analog: NATION_3 suppliers' market share among EUROPE customers
  // for ECONOMY parts, per order year — ratio of conditional decimal
  // sums, one fact scan.
  private val q8 = (s: SparkSession, dir: String) => {
    val suppN = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir).select(
        col("n_nationkey"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val custEur = Tables.customer(s, dir)
      .join(Tables.nation(s, dir).select(
        col("n_nationkey").as("cn_nk"), col("n_regionkey").as("cn_rk")),
        col("c_nationkey") === col("cn_nk"))
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("cn_rk") === col("r_regionkey"))
      .select(col("c_custkey"))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(custEur, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(suppN, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", revenue)
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double")
          / sum(revenue).cast("double"), 6).as("mkt_share"))
  }

  private val q8Sql =
    s"""SELECT year(o_orderdate) AS o_year,
       |  round(
       |    CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN $revenueSql
       |             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       |    / CAST(SUM($revenueSql) AS DOUBLE), 6) AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_type = 'ECONOMY'
       |  AND EXISTS (
       |    SELECT 1 FROM customer
       |    JOIN nation cn ON c_nationkey = cn.n_nationkey
       |    JOIN region ON cn.n_regionkey = r_regionkey
       |    WHERE c_custkey = o_custkey AND r_name = 'EUROPE')
       |GROUP BY year(o_orderdate)""".stripMargin

  // Q13 analog: customer order-count distribution, excluding
  // '4-NOT SPECIFIED' orders (the fixture's stand-in for the
  // '%special%requests%' comment filter) — outer join with the filter
  // in the join condition, then a histogram over the counts.
  private val q13 = (s: SparkSession, dir: String) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey") &&
        o("o_orderpriority") =!= "4-NOT SPECIFIED", "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey
      |       AND o_orderpriority <> '4-NOT SPECIFIED'
      |      GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  // Q15 analog: top supplier(s) by revenue over a quarter. The
  // max-equality test runs on the EXACT decimal revenue (double
  // equality would be engine-order-dependent); only the output casts
  // to double.
  private val q15 = (s: SparkSession, dir: String) => {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(revenue).as("rev_dec"))
    val top = rev.agg(max(col("rev_dec")).as("max_rev"))
    rev.join(broadcast(top), col("rev_dec") === col("max_rev"))
      .join(Tables.supplier(s, dir), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
  }

  private val q15Sql =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no, SUM($revenueSql) AS rev_dec
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)""".stripMargin

  // Q17 analog: revenue lost to small-quantity orders for one brand.
  // The per-part average is a window over the brand-filtered lines —
  // one scan + one shuffle instead of the correlated-subquery rescan
  // (partkey determines brand, so the window average equals the
  // canonical per-part correlated average). Quantities are integral
  // doubles, so the average is order-exact on both engines.
  private val q17 = (s: SparkSession, dir: String) => {
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).filter(col("p_brand") === "Brand#1"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((Ora.dsum(Ora.money(col("l_extendedprice"))) / 7.0).as("avg_yearly"))
  }

  private val q17Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |       / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < (
      |    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  // Q18 analog: large-volume orders (sum qty > 250), top 100 by total
  // price. The HAVING runs on the grouped fact first, so the join
  // carries only qualifying orderkeys.
  private val q18 = (s: SparkSession, dir: String) => {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |       sum_qty
      |FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING SUM(l_quantity) > 250)
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin

  // Q19 analog: discounted revenue under three OR'd brand/size/quantity
  // bands — the disjunctive-predicate pushdown shape. One broadcast
  // join, one conditional aggregate.
  private val q19 = (s: SparkSession, dir: String) => {
    val band = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#1", 1, 10, 1, 20) ||
        band("Brand#2", 11, 20, 10, 30) ||
        band("Brand#3", 21, 30, 20, 40))
      .agg(Ora.dsum(revenue).as("revenue"))
  }

  private val q19Sql =
    s"""SELECT CAST(SUM($revenueSql) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       |       AND l_quantity BETWEEN 1 AND 20)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
       |       AND l_quantity BETWEEN 10 AND 30)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30
       |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  // Q21 analog: suppliers whose line was the ONLY late one in a
  // multi-supplier finished order ("late" adapted to shipdate > 60 days
  // after order date — the fixture has no commit/receipt dates). The
  // EXISTS is a semi-join on orderkey, the NOT EXISTS an anti-join
  // against the same late-line set; both carry only (orderkey, suppkey)
  // pairs.
  private val q21 = (s: SparkSession, dir: String) => {
    val fOrders = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val fLines = Tables.lineitem(s, dir)
      .join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .as("is_late"))
    val late = fLines.filter(col("is_late"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val l1 = late
    val l2 = fLines.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    l1.join(l2, col("l_orderkey") === col("k2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("k3") &&
        col("l_suppkey") =!= col("s3"), "left_anti")
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  private val q21Sql =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders o ON l1.l_orderkey = o.o_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey
      |      AND o2.o_orderstatus = 'F')
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND o3.o_orderstatus = 'F'
      |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name ASC LIMIT 100""".stripMargin

  // Q22 analog: well-funded customers (balance above the positive-
  // balance average) in selected "country codes" (nationkey mod 10 —
  // the fixture has no phone column) with no orders since 2000. The
  // average is a broadcast scalar; the NOT EXISTS an anti-join against
  // recent orders only.
  private val q22 = (s: SparkSession, dir: String) => {
    val ccSet = Seq(1, 2, 3, 4, 5)
    val cands = Tables.customer(s, dir)
      .withColumn("cntrycode", col("c_nationkey") % 10)
      .filter(col("cntrycode").isin(ccSet: _*))
    val avgBal = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0)
      .agg((Ora.dsum(Ora.money(col("c_acctbal"))) /
        count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cands.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        Ora.dsum(Ora.money(col("c_acctbal"))).as("totacctbal"))
  }

  private val q22Sql =
    """SELECT c_nationkey % 10 AS cntrycode, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
      |  AND c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
      |           / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey % 10""".stripMargin

  // Q2 analog: min-cost supplier per part. The fixture has no partsupp
  // table, so lineitem's distinct (l_partkey, l_suppkey) pairs stand in
  // for the part-supplier relation and "supply cost" is the cheapest
  // sale price that supplier recorded for the part. Q2's correlated MIN
  // subquery (cheapest among EUROPE suppliers of the same part) becomes
  // a window MIN over the region-filtered per-pair costs — one fact
  // scan + one window shuffle instead of a per-part rescan. Costs stay
  // DECIMAL through the min-equality test; only the output is double.
  // Ties inside the LIMIT are impossible: (s_name, p_partkey) is unique
  // per row and both are in the ORDER BY.
  private val q2 = (s: SparkSession, dir: String) => {
    val euroSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    val cost = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(Ora.money(col("l_extendedprice"))).as("cost_dec"))
    val p = Tables.part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
    val w = Window.partitionBy(col("l_partkey"))
    cost.join(euroSupp, col("l_suppkey") === col("s_suppkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("min_cost", min(col("cost_dec")).over(w))
      .filter(col("cost_dec") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("cost_dec").cast("double").as("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  private val q2Sql =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_dec
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey,
      |       CAST(cost_dec AS DOUBLE) AS supplycost
      |FROM ps
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 10
      |  AND cost_dec = (
      |    SELECT MIN(p2.cost_dec) FROM ps p2
      |    JOIN supplier s2 ON p2.l_suppkey = s2.s_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE r2.r_name = 'EUROPE' AND p2.l_partkey = ps.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // Q9 analog: profit by supplier nation and order year for one part
  // family. Without partsupp there is no ps_supplycost to subtract, so
  // profit = discounted revenue; the plan shape — fact scan, broadcast
  // part/supplier/nation dims, one shuffle join with orders on
  // orderkey, then group — is Q9's.
  private val q9 = (s: SparkSession, dir: String) => {
    val p = Tables.part(s, dir).filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    Tables.lineitem(s, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(Ora.dsum(revenue).as("sum_profit"))
  }

  private val q9Sql =
    s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |  CAST(SUM($revenueSql) AS DOUBLE) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE 'red%'
       |GROUP BY n_name, year(o_orderdate)""".stripMargin

  // Q11 analog: parts carrying an outsized share of one nation's sales
  // value. Value per part = SUM(price × qty) over lines sold by that
  // nation's suppliers (partsupp's supplycost × availqty analog); the
  // HAVING threshold compares against a broadcast scalar of the global
  // total — both sides exact DECIMAL, so the inequality is
  // engine-order independent.
  private val q11 = (s: SparkSession, dir: String) => {
    val natSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = Tables.lineitem(s, dir)
      .join(natSupp, col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(Ora.money(col("l_extendedprice")) *
        col("l_quantity").cast("decimal(4,0)")).as("value_dec"))
    val tot = v.agg(sum(col("value_dec")).as("tot_dec"))
    v.crossJoin(broadcast(tot))
      .filter(col("value_dec") * lit(500) > col("tot_dec"))
      .select(col("l_partkey"), col("value_dec").cast("double").as("value"))
  }

  private val q11Sql =
    """WITH v AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |        CAST(l_quantity AS DECIMAL(4,0))) AS value_dec
      |  FROM lineitem
      |  WHERE l_suppkey IN (
      |    SELECT s_suppkey FROM supplier
      |    JOIN nation ON s_nationkey = n_nationkey
      |    WHERE n_name = 'NATION_3')
      |  GROUP BY l_partkey)
      |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
      |FROM v
      |WHERE value_dec * 500 > (SELECT SUM(value_dec) FROM v)""".stripMargin

  // Q16 analog: how many suppliers can deliver each part profile,
  // excluding flagged suppliers (negative balance stands in for the
  // '%Customer%Complaints%' comment filter). Distinct (part, supplier)
  // pairs come from the fact table; the NOT IN is an anti-join against
  // a broadcast 6-row exclusion list.
  private val q16 = (s: SparkSession, dir: String) => {
    val badSupp = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(badSupp, col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  // Q20 analog: one nation's suppliers who dominated a 'red%' part's
  // 1997 volume (>30% of the part's shipped quantity — availqty-vs-
  // half-demand analog). Q20's nested-IN-with-correlated-agg becomes a
  // window total per part; the share test multiplies exact integral
  // sums (×10 vs ×3) so no float boundary can diverge between engines.
  private val q20 = (s: SparkSession, dir: String) => {
    val redParts = Tables.part(s, dir).filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    val pair = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(redParts, col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("supp_qty"))
    val w = Window.partitionBy(col("l_partkey"))
    val bigSupp = pair
      .withColumn("part_qty", sum(col("supp_qty")).over(w))
      .filter(col("supp_qty") * 10 > col("part_qty") * 3)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(bigSupp, col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
  }

  private val q20Sql =
    """WITH pair AS (
      |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |    AND l_partkey IN
      |      (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |  GROUP BY l_partkey, l_suppkey)
      |SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM pair p1
      |    WHERE p1.supp_qty * 10 > 3 * (
      |      SELECT SUM(p2.supp_qty) FROM pair p2
      |      WHERE p2.l_partkey = p1.l_partkey))""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_tpch_q2" -> Q(q2, Some(q2Sql),
      "Q2 shape: min-cost supplier per part, correlated MIN as window"),
    "q_tpch_q9" -> Q(q9, Some(q9Sql),
      "Q9 shape: profit by supplier nation and order year"),
    "q_tpch_q11" -> Q(q11, Some(q11Sql),
      "Q11 shape: outsized part values vs global-total scalar"),
    "q_tpch_q16" -> Q(q16, Some(q16Sql),
      "Q16 shape: supplier count per part profile, NOT IN anti-join"),
    "q_tpch_q20" -> Q(q20, Some(q20Sql),
      "Q20 shape: dominant-share suppliers, correlated agg as window"),
    "q_tpch_q4" -> Q(q4, Some(q4Sql),
      "Q4 shape: EXISTS semi-join, priority counts over a quarter"),
    "q_tpch_q10" -> Q(q10, Some(q10Sql),
      "Q10 shape: returned-item revenue top-20 customers"),
    "q_tpch_q12" -> Q(q12, Some(q12Sql),
      "Q12 shape: conditional double-count per linestatus"),
    "q_tpch_q14" -> Q(q14, Some(q14Sql),
      "Q14 shape: promo revenue share, ratio of conditional sums"),
    "q_tpch_q7" -> Q(q7, Some(q7Sql),
      "Q7 shape: inter-region shipping volume per year"),
    "q_tpch_q8" -> Q(q8, Some(q8Sql),
      "Q8 shape: national market share, ratio of conditional sums"),
    "q_tpch_q13" -> Q(q13, Some(q13Sql),
      "Q13 shape: customer order-count histogram, filtered outer join"),
    "q_tpch_q15" -> Q(q15, Some(q15Sql),
      "Q15 shape: top supplier by quarter revenue, exact-decimal max"),
    "q_tpch_q17" -> Q(q17, Some(q17Sql),
      "Q17 shape: small-quantity revenue, per-part average threshold"),
    "q_tpch_q18" -> Q(q18, Some(q18Sql),
      "Q18 shape: large-volume orders, HAVING before the join"),
    "q_tpch_q19" -> Q(q19, Some(q19Sql),
      "Q19 shape: disjunctive brand/size/quantity revenue"),
    "q_tpch_q21" -> Q(q21, Some(q21Sql),
      "Q21 shape: only-late-supplier EXISTS/NOT-EXISTS, semi+anti join"),
    "q_tpch_q22" -> Q(q22, Some(q22Sql),
      "Q22 shape: dormant well-funded customers, scalar avg + anti join"),
    "q_win_pct_rank" -> Q(winPct, Some(winPctSql),
      "percent_rank / cume_dist / nth_value per market segment"))
}
