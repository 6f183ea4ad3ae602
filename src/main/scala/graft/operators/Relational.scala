package graft.operators

import graft.{Ora, Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1/§2.2/§2.4 — the reference's core surface: in-storage
  * scan–project–select–aggregate (SkyhookDM `--use-cls` query path,
  * [pub: src/cls/tabular/cls_tabular.cc — query op], see SURVEY §3.1).
  *
  * Spark-first mapping: declare filter/project/agg on the DataFrame and
  * Catalyst pushes predicates + column pruning into the parquet scan
  * (the exact analog of the reference's object-side processing), and
  * runs partial→final HashAggregate (the analog of the reference's
  * per-object partials + client merge). Verified via
  * `.explain("formatted")`: PushedFilters + narrow ReadSchema + two
  * HashAggregates around a single shuffle.
  *
  * 100 TB posture: group-by keys here are low-cardinality (≤ dozens of
  * groups) so the map-side partial agg collapses each of the thousands
  * of input splits to a handful of rows before the only shuffle; the
  * plan is scan-bound, which is optimal.
  */
object Relational extends QueryModule {

  // Flagship: the reference's query-a/f family == TPC-H Q1 skeleton
  // (sum/avg/count over projected cols, date range filter, group by
  // returnflag+linestatus). SURVEY §7 M0.
  private val q1Fn = (s: org.apache.spark.sql.SparkSession, dir: String) => {
    val li = Tables.lineitem(s, dir)
    val disc1 = (lit(1) - Ora.rate(col("l_discount"))).cast("decimal(4,2)")
    val tax1 = (lit(1) + Ora.rate(col("l_tax"))).cast("decimal(4,2)")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Ora.dsum(Ora.money(col("l_quantity"))).as("sum_qty"),
        Ora.dsum(Ora.money(col("l_extendedprice"))).as("sum_base_price"),
        Ora.dsum(Ora.money(col("l_extendedprice")) * disc1).as("sum_disc_price"),
        Ora.dsum(Ora.money(col("l_extendedprice")) * disc1 * tax1).as("sum_charge"),
        Ora.davg(Ora.money(col("l_quantity"))).as("avg_qty"),
        Ora.davg(Ora.money(col("l_extendedprice"))).as("avg_price"),
        Ora.davg(Ora.rate(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // The reference's headline pushdown shape: global MIN/MAX/SUM/COUNT
  // over a selected+projected scan; per-object partials merged by the
  // client == Spark partial/final HashAggregate with no group keys.
  private val qGlobalFn = (s: org.apache.spark.sql.SparkSession, dir: String) => {
    Tables.lineitem(s, dir)
      .filter(col("l_extendedprice") > 100.0 &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .agg(
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        Ora.dsum(Ora.money(col("l_extendedprice"))).as("sum_price"),
        count(col("l_extendedprice")).as("cnt"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_orderkey")).as("max_okey"))
  }

  private val qGlobalSql =
    """SELECT min(l_extendedprice) AS min_price,
      |  max(l_extendedprice) AS max_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  count(l_extendedprice) AS cnt,
      |  min(l_orderkey) AS min_okey,
      |  max(l_orderkey) AS max_okey
      |FROM lineitem
      |WHERE l_extendedprice > 100.0
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'""".stripMargin

  // TPC-H Q6 shape: the purest pushdown query — conjunctive range
  // predicates all pushed to the parquet scan, then a single global
  // agg partial/final. The reference's query-d/e selectivity family.
  private val q6Fn = (s: org.apache.spark.sql.SparkSession, dir: String) => {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(Ora.money(col("l_extendedprice")) * Ora.rate(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  private val q6Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // Projection + filter scan (the reference's --project-cols +
  // --select-preds path, no aggregation): returns raw matching rows.
  private val qScanFn = (s: org.apache.spark.sql.SparkSession, dir: String) => {
    Tables.lineitem(s, dir)
      .filter(col("l_extendedprice") > 71000.0 && col("l_discount") >= 0.08)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
  }

  private val qScanSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_extendedprice > 71000.0 AND l_discount >= 0.08""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q1_agg" -> Q(q1Fn, Some(q1Sql),
      "TPC-H Q1 skeleton == reference query-a/f family (pushdown agg)"),
    "q6_selective_agg" -> Q(q6Fn, Some(q6Sql),
      "TPC-H Q6: conjunctive range pushdown + single global agg"),
    "q_agg_global" -> Q(qGlobalFn, Some(qGlobalSql),
      "global min/max/sum/count pushdown (reference SOT_min/max/sum/cnt)"),
    "q_scan_project_filter" -> Q(qScanFn, Some(qScanSql),
      "select-project scan, no agg (reference --project-cols/--select-preds)"))
}
