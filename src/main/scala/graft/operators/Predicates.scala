package graft.operators

import graft.{Ora, Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — the reference's predicate surface.
  *
  * SkyhookDM evaluates `TypedPredicate<T>` chains (lt/gt/eq/ne/leq/geq,
  * between, in/not-in, regex-LIKE, AND/OR/NOT connectives, nullbits
  * skip) record-at-a-time inside the storage node
  * ([pub: src/cls/tabular/cls_tabular_utils.h — PredicateBase,
  * TypedPredicate, SkyOpType], SURVEY §2.2). Spark-first mapping: the
  * same predicates as Catalyst `BinaryComparison`/`In`/`Like`/`RLike`
  * expressions in `df.filter`, which Catalyst both pushes into the
  * parquet scan (row-group + page skipping — the pushdown analog) and
  * evaluates codegen'd for surviving rows.
  *
  * 100 TB posture: all queries here are scan-shaped (no shuffle except
  * the final partial→final agg where present); selectivity reaches the
  * storage layer via PushedFilters, so bytes read scale with matching
  * row-groups, not table size.
  */
object Predicates extends QueryModule {

  // BETWEEN + IN + NOT IN in one conjunction (SOT_between/in/not_in).
  private val betweenIn = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .filter(col("l_quantity").between(5, 10) &&
        col("l_linenumber").isin(1, 3, 5) &&
        !col("l_returnflag").isin("A"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  private val betweenInSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem
      |WHERE l_quantity BETWEEN 5 AND 10
      |  AND l_linenumber IN (1, 3, 5)
      |  AND l_returnflag NOT IN ('A')""".stripMargin

  // LIKE + regex (the reference's --comment_regex path, RE2 on strings).
  private val likeRegex = (s: SparkSession, dir: String) =>
    Tables.part(s, dir)
      .filter(col("p_type").like("PROMO%") ||
        (col("p_brand").rlike("Brand#1[0-9]") && col("p_name").like("%widget%")))
      .select("p_partkey", "p_name", "p_brand", "p_type")

  private val likeRegexSql =
    """SELECT p_partkey, p_name, p_brand, p_type
      |FROM part
      |WHERE p_type LIKE 'PROMO%'
      |   OR (regexp_matches(p_brand, 'Brand#1[0-9]') AND p_name LIKE '%widget%')""".stripMargin

  // Null semantics / three-valued logic (nullbits analog). The fixtures
  // are null-free, so nulls are introduced with NULLIF and then must
  // flow through IS NULL / OR correctly on both engines.
  private val null3vl = (s: SparkSession, dir: String) => {
    val o = Tables.orders(s, dir)
    val st = when(col("o_orderstatus") =!= "P", col("o_orderstatus"))
    o.select(col("o_orderkey"), st.as("st"))
      .filter(col("st") === "F" || col("st").isNull)
      .withColumn("st_is_null", col("st").isNull)
  }

  private val null3vlSql =
    """SELECT o_orderkey, st, st IS NULL AS st_is_null
      |FROM (SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st FROM orders)
      |WHERE st = 'F' OR st IS NULL""".stripMargin

  // Compound connectives: (AND) OR NOT(...) shape over a date bound
  // (SOT_logical_and/or/not), reduced by a grouped agg.
  private val compound = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .filter(((col("l_discount") >= 0.05 && col("l_tax") < 0.04) ||
        !(col("l_returnflag") === "N")) &&
        col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        Ora.dsum(Ora.money(col("l_quantity"))).as("sum_qty"))

  private val compoundSql =
    """SELECT l_returnflag, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE ((l_discount >= 0.05 AND l_tax < 0.04) OR NOT (l_returnflag = 'N'))
      |  AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
      |GROUP BY l_returnflag""".stripMargin

  // All six comparison ops in one conjunction (SOT_lt/gt/eq/ne/leq/geq).
  private val cmpOps = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 3 && col("l_quantity") <= 47 &&
        col("l_linenumber") =!= 4 && col("l_discount") >= 0.02 &&
        col("l_tax") < 0.07 && col("l_returnflag") === "R")
      .agg(count(lit(1)).as("cnt"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  private val cmpOpsSql =
    """SELECT COUNT(*) AS cnt, min(l_extendedprice) AS min_price,
      |  max(l_extendedprice) AS max_price
      |FROM lineitem
      |WHERE l_quantity > 3 AND l_quantity <= 47 AND l_linenumber <> 4
      |  AND l_discount >= 0.02 AND l_tax < 0.07 AND l_returnflag = 'R'""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_pred_between_in" -> Q(betweenIn, Some(betweenInSql),
      "BETWEEN + IN + NOT IN (reference SOT_between/in/not_in)"),
    "q_pred_like_regex" -> Q(likeRegex, Some(likeRegexSql),
      "LIKE + regex string predicates (reference --comment_regex)"),
    "q_pred_null3vl" -> Q(null3vl, Some(null3vlSql),
      "null semantics / three-valued logic (reference nullbits)"),
    "q_pred_compound" -> Q(compound, Some(compoundSql),
      "AND/OR/NOT compound predicates (reference SOT_logical_*)"),
    "q_pred_cmp_ops" -> Q(cmpOps, Some(cmpOpsSql),
      "all six comparison ops (reference SOT_lt/gt/eq/ne/leq/geq)"))
}
