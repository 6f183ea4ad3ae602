package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY.md §2.7 — set operations (absent in the reference; PARITY
  * surface). UNION ALL is a zero-shuffle concatenation of scans; the
  * distinct variants shuffle once on the full row as key. At 100 TB the
  * ALL variants are free and the distinct variants are one hash
  * exchange — same cost class as a groupBy, no driver involvement.
  */
object SetOps extends QueryModule {

  private def custKeys(s: SparkSession, dir: String) =
    Tables.customer(s, dir).select(col("c_nationkey").as("nkey"))
  private def suppKeys(s: SparkSession, dir: String) =
    Tables.supplier(s, dir).select(col("s_nationkey").as("nkey"))

  private val unionAll = (s: SparkSession, dir: String) =>
    custKeys(s, dir).unionAll(suppKeys(s, dir))
      .groupBy(col("nkey")).agg(count(lit(1)).as("cnt"))

  private val unionAllSql =
    """SELECT nkey, COUNT(*) AS cnt FROM (
      |  SELECT c_nationkey AS nkey FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nkey FROM supplier
      |) GROUP BY nkey""".stripMargin

  private val unionDistinct = (s: SparkSession, dir: String) =>
    custKeys(s, dir).union(suppKeys(s, dir)).distinct()

  private val unionDistinctSql =
    """SELECT c_nationkey AS nkey FROM customer
      |UNION
      |SELECT s_nationkey AS nkey FROM supplier""".stripMargin

  private val intersectQ = (s: SparkSession, dir: String) =>
    custKeys(s, dir).intersect(suppKeys(s, dir))

  private val intersectSql =
    """SELECT c_nationkey AS nkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nkey FROM supplier""".stripMargin

  private val intersectAllQ = (s: SparkSession, dir: String) =>
    custKeys(s, dir).intersectAll(suppKeys(s, dir))

  private val intersectAllSql =
    """SELECT c_nationkey AS nkey FROM customer
      |INTERSECT ALL
      |SELECT s_nationkey AS nkey FROM supplier""".stripMargin

  private val exceptQ = (s: SparkSession, dir: String) =>
    custKeys(s, dir).except(suppKeys(s, dir))

  private val exceptSql =
    """SELECT c_nationkey AS nkey FROM customer
      |EXCEPT
      |SELECT s_nationkey AS nkey FROM supplier""".stripMargin

  private val exceptAllQ = (s: SparkSession, dir: String) =>
    custKeys(s, dir).exceptAll(suppKeys(s, dir))
      .groupBy(col("nkey")).agg(count(lit(1)).as("cnt"))

  private val exceptAllSql =
    """SELECT nkey, COUNT(*) AS cnt FROM (
      |  SELECT c_nationkey AS nkey FROM customer
      |  EXCEPT ALL
      |  SELECT s_nationkey AS nkey FROM supplier
      |) GROUP BY nkey""".stripMargin

  // unionByName: schema-aligned union of differently-ordered projections.
  private val unionByNameQ = (s: SparkSession, dir: String) => {
    val a = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
    val b = Tables.supplier(s, dir)
      .select(col("s_acctbal").as("bal"), col("s_suppkey").as("k"))
    a.unionByName(b).groupBy().agg(count(lit(1)).as("cnt"),
      min(col("k")).as("min_k"))
  }

  private val unionByNameSql =
    """SELECT COUNT(*) AS cnt, min(k) AS min_k FROM (
      |  SELECT c_custkey AS k, c_acctbal AS bal FROM customer
      |  UNION ALL
      |  SELECT s_suppkey AS k, s_acctbal AS bal FROM supplier
      |)""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_set_union_all" -> Q(unionAll, Some(unionAllSql),
      "UNION ALL (multiset concat), grouped count"),
    "q_set_union" -> Q(unionDistinct, Some(unionDistinctSql), "UNION distinct"),
    "q_set_intersect" -> Q(intersectQ, Some(intersectSql), "INTERSECT"),
    "q_set_intersect_all" -> Q(intersectAllQ, Some(intersectAllSql),
      "INTERSECT ALL (multiset)"),
    "q_set_except" -> Q(exceptQ, Some(exceptSql), "EXCEPT"),
    "q_set_except_all" -> Q(exceptAllQ, Some(exceptAllSql),
      "EXCEPT ALL (multiset), grouped count"),
    "q_set_union_by_name" -> Q(unionByNameQ, Some(unionByNameSql),
      "unionByName (schema-aligned union)"))
}
