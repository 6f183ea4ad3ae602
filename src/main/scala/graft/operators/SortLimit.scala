package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 — sort / limit / top-k.
  *
  * The reference orders at most client-side over merged results and has
  * a row-limit knob (SURVEY §2.6, conf. L); distributed top-k is the
  * REPOSE pattern (per-partition local top-k, merge global —
  * [local: PAPERS.md:5]). Spark's `orderBy(...).limit(k)` compiles to
  * `TakeOrderedAndProject`, which IS local-top-k-then-merge: each task
  * keeps a k-sized heap, the driver merges k·numPartitions rows — no
  * global sort, no full shuffle. That plan survives 100 TB (driver
  * receives k rows per partition, not the data).
  *
  * Every limit query orders by a unique key suffix so results are
  * deterministic — an unordered LIMIT is not reproducible on any
  * engine and can never hash-match an oracle.
  */
object SortLimit extends QueryModule {

  // Global top-k, descending, unique tiebreak (REPOSE top-k shape).
  private val topkDesc = (s: SparkSession, dir: String) =>
    Tables.lineitem(s, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(20)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")

  private val topkDescSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 20""".stripMargin

  // Ascending top-k over a filtered scan (limit after selection).
  private val topkAsc = (s: SparkSession, dir: String) =>
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      .limit(15)
      .select("o_orderkey", "o_totalprice", "o_orderdate")

  private val topkAscSql =
    """SELECT o_orderkey, o_totalprice, o_orderdate
      |FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 15""".stripMargin

  // Multi-key mixed-direction sort surfaced through a limit.
  private val sortMulti = (s: SparkSession, dir: String) =>
    Tables.customer(s, dir)
      .orderBy(col("c_mktsegment").asc, col("c_acctbal").desc,
        col("c_custkey").asc)
      .limit(25)
      .select("c_custkey", "c_mktsegment", "c_acctbal")

  private val sortMultiSql =
    """SELECT c_custkey, c_mktsegment, c_acctbal
      |FROM customer
      |ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
      |LIMIT 25""".stripMargin

  /** Keyset pagination — page 3 (rows 41-60) of the price-ordered
    * listing, fetched the way a 100 TB serving layer must: WHERE
    * (price, orderkey, linenumber) > last-seen-key ORDER BY ... LIMIT
    * 20, which is a pushable range predicate + TakeOrdered — cost
    * ∝ page, not ∝ offset. The last-seen key is derived in-plan (the
    * 40th row via a TakeOrdered subquery + 1-row broadcast), and the
    * oracle is the honest OFFSET spelling — proving keyset ≡ offset,
    * the contract that lets a client switch. Row-value comparison is
    * spelled as the expanded lexicographic OR (engine-portable). */
  private val paginationQ = (s: SparkSession, dir: String) => {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val last = li
      .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(40)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").desc,
        col("l_linenumber").desc)
      .limit(1)
      .select(col("l_extendedprice").as("kp"),
        col("l_orderkey").as("ko"), col("l_linenumber").as("kl"))
    li.crossJoin(broadcast(last))
      .filter(col("l_extendedprice") > col("kp")
        || (col("l_extendedprice") === col("kp")
          && col("l_orderkey") > col("ko"))
        || (col("l_extendedprice") === col("kp")
          && col("l_orderkey") === col("ko")
          && col("l_linenumber") > col("kl")))
      .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(20)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
  }

  private val paginationSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 20 OFFSET 40""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_sort_pagination" -> Q(paginationQ, Some(paginationSql),
      "keyset pagination == OFFSET page: seek predicate + TakeOrdered"),
    "q_sort_topk_desc" -> Q(topkDesc, Some(topkDescSql),
      "global top-k via TakeOrderedAndProject (REPOSE local+merge)"),
    "q_sort_topk_asc" -> Q(topkAsc, Some(topkAscSql),
      "filtered ascending top-k"),
    "q_sort_multikey" -> Q(sortMulti, Some(sortMultiSql),
      "multi-key mixed-direction sort + limit"))
}
