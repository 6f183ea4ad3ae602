package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 — user extension surface (UDF / UDAF / UDTF) and
  * the SQL entry point.
  *
  * The engine's own operators avoid UDFs (codegen), but the USER
  * surface must exist for capability parity: scalar `udf()`, typed
  * `Aggregator.toColumn` (UDAF), typed `flatMap` (UDTF shape), and
  * `spark.sql` over registered views. The SQL-entry query runs ONE
  * SQL string verbatim on both Spark and DuckDB — dialect-portable
  * text is the strongest form of the oracle contract.
  *
  * 100 TB posture: an Aggregator is a partial/final agg like any
  * built-in (its reduce/merge tree is the reference's per-object
  * partial + client merge); a scalar UDF breaks codegen and is
  * documented as the slow path — prefer native expressions
  * (functions/CosineSimilarity shows the fast path).
  */
object Extensions extends QueryModule {

  /** Typed UDAF: exact money average via (cents, n) partials —
    * associative merge, so partial/final aggregation is lossless. */
  final case class MoneyAvgBuf(cents: Long, n: Long)
  object MoneyAvg extends Aggregator[Long, MoneyAvgBuf, Double] {
    override def zero: MoneyAvgBuf = MoneyAvgBuf(0L, 0L)
    override def reduce(b: MoneyAvgBuf, cents: Long): MoneyAvgBuf =
      MoneyAvgBuf(b.cents + cents, b.n + 1)
    override def merge(a: MoneyAvgBuf, b: MoneyAvgBuf): MoneyAvgBuf =
      MoneyAvgBuf(a.cents + b.cents, a.n + b.n)
    override def finish(b: MoneyAvgBuf): Double = b.cents.toDouble / b.n / 100.0
    override def bufferEncoder: Encoder[MoneyAvgBuf] = Encoders.product
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private val udafQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    Tables.orders(s, dir)
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MoneyAvg.toColumn.name("avg_price"))
      .toDF("o_orderstatus", "avg_price")
      .withColumn("avg_price", round(col("avg_price"), 4))
  }

  private val udafSql =
    """SELECT o_orderstatus,
      |  round(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) * 1.0
      |        / COUNT(*) / 100.0, 4) AS avg_price
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // Scalar UDF: parse the numeric rank out of '1-URGENT' style strings.
  private val udfQ = (s: SparkSession, dir: String) => {
    val priorityRank = udf((p: String) => p.split("-")(0).trim.toInt)
    Tables.orders(s, dir)
      .withColumn("prank", priorityRank(col("o_orderpriority")))
      .groupBy(col("prank"))
      .agg(count(lit(1)).as("n"))
  }

  private val udfSql =
    """SELECT CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prank,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  /** UDTF shape: typed flatMap exploding each order into fixed-size
    * installments (one row per 100k of total price). */
  final case class Installment(o_orderkey: Long, idx: Int, amount_cents: Long)
  private val udtfQ = (s: SparkSession, dir: String) => {
    import s.implicits._
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .flatMap { case (key, cents) =>
        val slice = 10000000L // 100k in cents
        val n = ((cents + slice - 1) / slice).toInt
        (0 until n).map { i =>
          val amt = math.min(slice, cents - i.toLong * slice)
          Installment(key, i, amt)
        }
      }
      .filter(col("o_orderkey") % 50 === 0)
      .toDF()
  }

  private val udtfSql =
    """WITH c AS (SELECT o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 50 = 0)
      |SELECT o_orderkey, CAST(i AS INT) AS idx,
      |  least(10000000, cents - i * 10000000) AS amount_cents
      |FROM c, LATERAL (SELECT unnest(range(0,
      |  CAST(ceil(cents / 10000000.0) AS BIGINT))) AS i)""".stripMargin

  /** SQL entry point: ONE dialect-portable SQL string run verbatim on
    * Spark (over temp views) and DuckDB (the oracle). */
  private val portableSql =
    """SELECT n_name,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  private val sqlEntryQ = (s: SparkSession, dir: String) => {
    Tables.registerAll(s, dir)
    s.sql(portableSql)
  }

  override val queries: Map[String, Q] = Map(
    "q_ext_udaf" -> Q(udafQ, Some(udafSql),
      "typed Aggregator UDAF: exact cents-average with associative merge"),
    "q_ext_udf" -> Q(udfQ, Some(udfSql),
      "scalar udf() surface (documented slow path)"),
    "q_ext_udtf" -> Q(udtfQ, Some(udtfSql),
      "UDTF shape: typed flatMap row explosion"),
    "q_ext_sql_entry" -> Q(sqlEntryQ, Some(portableSql),
      "spark.sql entry point; same SQL text runs on both engines"))
}
