package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a
  * named query; SQL-expressible ones also carry a DuckDB oracle query
  * (column names aligned on both sides — the driver sorts columns by
  * name and hash-compares values).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    graft.operators.Relational,
    graft.operators.Predicates,
    graft.operators.Aggregates,
    graft.operators.SortLimit,
    graft.operators.SetOps,
    graft.operators.Joins,
    graft.operators.Subqueries,
    graft.operators.Windows,
    graft.operators.Scalars,
    graft.operators.Dedup,
    graft.operators.Similarity,
    graft.operators.TextOps,
    graft.operators.Multimodal,
    graft.streaming.StreamOps,
    graft.operators.Sources,
    graft.operators.Extensions,
    graft.operators.Skew,
    graft.operators.Sampling,
    graft.operators.TimeSeries,
    graft.operators.Graph,
    graft.operators.Curation,
    graft.operators.Audit,
    graft.operators.TpchMore)

  private lazy val all: Map[String, Q] =
    modules.flatMap(_.queries).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }

  /** Per-query scale classification (r8 verdict #2): "safe" = the plan
    * shape survives the decade tiers; "fixture_diagnostic:<twin>" = a
    * deliberately fixture-bound (typically quadratic) recall/exactness
    * baseline — call <twin> at scale instead. Tier sweeps refuse
    * diagnostics unless SPARK_GRAFT_ALLOW_DIAG=1. */
  def scaleClass: Map[String, String] =
    all.map {
      case (k, q) => k -> (q.scale match {
        case ScaleClass.Safe => "safe"
        case ScaleClass.FixtureDiagnostic(t) => s"fixture_diagnostic:$t"
      })
    }

  /** Registered Q rows (tests + tooling; fn/oracle/doc/scale). */
  private[graft] def registry: Map[String, Q] = all
}
