package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scale classification of a registered query (r8 verdict #2: the
  * deliberately-quadratic recall baselines were quarantined only in
  * prose — a 100 TB user calling `SparkEntry.queries` couldn't tell a
  * scale-safe plan from a fixture diagnostic). Machine-readable and
  * enforced: tier sweeps refuse diagnostics unless forced
  * (SPARK_GRAFT_ALLOW_DIAG=1), `SparkEntry.scaleClass` exposes the
  * class per query, and ScaleClassSpec asserts every diagnostic names
  * a registered scale-safe twin.
  */
sealed trait ScaleClass
object ScaleClass {
  /** Plan shape survives the decade tiers: bucketed/blocked/linear
    * shuffles, no all-pairs stage, no fixture-bound constant. */
  case object Safe extends ScaleClass
  /** Deliberately fixture-bound (typically exact-quadratic) baseline
    * kept as the recall/exactness audit for `safeTwin` — the
    * registered query a scale user should call instead. */
  final case class FixtureDiagnostic(safeTwin: String) extends ScaleClass
}

/** One declared query: the Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query.
  * Queries without an oracle get the driver's weaker rows-only check.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    scale: ScaleClass = ScaleClass.Safe)

trait QueryModule {
  def queries: Map[String, Q]
}

/** Oracle-parity numeric helpers.
  *
  * Double aggregation is order-dependent, and Spark's partial/final
  * aggregation order differs from DuckDB's single-threaded order, so a
  * raw `sum(double)` hash-mismatches the oracle in the low bits. The
  * fix is exact arithmetic: cast the 2-decimal money columns and the
  * small rate columns to DECIMAL before any arithmetic, aggregate in
  * decimal (exact, order-independent), and cast the final result back
  * to double. Both engines then produce the identical double.
  */
object Ora {
  /** Money columns (2-decimal doubles, < 10^10). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Rate-like columns in [0, 10) with 2 decimals (discount, tax). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Exact decimal sum surfaced as double. */
  def dsum(c: Column): Column = sum(c).cast("double")
  /** Exact average: decimal sum / long count, one double division. */
  def davg(c: Column): Column = sum(c).cast("double") / count(c)
}
