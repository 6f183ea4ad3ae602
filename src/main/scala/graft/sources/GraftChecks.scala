package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BindReferences, CommonExpressionRef, EqualNullSafe, Expression, Literal, PlanExpression, RuntimeReplaceable, With, Predicate => CatalystPredicate}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LogicalFilter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** CHECK constraints on object-store tables — write-path data-quality
  * gates in the Delta/DLT-expectations shape (SURVEY §1.1: table
  * metadata the catalog owns; north star: a 100 TB ingest pipeline
  * wants bad rows refused AT THE WRITER, not discovered by a later
  * audit query).
  *
  * A constraint is a table property `check.<name> = <sql predicate>`
  * (TBLPROPERTIES at CREATE, or ALTER TABLE SET TBLPROPERTIES, which
  * first validates existing rows). Enforcement is per-row INSIDE each
  * DSv2 writer task: the predicate is analyzed ONCE on the driver
  * against the write schema (full analyzer — implicit casts, function
  * resolution), bound by field ordinal, and shipped to executors as a
  * serialized Catalyst expression that codegen-compiles locally — the
  * write fan-out stays embarrassingly parallel, no extra pass over the
  * data and no driver funnel. A violating row fails the WRITE; the
  * staged-rename commit discipline then guarantees the failed write
  * leaves NO partial data (abort deletes every staged object).
  *
  * Semantics are SQL-standard CHECK: a row is rejected only when the
  * predicate evaluates to FALSE — UNKNOWN (NULL) passes. The shipped
  * expression is therefore `pred <=> false`, evaluated null-safely.
  */
final case class GraftCheck(name: String, sql: String,
    violation: Expression)

object GraftChecks {
  val Prefix = "check."

  /** Constraint declarations present in a table's resolved options
    * (catalog `_props` sidecar merged with per-write options). */
  def fromOptions(options: CaseInsensitiveStringMap): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    options.entrySet().asScala
      .filter(_.getKey.startsWith(Prefix))
      .map(e => e.getKey.substring(Prefix.length) -> e.getValue)
      .toMap
  }

  /** Driver-side compile: analyze each predicate over an empty
    * relation of the write schema, refuse what a CHECK cannot contain
    * (non-determinism, subqueries), and bind attribute references to
    * field ordinals so executors evaluate session-free. */
  def compile(schema: StructType,
      checks: Map[String, String]): Seq[GraftCheck] =
    if (checks.isEmpty) Nil
    else {
      val spark = SparkSession.active
      checks.toSeq.sortBy(_._1).map { case (name, sql) =>
        val df = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
          .where(sql)
        val (cond, out) = df.queryExecution.analyzed.collect {
          case LogicalFilter(c, child) => (c, child.output)
        }.head
        require(cond.deterministic,
          s"graft-objects: CHECK '$name' must be deterministic: $sql")
        require(!cond.exists(_.isInstanceOf[PlanExpression[_]]),
          s"graft-objects: CHECK '$name' cannot contain a subquery: $sql")
        GraftCheck(name, sql,
          BindReferences.bindReference(
            EqualNullSafe(unwrap(cond), Literal(false)), out))
      }
    }

  /** The analyzer leaves sugar forms (BETWEEN, ilike, …) as
    * RuntimeReplaceable wrappers whose replacements may use
    * `With`/common-expression nodes — both only the optimizer
    * normally lowers, and this expression skips the optimizer. Unwrap
    * to a plainly evaluable tree: substitute replacements and INLINE
    * common-expression refs (duplicated evaluation is fine for a
    * per-row predicate), to a fixpoint since a replacement can itself
    * carry more sugar. */
  private def unwrap(e: Expression): Expression = {
    val once = e.transformUp {
      case r: RuntimeReplaceable => r.replacement
      case w: With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case ref: CommonExpressionRef if defs.contains(ref.id) =>
            defs(ref.id)
        }
    }
    if (once.fastEquals(e)) once else unwrap(once)
  }

  /** Executor-side enforcement closure: codegen the bound violation
    * predicates once per writer, throw naming the constraint on the
    * first violating row. */
  def enforcer(checks: Seq[GraftCheck]): InternalRow => Unit =
    if (checks.isEmpty) { _ => () }
    else {
      val preds = checks.map(c => (c, CatalystPredicate.create(c.violation)))
      row =>
        preds.foreach { case (c, p) =>
          if (p.eval(row))
            throw new IllegalArgumentException(
              s"graft-objects: CHECK constraint '${c.name}' " +
                s"(${c.sql}) violated; write aborted, no rows committed")
        }
    }
}
