package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** SURVEY §4.2-style materialized-view substitution — the third
  * optimizer-tier component beside AnnTopKRewrite and
  * TopKPerGroupRewrite: a `Rule[LogicalPlan]` that rewrites an
  * aggregate over a base table onto its maintained rollup table (the
  * Calcite/"automatic MV matching" pattern warehouses ship; here the
  * rollup is the incrementally-MERGEd table `q_src_mv_incremental`
  * maintains).
  *
  * The rewrite fires ONLY on an exact definition match — same base
  * relation (by DSv2 table name), same grouping columns, and every
  * aggregate output matching the registered (function, input) spec by
  * its alias — and substitutes a Project over the MV scan that
  * preserves the original output exprIds, so parents never notice.
  * Anything else (extra filters, unknown functions, DISTINCT,
  * FILTER-clauses) falls through untouched: correctness never depends
  * on the rule, it only removes the corpus scan.
  *
  * Freshness is the registrant's contract, exactly as in every
  * MV-substitution engine: register the MV only while it is
  * maintained (here: rebuilt or delta-MERGEd in the same operation).
  *
  * OFF by default; opt in per session with `spark.graft.mv.rewrite`
  * (the AnnTopKRewrite conf discipline). 100 TB posture: this is the
  * difference between re-scanning the corpus per dashboard query and
  * reading a |groups|-row table.
  */
object MvRewrite extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.mv.rewrite"

  /** One registered MV: its scan plan, grouping column names, and for
    * each aggregate output name the (function, input-column) it
    * stores. Grouping passthrough columns map by name. */
  final case class MvDef(
      scan: LogicalPlan,
      groupCols: Seq[String],
      aggCols: Map[String, (String, String)])

  // Session-scoped MV catalog: base DSv2 table name -> definition.
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  def registerMv(baseTableName: String, d: MvDef): Unit =
    registry.put(baseTableName, d)

  /** Scoped-registration discipline (the runtimeBloomQ conf pattern):
    * registrants unregister when their maintenance window ends, so a
    * later aggregate over the base table can never silently read a
    * rollup that stopped being maintained. */
  def unregisterMv(baseTableName: String): Unit =
    registry.remove(baseTableName): Unit

  /** Idempotent runtime registration (the TopKPerGroup discipline). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewrite

  private def enabled: Boolean =
    conf.getConfString(ConfKey, "false").toBoolean

  /** The base relation's DSv2 name, looking through column-pruning
    * Projects only (a Filter in between makes the MV non-applicable).
    * extraOptimizations run AFTER V2ScanRelationPushDown, so the leaf
    * is normally already a DataSourceV2ScanRelation; a pushed filter
    * surfaces as a non-empty `pushedFilters`-bearing scan description
    * only when a Filter node was consumed — we require the scan to sit
    * DIRECTLY under the aggregate (Spark keeps residual Filters as
    * logical nodes, which this match rejects; fully-consumed pushed
    * filters cannot occur here because the registrant's base read
    * carries no filters to push). */
  private def baseNameOf(p: LogicalPlan): Option[String] = p match {
    case r: DataSourceV2Relation => Some(r.table.name())
    case r: DataSourceV2ScanRelation => r.scan match {
      // A fully-consumed pushed filter/limit leaves no logical node, so
      // inspect the scan itself: only a pristine graft object scan (no
      // pushed filters, no limit/top-N) is the registered base's whole
      // content. Any other scan type is conservatively declined.
      case g: graft.sources.GraftObjectScan
          if g.pushed.isEmpty && g.limit.isEmpty && g.topN.isEmpty =>
        Some(r.relation.table.name())
      case _ => None
    }
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      baseNameOf(child)
    case _ => None
  }

  /** (function, input) signature of a logical aggregate expression in
    * the registry's vocabulary; None = not substitutable. */
  private def sigOf(ae: AggregateExpression): Option[(String, String)] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case Count(Seq(Literal(1, _))) => Some(("count", "1"))
      case Sum(a: AttributeReference, _) => Some(("sum", a.name))
      case Min(a: AttributeReference) => Some(("min", a.name))
      case Max(a: AttributeReference) => Some(("max", a.name))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || registry.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _)
          if groupExprs.forall(_.isInstanceOf[AttributeReference]) &&
            baseNameOf(child).exists(registry.containsKey) =>
        val d = registry.get(baseNameOf(child).get)
        val mvAttrs = d.scan.output.map(a => a.name -> a).toMap
        val groupNames = groupExprs.collect {
          case a: AttributeReference => a.name
        }
        val mapped: Seq[Option[NamedExpression]] = aggExprs.map {
          case a: AttributeReference if groupNames.contains(a.name) =>
            mvAttrs.get(a.name)
              .map(mv => Alias(mv, a.name)(exprId = a.exprId))
          case al @ Alias(ae: AggregateExpression, name) =>
            for {
              spec <- d.aggCols.get(name)
              sig <- sigOf(ae)
              if sig == spec
              mv <- mvAttrs.get(name)
              if mv.dataType == al.dataType
            } yield Alias(mv, name)(exprId = al.exprId)
          case _ => None
        }
        if (groupNames.sorted == d.groupCols.sorted &&
            mapped.forall(_.isDefined) &&
            d.aggCols.keySet.subsetOf(aggExprs.map(_.name).toSet))
          Project(mapped.map(_.get), d.scan)
        else agg
    }
  }
}
