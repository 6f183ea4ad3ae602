package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit, UnaryNode => LogicalUnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** SURVEY §4.2(c) — the custom whole-operator tier: a LogicalPlan +
  * Rule + SparkStrategy + SparkPlan chain that replaces the canonical
  * top-k-per-group window shape
  *
  *   SELECT ... FROM (SELECT ..., row_number() OVER
  *     (PARTITION BY g ORDER BY o) rn FROM t) WHERE rn <= k
  *
  * with a bounded-heap physical operator. Spark 3.5+ already prunes
  * this shape with InferWindowGroupLimit — but that keeps the full
  * per-group SORT and the rank projection; this operator ELIMINATES
  * the window entirely: a size-k heap per group on the map side (only
  * ≤ k rows per (group, partition) cross the exchange), then a size-k
  * heap per group on the reduce side. No sort of anything larger than
  * k, memory O(groups-per-partition × k).
  *
  * OFF by default (`spark.graft.topk.rewrite=true` to enable), same
  * opt-in contract as AnnTopKRewrite, for the same reason the repo's
  * window queries always carry unique tiebreaks: under a NON-total
  * ORDER BY, row_number and the heap may keep different peers of the
  * k-th row. With a total order (every query here) the result set is
  * identical — the equality spec proves it on the fixtures.
  *
  * The rule only fires on the exact canonical shape — a Project of
  * pass-through attributes over Filter(rn <= k) over a single-
  * row_number Window — and drops any InferWindowGroupLimit node under
  * the window (subsumed). Anything else (rank used downstream, other
  * window functions, non-literal k) is left untouched.
  */
case class TopKPerGroupPlan(
    group: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends LogicalUnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

object TopKPerGroupRewrite extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.topk.rewrite"

  private def enabled: Boolean =
    conf.getConfString(ConfKey, "false").toBoolean

  private object RankLimit {
    /** Filter condition `rn <= k` / `rn < k+1` / `rn = 1` on `rn`. */
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, _)) => Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(1, _)) => Some((a, 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case p @ Project(projList,
            Filter(RankLimit(rn, k),
              w @ Window(Seq(Alias(WindowExpression(_: RowNumber, spec), _)),
                part, order, wchild, _)))
          if k >= 1 &&
            spec.partitionSpec == part && spec.orderSpec == order &&
            // the filter's rank attr must be THE window output column
            w.windowOutputSet.contains(rn) &&
            // parent must only pass through child attributes (rank is
            // dropped — if rn or any computed column survives, the
            // window's semantics are still needed)
            projList.forall {
              case a: AttributeReference => wchild.outputSet.contains(a)
              case _ => false
            } =>
        // an InferWindowGroupLimit pre-pruner under the window is
        // subsumed by the heap operator
        val base = wchild match {
          case WindowGroupLimit(p2, o2, _, _, c)
              if p2 == part && o2 == order => c
          case c => c
        }
        Project(projList, TopKPerGroupPlan(part, order, k, base))
    }
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(group, order, k, child) =>
      TopKPerGroupExec(group, order, k, partial = false,
        TopKPerGroupExec(group, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per group. `partial = true` runs on whatever
  * partitioning the child has (map-side: caps each (group, partition)
  * at k rows before the exchange); `partial = false` requires the
  * group clustering (reduce-side: the exact per-group answer). Both
  * sides are the same heap pass — the operator composes with itself
  * exactly like partial/final aggregation. */
case class TopKPerGroupExec(
    group: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(group) :: Nil
  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val orderExprs = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = RowOrdering.create(orderExprs, childOutput)
      // max-heap on the ordering: head = current worst of the kept k
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[InternalRow](limit + 1,
            ord.reversed())
          heaps.put(key.copy(), h)
        }
        if (h.size() < limit) h.offer(row.copy())
        else if (ord.compare(row, h.peek()) < 0) {
          h.poll(); h.offer(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach(h => h.forEach(r => out += r))
      out.iterator
    }
  }
}

object TopKPerGroup {
  /** Idempotent runtime registration for sessions not built with
    * `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(TopKPerGroupRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKPerGroupRewrite
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
  }
}
