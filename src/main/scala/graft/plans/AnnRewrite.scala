package graft.plans

import graft.functions.VectorOps
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** SURVEY §4.2(b): the promised `Rule[LogicalPlan]` that rewrites
  * "ORDER BY cosine_sim(vec, <literal query>) DESC LIMIT k" onto an
  * LSH-bucket-pruned plan (the REPOSE pattern) — registered through
  * `SparkSessionExtensions` (graft.functions.GraftExtensions) or at
  * runtime via `spark.experimental.extraOptimizations`.
  *
  * OFF by default: the rewrite trades exactness for pruning (top-k is
  * computed over the multiprobe candidate set only), which is an
  * explicit, opt-in contract — `spark.graft.ann.rewrite=true`. It only
  * fires on the TakeOrdered shape (GlobalLimit/LocalLimit over Sort):
  * an unlimited ORDER BY must stay exact, so it is never touched.
  *
  * 100 TB: this is the plan the engine wants when the corpus no longer
  * fits a brute scan — the inserted bucket filter is an ordinary
  * pushable predicate over a precomputable column, so with a bucket
  * column materialized at ingest the scan prunes at the source.
  */
object AnnTopKRewrite extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.ann.rewrite"
  private val NBits = 16
  private val Probe = 3
  private val Seed = 42L

  private def enabled: Boolean =
    conf.getConfString(ConfKey, "false").toBoolean

  /** cosine_sim(vec, literal) inside the sort-key alias, any wrapping
    * (round, cast) above it. */
  private def extractCos(e: Expression): Option[(Expression, Array[Float])] =
    e.collectFirst {
      case graft.functions.CosineSimilarity(v, Literal(q: ArrayData, ArrayType(FloatType, _)))
          if !v.foldable =>
        (v, q.toFloatArray())
      case graft.functions.CosineSimilarity(Literal(q: ArrayData, ArrayType(FloatType, _)), v)
          if !v.foldable =>
        (v, q.toFloatArray())
    }

  private def probeBuckets(qbucket: Long): Set[Any] =
    (0 until (1 << NBits))
      .filter(m => java.lang.Integer.bitCount(m) <= Probe)
      .map(m => (qbucket ^ m.toLong): Any).toSet

  /** Has this subtree already been rewritten? (The inserted filter is
    * an InSet over either the hash expression or a stored bucket
    * attribute — matching it makes the rule idempotent across
    * optimizer fixpoint iterations.) */
  private def alreadyPruned(p: LogicalPlan): Boolean = p.exists {
    case Filter(InSet(_: RhpBucket, _), _) => true
    case Filter(InSet(a: Attribute, _), _) if a.name == "bucket" => true
    case _ => false
  }

  /** Insert the probe-bucket filter as deep as a stored `bucket`
    * column is visible (walking through pruning Projects), falling
    * back to the per-row hash recompute at the top. MATERIALIZED index
    * path: when the relation carries a `bucket` column written at
    * ingest (Similarity.annIndexRoot), the filter lands directly on
    * the stored attribute; the InSet then translates to an ordinary
    * source `In` filter, so a DSv2 source with object-level min/max
    * stats (graft-objects) prunes whole objects at planning time —
    * the scan-level pruning the reference gets from its object index. */
  private def insertFilter(node: LogicalPlan, buckets: Set[Any],
      fallback: => Expression): LogicalPlan = {
    def descend(n: LogicalPlan): Option[LogicalPlan] =
      n.output.find(a => a.name == "bucket" && a.dataType == LongType) match {
        case Some(attr) => Some(Filter(InSet(attr, buckets), n))
        case None => n match {
          case p @ Project(_, c) =>
            descend(c).map(nc => p.copy(child = nc))
          case _ => None
        }
      }
    descend(node).getOrElse(Filter(InSet(fallback, buckets), node))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_,
          sort @ Sort(SortOrder(key: Attribute, Descending, _, _) +: _, true,
            proj @ Project(projectList, child), _))) if !alreadyPruned(child) =>
        val rewritten = projectList.collectFirst {
          case a: Alias if a.exprId == key.exprId => a.child
        }.flatMap(extractCos).map { case (vecExpr, queryVec) =>
          val qb = VectorOps.bucketOfVector(queryVec, NBits, Seed)
          val pruned = insertFilter(child, probeBuckets(qb),
            RhpBucket(vecExpr, queryVec.length, NBits, Seed))
          gl.copy(child = ll.copy(child =
            sort.copy(child = proj.copy(child = pruned))))
        }
        rewritten.getOrElse(gl)
    }
  }
}

/** Native random-hyperplane LSH bucket id — the resolved-expression
  * form of VectorOps.rhpBucket (bit-identical by construction: shared
  * sign matrix, same strict left-to-right projection fold), usable from
  * optimizer rules where HOF-based columns would be unresolved. */
case class RhpBucket(child: Expression, dim: Int, nBits: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_bucket"

  @transient private lazy val signs: Array[Array[Double]] =
    VectorOps.signsFor(dim, nBits, seed)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var bucket = 0L
    var k = 0
    while (k < nBits) {
      var proj = 0.0
      var i = 0
      while (i < n) { proj += signs(k)(i) * v.getFloat(i); i += 1 }
      if (proj > 0) bucket |= 1L << k
      k += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val signsRef = ctx.addReferenceObj("signs", signs, "double[][]")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long $bucket = 0L;
         |for (int $k = 0; $k < $nBits; $k++) {
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += $signsRef[$k][$i] * (double) $v.getFloat($i);
         |  }
         |  if ($proj > 0) $bucket |= 1L << $k;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RhpBucket =
    copy(child = newChild)
}
