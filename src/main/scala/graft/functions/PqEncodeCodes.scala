package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encoder: per subspace, the argmin-L2 codebook cell for a
  * vector — `array<int>` of `nSub` codes (r9 optimization, guide §1.2
  * step 2 / §4: the SQL spelling was a four-deep interpreted HOF nest
  * — transform(sequence) → aggregate(transform(filter(cb))) →
  * aggregate(zip_with(slice)) — dispatching boxed lambdas per
  * (subspace × cell × dimension) for every encoded row; this is one
  * fused primitive loop per row).
  *
  * Semantics contract — BIT-IDENTICAL to the HOF spelling it replaces
  * (PqEncodeSpec asserts equality on every fixture vector, float and
  * double element types):
  *   - distance: strict left-to-right fold of (vec[s·subDim+i] − c[i])²
  *     with every element widened to double before arithmetic, exactly
  *     `aggregate(zip_with(slice(...), centroid, (a,b) -> (a-b)²))`;
  *   - argmin: codebook entries visited in ARRAY ORDER (pqCbArr sorts
  *     by (sub, cell)), strict `<` against the running best seeded at
  *     (1e18, -1) — first minimum wins, ties break to the smallest
  *     cell, a subspace with no entries yields -1;
  *   - null vec or null codebook → null (BinaryExpression default).
  *
  * `cb` rows are structs (sub int, cell int, centroid array<double>).
  * CodegenFallback: the per-row work IS the fused loop — falling out
  * of whole-stage codegen costs one boxed call per row, not per
  * (cell × dimension) as the HOF nest did.
  */
case class PqEncodeCodes(left: Expression, right: Expression,
    nSub: Int, subDim: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_codes"

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 3 &&
        fields(0).dataType == IntegerType &&
        fields(1).dataType == IntegerType &&
        fields(2).dataType.isInstanceOf[ArrayType] => true
      case _ => false
    }
    if (vecOk && cbOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName(vec array<float|double>, cb array<struct<sub int, cell int, " +
        s"centroid array<double>>>) — got ${left.dataType.catalogString}, " +
        right.dataType.catalogString)
  }

  override protected def nullSafeEval(v: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cb = c.asInstanceOf[ArrayData]
    val fl = vecIsFloat
    val vlen = vec.numElements()
    val bestD = Array.fill(nSub)(1e18)
    val bestC = Array.fill(nSub)(-1)
    var e = 0
    val n = cb.numElements()
    while (e < n) {
      val row = cb.getStruct(e, 3)
      val s = row.getInt(0)
      if (s >= 0 && s < nSub) {
        val cell = row.getInt(1)
        val cent = row.getArray(2)
        val base = s * subDim
        val m = math.min(subDim,
          math.min(cent.numElements(), math.max(vlen - base, 0)))
        var d = 0.0
        var i = 0
        while (i < m) {
          val a = if (fl) vec.getFloat(base + i).toDouble
            else vec.getDouble(base + i)
          val diff = a - cent.getDouble(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD(s)) { bestD(s) = d; bestC(s) = cell }
      }
      e += 1
    }
    new GenericArrayData(bestC)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeCodes =
    copy(left = newLeft, right = newRight)
}

/** Native IVF cell assignment: argmax-cosine over a (cell, centroid)
  * array — the map-side `assignCells` fold without the per-cell
  * interpreted aggregate/struct allocation (r9; same motivation as
  * [[PqEncodeCodes]]). Bit-identical to the HOF fold it replaces
  * (CellArgmaxSpec): cosine per cell is the CosineSimilarity fold
  * (strict left-to-right, elements widened to double), entries are
  * visited in ARRAY ORDER with strict `>` against a running best
  * seeded at (-2.0, -1) — the first maximum wins, so ties break to
  * the smallest cell when the array is (cell)-sorted. The `>` is
  * SPARK SQL's double comparison, not Java's: Spark orders NaN above
  * every other value (and NaN = NaN), so a NaN cosine (zero-norm
  * centroid or vector) DISPLACES any non-NaN best and the first NaN
  * then wins — CellArgmaxSpec pins exactly this against the fold. */
case class CosineArgmaxCell(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "cosine_argmax_cell"

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def centIsFloat: Boolean = right.dataType match {
    case ArrayType(StructType(f), _) => f(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val centsOk = right.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 2 &&
        fields(0).dataType == IntegerType &&
        (fields(1).dataType match {
          case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
          case _ => false
        }) => true
      case _ => false
    }
    if (vecOk && centsOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName(vec array<float|double>, cents array<struct<cell int, " +
        s"centroid array<float|double>>>) — got ${left.dataType.catalogString}, " +
        right.dataType.catalogString)
  }

  override protected def nullSafeEval(v: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = c.asInstanceOf[ArrayData]
    val vf = vecIsFloat
    val cf = centIsFloat
    var bestC = -2.0
    var bestCell = -1
    var e = 0
    val n = cents.numElements()
    while (e < n) {
      val row = cents.getStruct(e, 2)
      val cell = row.getInt(0)
      val cent = row.getArray(1)
      val m = math.min(vec.numElements(), cent.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val x = if (vf) vec.getFloat(i).toDouble else vec.getDouble(i)
        val y = if (cf) cent.getFloat(i).toDouble else cent.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      // Spark SQL double ordering: NaN > any non-NaN, NaN = NaN
      val wins =
        if (java.lang.Double.isNaN(cos)) !java.lang.Double.isNaN(bestC)
        else if (java.lang.Double.isNaN(bestC)) false
        else cos > bestC
      if (wins) { bestC = cos; bestCell = cell }
      e += 1
    }
    bestCell
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineArgmaxCell =
    copy(left = newLeft, right = newRight)
}
