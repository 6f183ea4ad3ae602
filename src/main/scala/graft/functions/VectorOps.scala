package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column math over ArrayType(FloatType) embeddings (SURVEY
  * §2.10 similarity ops). Pure higher-order-function expressions —
  * `zip_with` + `aggregate` — so everything is codegen'd; no UDFs.
  *
  * Accumulation is a strict left-to-right fold in DOUBLE. That makes
  * results deterministic and bit-identical to any oracle that folds the
  * same way (DuckDB `list_sum(list_transform(...))`), independent of
  * partitioning — a requirement for hash-equality testing (SURVEY §5.2).
  */
object VectorOps {

  def dot(x: Column, y: Column): Column = aggregate(
    zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  def norm2(x: Column): Column = dot(x, x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Random-hyperplane LSH bucket id over `nBits` hyperplanes with ±1
    * components drawn from a fixed seed (never Math.random — SURVEY §7
    * risk 3). Cosine-similar vectors agree on most sign bits, so
    * bucket equality (or small bucket-hamming) prunes the search space.
    */
  def rhpBucket(v: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val signs = Array.fill(nBits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val bits = (0 until nBits).map { k =>
      // signed projection: sum_i signs(k)(i) * v[i], computed as a fold
      val proj = aggregate(
        zip_with(v, typedLit(signs(k).toSeq), (p, s) => p.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << k)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }
}
