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
  /** Hyperplane sign matrix for `rhpBucket` — shared with the native
    * RhpBucket expression and the AnnTopKRewrite rule so every
    * implementation computes the identical bucket id. */
  def signsFor(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Driver-side bucket of a concrete vector (used by the optimizer
    * rule to expand a literal query vector into its probe buckets). */
  def bucketOfVector(v: Array[Float], nBits: Int, seed: Long = 42L): Long = {
    val signs = signsFor(v.length, nBits, seed)
    var bucket = 0L
    var k = 0
    while (k < nBits) {
      var proj = 0.0
      var i = 0
      while (i < v.length) { proj += signs(k)(i) * v(i); i += 1 }
      if (proj > 0) bucket |= 1L << k
      k += 1
    }
    bucket
  }

  def rhpBucket(v: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val signs = signsFor(dim, nBits, seed)
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
