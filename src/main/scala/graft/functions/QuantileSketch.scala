package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile-summary state — the KLL compactor-stack shape
  * ([pub: Karnin, Lang, Liberty, "Optimal quantile approximation in
  * streams", FOCS 2016]) with DETERMINISTIC compaction (keep the
  * even-ranked half — no randomness, so identical inputs give
  * identical state): level ℓ holds values of weight 2^ℓ; when a level
  * exceeds `cap` it sorts and promotes its even-ranked half to level
  * ℓ+1. Below cap nothing ever compacts, the summary IS the exact
  * multiset, and the result is independent of partitioning and merge
  * order — the exact regime the oracle checks (the same
  * exact-below-cap discipline as the KMV and Space-Saving sketches).
  * Beyond cap the rank error is bounded by Σ_{ℓ} 2^ℓ · (compactions
  * at ℓ) ≤ N/cap per level — the spec checks the bound, not the
  * oracle. */
final class QuantileBuf(val cap: Int) extends Serializable {
  var levels: scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Long]] =
    scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Long])

  def insert(v: Long): Unit = { levels(0) += v; compactFrom(0) }

  // Scans EVERY level from `start` (not stopping at the first
  // within-cap one): after merge() any level can be over cap, not
  // just a prefix — stopping early would let a high level carry
  // ~(#merges)·cap entries across the exchange, violating the
  // cap-bounded-partials contract. Promotions land in l+1, which the
  // advancing scan re-checks next iteration, so cascades terminate.
  private def compactFrom(start: Int): Unit = {
    var l = start
    while (l < levels.length) {
      if (levels(l).length > cap) {
        val sorted = levels(l).sorted
        if (l + 1 >= levels.length)
          levels += scala.collection.mutable.ArrayBuffer.empty[Long]
        // deterministic: promote the even-RANKED half (indices 1,3,5…
        // keep the odd — either is valid; picking rank index 1 mod 2
        // keeps medians stable on duplicated values)
        var i = 1
        while (i < sorted.length) { levels(l + 1) += sorted(i); i += 2 }
        levels(l) = if (sorted.length % 2 == 1)
          scala.collection.mutable.ArrayBuffer(sorted(sorted.length - 1))
        else scala.collection.mutable.ArrayBuffer.empty[Long]
      }
      l += 1
    }
  }

  def merge(o: QuantileBuf): Unit = {
    var l = 0
    while (l < o.levels.length) {
      if (l >= levels.length)
        levels += scala.collection.mutable.ArrayBuffer.empty[Long]
      levels(l) ++= o.levels(l)
      l += 1
    }
    compactFrom(0)
  }

  /** Weighted lower quantile: smallest value whose cumulative weight
    * reaches ceil(pMicro·N / 10⁶) (integer-exact rank — no float in
    * the rank computation, so both engines agree at every N). */
  def quantiles(pMicros: Array[Long]): Array[Long] = {
    val pairs = levels.zipWithIndex.flatMap { case (vs, l) =>
      vs.map(v => (v, 1L << l))
    }.sortBy(_._1)
    val n = pairs.map(_._2).sum
    pMicros.map { pm =>
      val target = math.max(1L, (pm * n + 999999L) / 1000000L)
      var cum = 0L
      var i = 0
      var res = if (pairs.nonEmpty) pairs.last._1 else 0L
      var done = false
      while (!done && i < pairs.length) {
        cum += pairs(i)._2
        if (cum >= target) { res = pairs(i)._1; done = true }
        i += 1
      }
      res
    }
  }
}

/** `quantile_sketch(v, cap, 'p1,p2,…')` — native mergeable quantile
  * aggregate over BIGINT values: partial compactor stacks per
  * partition, merged at the final stage (cap-bounded state crosses
  * the exchange, never rows — the sketch posture every 100 TB
  * percentile job wants). Probabilities are MICRO integers
  * ('250000,500000' = P25, P50) so the rank ceil is integer-exact.
  * Returns array<bigint>, one quantile per probability. */
case class QuantileSketch(child: Expression, cap: Int, pMicros: Array[Long],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuf] with UnaryLike[Expression] {

  require(cap >= 8 && cap <= 10000000,
    s"quantile_sketch: cap $cap outside [8, 10000000]")
  require(pMicros.nonEmpty && pMicros.forall(p => p >= 0L && p <= 1000000L),
    "quantile_sketch: probabilities must be micro ints in [0, 1000000]")

  override def prettyName: String = "quantile_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): QuantileBuf = new QuantileBuf(cap)

  override def update(b: QuantileBuf, row: InternalRow): QuantileBuf = {
    val v = child.eval(row)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: QuantileBuf, o: QuantileBuf): QuantileBuf = {
    b.merge(o); b
  }

  override def eval(b: QuantileBuf): Any =
    new GenericArrayData(b.quantiles(pMicros))

  override def serialize(b: QuantileBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.cap); out.writeInt(b.levels.length)
    b.levels.foreach { vs =>
      out.writeInt(vs.length); vs.foreach(out.writeLong)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new QuantileBuf(in.readInt())
    val nl = in.readInt()
    b.levels = scala.collection.mutable.ArrayBuffer.tabulate(nl) { _ =>
      val n = in.readInt()
      val vs = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < n) { vs += in.readLong(); i += 1 }
      vs
    }
    if (b.levels.isEmpty)
      b.levels += scala.collection.mutable.ArrayBuffer.empty[Long]
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketch =
    copy(child = c)
}
