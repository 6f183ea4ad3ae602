package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters state (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams",
  * ICDT 2005; merge rule per Agarwal et al., "Mergeable Summaries",
  * PODS 2012): at most `cap` tracked items, each carrying an estimate
  * `est` and an overestimate bound `err` with the invariant
  * `est − err ≤ true ≤ est`. Eviction and merge tiebreaks are total
  * orders ((est, item) lexicographic), so identical inputs in
  * identical order produce identical state — and in the EXACT regime
  * (cap ≥ distinct items, so nothing is ever evicted) the sketch is
  * the exact count map regardless of partitioning or merge order,
  * which is what the oracle checks.
  */
final class SpaceSavingBuf(val cap: Int) extends Serializable {
  val m: scala.collection.mutable.HashMap[String, (Long, Long)] =
    scala.collection.mutable.HashMap.empty

  private def full: Boolean = m.size >= cap
  /** Smallest estimate currently tracked (0 when not full: an absent
    * item is exactly absent, not possibly-evicted). */
  def minEst: Long = if (!full) 0L else m.valuesIterator.map(_._1).min

  private def evictMin(): Long = {
    // total-order tiebreak: smallest est, then lexicographically
    // smallest item — deterministic for any map iteration order
    val (k, (c, _)) = m.minBy { case (k, (c, _)) => (c, k) }
    m.remove(k); c
  }

  def insert(item: String): Unit = m.get(item) match {
    case Some((c, e)) => m.update(item, (c + 1, e))
    case None if !full => m.update(item, (1L, 0L))
    case None =>
      val floor = evictMin()
      m.update(item, (floor + 1, floor))
  }

  def merge(o: SpaceSavingBuf): Unit = {
    // An item absent from one side may have been seen there and
    // evicted — bounded by that side's minimum estimate. Adding the
    // bound to BOTH est and err preserves est−err ≤ true ≤ est.
    val mySeen = m.keySet.toSet
    val myMin = minEst
    val oMin = o.minEst
    o.m.foreach { case (k, (oc, oe)) =>
      m.get(k) match {
        case Some((c, e)) => m.update(k, (c + oc, e + oe))
        case None         => m.update(k, (oc + myMin, oe + myMin))
      }
    }
    if (oMin > 0)
      mySeen.foreach { k =>
        if (!o.m.contains(k)) {
          val (c, e) = m(k); m.update(k, (c + oMin, e + oMin))
        }
      }
    while (m.size > cap) evictMin()
  }
}

/** `freq_items_sketch(item, cap)` — native mergeable heavy-hitters
  * aggregate: partial Space-Saving summaries per partition, merged at
  * the final stage (no row exchange beyond cap-bounded sketches — the
  * sketch posture every 100 TB top-k-terms job wants). Returns
  * array<struct<item,est,err>> sorted (est DESC, item ASC). */
case class FreqItemsSketch(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuf] with UnaryLike[Expression] {

  require(cap >= 1 && cap <= 100000,
    s"freq_items_sketch: cap $cap outside [1, 100000]")

  override def prettyName: String = "freq_items_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType),
    StructField("err", LongType))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuf =
    new SpaceSavingBuf(cap)

  override def update(b: SpaceSavingBuf, row: InternalRow): SpaceSavingBuf = {
    val v = child.eval(row)
    if (v != null) b.insert(v.toString)
    b
  }

  override def merge(b: SpaceSavingBuf, o: SpaceSavingBuf): SpaceSavingBuf = {
    b.merge(o); b
  }

  override def eval(b: SpaceSavingBuf): Any = {
    val sorted = b.m.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, (c, e)) =>
      InternalRow(UTF8String.fromString(k), c, e)
    })
  }

  override def serialize(b: SpaceSavingBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.cap); out.writeInt(b.m.size)
    b.m.foreach { case (k, (c, e)) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new SpaceSavingBuf(in.readInt())
    var n = in.readInt()
    while (n > 0) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      b.m.update(new String(kb, "UTF-8"), (in.readLong(), in.readLong()))
      n -= 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsSketch =
    copy(child = c)
}
