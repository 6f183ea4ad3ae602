package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Bit-interleaved Z-value over N long keys — the multi-dimensional
  * clustering key for the object layout (SURVEY §2.11: the reference
  * range-shards on ONE ingest key; a 100 TB table queried on several
  * independent dimensions needs all of their footer ranges tight at
  * once, which a linear sort cannot give). Rows sorted by this value
  * follow the Z-curve: each object covers one curve segment ≈ one
  * hyper-rectangle of the key space, so per-column min/max footer
  * stats prune scans on ANY of the interleaved dimensions — the same
  * trick lakehouse table formats use (OPTIMIZE ... ZORDER BY) applied
  * to the graft object layout.
  *
  * Each input maps through XOR Long.MinValue (order-preserving
  * signed→unsigned), then all 64 bits of each key interleave
  * round-robin from the MSB into an N·8-byte BINARY value — full
  * fidelity for any key range (a 64-bit-truncated variant would
  * collapse every key sharing its top 64/N bits), and binary sort
  * order in Spark IS unsigned lexicographic, exactly the curve
  * order. Any null key ⇒ null z-value (callers coalesce first;
  * GraftLayout.zorderWrite sends nulls to the curve origin).
  */
case class ZOrderLong(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty || children.size > 8)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 1 to 8 arguments, got ${children.size}")
    else if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    val vals = new Array[Long](n)
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      if (v == null) return null
      vals(c) = v.asInstanceOf[Long] ^ Long.MinValue
      c += 1
    }
    ZOrderLong.interleave(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("arr")
    val inputs = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; }
         |else { $arr[$i] = ${e.value} ^ java.lang.Long.MIN_VALUE; }
       """.stripMargin
    }.mkString("\n")
    val code =
      code"""
        |boolean ${ev.isNull} = false;
        |byte[] ${ev.value} = null;
        |long[] $arr = new long[$n];
        |$inputs
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.ZOrderLong.interleave($arr);
        |}
       """.stripMargin
    ev.copy(code = code,
      isNull = if (nullable) ev.isNull else FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderLong =
    copy(children = newChildren)
}

object ZOrderLong {
  /** Round-robin MSB interleave of all 64 bits of each (already
    * unsigned-mapped) key into an N·8-byte array. Shared by eval, the
    * generated code (via the companion's static forwarder), and the
    * spec's reference model. */
  def interleave(vals: Array[Long]): Array[Byte] = {
    val n = vals.length
    val out = new Array[Byte](n * 8)
    var bitIdx = 0
    var b = 0
    while (b < 64) {
      var c = 0
      while (c < n) {
        if (((vals(c) >>> (63 - b)) & 1L) != 0L)
          out(bitIdx >>> 3) = (out(bitIdx >>> 3) | (0x80 >>> (bitIdx & 7))).toByte
        bitIdx += 1
        c += 1
      }
      b += 1
    }
    out
  }

  /** Column API: integral/date/timestamp inputs are cast to long.
    * Resolves through the registered `zorder_long` SQL function —
    * callers must have run `GraftFunctions.register(spark)` (the
    * layout helper does). */
  def zorder(cols: Column*): Column =
    call_function("zorder_long", cols.map(_.cast("long")): _*)
}

/** Multi-dimensional object layout: range-shard on the Z-value so each
  * object covers ≈ one hyper-rectangle of the composite key space, and
  * the ordinary per-column min/max footer stats prune on ANY clustered
  * dimension. A linear sort gives one tight dimension and leaves every
  * other column's range spanning the whole table — at 100 TB that is
  * the difference between reading 1/√N of the objects and reading all
  * of them for a filter on the second key. */
object GraftLayout {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.{coalesce, col, lit}

  /** Write `df` as `nObjects` Z-ordered graft objects clustered on
    * `cols` (integral/date/timestamp). Nulls sort to the curve origin.
    * One range-exchange + in-partition sort — the same cost as the
    * single-key clustered ingest. */
  def zorderWrite(df: DataFrame, tgt: String, cols: Seq[String],
      nObjects: Int): Unit = {
    GraftFunctions.register(df.sparkSession)
    val z = ZOrderLong.zorder(cols.map(c =>
      coalesce(col(c).cast("long"), lit(Long.MinValue))): _*)
    df.withColumn("_graft_z", z)
      .repartitionByRange(nObjects, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.format("graft-objects").mode("overwrite").save(tgt)
  }
}
