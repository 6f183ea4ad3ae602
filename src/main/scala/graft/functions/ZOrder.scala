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

/** Order-preserving 8-byte prefix code of a string — the bridge that
  * lets STRING dimensions participate in the Z-curve (round-6 verdict
  * item: the reference's text-index domain clusters on string keys):
  * the first 8 UTF-8 bytes pack big-endian into an unsigned 64-bit
  * value (zero-padded — a prefix sorts before every extension, which
  * zero-padding preserves because 0x00 is the smallest byte), then
  * XOR Long.MinValue so the SIGNED long order equals the string's
  * binary order — exactly the unsigned→signed mapping [[ZOrderLong]]
  * undoes before interleaving. Strings sharing an 8-byte prefix
  * collapse to one curve cell (they stay adjacent; footer string
  * min/max — which the object format already truncates with the same
  * prefix discipline — still prunes on the full value). */
case class StringPrefixLong(child: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "zorder_prefix"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def foldable: Boolean = child.foldable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Long.box(StringPrefixLong.code(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = child.genCode(ctx)
    val code =
      code"""
        |${e.code}
        |boolean ${ev.isNull} = ${e.isNull};
        |long ${ev.value} = 0L;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.StringPrefixLong.code(${e.value});
        |}
       """.stripMargin
    ev.copy(code = code,
      isNull = if (nullable) ev.isNull else FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): StringPrefixLong =
    copy(child = newChildren.head)
}

object StringPrefixLong {
  /** Big-endian pack of the first 8 UTF-8 bytes (zero-padded), XOR
    * Long.MinValue: signed order == binary string order. Shared by
    * eval, codegen, and the spec's reference model. */
  def code(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = s.getBytes
    var v = 0L
    var i = 0
    val n = math.min(8, b.length)
    while (i < n) { v |= (b(i) & 0xffL) << (56 - 8 * i); i += 1 }
    v ^ Long.MinValue
  }
}

/** Per-dimension Z-curve normalization — maps a key into its
  * dimension's observed [min, max] range rescaled to ≤16 bits:
  * `((v ^ MIN_VALUE) - uMin) >>> shift` in PLAIN Java arithmetic
  * (wrapping subtraction of unsigned bit patterns — deliberately
  * outside ANSI overflow semantics, the quantities are bit patterns,
  * not SQL numbers). Without this, dimensions whose values vary at
  * different bit positions (a 3-char string prefix code varies in
  * bits 8–23; a 0–99 integer in bits 57–63) interleave uselessly —
  * the curve degenerates to a lexicographic sort on whichever
  * dimension owns the higher bits. Rescaled, every dimension varies
  * in the same low 16 bits and the curve forms real hyper-rectangles.
  * (The same reason lakehouse OPTIMIZE…ZORDER implementations rank
  * or range-bucket each column first.) uMin/shift are write-time
  * constants from one stats pass over the input — the runstats
  * discipline applied to layout. */
case class ZNormLong(child: Expression, uMin: Long, shift: Int)
    extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "zorder_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got " +
        child.dataType.catalogString)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Long.box(ZNormLong.norm(v.asInstanceOf[Long], uMin, shift))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = child.genCode(ctx)
    val code =
      code"""
        |${e.code}
        |boolean ${ev.isNull} = ${e.isNull};
        |long ${ev.value} = 0L;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.ZNormLong.norm(
        |    ${e.value}, ${uMin}L, $shift);
        |}
       """.stripMargin
    ev.copy(code = code,
      isNull = if (nullable) ev.isNull else FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZNormLong =
    copy(child = newChildren.head)
}

object ZNormLong {
  /** shift ≥ 0 compresses a wide range down to 16 bits; shift < 0
    * EXPANDS a narrow range up (left shift — order-preserving), so
    * every dimension occupies the SAME 16-bit window and no
    * dimension's varying bits dominate another's in the interleave. */
  def norm(v: Long, uMin: Long, shift: Int): Long = {
    val d = (v ^ Long.MinValue) - uMin
    if (shift >= 0) d >>> shift else d << -shift
  }

  /** (uMin, shift) for a dimension with signed [min, max]: the range
    * lands exactly in [0, 2^16). */
  def params(min: Long, max: Long): (Long, Int) = {
    val uMin = min ^ Long.MinValue
    val range = (max ^ Long.MinValue) - uMin // unsigned-diff bit pattern
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(range)
    (uMin, bits - 16)
  }
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
    * `cols` (integral/date/timestamp — and STRING, which rides the
    * curve through its order-preserving 8-byte prefix code). Every
    * dimension is first NORMALIZED to ≤16 bits against its observed
    * [min, max] (one stats pass at layout time — see [[ZNormLong]]:
    * un-normalized, dimensions of different magnitudes interleave
    * uselessly). Nulls sort to the curve origin. One stats pass + one
    * range-exchange + in-partition sort. */
  def zorderWrite(df: DataFrame, tgt: String, cols: Seq[String],
      nObjects: Int): Unit = {
    import org.apache.spark.sql.functions.{max => fmax, min => fmin}
    GraftFunctions.register(df.sparkSession)
    val codes = cols.map { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType =>
          call_function("zorder_prefix", col(c))
        case _ => col(c).cast("long")
      }
    }
    // write-time stats pass: per-dimension signed [min, max] over
    // non-null codes (nulls join the curve at the origin below)
    val statRow = df.select(codes.zipWithIndex.flatMap { case (e, i) =>
      Seq(fmin(e).as(s"mn$i"), fmax(e).as(s"mx$i")) }: _*).collect()(0)
    val z = ZOrderLong.zorder(codes.zipWithIndex.map { case (e, i) =>
      if (statRow.isNullAt(2 * i)) lit(0L) // all-null dimension
      else {
        val (uMin, shift) = ZNormLong.params(
          statRow.getLong(2 * i), statRow.getLong(2 * i + 1))
        coalesce(call_function("zorder_norm", e, lit(uMin), lit(shift)),
          lit(0L))
      }
    }: _*)
    df.withColumn("_graft_z", z)
      .repartitionByRange(nObjects, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.format("graft-objects").mode("overwrite").save(tgt)
  }
}
