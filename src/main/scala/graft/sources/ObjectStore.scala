package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, File, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{DateTimeUtils, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom-storage object layout + DataSource V2 read path (SURVEY §1.1,
  * §4.2(3) — the reference's data model made real on Spark).
  *
  * The reference stores each table as many self-describing storage
  * objects named `<table>.<seq>`, each carrying its own schema and an
  * object-local index, and evaluates select/project INSIDE the storage
  * node so only matching bytes travel to the client. This module is
  * that architecture as a Spark DSv2 source:
  *
  *  - an object = one `<table>.<seq>` file: header (magic + schema DDL),
  *    row-major encoded rows (the analog of the reference's flatbuffer
  *    rows), and a footer with row count + per-column min/max stats
  *    (the analog of the reference's object-level index);
  *  - `GraftObjectSource` (`format("graft-objects")`) implements
  *    `TableProvider` → `SupportsRead` → `ScanBuilder` with BOTH
  *    `SupportsPushDownFilters` and `SupportsPushDownRequiredColumns`:
  *    accepted predicates are evaluated inside the reader before a row
  *    is ever surfaced (the `--use-cls` path), and object-level stats
  *    prune whole objects from `planInputPartitions` (the object
  *    index); rejected predicates fall back to Spark (the client-side
  *    path) — the same split the reference makes;
  *  - one object = one `InputPartition` = one task: fan-out is
  *    object-granular exactly like the reference's per-object reads.
  *
  * 100 TB posture: `planInputPartitions` lists objects and reads ONLY
  * footers (driver-side metadata, ~bytes per object); all row work is
  * executor-side, one object per task, embarrassingly parallel. Row
  * decode is allocation-light (single pass over a byte buffer).
  * Column pruning here cuts deserialization + downstream width (the
  * layout is row-major like the reference's fbx rows — the reference
  * also projects inside the storage server rather than laying data
  * out columnar).
  */
object ObjectFormat {
  val Magic = 0x474F424A // "GOBJ"
  val Version = 1

  /** Which types get footer min/max stats (numeric + timestamp). */
  private def statable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  final case class ColStats(min: Double, max: Double, hasNull: Boolean)
  final case class Footer(rowCount: Int, stats: Map[String, ColStats])

  /** Streaming encoder: add rows (external Row from ingest, or
    * InternalRow from the DSv2 writer), then `finish(path)` writes
    * header + body + stats footer. */
  final class ObjectEncoder(schema: StructType) {
    private val body = new ByteArrayOutputStream(1 << 20)
    private val out = new DataOutputStream(body)
    private val n = schema.length
    private val mins = Array.fill(n)(Double.PositiveInfinity)
    private val maxs = Array.fill(n)(Double.NegativeInfinity)
    private val nulls = Array.fill(n)(false)
    private val nans = Array.fill(n)(false)
    private var count = 0

    private def stat(i: Int, v: Double): Unit = {
      // NaN never updates < / > comparisons, yet Spark orders NaN above
      // every double — min/max stats that ignored NaN would let the
      // object-skip logic wrongly prune objects whose only matches are
      // NaN rows. A NaN sighting disables stats for the column.
      if (v.isNaN) nans(i) = true
      if (v < mins(i)) mins(i) = v
      if (v > maxs(i)) maxs(i) = v
    }
    private def put(i: Int, dt: DataType, value: Any): Unit = dt match {
      case LongType | TimestampNTZType | TimestampType =>
        val v = value.asInstanceOf[Long]
        out.writeLong(v); stat(i, v.toDouble)
      case IntegerType =>
        val v = value.asInstanceOf[Int]
        out.writeInt(v); stat(i, v.toDouble)
      case DoubleType =>
        val v = value.asInstanceOf[Double]
        out.writeDouble(v); stat(i, v)
      case FloatType =>
        val v = value.asInstanceOf[Float]
        out.writeFloat(v); stat(i, v.toDouble)
      case StringType =>
        val b = value.asInstanceOf[Array[Byte]]
        out.writeInt(b.length); out.write(b)
      case ArrayType(FloatType, _) =>
        val a = value.asInstanceOf[Array[Float]]
        out.writeInt(a.length); a.foreach(out.writeFloat)
      case BooleanType => out.writeBoolean(value.asInstanceOf[Boolean])
      case other => throw new UnsupportedOperationException(
        s"graft-objects codec: unsupported type $other")
    }

    /** presence flags (1 byte/field; a packed bitmap is the obvious
      * compaction, skipped for codec readability) */
    private def addVia(isNull: Int => Boolean, value: Int => Any): Unit = {
      var i = 0
      while (i < n) { out.writeBoolean(!isNull(i)); i += 1 }
      i = 0
      while (i < n) {
        if (!isNull(i)) put(i, schema(i).dataType, value(i))
        else nulls(i) = true
        i += 1
      }
      count += 1
    }

    def addExternal(row: Row): Unit =
      addVia(row.isNullAt, { i =>
        schema(i).dataType match {
          case TimestampNTZType => DateTimeUtils.localDateTimeToMicros(
            row.getAs[java.time.LocalDateTime](i))
          case TimestampType => row.getAs[Any](i) match {
            case t: java.sql.Timestamp => DateTimeUtils.fromJavaTimestamp(t)
            case t: java.time.Instant  => DateTimeUtils.instantToMicros(t)
          }
          case StringType => row.getString(i).getBytes("UTF-8")
          case ArrayType(FloatType, _) => row.get(i) match {
            case a: Array[Float] => a
            case s: scala.collection.Seq[_] =>
              s.map(_.asInstanceOf[Float]).toArray
          }
          case _ => row.get(i)
        }
      })

    def addInternal(row: InternalRow): Unit =
      addVia(row.isNullAt, { i =>
        schema(i).dataType match {
          case LongType | TimestampNTZType | TimestampType => row.getLong(i)
          case IntegerType => row.getInt(i)
          case DoubleType => row.getDouble(i)
          case FloatType => row.getFloat(i)
          case StringType => row.getUTF8String(i).getBytes
          case ArrayType(FloatType, _) => row.getArray(i).toFloatArray()
          case BooleanType => row.getBoolean(i)
          case other => throw new UnsupportedOperationException(other.toString)
        }
      })

    def finish(path: String): Int = {
      out.flush()
      val file = new DataOutputStream(new FileOutputStream(path))
      file.writeInt(Magic); file.writeInt(Version)
      file.writeUTF(schema.toDDL)
      val bodyBytes = body.toByteArray
      file.writeInt(bodyBytes.length)
      file.write(bodyBytes)
      file.writeInt(count)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        val has = statable(f.dataType) && mins(i) <= maxs(i) && !nans(i)
        file.writeBoolean(has)
        if (has) { file.writeDouble(mins(i)); file.writeDouble(maxs(i)) }
        file.writeBoolean(nulls(i))
      }
      // body CRC32 — verified by verifyObject (scrub), not at planning
      val crc = new java.util.zip.CRC32()
      crc.update(bodyBytes)
      file.writeLong(crc.getValue)
      file.close()
      count
    }
  }

  /** Encode one partition of external Rows into a `<table>.<seq>` file. */
  def writeObject(path: String, schema: StructType, rows: Iterator[Row]): Int = {
    val enc = new ObjectEncoder(schema)
    rows.foreach(enc.addExternal)
    enc.finish(path)
  }

  def readSchema(path: String): StructType = {
    val in = new DataInputStream(Files.newInputStream(Paths.get(path)))
    try {
      require(in.readInt() == Magic, s"$path: not a graft object")
      require(in.readInt() == Version, s"$path: bad version")
      StructType.fromDDL(in.readUTF())
    } finally in.close()
  }

  /** Footer-only read: header (to size the skip) + trailing stats. */
  def readFooter(path: String): Footer = {
    val in = new DataInputStream(Files.newInputStream(Paths.get(path)))
    try {
      require(in.readInt() == Magic, s"$path: not a graft object")
      in.readInt()
      val schema = StructType.fromDDL(in.readUTF())
      val bodyLen = in.readInt()
      in.skipBytes(bodyLen)
      val count = in.readInt()
      val stats = schema.fields.map { f =>
        val has = in.readBoolean()
        val st =
          if (has) {
            val mn = in.readDouble(); val mx = in.readDouble()
            val hn = in.readBoolean()
            Some(ColStats(mn, mx, hn))
          } else { in.readBoolean(); None }
        f.name -> st
      }.collect { case (n, Some(s)) => n -> s }.toMap
      Footer(count, stats)
    } finally in.close()
  }

  /** Integrity scrub (the reference's object-checksum discipline):
    * recompute the body CRC32 and compare with the footer's. Kept OUT
    * of planInputPartitions — planning reads footers only; scrubbing
    * reads bodies and is a maintenance pass. */
  def verifyObject(path: String): Boolean =
    try {
      val in = new DataInputStream(Files.newInputStream(Paths.get(path)))
      try {
        if (in.readInt() != Magic || in.readInt() != Version) return false
        val schema = StructType.fromDDL(in.readUTF())
        val bodyLen = in.readInt()
        val body = new Array[Byte](bodyLen)
        in.readFully(body)
        in.readInt() // rowCount
        schema.fields.foreach { f =>
          if (in.readBoolean()) { in.readDouble(); in.readDouble() }
          in.readBoolean()
        }
        val stored = in.readLong()
        val crc = new java.util.zip.CRC32()
        crc.update(body)
        crc.getValue == stored
      } finally in.close()
    } catch { case _: Exception => false }

  /** Can `filter` (an accepted pushdown) possibly match an object with
    * these stats? False ⇒ the whole object is skipped (object index). */
  def mightMatch(filter: Filter, stats: Map[String, ColStats]): Boolean = {
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    filter match {
      case EqualTo(a, v) => (stats.get(a), num(v)) match {
        case (Some(s), Some(d)) => d >= s.min && d <= s.max
        case _ => true
      }
      case GreaterThan(a, v) => (stats.get(a), num(v)) match {
        case (Some(s), Some(d)) => s.max > d
        case _ => true
      }
      case GreaterThanOrEqual(a, v) => (stats.get(a), num(v)) match {
        case (Some(s), Some(d)) => s.max >= d
        case _ => true
      }
      case LessThan(a, v) => (stats.get(a), num(v)) match {
        case (Some(s), Some(d)) => s.min < d
        case _ => true
      }
      case LessThanOrEqual(a, v) => (stats.get(a), num(v)) match {
        case (Some(s), Some(d)) => s.min <= d
        case _ => true
      }
      case In(a, vs) => stats.get(a) match {
        case Some(s) =>
          val ds = vs.flatMap(num)
          ds.isEmpty || ds.exists(d => d >= s.min && d <= s.max)
        case _ => true
      }
      case IsNull(a) => stats.get(a).forall(_.hasNull)
      case And(l, r) => mightMatch(l, stats) && mightMatch(r, stats)
      case _ => true
    }
  }
}

/** Distributed ingest: raw parquet fixtures → the object layout.
  * One Spark task writes one `<table>.<seq>` object (the reference's
  * fbwriter, as a Spark job). */
object ObjectStoreIngest {
  val defaultObjects: Map[String, Int] = Map(
    "lineitem" -> 8, "orders" -> 4, "events" -> 4, "documents" -> 4,
    "embeddings" -> 2, "customer" -> 2, "part" -> 2).withDefaultValue(1)

  def ingest(spark: SparkSession, sfDir: String, outRoot: String,
      objects: Map[String, Int] = defaultObjects): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.Tables.names.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .repartition(objects(t))
        .write.format("graft-objects").mode("overwrite")
        .save(s"$outRoot/$t")
    }
  }
}

/** Object-store maintenance (SURVEY §2.11 compaction/merge): rewrite a
  * table's many small objects into `target` larger ones — a DSv2 read
  * (all pushdown machinery available) into a DSv2 truncate-write that
  * renames the new generation in only after it is fully staged. The
  * reference runs the same op storage-side to merge small ingest
  * objects. */
object ObjectStoreMaintenance {
  def compact(spark: SparkSession, dir: String, target: Int): Unit =
    spark.read.format("graft-objects").load(dir)
      .repartition(target)
      .write.format("graft-objects").mode("overwrite").save(dir)
}

/** `spark.read.format("graft-objects").load(dir)` — see ObjectFormat. */
class GraftObjectSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-objects"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-objects: .load(path) is required")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = pathOf(options)
    val first = GraftObjectTable.listObjects(dir).headOption
      .getOrElse(throw new IllegalArgumentException(s"$dir: no objects"))
    ObjectFormat.readSchema(first)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftObjectTable(schema, properties.get("path"))
}

object GraftObjectTable {
  /** `<table>.<seq>` files, seq-sorted — the object naming contract. */
  def listObjects(dir: String): Seq[String] = {
    val d = new File(dir)
    val name = d.getName
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.matches(
        java.util.regex.Pattern.quote(name) + "\\.\\d+"))
      .sortBy(f => f.getName.substring(name.length + 1).toInt)
      .map(_.getPath).toSeq
  }
}

class GraftObjectTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-objects:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableSchema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(info.schema(), path)
}

/** DSv2 write: each task encodes its partition into a staged object;
  * commit sequences the staged files into `<table>.<seq>` names
  * (rename within one directory — atomic on a shared FS/object store
  * with atomic rename; at 100 TB this is the same one-object-per-task
  * write fan-out as the reference's loader). `overwrite` (TRUNCATE)
  * clears the previous generation at commit time, after every staged
  * object is durable. */
class GraftWriteBuilder(writeSchema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftBatchWrite(writeSchema, path, doTruncate)
    /** Streaming write: each micro-batch epoch commits its staged
      * objects onto the tail of the `<table>.<seq>` sequence — which is
      * exactly what makes the table readable as a stream (offset =
      * object count): a writeStream into the object store composes with
      * a readStream out of it. Exactly-once at the object level comes
      * from the staged-rename commit; epoch replays after a failure
      * re-stage and re-commit idempotently named epochs... kept simple
      * here: append-only, epoch commits are sequential. */
    override def toStreaming:
        org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new GraftStreamingWrite(writeSchema, path)
  }
}

case class GraftStagedObject(stagedPath: String) extends WriterCommitMessage

class GraftBatchWrite(writeSchema: StructType, path: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new File(path).mkdirs()
    // APPEND must match the table's existing schema: objects are
    // self-describing, but one table = one schema (readers take the
    // first object's header as the table contract)
    if (!truncate) {
      GraftObjectTable.listObjects(path).headOption.foreach { first =>
        val existing = ObjectFormat.readSchema(first)
        require(existing.toDDL == writeSchema.toDDL,
          s"graft-objects append schema mismatch: table has " +
            s"[${existing.toDDL}], write has [${writeSchema.toDDL}]")
      }
    }
    new GraftWriterFactory(writeSchema, path)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    val table = dir.getName
    val existing = GraftObjectTable.listObjects(path)
    if (truncate) existing.foreach(p => new File(p).delete())
    val base = if (truncate) 0 else existing.size
    messages.zipWithIndex.foreach { case (GraftStagedObject(staged), i) =>
      val dst = new File(dir, s"$table.${base + i}")
      if (!new File(staged).renameTo(dst))
        throw new java.io.IOException(s"rename $staged -> $dst failed")
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftStagedObject(staged) => new File(staged).delete()
      case _ =>
    }
}

class GraftStreamingWrite(writeSchema: StructType, path: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    new File(path).mkdirs()
    val factory = new GraftWriterFactory(writeSchema, path)
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        factory.createWriter(partitionId, taskId)
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    val table = dir.getName
    val base = GraftObjectTable.listObjects(path).size
    messages.zipWithIndex.foreach { case (GraftStagedObject(staged), i) =>
      val dst = new File(dir, s"$table.${base + i}")
      if (!new File(staged).renameTo(dst))
        throw new java.io.IOException(s"rename $staged -> $dst failed")
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftStagedObject(staged) => new File(staged).delete()
      case _ =>
    }
}

class GraftWriterFactory(writeSchema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val staged = s"$path/_staged_${partitionId}_$taskId"
      private val enc = new ObjectFormat.ObjectEncoder(writeSchema)
      override def write(row: InternalRow): Unit = enc.addInternal(row)
      override def commit(): WriterCommitMessage = {
        enc.finish(staged)
        GraftStagedObject(staged)
      }
      override def abort(): Unit = new File(staged).delete()
      override def close(): Unit = ()
    }
}

class GraftScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  /** A filter is storage-evaluable when it references only codec-typed
    * columns with comparable values; everything else stays client-side
    * (Spark re-evaluates exactly the residual set). */
  private def evaluable(f: Filter): Boolean = f match {
    case EqualTo(a, v) => ok(a, v)
    case GreaterThan(a, v) => ok(a, v)
    case GreaterThanOrEqual(a, v) => ok(a, v)
    case LessThan(a, v) => ok(a, v)
    case LessThanOrEqual(a, v) => ok(a, v)
    case In(a, vs) => vs.forall(ok(a, _))
    case IsNull(a) => has(a)
    case IsNotNull(a) => has(a)
    case And(l, r) => evaluable(l) && evaluable(r)
    case _ => false
  }
  private def has(a: String): Boolean = fullSchema.fieldNames.contains(a)
  private def ok(a: String, v: Any): Boolean = has(a) && (v match {
    case _: Number | _: String => fullSchema(a).dataType match {
      case LongType | IntegerType | DoubleType | FloatType | StringType => true
      case _ => false
    }
    case _ => false
  })

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, residual) = filters.partition(evaluable)
    accepted = acc
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftObjectScan(fullSchema, required, accepted, path)
}

case class GraftObjectPartition(path: String) extends InputPartition

class GraftObjectScan(fullSchema: StructType, readSchema_ : StructType,
    pushed: Array[Filter], path: String)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = readSchema_
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftObjectScan path=$path, " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${readSchema_.catalogString}"

  /** Object pruning = the reference's object-local index: footers only. */
  private lazy val selected: Seq[String] =
    GraftObjectTable.listObjects(path).filter { obj =>
      val footer = ObjectFormat.readFooter(obj)
      footer.rowCount > 0 &&
        pushed.forall(ObjectFormat.mightMatch(_, footer.stats))
    }

  override def planInputPartitions(): Array[InputPartition] =
    selected.map(GraftObjectPartition.apply).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(fullSchema, readSchema_, pushed)

  /** Streaming read: the object sequence IS the offset log. Objects are
    * immutable once committed (staged rename) and appended with
    * monotonically increasing `<seq>`, so a stream offset = "number of
    * objects consumed" and a micro-batch = the newly appeared objects —
    * the reference's append-object model feeding Structured Streaming.
    * Pushed filters and stats pruning apply per batch exactly as in
    * batch reads. */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(fullSchema, readSchema_, pushed, path)

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = selected.map(p => new File(p).length()).sum
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }
}

/** Offset = count of `<table>.<seq>` objects consumed so far. */
case class GraftObjectOffset(objectCount: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = objectCount.toString
}

class GraftMicroBatchStream(fullSchema: StructType, readSchema: StructType,
    pushed: Array[Filter], path: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = GraftObjectOffset(0)
  override def latestOffset(): Offset =
    GraftObjectOffset(GraftObjectTable.listObjects(path).size)
  override def deserializeOffset(json: String): Offset =
    GraftObjectOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftObjectOffset].objectCount
    val e = end.asInstanceOf[GraftObjectOffset].objectCount
    GraftObjectTable.listObjects(path).slice(s, e)
      .filter { obj => // same object-index pruning as the batch path
        val footer = ObjectFormat.readFooter(obj)
        footer.rowCount > 0 &&
          pushed.forall(ObjectFormat.mightMatch(_, footer.stats))
      }
      .map(GraftObjectPartition.apply).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(fullSchema, readSchema, pushed)
}

class GraftReaderFactory(fullSchema: StructType, readSchema: StructType,
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftObjectReader(
      p.asInstanceOf[GraftObjectPartition].path, fullSchema, readSchema, pushed)
}

/** Streams one object: decode row → evaluate pushed filters → project
  * required columns. The select+project happens HERE, storage-side —
  * the reference's in-storage processing. */
class GraftObjectReader(path: String, fullSchema: StructType,
    readSchema: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val in = new DataInputStream(
    new java.io.BufferedInputStream(Files.newInputStream(Paths.get(path)), 1 << 20))
  require(in.readInt() == ObjectFormat.Magic)
  in.readInt()
  in.readUTF()
  private val bodyLen = in.readInt()
  private var consumed = 0L

  private val n = fullSchema.length
  private val fieldIdx = fullSchema.fieldNames.zipWithIndex.toMap
  private val outIdx = readSchema.fieldNames.map(fieldIdx)
  private val present = Array.ofDim[Boolean](n)
  private val values = Array.ofDim[Any](n) // decoded java-level values
  private var current: InternalRow = _

  private def readRow(): Boolean = {
    if (consumed >= bodyLen) return false
    var i = 0
    while (i < n) { present(i) = in.readBoolean(); consumed += 1; i += 1 }
    i = 0
    while (i < n) {
      if (present(i)) {
        fullSchema(i).dataType match {
          case LongType | TimestampNTZType | TimestampType =>
            values(i) = in.readLong(); consumed += 8
          case IntegerType => values(i) = in.readInt(); consumed += 4
          case DoubleType => values(i) = in.readDouble(); consumed += 8
          case FloatType => values(i) = in.readFloat(); consumed += 4
          case StringType =>
            val len = in.readInt(); consumed += 4
            val b = new Array[Byte](len); in.readFully(b); consumed += len
            values(i) = b // defer UTF8String until projected
          case ArrayType(FloatType, _) =>
            val len = in.readInt(); consumed += 4
            val a = new Array[Float](len)
            var k = 0
            while (k < len) { a(k) = in.readFloat(); k += 1 }
            consumed += 4L * len
            values(i) = a
          case BooleanType => values(i) = in.readBoolean(); consumed += 1
          case other => throw new UnsupportedOperationException(other.toString)
        }
      } else values(i) = null
      i += 1
    }
    true
  }

  private def fieldVal(a: String): Any = {
    val i = fieldIdx(a)
    values(i) match {
      case b: Array[Byte] => new String(b, "UTF-8")
      case v => v
    }
  }

  private def eval(f: Filter): Boolean = f match {
    case EqualTo(a, v) => cmp(fieldVal(a), v).contains(0)
    case GreaterThan(a, v) => cmp(fieldVal(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(fieldVal(a), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(fieldVal(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(fieldVal(a), v).exists(_ <= 0)
    case In(a, vs) => vs.exists(v => cmp(fieldVal(a), v).contains(0))
    case IsNull(a) => fieldVal(a) == null
    case IsNotNull(a) => fieldVal(a) != null
    case And(l, r) => eval(l) && eval(r)
    case _ => true
  }

  /** 3VL compare: None when either side is null (predicate is unknown
    * ⇒ row filtered, matching SQL semantics for pushed conjuncts). */
  private def cmp(x: Any, v: Any): Option[Int] = (x, v) match {
    case (null, _) | (_, null) => None
    case (a: Number, b: Number) =>
      Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
    case (a: String, b: String) => Some(a.compareTo(b))
    case _ => None
  }

  override def next(): Boolean = {
    while (readRow()) {
      if (pushed.forall(eval)) {
        val out = new Array[Any](outIdx.length)
        var k = 0
        while (k < outIdx.length) {
          val i = outIdx(k)
          out(k) = fullSchema(i).dataType match {
            case StringType => values(i) match {
              case b: Array[Byte] => UTF8String.fromBytes(b)
              case null => null
            }
            case ArrayType(FloatType, _) => values(i) match {
              case a: Array[Float] =>
                new GenericArrayData(a.map(x => x: Any))
              case null => null
            }
            case _ => values(i)
          }
          k += 1
        }
        current = new GenericInternalRow(out)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
