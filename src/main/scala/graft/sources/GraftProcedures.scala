package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for the storage-layer verbs that have no DML
  * shape (Spark 4 DSv2 ProcedureCatalog — the Iceberg-procedures
  * pattern): branches, retention and version inspection become
  *
  *   CALL graft.system.create_branch('main.orders', 'exp')
  *   CALL graft.system.merge_branch('main.orders', 'exp')
  *   CALL graft.system.list_branches('main.orders')
  *   CALL graft.system.vacuum_table('main.orders', 3)
  *   CALL graft.system.table_version('main.orders')
  *
  * so a SQL-only client operates the full table lifecycle. Each call
  * returns its result as a LocalScan row set (versions, branch
  * listings) — driver-side metadata, never data-path work. Table
  * references are '<namespace>.<table>' strings resolved against the
  * catalog root ('main' when unqualified) — the same layout rule
  * every other catalog path uses. */
object GraftProcedures {

  private val SystemNs = Array("system")

  private val names = Seq("create_branch", "merge_branch", "drop_branch",
    "list_branches", "vacuum_table", "table_version",
    "compact_table", "scrub_table", "delete_mor", "update_mor",
    "table_health", "zorder_table")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(SystemNs))
      names.map(n => Identifier.of(SystemNs, n)).toArray
    else Array.empty

  def load(root: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(SystemNs),
      s"procedures live in the 'system' namespace, got ${ident.namespace().mkString(".")}")
    val dirOf = (table: String) => {
      val parts = table.split('.')
      val path = if (parts.length == 1) Seq(root, "main", table)
        else root +: parts.toSeq
      path.mkString("/")
    }
    ident.name() match {
      case "create_branch" => proc("create_branch",
        Seq("table" -> StringType, "branch" -> StringType),
        StructType(Seq(StructField("branch", StringType),
          StructField("base_version", IntegerType))),
        in => {
          val (t, b) = (str(in, 0), str(in, 1))
          val base = GraftBranches.create(dirOf(t), b)
          Array(row(UTF8String.fromString(b), base))
        })
      case "merge_branch" => proc("merge_branch",
        Seq("table" -> StringType, "branch" -> StringType),
        StructType(Seq(StructField("merged_version", IntegerType))),
        in => Array(row(
          GraftBranches.merge(dirOf(str(in, 0)), str(in, 1)))))
      case "drop_branch" => proc("drop_branch",
        Seq("table" -> StringType, "branch" -> StringType),
        StructType(Seq(StructField("dropped", BooleanType))),
        in => {
          val (t, b) = (str(in, 0), str(in, 1))
          val existed = GraftBranches.exists(dirOf(t), b)
          GraftBranches.drop(dirOf(t), b)
          Array(row(existed))
        })
      case "list_branches" => proc("list_branches",
        Seq("table" -> StringType),
        StructType(Seq(StructField("branch", StringType),
          StructField("base_version", IntegerType))),
        in => GraftBranches.list(dirOf(str(in, 0)))
          .map { case (b, v) => row(UTF8String.fromString(b), v) }.toArray)
      case "vacuum_table" => proc("vacuum_table",
        Seq("table" -> StringType, "keep_from" -> IntegerType),
        StructType(Seq(StructField("vacuumed_through", IntegerType))),
        in => {
          val keep = in.getInt(1)
          GraftVersions.vacuum(dirOf(str(in, 0)), keep)
          Array(row(keep))
        })
      case "table_version" => proc("table_version",
        Seq("table" -> StringType),
        StructType(Seq(StructField("version", IntegerType))),
        in => Array(row(
          GraftVersions.currentVersion(dirOf(str(in, 0))))))
      case "zorder_table" => proc("zorder_table",
        Seq("table" -> StringType, "cols" -> StringType,
          "objects" -> IntegerType),
        StructType(Seq(StructField("objects_before", IntegerType),
          StructField("objects_after", IntegerType),
          StructField("zorder_cols", StringType))),
        in => {
          // OPTIMIZE…ZORDER as a CALL: rewrite the table range-sharded
          // on the normalized Z-curve (string dims ride the prefix
          // code) — one stats pass + one range exchange, a truncate
          // commit like compact_table, so the old layout stays
          // time-travelable
          val d = dirOf(str(in, 0))
          val cols = str(in, 1).split(",").map(_.trim).filter(_.nonEmpty)
          require(cols.nonEmpty, "zorder_table: no columns given")
          val spark = org.apache.spark.sql.SparkSession.active
          val before = GraftObjectTable.listObjects(d).size
          graft.functions.GraftLayout.zorderWrite(
            spark.read.format("graft-objects").load(d), d,
            cols.toSeq, in.getInt(2))
          Array(row(before, GraftObjectTable.listObjects(d).size,
            UTF8String.fromString(cols.mkString(","))))
        })
      case "compact_table" => proc("compact_table",
        Seq("table" -> StringType, "target" -> IntegerType),
        StructType(Seq(StructField("objects_before", IntegerType),
          StructField("objects_after", IntegerType))),
        in => {
          val d = dirOf(str(in, 0))
          val before = GraftObjectTable.listObjects(d).size
          ObjectStoreMaintenance.compact(
            org.apache.spark.sql.SparkSession.active, d, in.getInt(1))
          Array(row(before, GraftObjectTable.listObjects(d).size))
        })
      case "delete_mor" => proc("delete_mor",
        Seq("table" -> StringType, "predicate" -> StringType),
        StructType(Seq(StructField("objects_removed", IntegerType),
          StructField("objects_dv", IntegerType),
          StructField("rows_deleted", LongType))),
        in => {
          val d = dirOf(str(in, 0))
          val f = parseSimplePredicate(str(in, 1))
          val (rm, dv, rows) = ObjectStoreMaintenance.deleteMoR(d, Array(f))
          Array(row(rm, dv, rows))
        })
      case "update_mor" => proc("update_mor",
        Seq("table" -> StringType, "predicate" -> StringType,
          "set_column" -> StringType, "set_value" -> StringType),
        StructType(Seq(StructField("rows_updated", LongType),
          StructField("new_object", StringType))),
        in => {
          val d = dirOf(str(in, 0))
          val f = parseSimplePredicate(str(in, 1))
          val (rows, obj) = ObjectStoreMaintenance.updateMoR(d,
            Array(f), Map(str(in, 2) -> parseLiteral(str(in, 3))))
          Array(row(rows,
            if (obj == null) null else UTF8String.fromString(obj)))
        })
      case "table_health" => proc("table_health",
        Seq("table" -> StringType, "small_bytes" -> IntegerType),
        StructType(Seq(StructField("n_objects", IntegerType),
          StructField("n_rows", LongType),
          StructField("total_bytes", LongType),
          StructField("min_bytes", LongType),
          StructField("avg_bytes", LongType),
          StructField("max_bytes", LongType),
          StructField("n_small", IntegerType),
          StructField("small_share_micro", LongType),
          StructField("n_with_dv", IntegerType))),
        in => {
          // the compaction-advisor readout: object-count/size shape,
          // small-file share against the caller's threshold, and how
          // many objects carry live deletion vectors (merge-on-read
          // debt) — all from footers and file metadata, zero rows
          // decoded
          val d = dirOf(str(in, 0))
          val thresh = in.getInt(1).toLong
          val objs = GraftObjectTable.listObjects(d)
          require(objs.nonEmpty, s"graft-objects: no objects under $d")
          val sizes = objs.map(p => new java.io.File(p).length())
          val rows = objs.map(p =>
            ObjectFormat.readFooter(p).rowCount.toLong).sum
          val small = sizes.count(_ < thresh)
          val dv = objs.count(DeleteVectors.hasValid)
          Array(row(objs.size, rows, sizes.sum, sizes.min,
            sizes.sum / sizes.size, sizes.max, small,
            1000000L * small / sizes.size, dv))
        })
      case "scrub_table" => proc("scrub_table",
        Seq("table" -> StringType),
        StructType(Seq(StructField("n_objects", IntegerType),
          StructField("n_ok", IntegerType),
          StructField("n_corrupt", IntegerType))),
        in => {
          val objs = GraftObjectTable.listObjects(dirOf(str(in, 0)))
          val ok = objs.count(ObjectFormat.verifyObject)
          Array(row(objs.size, ok, objs.size - ok))
        })
      case other =>
        throw new IllegalArgumentException(s"unknown procedure: $other")
    }
  }

  /** `delete_mor`'s predicate grammar: one `col <op> literal` with
    * op ∈ {=, !=, <, <=, >, >=}; literals are 'quoted' strings,
    * integral longs, or decimal doubles. Deliberately tiny — the
    * storage-evaluable contract is enforced downstream, and compound
    * predicates go through SQL DELETE (copy-on-write) instead. */
  private[sources] def parseSimplePredicate(p: String): org.apache.spark.sql.sources.Filter = {
    import org.apache.spark.sql.sources._
    val m = "^\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*(<=|>=|!=|=|<|>)\\s*(.+?)\\s*$".r
    p match {
      case m(col, op, lit) =>
        val v: Any =
          if (lit.startsWith("'") && lit.endsWith("'") && lit.length >= 2)
            lit.substring(1, lit.length - 1)
          else if (lit.matches("-?\\d+")) lit.toLong
          else if (lit.matches("-?\\d*\\.\\d+")) lit.toDouble
          else throw new IllegalArgumentException(
            s"delete_mor: unsupported literal '$lit'")
        op match {
          case "=" => EqualTo(col, v)
          case "!=" => Not(EqualTo(col, v))
          case "<" => LessThan(col, v)
          case "<=" => LessThanOrEqual(col, v)
          case ">" => GreaterThan(col, v)
          case ">=" => GreaterThanOrEqual(col, v)
        }
      case _ => throw new IllegalArgumentException(
        s"delete_mor: predicate must be 'col <op> literal', got: $p")
    }
  }

  /** Same literal grammar as the predicate side: 'quoted' string,
    * integral long, or decimal double. */
  private[sources] def parseLiteral(lit: String): Any =
    if (lit.startsWith("'") && lit.endsWith("'") && lit.length >= 2)
      lit.substring(1, lit.length - 1)
    else if (lit.matches("-?\\d+")) lit.toLong
    else if (lit.matches("-?\\d*\\.\\d+")) lit.toDouble
    else throw new IllegalArgumentException(
      s"update_mor: unsupported literal '$lit'")

  private def str(in: InternalRow, i: Int): String = {
    require(!in.isNullAt(i), s"procedure argument $i must not be NULL")
    in.getUTF8String(i).toString
  }

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray)

  private def proc(pname: String, params: Seq[(String, DataType)],
      out: StructType, body: InternalRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = s"graft storage procedure $pname"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String = s"graft storage procedure $pname"
          override def parameters(): Array[ProcedureParameter] =
            params.map { case (n, t) =>
              ProcedureParameter.in(n, t).build()
            }.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): JIterator[Scan] = {
            val rs = body(input)
            Collections.singletonList[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = rs
              override def readSchema(): StructType = out
            }).iterator()
          }
        }
    }
}
