package graft.catalog

import scala.collection.mutable
import org.apache.spark.sql.types._

import graft.schema.{Attr, DType}

/** One relational column derived from a scalar attribute — the Scala form
  * of the reference's tab-delimited quadruple
  * `UPPER_SNAKE \t SQLTYPE \t dot.path \t jsType`
  * (/root/reference/src/lib/sqlMetadata.ts:85-91).
  */
final case class ColumnSpec(
    sqlName: String,   // UPPER_SNAKE
    sqlType: String,   // reference SQL Server type (golden-test parity)
    jsonPath: String,  // logical dot path from root (reference addressing)
    dType: DType,      // inferred doc type
) {
  /** Spark lake type per SURVEY.md §1.4: numbers stay text (lexical
    * fidelity), dates become timestamps, booleans become 0/1 ints. */
  def sparkType: DataType = dType match {
    case DType.Int  => IntegerType
    case DType.Num  => StringType // VARCHAR(38) in the reference
    case DType.Date => TimestampType
    case DType.Bool => IntegerType
    case _          => StringType
  }
  /** The reference's rendered column string (sqlMetadata.ts:85-91),
    * including the 30-char padding — sorting these strings is how the
    * reference orders columns, so we sort the same rendering. */
  def rendered: String =
    s"${ColumnSpec.pad30(sqlName)}\t${ColumnSpec.pad30(sqlType)}\t$jsonPath\t${dType.tag}"
  def leafName: String = jsonPath.substring(jsonPath.lastIndexOf('.') + 1)
}
object ColumnSpec {
  def pad30(s: String): String = if (s.length >= 30) s else s + " " * (30 - s.length)
}

/** One step from the root document down to a nested table's object node. */
final case class PathStep(attrName: String, isArray: Boolean)

/** One relational table — the reference's catalog entry
  * (/root/reference/src/lib/sqlMetadata.ts:161-191).
  *
  * @param attrName   the attribute name keying the catalog (JS object key)
  * @param tableToken UPPER_SNAKE of this node alone
  * @param fullName   ancestor-joined table name, 125-char cap
  *                   (sqlDDL.ts:385-397)
  * @param tablePk    "ID" if the node has an id column, else "AI"
  * @param fkColumns  one per ancestor table, nearest first; names capped at
  *                   30 chars (sqlMetadata.ts:97-136)
  * @param path       steps from the root doc to this node (flatten recipe)
  */
final case class TableSpec(
    attrName: String,
    tableToken: String,
    fullName: String,
    tablePk: String,
    parentName: String,
    parentTable: String,
    parentTablePk: String,
    columns: Seq[ColumnSpec],
    fkColumns: Seq[ColumnSpec],
    path: Seq[PathStep],
) {
  def isRoot: Boolean = parentName.isEmpty
  /** Composite merge/PK key: reversed FK chain (outermost first) + own PK
    * (sqlDDL.ts:335-354). */
  def keyColumns: Seq[String] = fkColumns.reverse.map(_.sqlName) :+ tablePk
  /** Lake schema: key columns first (non-null), then data columns that are
    * not already keys. */
  def schema: StructType = {
    val fks = fkColumns.reverse.map(f =>
      StructField(f.sqlName, f.sparkType, nullable = false))
    val pkType = if (tablePk == "AI") IntegerType else StringType
    val pk = StructField(tablePk, pkType, nullable = false)
    val dataCols = columns
      .filterNot(c => c.sqlName == tablePk || fkColumns.exists(_.sqlName == c.sqlName))
      .map(c => StructField(c.sqlName, c.sparkType, nullable = true))
    StructType((fks :+ pk) ++ dataCols)
  }
}

/** Derives the relational catalog from an inferred attribute tree —
  * findTables/findColumns/findFkColumns/findParentTable
  * (/root/reference/src/lib/sqlMetadata.ts:61-274) re-expressed as a
  * recursion that carries the ancestor chain explicitly (the reference
  * climbs `parent` pointers with a 3-level cap and a `patent` typo at
  * sqlMetadata.ts:245 — effectively depth-2; the explicit chain agrees at
  * every depth the reference can reach and keeps working deeper).
  */
object Catalog {
  val NameLimit     = 128 // sqlDDL.ts:21; effective cap nameLimit-3 = 125
  val FkNameLimit   = 30  // sqlMetadata.ts:126
  val ArrayIndexCol = "AI"

  /** sqlDataType (sqlMetadata.ts:27-59). */
  def sqlDataType(d: DType, maxLength: Long): String = d match {
    case DType.Int  => "INT"
    case DType.Num  => "VARCHAR(38)" // JS numbers stored as text
    case DType.Date => "DATETIMEOFFSET"
    case DType.Bool => "INT"
    case _ =>
      if (maxLength <= 8) "VARCHAR(8)"
      else if (maxLength <= 80) "VARCHAR(80)"
      else if (maxLength <= 800) "VARCHAR(800)"
      else if (maxLength <= 8000) "VARCHAR(8000)"
      else if (maxLength <= 2147483647L) "VARCHAR(MAX)"
      else throw new IllegalArgumentException(
        "2,147,483,647 characters is the maximum size allowed at this time")
  }

  /** findColumns (sqlMetadata.ts:61-95): scalar children → sorted columns;
    * AI dropped when an ID column exists (sqlMetadata.ts:81-84); columns
    * with unknown type (never seen non-null) are skipped entirely. */
  def findColumns(node: Attr, dotName: String): Seq[ColumnSpec] = {
    val scalars = node.attributes.values.filter(a => DType.isScalar(a.dataType)).toSeq
    val hasId = scalars.exists(_.upperSnake == "ID")
    val cols = scalars
      .filterNot(a => hasId && a.upperSnake == ArrayIndexCol)
      .map { a =>
        ColumnSpec(a.upperSnake, sqlDataType(a.dataType, a.maxLength),
          s"$dotName.${a.name}", a.dataType)
      }
    // sort by the reference's rendered padded string (sqlMetadata.ts:191)
    val sorted = cols.sortBy(_.rendered)
    // divergence guard: a doc carrying BOTH id and _id would yield two ID
    // columns in the reference (broken DDL there too); keep the first
    sorted.foldLeft(Vector.empty[ColumnSpec]) { (acc, c) =>
      if (acc.exists(_.sqlName == c.sqlName)) acc else acc :+ c
    }
  }

  private final case class RawTable(
      attrName: String,
      node: Attr,
      parentName: String,
      parentTable: String,
      parentTablePk: String,
      dotName: String,
      path: Seq[PathStep],
  )

  /** Full catalog derivation. Returns tables in the reference's discovery
    * order (depth-first over attribute insertion order, root first). */
  def fromTree(root: Attr): Seq[TableSpec] = {
    val raw = mutable.LinkedHashMap.empty[String, RawTable]

    // findParentTable: nearest ancestor object node with a different name
    def resolveParent(chain: List[Attr], self: Attr): Option[Attr] =
      chain.find(a => a.dataType == DType.Obj && a.name != self.name)

    def walk(node: Attr, chain: List[Attr], path: Seq[PathStep]): Unit = {
      node.attributes.values.foreach { a =>
        val isObj = a.dataType == DType.Obj
        val isArr = a.dataType == DType.Arr
        if (isObj) {
          val parent = resolveParent(chain, a)
          val parentName = parent.map(_.name).getOrElse("")
          val parentTable = parent.map(_.upperSnake).getOrElse("")
          val parentPk = parent.map { p =>
            if (p.attributes.contains("id") || p.attributes.contains("_id")) "ID"
            else ArrayIndexCol
          }.getOrElse("")
          val step = PathStep(a.name, isArray = chain.headOption.exists(_.name == a.name))
          // dot path: logical ancestor chain (root included, arrays counted
          // once) — matches the parentDotName walk at sqlMetadata.ts:172-183
          val newPath = if (step.isArray) path else path :+ step
          raw.put(a.name, RawTable(a.name, a, parentName, parentTable,
            parentPk, "", newPath))
          walk(a, a :: chain, newPath)
        } else if (isArr) {
          // the element node (same name) carries the object type; mark the
          // step as an array for the flattener
          val elemPath = path :+ PathStep(a.name, isArray = true)
          walk(a, a :: chain, elemPath)
        } else if (a.attributes.nonEmpty) {
          walk(a, a :: chain, path)
        }
      }
    }

    walk(root, List(root), Vector.empty)

    // dot-name prefix per table: ancestor names joined, root-first
    def dotName(t: RawTable): String = {
      var segs = List(t.attrName)
      var p = t.parentName
      var guard = 0
      while (p.nonEmpty && guard < 99) {
        segs = p :: segs
        p = raw.get(p).map(_.parentName).getOrElse("")
        guard += 1
      }
      segs.mkString(".")
    }

    val withCols = raw.values.toSeq.map { t =>
      val cols = findColumns(t.node, dotName(t))
      val pk = if (cols.exists(_.sqlName == "ID")) "ID" else ArrayIndexCol
      (t, cols, pk)
    }
    val byName = withCols.map { case (t, c, pk) => t.attrName -> ((t, c, pk)) }.toMap

    // findFkColumns (sqlMetadata.ts:97-136): one FK per ancestor table,
    // nearest first, name = <ANCESTOR_TABLE>_<PK> capped at 30 chars
    def fksFor(t: RawTable): Seq[ColumnSpec] = {
      val out = Vector.newBuilder[ColumnSpec]
      var cur = t.parentName
      var guard = 0
      while (cur.nonEmpty && guard < 99) {
        byName.get(cur) match {
          case Some((anc, ancCols, _)) =>
            val pkCol = ancCols.find(_.sqlName == "ID")
              .orElse(ancCols.find(_.sqlName == ArrayIndexCol))
            pkCol.foreach { c =>
              val fkName = (s"${anc.node.upperSnake}_${c.sqlName}").take(FkNameLimit)
              out += ColumnSpec(fkName, c.sqlType, c.jsonPath, c.dType)
            }
            cur = anc.parentName
          case None => cur = ""
        }
        guard += 1
      }
      out.result()
    }

    // createTableName (sqlDDL.ts:385-397)
    def fullName(t: RawTable): String = {
      var result = t.node.upperSnake
      var p = t.parentName
      var guard = 0
      while (p.nonEmpty && guard < 99) {
        byName.get(p) match {
          case Some((anc, _, _)) =>
            result = s"${anc.node.upperSnake}_$result"
            p = anc.parentName
          case None => p = ""
        }
        guard += 1
      }
      result.take(NameLimit - 3)
    }

    withCols.map { case (t, cols, pk) =>
      TableSpec(
        attrName = t.attrName,
        tableToken = t.node.upperSnake,
        fullName = fullName(t),
        tablePk = pk,
        parentName = t.parentName,
        parentTable = t.parentTable,
        parentTablePk = t.parentTablePk,
        columns = cols,
        fkColumns = fksFor(t),
        path = t.path,
      )
    }
  }
}
