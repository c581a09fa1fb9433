package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.catalog._
import graft.schema.{DType, Infer, Json}

/** Golden port of the reference's catalog suite
  * (/root/reference/test/unit/lib/sqlMetadata.test.ts:15-220). */
class CatalogSpec extends AnyFunSuite {

  private lazy val tables = Catalog.fromTree(
    Infer.analyzeDocuments("docs", Seq(Json.parse(Fixtures.doc1))))
  private def t(name: String): TableSpec = tables.find(_.attrName == name).get

  test("root table DOCS (sqlMetadata.test.ts:40-64)") {
    val d = t("docs")
    assert(d.tableToken == "DOCS")
    assert(d.fullName == "DOCS")
    assert(d.tablePk == "ID")
    assert(d.parentName == "" && d.parentTable == "" && d.parentTablePk == "")
    assert(d.columns.map(_.sqlName) ==
      Seq("A_BOOLEAN", "A_DATE", "A_NUMBER", "A_STRING", "ID", "REV"))
    assert(d.columns.map(_.sqlType) == Seq("INT", "DATETIMEOFFSET",
      "VARCHAR(38)", "VARCHAR(80)", "VARCHAR(8)", "VARCHAR(80)"))
    assert(d.fkColumns.isEmpty)
    assert(d.keyColumns == Seq("ID"))
  }

  test("AN_OBJECT_WITH_NO_ID: AI pk, AI column kept (sqlMetadata.test.ts:66-93)") {
    val o = t("anObjectWithNoId")
    assert(o.tableToken == "AN_OBJECT_WITH_NO_ID")
    assert(o.fullName == "DOCS_AN_OBJECT_WITH_NO_ID")
    assert(o.tablePk == "AI")
    assert(o.parentName == "docs" && o.parentTable == "DOCS" && o.parentTablePk == "ID")
    assert(o.columns.map(_.sqlName) ==
      Seq("AI", "A_BOOLEAN", "A_DATE", "A_NUMBER", "A_STRING"))
    assert(o.fkColumns.map(_.sqlName) == Seq("DOCS_ID"))
    assert(o.keyColumns == Seq("DOCS_ID", "AI"))
  }

  test("AN_OBJECT_WITH_AN_ID: ID pk, AI dropped (sqlMetadata.test.ts:95-122)") {
    val o = t("anObjectWithAnId")
    assert(o.tablePk == "ID")
    assert(o.fullName == "DOCS_AN_OBJECT_WITH_AN_ID")
    assert(o.columns.map(_.sqlName) ==
      Seq("A_BOOLEAN", "A_DATE", "A_NUMBER", "A_STRING", "ID"))
    assert(o.fkColumns.map(_.sqlName) == Seq("DOCS_ID"))
  }

  test("2-level nesting: AN_OBJECT_WITHIN_AN_OBJECT fk chain (sqlMetadata.test.ts:124-152)") {
    val o = t("anObjectWithinAnObject")
    assert(o.tablePk == "ID")
    assert(o.parentName == "anObjectWithAnId")
    assert(o.parentTable == "AN_OBJECT_WITH_AN_ID")
    assert(o.parentTablePk == "ID")
    assert(o.fullName == "DOCS_AN_OBJECT_WITH_AN_ID_AN_OBJECT_WITHIN_AN_OBJECT")
    assert(o.fkColumns.map(_.sqlName) == Seq("AN_OBJECT_WITH_AN_ID_ID", "DOCS_ID"))
    assert(o.keyColumns == Seq("DOCS_ID", "AN_OBJECT_WITH_AN_ID_ID", "ID"))
  }

  test("AN_ARRAY_WITH_NO_IDS: AI pk from posexplode (sqlMetadata.test.ts:154-181)") {
    val o = t("anArrayWithNoIds")
    assert(o.tablePk == "AI")
    assert(o.parentName == "docs")
    assert(o.fullName == "DOCS_AN_ARRAY_WITH_NO_IDS")
    assert(o.columns.map(_.sqlName) ==
      Seq("AI", "A_BOOLEAN", "A_DATE", "A_NUMBER", "A_STRING"))
    assert(o.fkColumns.map(_.sqlName) == Seq("DOCS_ID"))
    assert(o.path == Seq(PathStep("anArrayWithNoIds", isArray = true)))
  }

  test("AN_ARRAY_WITH_IDS: ID pk (sqlMetadata.test.ts:168-196)") {
    val o = t("anArrayWithIds")
    assert(o.tablePk == "ID")
    assert(o.parentName == "docs")
    assert(o.columns.map(_.sqlName) ==
      Seq("A_BOOLEAN", "A_DATE", "A_NUMBER", "A_STRING", "ID"))
    assert(o.fkColumns.map(_.sqlName) == Seq("DOCS_ID"))
  }

  test("object inside array element: 2-level fk chain (sqlMetadata.test.ts:198-218)") {
    val o = t("anObjectWithinAnObjectInAnArray")
    assert(o.tablePk == "ID")
    assert(o.parentName == "anArrayWithIds")
    assert(o.parentTable == "AN_ARRAY_WITH_IDS")
    assert(o.parentTablePk == "ID")
    assert(o.fkColumns.map(_.sqlName) == Seq("AN_ARRAY_WITH_IDS_ID", "DOCS_ID"))
    assert(o.fullName ==
      "DOCS_AN_ARRAY_WITH_IDS_AN_OBJECT_WITHIN_AN_OBJECT_IN_AN_ARRAY")
    assert(o.path == Seq(PathStep("anArrayWithIds", isArray = true),
      PathStep("anObjectWithinAnObjectInAnArray", isArray = false)))
  }

  test("catalog is exactly the 7 golden tables, root first") {
    assert(tables.map(_.attrName) == Seq("docs", "anObjectWithNoId",
      "anObjectWithAnId", "anObjectWithinAnObject", "anArrayWithNoIds",
      "anArrayWithIds", "anObjectWithinAnObjectInAnArray"))
  }

  test("spark schema: key cols first + types per SURVEY §1.4") {
    val d = t("docs").schema
    assert(d.fields.head.name == "ID" && !d.fields.head.nullable)
    assert(d("A_NUMBER").dataType == StringType)  // text fidelity
    assert(d("A_DATE").dataType == TimestampType)
    assert(d("A_BOOLEAN").dataType == IntegerType)
    val arr = t("anArrayWithNoIds").schema
    assert(arr.fieldNames.take(2).toSeq == Seq("DOCS_ID", "AI"))
    assert(arr("AI").dataType == IntegerType)
  }

  test("VARCHAR tiers + name caps (sqlMetadata.ts:43-56, sqlDDL.ts:396)") {
    assert(Catalog.sqlDataType(DType.Str, 7) == "VARCHAR(8)")
    assert(Catalog.sqlDataType(DType.Str, 79) == "VARCHAR(80)")
    assert(Catalog.sqlDataType(DType.Str, 799) == "VARCHAR(800)")
    assert(Catalog.sqlDataType(DType.Str, 7999) == "VARCHAR(8000)")
    assert(Catalog.sqlDataType(DType.Str, 100000) == "VARCHAR(MAX)")
    intercept[IllegalArgumentException] {
      Catalog.sqlDataType(DType.Str, 3000000000L)
    }
    // FK name 30-char truncation (sqlMetadata.ts:126)
    val o = t("anObjectWithinAnObjectInAnArray")
    assert(o.fkColumns.forall(_.sqlName.length <= 30))
  }

  test("schema evolution: doc2 adds a column, widens a VARCHAR, adds a table (sqlDDL.test.ts:352-370)") {
    val merged = Infer.mergeInto(
      Infer.analyzeDocuments("docs", Seq(Json.parse(Fixtures.doc1))),
      Infer.analyzeDocuments("docs", Seq(Json.parse(Fixtures.doc2))))
    val evolved = Catalog.fromTree(merged)
    val d = evolved.find(_.attrName == "docs").get
    assert(d.columns.map(_.sqlName) == Seq("A_BOOLEAN", "A_DATE",
      "A_NEW_DATE", "A_NUMBER", "A_STRING", "ID", "REV"))
    // aString widened past 80 chars → next tier
    assert(d.columns.find(_.sqlName == "A_STRING").get.sqlType == "VARCHAR(800)")
    val newT = evolved.find(_.attrName == "aNewObject").get
    assert(newT.fullName == "DOCS_AN_OBJECT_WITH_NO_ID_A_NEW_OBJECT")
    assert(newT.tablePk == "ID")
    assert(newT.fkColumns.map(_.sqlName) ==
      Seq("AN_OBJECT_WITH_NO_ID_AI", "DOCS_ID"))
  }
}
