package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.engine.Engine

/** Nesting beyond the reference's own test depth (its parent resolution
  * effectively caps at depth 2, sqlMetadata.ts:241-255 — our explicit
  * ancestor chain keeps working), plus cross-batch type widening of a
  * column whose Spark storage type changes (bool INT → string). */
class DeepNestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newEngine() =
    new Engine(spark, SparkTestSession.tmpDir("graft-deep-"), numBuckets = 4)

  private val deepDoc =
    """{"_id":"d1","_rev":"r1",
      |"levels":[
      |  {"id":"l1","items":[
      |     {"name":"i1","detail":{"id":"dt1","score":9.5}},
      |     {"name":"i2","detail":{"id":"dt2","score":8.0}}
      |  ]},
      |  {"id":"l2","items":[
      |     {"name":"i3","detail":{"id":"dt3","score":7.0}}
      |  ]}
      |]}""".stripMargin.replaceAll("\n", "")

  test("array → array → object: 4-level tables, full FK chains, AI positions") {
    val e = newEngine()
    e.load("deep", Seq(deepDoc).toDF("doc"), "doc", "t:1")
    val tables = Catalog.fromTree(e.loadRegistry("deep").get)

    val levels = tables.find(_.attrName == "levels").get
    assert(levels.fullName == "DEEP_LEVELS")
    assert(levels.tablePk == "ID")

    val items = tables.find(_.attrName == "items").get
    assert(items.fullName == "DEEP_LEVELS_ITEMS")
    assert(items.tablePk == "AI") // items have no ids → posexplode position
    assert(items.fkColumns.map(_.sqlName) == Seq("LEVELS_ID", "DEEP_ID"))

    val detail = tables.find(_.attrName == "detail").get
    assert(detail.fullName == "DEEP_LEVELS_ITEMS_DETAIL")
    assert(detail.tablePk == "ID")
    assert(detail.fkColumns.map(_.sqlName) ==
      Seq("ITEMS_AI", "LEVELS_ID", "DEEP_ID"))

    val itemRows = e.table(items).read()
      .orderBy("LEVELS_ID", "AI").collect()
    assert(itemRows.map(r => (r.getAs[String]("LEVELS_ID"),
      r.getAs[Int]("AI"), r.getAs[String]("NAME"))).toSeq ==
      Seq(("l1", 0, "i1"), ("l1", 1, "i2"), ("l2", 0, "i3")))

    val detailRows = e.table(detail).read()
      .orderBy("ID").collect()
    // ITEMS_AI inherits the ancestor AI column's INT type (sqlMetadata FK
    // columns copy the ancestor PK's type)
    assert(detailRows.map(r => (r.getAs[String]("ID"),
      r.getAs[Int]("ITEMS_AI"), r.getAs[String]("LEVELS_ID"),
      r.getAs[String]("DEEP_ID"), r.getAs[String]("SCORE"))).toSeq ==
      Seq(("dt1", 0, "l1", "d1", "9.5"), ("dt2", 1, "l1", "d1", "8.0"),
        ("dt3", 0, "l2", "d1", "7.0")))
  }

  test("cross-batch widening changes a column's storage type: bool INT → string") {
    val e = newEngine()
    e.load("w", Seq("""{"_id":"a","_rev":"1","flag":true}""").toDF("doc"),
      "doc", "t:1")
    // second batch: flag arrives as a non-boolean → widens to string
    e.load("w", Seq("""{"_id":"b","_rev":"1","flag":"maybe"}""").toDF("doc"),
      "doc", "t:2")
    val spec = Catalog.fromTree(e.loadRegistry("w").get).find(_.isRoot).get
    assert(spec.columns.find(_.sqlName == "FLAG").get.sparkType ==
      org.apache.spark.sql.types.StringType)
    val rows = e.table(spec).read().orderBy("ID").collect()
    // old file stored INT 1; read under the widened schema casts to "1"
    // (the reference's ALTER COLUMN INT→VARCHAR conversion does the same)
    assert(rows.map(_.getAs[String]("FLAG")).toSeq == Seq("1", "maybe"))
  }

  test("array of scalars is dropped entirely (reference: no table, no column)") {
    val e = newEngine()
    e.load("sc", Seq("""{"_id":"a","_rev":"1","tags":["x","y"],"n":1}""")
      .toDF("doc"), "doc", "t:1")
    val tables = Catalog.fromTree(e.loadRegistry("sc").get)
    assert(tables.size == 1) // root only — no TAGS table
    assert(!tables.head.columns.exists(_.sqlName == "TAGS"))
  }

  test("empty object gains AI table row (JS [] / {} object-branch quirk)") {
    val e = newEngine()
    e.load("eo", Seq("""{"_id":"a","_rev":"1","meta":{}}""").toDF("doc"),
      "doc", "t:1")
    val tables = Catalog.fromTree(e.loadRegistry("eo").get)
    val meta = tables.find(_.attrName == "meta").get
    assert(meta.tablePk == "AI")
    val rows = e.table(meta).read().collect()
    assert(rows.length == 1 && rows.head.getAs[Int]("AI") == 0)
  }
}
