package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.Engine

/** End-to-end smoke CLI: loads the canonical fixture docs through the full
  * engine (infer → catalog → DDL → flatten → merge) into a lake directory
  * and prints every resulting table. Usage:
  *   sbt "runMain graft.tools.Smoke /tmp/graft-smoke"
  */
object Smoke {
  val doc1: String =
    """{"_id":"doc-0001","_rev":"0.rev-0001","aBoolean":true,
      |"aDate":"2020-06-23T12:00:00.000Z","aNumber":31.61705701614879,
      |"aString":"Thirty One Point Six One Seven ...",
      |"anObjectWithNoId":{"aBoolean":false,"aDate":"2020-06-23T12:00:01.000Z","aNumber":2.0,"aString":"Two Point Zero"},
      |"anObjectWithAnId":{"id":"obj-01","aBoolean":true,"aDate":"2020-06-23T12:00:02.000Z","aNumber":3.0,"aString":"Three Point Zero",
      |  "anObjectWithinAnObject":{"id":"obj-02","aBoolean":false,"aDate":"2020-06-23T12:00:03.000Z","aNumber":6.0,"aString":"Six Point Zero"}},
      |"anArrayWithNoIds":[
      |  {"aBoolean":true,"aDate":"2020-06-23T12:00:04.000Z","aNumber":4.0,"aString":"Four Point Zero"},
      |  {"aBoolean":false,"aDate":"2020-06-23T12:00:05.000Z","aNumber":4.2,"aString":"Four Point One"}],
      |"anArrayWithIds":[
      |  {"id":"arr-01","aBoolean":true,"aDate":"2020-06-23T12:00:06.000Z","aNumber":5.0,"aString":"Five Point Zero"},
      |  {"id":"arr-02","aBoolean":false,"aDate":"2020-06-23T12:00:07.000Z","aNumber":5.1,"aString":"Five Point One",
      |   "anObjectWithinAnObjectInAnArray":{"id":"arr-02-obj","aBoolean":true,"aDate":"2020-06-23T12:00:08.000Z","aNumber":7.0,"aString":"Seven Point Zero"}}]
      |}""".stripMargin.replaceAll("\n", "")

  def main(args: Array[String]): Unit = {
    val lakeRoot = args.headOption.getOrElse("/tmp/graft-smoke")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val engine = new Engine(spark, lakeRoot, numBuckets = 8)
    val docs = Seq(doc1).toDF("doc")
    val stats = engine.load("testd2s", docs, "doc", commitTag = "smoke:1")
    println(s"[smoke] load stats: $stats")

    import graft.catalog.Catalog
    val registry = engine.loadRegistry("testd2s").get
    Catalog.fromTree(registry).foreach { t =>
      val df = engine.table(t).read()
      println(s"== ${t.fullName} (pk=${t.tablePk}, keys=${t.keyColumns.mkString(",")}) ==")
      df.orderBy(t.keyColumns.map(org.apache.spark.sql.functions.col): _*)
        .show(20, truncate = false)
    }

    // idempotent re-commit probe: same tag must be a no-op
    val stats2 = engine.load("testd2s", docs, "doc", commitTag = "smoke:1")
    println(s"[smoke] re-commit stats: $stats2")
    val rootName = Catalog.fromTree(registry).find(_.isRoot).get.fullName
    println(s"[smoke] root rows after re-commit: " +
      engine.table(Catalog.fromTree(registry).find(_.isRoot).get).read().count())

    spark.stop()
  }
}
