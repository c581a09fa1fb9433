package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftTableFunctions
import graft.lake.LakeTable

/** Table-valued SQL surface (graft_changes / graft_changes_cdf /
  * graft_at / graft_history / graft_metrics): each TVF must return
  * exactly what the corresponding library reader returns — the builders
  * splice the reader's own logical plan, so this pins that the SQL form
  * and the API form are the same computation. */
class TvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("graft_* table functions match the library readers") {
    GraftTableFunctions.registerAllTables(spark)
    val root = SparkTestSession.tmpDir("graft-tvf-")
    val t = new LakeTable(spark, root, "T", numBuckets = 4)
    t.create(StructType(Seq(
      StructField("ID", StringType, nullable = false),
      StructField("V", StringType))), Seq("ID"), "ID")
    t.merge(Seq(("a", "1"), ("b", "1"), ("c", "1")).toDF("ID", "V"),
      Seq("ID"), "ID", "c1")
    val v1 = t.currentVersion()
    val ts1 = t.snapshotAt(v1).timeMs
    t.merge(Seq(("a", "2"), ("d", "1")).toDF("ID", "V"), Seq("ID"), "ID",
      "c2", deleteRootKeys = Some(Seq("b").toDF("ID")))
    val v2 = t.currentVersion()

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted

    // changefeed: SQL == library, and it actually carries the diff
    val sqlChanges = rows(spark.sql(
      s"SELECT ID, V, _change_type FROM graft_changes('$root', 'T', $v1, $v2)"))
    assert(sqlChanges == rows(t.readChangesBetween(v1, v2)
      .select("ID", "V", "_change_type")))
    assert(sqlChanges.size == 3) // a update, d insert, b delete

    // CDF form: the update expands to its image pair
    val sqlCdf = rows(spark.sql(
      s"SELECT ID, V, _change_type FROM graft_changes_cdf('$root', 'T', $v1, $v2)"))
    assert(sqlCdf == rows(t.readChangesBetweenCdf(v1, v2)
      .select("ID", "V", "_change_type")))
    assert(sqlCdf.size == 4)

    // TVFs compose with ordinary SQL (WHERE over the feed)
    val deletesOnly = spark.sql(
      s"SELECT ID FROM graft_changes('$root', 'T', $v1, $v2) " +
        "WHERE _change_type = 'delete'").collect().map(_.getString(0)).toSeq
    assert(deletesOnly == Seq("b"))

    // seq-space feed: everything past the c1 commit's visibility seq
    val sqlSince = rows(spark.sql(
      s"SELECT ID, V, _change_type FROM graft_changes_since('$root', 'T', $v1)"))
    assert(sqlSince == rows(t.readChangesSince(v1)
      .select("ID", "V", "_change_type")))
    assert(sqlSince.nonEmpty)

    // time travel: as-of the v1 publish clock = the v1 state
    val sqlAt = rows(spark.sql(
      s"SELECT ID, V FROM graft_at('$root', 'T', ${ts1}L)"))
    assert(sqlAt == rows(t.readAsOf(ts1).select("ID", "V")))
    assert(sqlAt.size == 3)

    // history: one row per retained snapshot, commits attributed
    val hist = spark.sql(s"SELECT * FROM graft_history('$root', 'T')")
    assert(hist.count() == t.snapshotVersions().size)
    assert(hist.filter(col("operation") === "commit").count() == 2)

    // metrics: a lake with no streamed batches reads as EMPTY but typed
    val met = spark.sql(s"SELECT * FROM graft_metrics('$root', 'repos')")
    assert(met.count() == 0)
    assert(met.columns.contains("wall_ms"))

    // non-literal argument rejected with the friendly message
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('$root', 'T', 1, 1 + $v2)")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }
}
