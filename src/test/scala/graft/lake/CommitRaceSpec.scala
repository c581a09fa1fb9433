package graft.lake

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.SparkTestSession

/** The collision-retry LWW contract (ADVICE r5 #1): a commit-domain writer
  * that loses the snapshot publish race re-stamps only the SEGMENT seq
  * before republishing — the parquet keeps the losing attempt's stale
  * row-level `_gseq`. Resolution must honor the committed segment seq, or
  * same-key rows from the two commits tie nondeterministically and an
  * earlier commit's tombstone permanently shadows the later commit's
  * upsert. These tests drive the exact interleaving with the split
  * prepare/write/commit internals (both writers read the SAME snapshot). */
class CommitRaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ID", StringType, nullable = false),
    StructField("V", StringType, nullable = true)))

  private def newTable(): LakeTable = {
    val t = new LakeTable(spark, SparkTestSession.tmpDir("graft-race-"),
      "T", numBuckets = 4)
    t.create(schema, Seq("ID"), "ID")
    t
  }

  test("commit-domain collision retry: republished rows win same-key LWW") {
    val t = newTable()
    val s0 = t.snapshot()
    // both writers read version 1 and stage deltas whose parquet rows
    // carry _gseq = 2
    val upA = t.prepareDelta(s0, Seq("k" -> "a").toDF("ID", "V"), "ID",
      None, None)
    val upB = t.prepareDelta(s0, Seq("k" -> "b").toDF("ID", "V"), "ID",
      None, None)
    val (segsA, nA, _) = t.writeDelta(s0, upA)
    val (segsB, nB, _) = t.writeDelta(s0, upB)
    // A publishes v2; B loses the race and republishes as v3, but its
    // parquet rows still read _gseq = 2
    t.commitDelta(s0, "A", Seq("ID"), "ID", segsA, nA, 0,
      System.nanoTime(), "commit")
    val sB = t.commitDelta(s0, "B", Seq("ID"), "ID", segsB, nB, 0,
      System.nanoTime(), "commit")
    assert(sB.version == 3)
    assert(sB.segments.filter(_.kind == "delta").map(_.seq).toSet ==
      Set(2L, 3L))
    // the later COMMIT must win deterministically (segment-seq order),
    // not tie on the shared stale row seq
    val got = t.read().collect().map(r => r.getString(0) -> r.getString(1))
    assert(got.toSeq == Seq("k" -> "b"))
  }

  test("collision retry: earlier tombstone must not shadow the later commit's upsert") {
    val t = newTable()
    t.merge(Seq("k" -> "v0").toDF("ID", "V"), Seq("ID"), "ID", "seed")
    val s0 = t.snapshot()
    // writer A deletes k; writer B upserts k — both staged against s0
    val delA = t.prepareDelta(s0,
      Seq.empty[(String, String)].toDF("ID", "V"), "ID",
      Some(Seq("k").toDF("ID")), None)
    val upB = t.prepareDelta(s0, Seq("k" -> "new").toDF("ID", "V"), "ID",
      None, None)
    val (segsA, nA, dA) = t.writeDelta(s0, delA)
    val (segsB, nB, _) = t.writeDelta(s0, upB)
    t.commitDelta(s0, "A", Seq("ID"), "ID", segsA, nA, dA,
      System.nanoTime(), "commit")
    t.commitDelta(s0, "B", Seq("ID"), "ID", segsB, nB, 0,
      System.nanoTime(), "commit")
    // B committed AFTER the delete: its upsert must be visible (without
    // the segment-seq override B's rows read _gseq equal to the
    // tombstone's seq and resolveRows' strict > drops them forever)
    val got = t.read().collect().map(r => r.getString(0) -> r.getString(1))
    assert(got.toSeq == Seq("k" -> "new"))
    // and the resolved state survives compaction with the same answer
    t.compactAll("compact-after-race")
    val got2 = t.read().collect().map(r => r.getString(0) -> r.getString(1))
    assert(got2.toSeq == Seq("k" -> "new"))
  }
}
