package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.cdc.ChangeEvent
import graft.streaming.StreamOps

/** Streaming-native operators: watermarked windowed aggregation,
  * mapGroupsWithState LWW, flatMapGroupsWithState sessionization —
  * all driven through real micro-batches via MemoryStream. */
class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(lsn: Long, op: String, repo: String, tSec: Long,
      rev: String = "r1") = ChangeEvent(lsn, op,
    new Timestamp(1700000000000L + tSec * 1000),
    s"""{"id":"$repo|f|c","rev":"$rev","repo":"$repo","content":"x"}""")

  test("eventRate: watermarked tumbling windows count events per repo") {
    val in = MemoryStream[ChangeEvent](spark)
    val q = StreamOps.eventRate(in.toDF(), window = "1 minute")
      .writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Append()).start()
    // two windows for repo a; watermark advances past the first window
    in.addData(ev(1, "insert", "a", 10), ev(2, "update", "a", 20),
      ev(3, "delete", "a", 30))
    q.processAllAvailable()
    in.addData(ev(4, "insert", "a", 400), ev(5, "insert", "b", 410))
    q.processAllAvailable()
    in.addData(ev(6, "insert", "a", 900)) // pushes watermark further
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rates")
      .selectExpr("repo", "n_events", "n_deletes").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.contains(("a", 3L, 1L))) // first closed window of repo a
    assert(rows.exists(_._1 == "b"))
  }

  test("latestState: mapGroupsWithState keeps max-lsn per key; delete tombstones") {
    val in = MemoryStream[ChangeEvent](spark)
    val q = StreamOps.latestState(in.toDF())
      .writeStream.format("memory").queryName("state")
      .outputMode(OutputMode.Update()).start()
    in.addData(ev(1, "insert", "a", 1, "v1"), ev(3, "update", "a", 3, "v3"))
    q.processAllAvailable()
    in.addData(ev(2, "update", "a", 2, "v2")) // stale lower-lsn: must lose
    q.processAllAvailable()
    in.addData(ev(9, "delete", "a", 9, "v9"))
    q.processAllAvailable()
    in.addData(ev(5, "update", "a", 5, "v5")) // late after delete: stays dead
    q.processAllAvailable()
    q.stop()
    val byBatch = spark.table("state")
      .collect().map(r => (r.getAs[Long]("lsn"), r.getAs[Boolean]("live")))
    // progression: v3 wins, stale v2 rejected (lsn stays 3), delete at 9,
    // late 5 cannot resurrect (lsn stays 9, dead)
    assert(byBatch.contains((3L, true)))
    assert(byBatch.count(_ == (3L, true)) == 2) // initial + stale-rejected
    assert(byBatch.contains((9L, false)))
    assert(byBatch.count(_ == (9L, false)) == 2) // delete + late-rejected
    assert(!byBatch.contains((5L, true)))
  }

  test("dedupeStream: native streaming dedup keeps first occurrence per content hash") {
    val in = MemoryStream[ChangeEvent](spark)
    val q = StreamOps.dedupeStream(in.toDF(), "doc", lateness = "10 minutes")
      .select("lsn", "content_sha")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    // same doc content delivered 3 times across two micro-batches (only
    // the first emits), plus two distinct docs
    in.addData(ev(1, "insert", "a", 10, "r1"), ev(2, "insert", "a", 20, "r1"),
      ev(3, "insert", "b", 30, "r1"))
    q.processAllAvailable()
    in.addData(ev(4, "insert", "a", 40, "r1"), ev(5, "insert", "c", 50, "r1"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup").collect()
    assert(rows.length == 3, s"expected 3 distinct docs, got ${rows.length}")
    // the duplicate group kept its FIRST delivery (lsn 1, not 2 or 4)
    assert(rows.map(_.getAs[Long]("lsn")).toSet == Set(1L, 3L, 5L))
  }

  test("dedupeStream: guards — missing ts column and content_sha collision fail fast") {
    import spark.implicits._
    val noTs = Seq(("x", 1L)).toDF("doc", "lsn")
    val e1 = intercept[IllegalArgumentException] {
      StreamOps.dedupeStream(noTs, "doc")
    }
    assert(e1.getMessage.contains("event-time column"))
    // a pre-existing content_sha column must not be silently overwritten
    // (ADVICE r4: corrupting caller data downstream)
    val collide = Seq(("x", new java.sql.Timestamp(0L), "SHADOW"))
      .toDF("doc", "ts", "content_sha")
    val e2 = intercept[IllegalArgumentException] {
      StreamOps.dedupeStream(collide, "doc")
    }
    assert(e2.getMessage.contains("content_sha"))
  }

  test("sessionize: flatMapGroupsWithState closes sessions on gap") {
    val in = MemoryStream[ChangeEvent](spark)
    val q = StreamOps.sessionize(in.toDF(), gapMs = 30000L,
      lateness = "10 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    // burst 1 (0-20s), gap, burst 2 (100-110s), then watermark pusher
    in.addData(ev(1, "insert", "a", 0), ev(2, "update", "a", 20),
      ev(3, "insert", "a", 100), ev(4, "insert", "a", 110))
    q.processAllAvailable()
    in.addData(ev(5, "insert", "b", 500)) // advances watermark far past both
    q.processAllAvailable()
    in.addData(ev(6, "insert", "b", 900))
    q.processAllAvailable()
    q.stop()
    val sess = spark.table("sessions")
      .collect().map(r => (r.getAs[String]("repo"), r.getAs[Long]("nEvents")))
    assert(sess.contains(("a", 2L))) // burst 1: events at 0s and 20s
    assert(sess.count(_._1 == "a") == 2) // both bursts closed
  }
}
