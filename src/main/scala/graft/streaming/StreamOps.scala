package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native operators over the change-event tail — the pieces of
  * the pipeline that are not just `foreachBatch`-wrapped batch code:
  * watermarked windowed aggregation (event-time metrics), per-key running
  * state via `mapGroupsWithState` (streaming LWW), and gap-based
  * sessionization via `flatMapGroupsWithState`.
  *
  * Scale notes: every operator here keys its state on the fine-grained
  * document key or repo, so state distributes across executors with the
  * shuffle; watermarks bound state size (Spark evicts windows/sessions
  * older than the watermark), and timeouts evict idle per-key state —
  * nothing grows with the total history, only with the live key set.
  */
object StreamOps {

  /** Event-time ingest rate per repo over tumbling windows, watermarked:
    * late events beyond `lateness` are dropped and window state is
    * evicted — bounded state on an unbounded stream. Works on a streaming
    * OR batch frame (same plan, which is the point of the unified API). */
  def eventRate(events: DataFrame, window: String = "1 minute",
      lateness: String = "2 minutes"): DataFrame = {
    val repo = get_json_object(col("doc"), "$.repo")
    events
      .withColumn("_repo", repo)
      .withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("_repo").as("repo"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("op") === "delete", 1).otherwise(0)).as("n_deletes"))
  }

  /** Per-document-key running state: the current (max-lsn) revision of
    * every live key, maintained incrementally with `mapGroupsWithState`
    * (update mode). A delete event clears the value but keeps a tombstone
    * lsn so late lower-lsn events cannot resurrect the key — the
    * streaming mirror of the lake's tombstone semantics. Keys idle for
    * `idleMs` of EVENT time are evicted once the watermark passes (state
    * is bounded by the active key set, not history — the same role as
    * the lake's tombstone-retention horizon). Event-time timeouts fire
    * with watermark advances; a processing-time timeout here would make
    * Spark run continuous no-data micro-batches (measured: ~4/s forever). */
  final case class KeyState(lsn: Long, op: String, rev: String, lastTs: Long)
  final case class KeyUpdate(id: String, lsn: Long, live: Boolean, rev: String)

  def latestState(events: DataFrame, idleMs: Long = 3600000L,
      lateness: String = "10 minutes"): Dataset[KeyUpdate] = {
    import events.sparkSession.implicits._
    val keyed = events
      .withWatermark("ts", lateness)
      .select(
        coalesce(get_json_object(col("doc"), "$._id"),
          get_json_object(col("doc"), "$.id")).as("id"),
        col("lsn"), col("op"),
        coalesce(get_json_object(col("doc"), "$._rev"),
          get_json_object(col("doc"), "$.rev")).as("rev"),
        col("ts"))
      .as[(String, Long, String, String, Timestamp)]

    keyed.groupByKey(_._1).mapGroupsWithState(
      GroupStateTimeout.EventTimeTimeout) {
      (id: String, rows: Iterator[(String, Long, String, String, Timestamp)],
       state: GroupState[KeyState]) =>
        if (state.hasTimedOut) {
          val last = state.get
          state.remove()
          KeyUpdate(id, last.lsn, live = last.op != "delete", last.rev)
        } else {
          // LWW within the group's new rows ∪ existing state
          val winner = rows.foldLeft(state.getOption.orNull) { (cur, r) =>
            val ts = r._5.getTime
            if (cur == null) KeyState(r._2, r._3, r._4, ts)
            else if (r._2 >= cur.lsn)
              KeyState(r._2, r._3, r._4, math.max(ts, cur.lastTs))
            else cur.copy(lastTs = math.max(ts, cur.lastTs))
          }
          state.update(winner)
          // must be strictly beyond the current watermark
          state.setTimeoutTimestamp(
            math.max(state.getCurrentWatermarkMs() + 1,
              winner.lastTs + idleMs))
          KeyUpdate(id, winner.lsn, live = winner.op != "delete", winner.rev)
        }
    }
  }

  /** Streaming exact dedup — emit only the FIRST occurrence of each
    * content hash; the streaming face of [[graft.ops.Dedup.exactGroups]].
    * Built on Spark's NATIVE `dropDuplicatesWithinWatermark` (compose
    * existing operators before custom state): state holds one entry per
    * distinct hash and the watermark evicts entries older than the dedup
    * horizon — bounded state on an unbounded stream, keyed on the content
    * hash so it distributes with the shuffle. Cross-horizon dedup belongs
    * to the batch path (anti-join against the lake's historical hashes).
    * On a batch frame this degrades to plain `dropDuplicates` — same
    * per-batch semantics, which keeps the plan runnable both ways.
    *
    * `tsCol` names the event-time column the watermark rides on (a frame
    * without it fails fast with a clear message instead of an analyzer
    * error deep in the plan). The kept row per hash is tie-arbitrary; the
    * emitted frame carries the input columns PLUS `content_sha` (the
    * dedup key — the deterministic surface; `_chash` no longer leaks). */
  def dedupeStream(docs: DataFrame, contentCol: String = "doc",
      lateness: String = "10 minutes", tsCol: String = "ts"): DataFrame = {
    require(docs.columns.contains(tsCol),
      s"dedupeStream: event-time column '$tsCol' is not a column of the " +
        s"frame ${docs.columns.mkString("(", ",", ")")} — pass tsCol=...")
    // the dedup key is emitted under a PUBLIC name; silently overwriting a
    // caller's same-named column would corrupt data downstream (ADVICE r4)
    require(!docs.columns.contains("content_sha"),
      "dedupeStream: the input frame already has a 'content_sha' column — " +
        "rename it first; dedupeStream emits the dedup key under that name")
    val hashed = docs.withColumn("content_sha", sha2(col(contentCol), 256))
      .withWatermark(tsCol, lateness)
    if (docs.isStreaming) hashed.dropDuplicatesWithinWatermark("content_sha")
    else hashed.dropDuplicates("content_sha")
  }

  /** Gap-based sessionization per repo with `flatMapGroupsWithState`:
    * consecutive events of a repo within `gapMs` belong to one session;
    * a session closes (and emits) when the event-time watermark passes
    * its end + gap. The custom-state shape a training-data pipeline uses
    * for activity bursts / crawl sessions. */
  final case class Session(repo: String, start: Timestamp, end: Timestamp,
      nEvents: Long)
  /** session accumulator state (public: the state encoder's generated
    * code must construct/read it) */
  final case class SessAcc(start: Long, end: Long, n: Long)

  def sessionize(events: DataFrame, gapMs: Long = 60000L,
      lateness: String = "2 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val keyed = events
      .withColumn("_repo", get_json_object(col("doc"), "$.repo"))
      .withWatermark("ts", lateness)
      .select(col("_repo").as("repo"), col("ts"))
      .as[(String, Timestamp)]

    keyed.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
      (repo: String, rows: Iterator[(String, Timestamp)],
       state: GroupState[SessAcc]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator.single(Session(repo, new Timestamp(s.start),
            new Timestamp(s.end), s.n))
        } else {
          // fold the micro-batch's events into (possibly several) sessions
          val ts = rows.map(_._2.getTime).toArray.sorted
          var acc = state.getOption.orNull
          val closed = Vector.newBuilder[Session]
          ts.foreach { t =>
            if (acc == null) acc = SessAcc(t, t, 1)
            else if (t - acc.end <= gapMs)
              acc = acc.copy(end = math.max(acc.end, t), n = acc.n + 1)
            else {
              closed += Session(repo, new Timestamp(acc.start),
                new Timestamp(acc.end), acc.n)
              acc = SessAcc(t, t, 1)
            }
          }
          state.update(acc)
          state.setTimeoutTimestamp(acc.end + gapMs)
          closed.result().iterator
        }
    }
  }
}
