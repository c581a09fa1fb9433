package graft.engine

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.{Catalog, TableSpec}
import graft.flatten.Flattener
import graft.lake.LakeTable
import graft.schema.{Attr, Infer, Json}

/** Per-apply metrics (the rebuild's applied-event accounting; per-bucket
  * lineage lives in each LakeTable snapshot). */
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
  * is a `mapPartitions` fold + `treeReduce` over the widening lattice
  * (commutative/associative/idempotent, so partition order is immaterial),
  * and each table's upsert is a single set-oriented merge.
  */
final class Engine(val spark: SparkSession, val lakeRoot: String,
    val numBuckets: Int = 64) {

  // doctosql coercions are lenient (invalid date/number → null,
  // sqlDML.ts:257-296); Spark 4 defaults to ANSI (throwing) casts
  spark.conf.set("spark.sql.ansi.enabled", "false")

  // ---------- schema registry (persisted widened tree per entity) ----------

  private def registryDir(entity: String) =
    Paths.get(lakeRoot, s"_registry_$entity")

  def loadRegistry(entity: String): Option[Attr] = {
    val d = registryDir(entity)
    if (!Files.isDirectory(d)) None
    else {
      val latest = Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(_.stripPrefix("v").stripSuffix(".json").toInt)
        .foldLeft(0)(math.max)
      if (latest == 0) None
      else Some(Infer.fromJson(Json.parse(
        Files.readString(d.resolve(f"v$latest%05d.json")))))
    }
  }

  private def saveRegistry(entity: String, tree: Attr): Unit = {
    val d = registryDir(entity)
    Files.createDirectories(d)
    val latest = Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toInt)
      .foldLeft(0)(math.max)
    val tmp = d.resolve(f".tmp-v${latest + 1}%05d.json")
    Files.writeString(tmp, Json.render(Infer.toJson(tree)))
    Files.move(tmp, d.resolve(f"v${latest + 1}%05d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Distributed schema inference: per-partition fold into an attribute
    * tree, then a lattice-merge treeReduce. One pass over the batch; no
    * documents are collected to the driver. */
  def inferBatch(entity: String, docs: DataFrame, docCol: String): Attr = {
    import spark.implicits._
    val strings = docs.select(col(docCol).cast("string")).as[String]
    val partials = strings.rdd
      .mapPartitions { it =>
        val t = Infer.analyzeDocuments(entity, it.flatMap(s => Json.parseOpt(s)))
        // skip doc-less partitions so treeReduce never sees an empty RDD
        if (t.attributes(entity).dataType == graft.schema.DType.Unknown)
          Iterator.empty
        else Iterator.single(t)
      }
    if (partials.isEmpty()) Infer.analyzeDocuments(entity, Nil)
    else partials.treeReduce(Infer.mergeInto)
  }

  def table(t: TableSpec): LakeTable =
    new LakeTable(spark, lakeRoot, t.fullName, numBuckets)

  /** Maintenance pass over every table of an entity: force-compact all
    * delta buckets (read-optimize) and vacuum unreferenced files. */
  def maintain(entity: String, tag: String = "maintain"): Unit =
    loadRegistry(entity).foreach { tree =>
      Catalog.fromTree(tree).foreach { t =>
        val lake = table(t)
        if (lake.exists()) {
          lake.compactAll(s"$tag:${t.fullName}")
          lake.vacuum()
        }
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

    val idExpr: Column = coalesce(
      get_json_object(col(docCol), "$._id"),
      get_json_object(col(docCol), "$.id"))
    val revExpr: Column = coalesce(
      get_json_object(col(docCol), "$._rev"),
      get_json_object(col(docCol), "$.rev"))

    val seqed = seqCol match {
      case Some(c) => docs.withColumn("_seq", col(c).cast("long"))
      case None    => docs.withColumn("_seq", monotonically_increasing_id())
    }

    // Last-write-wins per key (BASELINE.json north-star): one row_number
    // window over the event sequence dedups WITHIN the batch (real CDC
    // batches carry many versions per hot key — dedup here shrinks all
    // downstream flatten/write work by that factor). With a monotone
    // seqCol (the WAL lsn) the winner's lsn also becomes the row's lake
    // visibility seq, so LWW holds ACROSS batches even for late/out-of-
    // order deliveries, and re-applying events is idempotent by content.
    // The window shuffles on the fine-grained document key
    // (repo|path|commit), so a hot REPO cannot skew a partition — the
    // salted layout with a semantic salt.
    val monotoneSeq = seqCol.isDefined
    val w = Window.partitionBy(col("_docid")).orderBy(col("_seq").desc)
    // ONE persisted dedup result: upserts and deletes are both cheap
    // filters over this cache (persisting each separately would run the
    // window shuffle twice per batch)
    val latest = seqed
      .withColumn("_docid", idExpr) // materialized ONCE, before the shuffle
      .withColumn("_docrev", revExpr)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .persist()

    // op split: upserts vs delete tombstones (each keeps its event seq)
    var deduped = opCol match {
      case Some(c) => latest.filter(col(c) =!= "delete")
      case None    => latest
    }
    val delFromOps: Option[DataFrame] = opCol.map { c =>
      latest.filter(col(c) === "delete")
        .select(col("_docid"), col("_seq"))
    }
    val allDeletes: Option[DataFrame] = (deleteIds, delFromOps) match {
      case (Some(a), Some(b)) =>
        Some(a.toDF("_docid").withColumn("_seq", lit(null).cast("long"))
          .unionByName(b))
      case (Some(a), None) =>
        Some(a.toDF("_docid").withColumn("_seq", lit(null).cast("long")))
      case (None, b) => b
    }

    try {
      var skipped = 0L
      val prior = loadRegistry(entity)

      // incr (index.ts:43-72): skip docs whose (ID, REV) is already in the
      // root table — anti-join replaces the driver-side revision Map
      // (sqlDML.ts:27-93); the join broadcasts under AQE when small
      if (incremental) {
        prior.foreach { tree =>
          val tables = Catalog.fromTree(tree)
          val rootT = tables.find(_.isRoot).get
          val lake = table(rootT)
          if (lake.exists() && lake.snapshot().segments.nonEmpty &&
            lake.snapshot().schema.fieldNames.contains("REV")) {
            val existing = lake.read().select(
              col("ID").as("_docid"), col("REV").as("_docrev"))
            val before = deduped.count()
            val next = deduped
              .join(existing, Seq("_docid", "_docrev"), "left_anti").persist()
            skipped = before - next.count()
            deduped.unpersist()
            deduped = next
          }
        }
      }

      val dedupedDocs = deduped.count()
      val nDel = allDeletes.map(_.count()).getOrElse(0L)
      val batchEvents = dedupedDocs + nDel // applied after per-key dedup
      if (batchEvents == 0)
        return ApplyStats(0, 0, 0, skipped, 0)

      // 1-2: inference + registry widen (docMetadata/sqlMetadata stages)
      val batchTree = inferBatch(entity, deduped, docCol)
      val registry = prior match {
        case Some(t) => Infer.mergeInto(t, batchTree)
        case None    => batchTree
      }
      saveRegistry(entity, registry)

      // 3-4: DDL — create or evolve each lake table (sqlDDL createTables /
      // alterTables; additive + widening only)
      val tables = Catalog.fromTree(registry)
      tables.foreach { t =>
        val lake = table(t)
        if (!lake.exists()) lake.create(t.schema, t.keyColumns, rootKeyOf(t))
        else lake.evolve(t.schema, t.keyColumns, rootKeyOf(t))
      }

      // 5: flatten + set-oriented merge per table, root first. The parsed
      // struct column is CACHED once — every table's explode chain reads
      // it instead of re-running from_json per table
      val rootElem = registry.attributes(registry.name)
      val schema = Flattener.readSchema(rootElem)
      val parsed = deduped
        .select(col("_docid"), col("_seq"),
          from_json(col(docCol), schema).as("_gdoc"))
        .persist()

      // per-table merges run CONCURRENTLY (independent lake tables, like
      // the reference's per-table DDL fan-out, sqlDDL.ts:453-480) — Spark
      // schedules the jobs from separate threads and fills idle cores;
      // exactly-once holds per table via the shared commit tag
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      try {
        val parallelMerge = sys.env.getOrElse("GRAFT_PAR_MERGE", "1") != "0"
        def mergeOne(t: TableSpec): Unit = {
          // within-doc duplicate keys need a dedup window ONLY for ID-keyed
          // tables under an array (two elements may share an id —
          // reference's serial MERGE makes the last win, sqlDML.ts:519-545);
          // root rows are unique per batch dedup and AI keys are positions
          val needsKeyDedup = !t.isRoot && t.tablePk == "ID" &&
            t.path.exists(_.isArray)
          val raw = Flattener.tableFrame(parsed, rootElem, tables, t,
            col("_gdoc"), extraCols = Seq("_seq"), withOrd = needsKeyDedup)
          val frame =
            if (!needsKeyDedup) raw
            else raw
              .withColumn("_krn", row_number().over(Window
                .partitionBy(t.keyColumns.map(col): _*)
                .orderBy(col("_seq").desc, col("_gord").desc)))
              .filter(col("_krn") === 1)
              .drop("_krn", "_gord")
          table(t).merge(frame, t.keyColumns, rootKeyOf(t), commitTag,
            deleteRootKeys = allDeletes,
            rowSeqCol = if (monotoneSeq) Some("_seq") else None)
          ()
        }
        if (parallelMerge)
          Await.result(Future.sequence(tables.map(t => Future(mergeOne(t)))),
            Duration.Inf)
        else tables.foreach(mergeOne)
      } finally parsed.unpersist()

      ApplyStats(batchEvents, dedupedDocs, nDel, skipped, tables.size)
    } finally {
      latest.unpersist()
      deduped.unpersist() // no-op unless incr swapped in a persisted frame
    }
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
    * the lake's commit tags make re-application a no-op. */
  def stream(entity: String, events: DataFrame, checkpoint: String,
      queryName: String = "graft-cdc"): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyEvents(entity, batch, commitTag = s"$queryName:$batchId")
        ()
      }
      .start()
}
