package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

import graft.schema.{JArr, JNum, JObj, JStr, JValue, Json}

/** One data segment: a parquet leaf directory holding exactly one key
  * bucket, written under one schema version. */
final case class Segment(path: String, bucket: Int, schemaVer: Int, rows: Long)

/** Per-commit lineage record (the rebuild's answer to the reference's
  * TMPDIR db script audit files, sqlDDL.ts:107-116). */
final case class Lineage(tag: String, buckets: Seq[Int], upserted: Long,
    deleted: Long, wallMs: Long)

/** An immutable table snapshot: schema history, live segments, applied
  * commit tags (exactly-once), lineage. */
final case class Snapshot(
    version: Int,
    schemaVer: Int,
    schemas: Map[Int, StructType], // ver → schema (history for old files)
    segments: Seq[Segment],
    commits: Set[String], // applied (streamId:batchId) tags
    lineage: Seq[Lineage],
) {
  def schema: StructType = schemas(schemaVer)
}

/** A minimal snapshot-committing lake table over parquet — MERGE upserts,
  * additive schema evolution, snapshot isolation, idempotent re-commit.
  *
  * Replaces the reference's SQL Server tables + per-row `MERGE INTO`
  * (/root/reference/src/lib/sqlDML.ts:155-423) with set-oriented,
  * bucket-pruned merges: data is hash-bucketed on the root key, a merge
  * touches (reads + rewrites) only the buckets present in the update
  * batch, and every commit is an atomic snapshot-file rename. No Iceberg
  * jar exists in this sandbox (SURVEY.md §7.0); this supplies the same
  * properties the north rule names.
  *
  * Scale design: `numBuckets` bounds the rewrite amplification — at 100 TB
  * a batch touching K buckets rewrites K/numBuckets of the table, and the
  * anti-join runs only over those buckets, shuffled (or broadcast via AQE)
  * on the merge key.
  */
final class LakeTable(val spark: SparkSession, val root: String,
    val name: String, val numBuckets: Int = 64) {

  private val dir: Path = Paths.get(root, name)
  private val snapDir: Path = dir.resolve("_snap")
  val BucketCol = "_gbucket"

  // ---------- snapshot log ----------

  private def versionOf(p: Path): Int = {
    val n = p.getFileName.toString
    if (n.startsWith("v") && n.endsWith(".json"))
      n.stripPrefix("v").stripSuffix(".json").toInt
    else -1
  }

  def currentVersion(): Int =
    if (!Files.isDirectory(snapDir)) 0
    else Files.list(snapDir).iterator().asScala.map(versionOf).foldLeft(0)(math.max)

  def exists(): Boolean = currentVersion() > 0

  def snapshot(): Snapshot = {
    val v = currentVersion()
    require(v > 0, s"lake table $name does not exist at $dir")
    readSnapshot(snapDir.resolve(f"v$v%05d.json"), v)
  }

  def snapshotOpt(): Option[Snapshot] =
    if (exists()) Some(snapshot()) else None

  private def readSnapshot(p: Path, v: Int): Snapshot = {
    val o = Json.parse(Files.readString(p)).asInstanceOf[JObj]
    def str(k: String) = o.get(k).collect { case JStr(s) => s }
    def arr(k: String) = o.get(k).collect { case JArr(x) => x }.getOrElse(Vector.empty)
    val schemaVer = o.get("schemaVer").collect { case JNum(n) => n.toInt }.get
    val schemas = o.get("schemas").collect { case JObj(fs) =>
      fs.map { case (k, JStr(s)) =>
        k.toInt -> DataType.fromJson(s).asInstanceOf[StructType]
      case (k, _) => throw new IllegalStateException(s"bad schema entry $k")
      }.toMap
    }.get
    val segs = arr("segments").map { case seg: JObj =>
      Segment(
        seg.get("path").collect { case JStr(s) => s }.get,
        seg.get("bucket").collect { case JNum(n) => n.toInt }.get,
        seg.get("schemaVer").collect { case JNum(n) => n.toInt }.get,
        seg.get("rows").collect { case JNum(n) => n.toLong }.get)
    case _ => throw new IllegalStateException("bad segment")
    }
    val commits = arr("commits").collect { case JStr(s) => s }.toSet
    val lineage = arr("lineage").map { case l: JObj =>
      Lineage(
        l.get("tag").collect { case JStr(s) => s }.get,
        l.get("buckets").collect { case JArr(b) => b.collect { case JNum(n) => n.toInt } }.getOrElse(Vector.empty),
        l.get("upserted").collect { case JNum(n) => n.toLong }.getOrElse(0L),
        l.get("deleted").collect { case JNum(n) => n.toLong }.getOrElse(0L),
        l.get("wallMs").collect { case JNum(n) => n.toLong }.getOrElse(0L))
    case _ => throw new IllegalStateException("bad lineage")
    }
    Snapshot(v, schemaVer, schemas, segs, commits, lineage)
  }

  private def writeSnapshot(s: Snapshot): Unit = {
    Files.createDirectories(snapDir)
    val body = JObj(Vector(
      "version" -> JNum(s.version.toString),
      "schemaVer" -> JNum(s.schemaVer.toString),
      "schemas" -> JObj(s.schemas.toVector.sortBy(_._1).map { case (k, v) =>
        k.toString -> (JStr(v.json): JValue)
      }),
      "segments" -> JArr(s.segments.map(seg => JObj(Vector(
        "path" -> JStr(seg.path), "bucket" -> JNum(seg.bucket.toString),
        "schemaVer" -> JNum(seg.schemaVer.toString),
        "rows" -> JNum(seg.rows.toString))): JValue).toVector),
      "commits" -> JArr(s.commits.toVector.sorted.map(JStr(_): JValue)),
      "lineage" -> JArr(s.lineage.map(l => JObj(Vector(
        "tag" -> JStr(l.tag),
        "buckets" -> JArr(l.buckets.map(b => JNum(b.toString): JValue).toVector),
        "upserted" -> JNum(l.upserted.toString),
        "deleted" -> JNum(l.deleted.toString),
        "wallMs" -> JNum(l.wallMs.toString))): JValue).toVector),
    ))
    val tmp = snapDir.resolve(f".tmp-v${s.version}%05d.json")
    Files.writeString(tmp, Json.render(body))
    // atomic publish: rename is the commit point
    Files.move(tmp, snapDir.resolve(f"v${s.version}%05d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  // ---------- DDL ----------

  /** Create the table (v1 snapshot, no data). No-op if it exists. */
  def create(schema: StructType): Unit = if (!exists()) {
    Files.createDirectories(dir.resolve("data"))
    writeSnapshot(Snapshot(1, 1, Map(1 -> schema), Nil, Set.empty, Nil))
  }

  /** Additive schema evolution (alterTables, sqlDDL.ts:27-65): commit a
    * new schema version. Caller supplies the already-widened schema (the
    * widening lattice lives in the registry); existing files keep their
    * old schema version and are cast on read. No-op when unchanged. */
  def evolve(newSchema: StructType): Snapshot = {
    val s = snapshot()
    if (s.schema == newSchema) s
    else {
      val ver = s.schemaVer + 1
      val next = s.copy(version = s.version + 1, schemaVer = ver,
        schemas = s.schemas + (ver -> newSchema))
      writeSnapshot(next)
      next
    }
  }

  // ---------- read ----------

  /** Read the current snapshot: every live segment, aligned (missing
    * columns → null, changed types → cast) to the current schema. */
  def read(): DataFrame = readSegments(snapshot(), _ => true)

  /** Read only the given buckets (merge-side partition pruning). */
  def readBuckets(buckets: Set[Int]): DataFrame =
    readSegments(snapshot(), seg => buckets.contains(seg.bucket))

  private def emptyDf(schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def readSegments(s: Snapshot, keep: Segment => Boolean): DataFrame = {
    val target = s.schema
    val live = s.segments.filter(keep)
    if (live.isEmpty) emptyDf(target)
    else {
      // group by schema version: each group reads with its written schema,
      // then aligns to the current one (additive evolution ⇒ cast-safe)
      val parts = live.groupBy(_.schemaVer).toSeq.sortBy(_._1).map {
        case (ver, segs) =>
          val df = spark.read.schema(s.schemas(ver))
            .parquet(segs.map(seg => dir.resolve(seg.path).toString): _*)
          align(df, target)
      }
      parts.reduce(_ unionByName _)
    }
  }

  private def align(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.fieldNames.toSet
    df.select(target.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  // ---------- merge (the reference's MERGE INTO, set-oriented) ----------

  /** Bucket expression over the table's root-key column — co-partitions
    * all tables of one document family into the same bucket. */
  def bucketExpr(rootKey: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(rootKey), lit(numBuckets)).cast(IntegerType)

  /** Idempotent, bucket-pruned MERGE:
    *   - rows of `updates` replace existing rows with the same `keyCols`
    *   - rows whose `rootKeyCol` appears in `deleteRootKeys` are removed
    *   - only buckets present in the batch are read or rewritten
    *   - a `commitTag` already in the snapshot makes the call a no-op
    *     (exactly-once under foreachBatch retry)
    *
    * @param rootKeyCol column (in both `updates` and the table) that carries
    *                   the root-document key — bucketing + delete cascade
    */
  def merge(
      updates: DataFrame,
      keyCols: Seq[String],
      rootKeyCol: String,
      commitTag: String,
      deleteRootKeys: Option[DataFrame] = None,
  ): Snapshot = {
    val t0 = System.nanoTime()
    val s = snapshot()
    if (s.commits.contains(commitTag)) return s // idempotent re-commit

    val target = s.schema
    val up = align(updates, target)
      .withColumn(BucketCol, bucketExpr(col(rootKeyCol)))
      .persist()
    val delKeys = deleteRootKeys.map(_.toDF(rootKeyCol)
      .withColumn(BucketCol, bucketExpr(col(rootKeyCol))).persist())

    try {
      // touched buckets + batch size in ONE job per side (collect_set is a
      // partial-aggregated ≤numBuckets-value set — no wide shuffle)
      val upAgg = up.agg(collect_set(col(BucketCol)), count(lit(1))).head()
      val upserted = upAgg.getLong(1)
      val delAgg = delKeys.map(_.agg(collect_set(col(BucketCol)),
        count(lit(1))).head())
      val deleted = delAgg.map(_.getLong(1)).getOrElse(0L)
      val touched: Set[Int] =
        (upAgg.getSeq[Int](0) ++ delAgg.toSeq.flatMap(_.getSeq[Int](0))).toSet
      if (touched.isEmpty) return commitEmpty(s, commitTag, t0)

      val existing = readSegments(s, seg => touched.contains(seg.bucket))
      // survivors: existing rows not superseded by an update and not deleted
      var survivors = existing.join(up.select(keyCols.map(col): _*),
        keyCols, "left_anti")
      delKeys.foreach { dk =>
        survivors = survivors.join(dk.select(rootKeyCol), Seq(rootKeyCol), "left_anti")
      }
      val upLive = delKeys match {
        case Some(dk) => up.drop(BucketCol)
          .join(dk.select(rootKeyCol), Seq(rootKeyCol), "left_anti")
        case None => up.drop(BucketCol)
      }
      val out = survivors.unionByName(upLive)
        .withColumn(BucketCol, bucketExpr(col(rootKeyCol)))

      // write one commit directory, one leaf dir per bucket (single job;
      // applied/deleted row metrics come from the agg above, no rescans)
      val commitRel = f"data/c${s.version + 1}%05d"
      out
        .repartition(math.min(numBuckets, touched.size * 2), col(BucketCol))
        .sortWithinPartitions(keyCols.map(col): _*)
        .write.partitionBy(BucketCol).mode("overwrite")
        .parquet(dir.resolve(commitRel).toString)

      // an all-deleted bucket set can legitimately write zero files
      val bucketDirs = listBucketDirs(dir.resolve(commitRel))
      val newSegs = bucketDirs.map { case (b, p) =>
        Segment(dir.relativize(Paths.get(p)).toString, b, s.schemaVer,
          -1L) // per-bucket rows not tracked; batch total in lineage
      }
      val kept = s.segments.filterNot(seg => touched.contains(seg.bucket))
      val next = s.copy(
        version = s.version + 1,
        segments = kept ++ newSegs,
        commits = s.commits + commitTag,
        lineage = s.lineage :+ Lineage(commitTag, touched.toSeq.sorted,
          upserted, deleted, (System.nanoTime() - t0) / 1000000),
      )
      writeSnapshot(next)
      next
    } finally {
      up.unpersist()
      delKeys.foreach(_.unpersist())
    }
  }

  private def commitEmpty(s: Snapshot, tag: String, t0: Long): Snapshot = {
    val next = s.copy(version = s.version + 1, commits = s.commits + tag,
      lineage = s.lineage :+ Lineage(tag, Nil, 0, 0,
        (System.nanoTime() - t0) / 1000000))
    writeSnapshot(next)
    next
  }

  private def listBucketDirs(commitDir: Path): Seq[(Int, String)] =
    if (!Files.isDirectory(commitDir)) Nil
    else Files.list(commitDir).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(s"$BucketCol="))
      .map { p =>
        val b = p.getFileName.toString.stripPrefix(s"$BucketCol=").toInt
        b -> p.toString
      }.toSeq
}
