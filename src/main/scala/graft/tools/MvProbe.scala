package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.lake.LakeTable
import graft.streaming.Materialize

/** Materialized-view fold cost probe — measured evidence that maintaining
  * a rollup is O(changed groups), not O(table):
  * `runMain graft.tools.MvProbe [rows] [groups] [updKeys] [cores]`.
  *
  * Builds a source lake table of `rows` documents spread over `groups`
  * group keys, backfills the per-group rollup MV once (necessarily
  * O(rows)), then commits ONE small update batch (`updKeys` rows, all in
  * a handful of groups) and times:
  *   - `fold` — `Materialize.applyDelta` over the CDF window of that one
  *     commit (feed O(changed buckets) + target join O(groups) + merge
  *     O(changed groups));
  *   - `recompute` — the from-scratch `groupBy().agg()` over the source
  *     (what a non-incremental consumer pays per refresh).
  * Growing `rows` at fixed change size should leave the fold wall flat
  * while the recompute grows with the table. Best-of-2 per measurement. */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val groups = args.lift(1).map(_.toInt).getOrElse(10000)
    val updKeys = args.lift(2).map(_.toInt).getOrElse(1000)
    val cores = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft-mvprobe-")
      .toString
    val src = new LakeTable(spark, dir, "SRC", numBuckets = 64)
    src.create(StructType(Seq(
      StructField("ID", StringType, nullable = false),
      StructField("G", StringType),
      StructField("SZ", LongType))), Seq("ID"), "ID")
    val base = spark.range(0, rows, 1, cores * 4)
      .select(format_string("k%012d", col("id")).as("ID"),
        format_string("g%06d", pmod(xxhash64(col("id")), lit(groups)))
          .as("G"),
        (pmod(xxhash64(col("id") * 31), lit(1000L)) + 1L).as("SZ"))
    src.merge(base, Seq("ID"), "ID", "base")
    val v1 = src.currentVersion()

    val mv = new LakeTable(spark, dir, "MV", numBuckets = 16)
    mv.create(StructType(Seq(
      StructField("G", StringType, nullable = false),
      StructField("N", LongType), StructField("BYTES", LongType))),
      Seq("G"), "G")
    val t0 = System.nanoTime()
    Materialize.applyDelta(src.readChangesBetweenCdf(1, v1), mv, "G",
      Map("BYTES" -> col("SZ")), "N", "mv:base")
    val backfillWall = (System.nanoTime() - t0) / 1e9

    // one small update commit confined to 2 of the 64 lake buckets (the
    // same pmod(xxhash64) layout function) — the shape of a real small
    // CDC batch against a well-bucketed 10^10-row table, where the
    // changed-bucket fraction, not the row count, is what the feed pays
    // cache pins the limit's row selection: a multi-partition limit picks
    // rows by task arrival order, so re-executing the plan (merge vs the
    // changed-groups count below) could otherwise describe a DIFFERENT
    // subset than the one actually merged
    val updBatch = base
      .filter(pmod(xxhash64(col("ID")), lit(64)) < 2)
      .limit(updKeys)
      .select(col("ID"), col("G"), (col("SZ") + 1L).as("SZ"))
      .cache()
    updBatch.count()
    src.merge(updBatch, Seq("ID"), "ID", "upd")
    val v2 = src.currentVersion()

    def time2(f: () => Unit): Double = {
      var best = Double.MaxValue
      (1 to 2).foreach { _ =>
        val s = System.nanoTime(); f()
        best = math.min(best, (System.nanoTime() - s) / 1e9)
      }
      best
    }
    // the fold is a WRITE (merge), so it runs ONCE (cold, reported as
    // foldWall); the second call is the idempotent tag-replay no-op —
    // reported separately as the crash-recovery floor
    val f0 = System.nanoTime()
    Materialize.applyDelta(src.readChangesBetweenCdf(v1, v2), mv, "G",
      Map("BYTES" -> col("SZ")), "N", "mv:delta")
    val foldWall = (System.nanoTime() - f0) / 1e9
    val r0 = System.nanoTime()
    Materialize.applyDelta(src.readChangesBetweenCdf(v1, v2), mv, "G",
      Map("BYTES" -> col("SZ")), "N", "mv:delta")
    val replayWall = (System.nanoTime() - r0) / 1e9

    val recomputeWall = time2(() => {
      src.read().groupBy("G")
        .agg(count(lit(1)).as("N"), sum("SZ").as("BYTES"))
        .write.mode("overwrite")
        .parquet(s"$dir/recompute")
    })
    val changedGroups = updBatch.select("G").distinct().count()
    println(f"[mvprobe] rows=$rows groups=$groups updKeys=$updKeys " +
      f"cores=$cores changedGroups=$changedGroups " +
      f"backfillWall=$backfillWall%.3f foldWall=$foldWall%.3f " +
      f"replayNoopWall=$replayWall%.3f recomputeWall=$recomputeWall%.3f " +
      f"ratio=${recomputeWall / foldWall}%.1fx")
    spark.stop()
  }
}
