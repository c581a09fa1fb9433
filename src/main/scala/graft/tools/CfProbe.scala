package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.lake.LakeTable

/** Changefeed cost probe — measured evidence for the O(changed buckets)
  * claim: `runMain graft.tools.CfProbe [rows] [buckets] [updKeys] [cores]`.
  *
  * Builds a lake table of `rows` documents (ID + 96-byte payload) across
  * `buckets` hash buckets, commits a SMALL update batch whose keys are
  * chosen (by the same xxhash bucket function the lake uses) to land in
  * ONE bucket, then times:
  *   - `feed` — `readChangesBetween(base, head).count()`: the classified
  *     version diff, bucket-pruned to segments whose set changed;
  *   - `scan` — `read().count()`: the full merge-on-read table resolve.
  *
  * If the feed is really O(changed buckets), its wall must track the
  * TOUCHED bucket count (reported from the two snapshots' segment maps),
  * not `rows`: growing the table at a fixed change size should leave the
  * feed wall flat while the full scan grows linearly. Run at three sizes
  * for the scaling row in BENCH.md. Best-of-2 per measurement (JIT). */
object CfProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(256)
    val updKeys = args.lift(2).map(_.toInt).getOrElse(128)
    val cores = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft-cfprobe-")
      .toString
    val t = new LakeTable(spark, dir, "T", numBuckets = buckets)
    t.create(StructType(Seq(
      StructField("ID", StringType, nullable = false),
      StructField("V", StringType),
      StructField("PAD", StringType))), Seq("ID"), "ID")

    val base = spark.range(0, rows, 1, cores * 4)
      .select(format_string("k%012d", col("id")).as("ID"),
        lit("v1").as("V"),
        repeat(substring(sha2(col("id").cast("string"), 256), 1, 32), 3)
          .as("PAD"))
    t.merge(base, Seq("ID"), "ID", "base")
    val vBase = t.currentVersion()

    // update keys confined to bucket 0 — the same pmod(xxhash64) the
    // lake's layout uses, so the diff's touched-set is exactly 1 bucket
    val upd = base
      .filter(pmod(xxhash64(col("ID")), lit(buckets)) === 0)
      .limit(updKeys)
      .select(col("ID"), lit("v2").as("V"), col("PAD"))
    t.merge(upd, Seq("ID"), "ID", "upd")
    val vHead = t.currentVersion()

    def byBucket(v: Int): Map[Int, Set[String]] =
      t.snapshotAt(v).segments.groupBy(_.bucket)
        .map { case (b, xs) => b -> xs.map(_.path).toSet }
    val (fb, tb) = (byBucket(vBase), byBucket(vHead))
    val touched = (fb.keySet ++ tb.keySet).count(b => fb.get(b) != tb.get(b))

    def time2(f: () => Long): (Double, Long) = {
      var best = Double.MaxValue; var n = 0L
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime(); n = f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }
    val (feedWall, feedRows) =
      time2(() => t.readChangesBetween(vBase, vHead).count())
    val (scanWall, scanRows) = time2(() => t.read().count())

    println(f"[cfprobe] rows=$rows buckets=$buckets updKeys=$updKeys " +
      f"cores=$cores touchedBuckets=$touched " +
      f"feedRows=$feedRows feedWall=$feedWall%.3f " +
      f"scanRows=$scanRows scanWall=$scanWall%.3f " +
      f"ratio=${scanWall / feedWall}%.1fx")
    spark.stop()
  }
}
