package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Engine

/** Measures the struct-native bootstrap fast path against the JSON
  * round-trip path on the north rule's snapshot shape
  * `(repo, path, commit, lang, content)`.
  *
  * Usage: runMain graft.tools.BootstrapProbe [rows] [cores]
  */
object BootstrapProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def snapshot() = spark.range(rows).select(
      concat(lit("repo-"), pmod(col("id"), lit(2000))).as("repo"),
      concat(lit("src/dir"), pmod(col("id"), lit(97)), lit("/f"),
        col("id"), lit(".scala")).as("path"),
      concat(lit("c"), col("id") % 1000000).as("commit"),
      when(col("id") % 3 === 0, "scala").otherwise("py").as("lang"),
      concat(lit("object X { // body "), col("id"),
        lit(" lorem ipsum dolor sit amet consectetur adipiscing elit sed do "),
        col("id") * 31, lit(" }")).as("content"))

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bootstrap-probe] $label: $s%.2f s (${rows / s}%.0f rows/s)")
      s
    }

    def freshLake() = java.nio.file.Files
      .createTempDirectory("graft-bsprobe-").toString

    // warm both paths once at small scale (JIT)
    locally {
      val e = new Engine(spark, freshLake(), numBuckets = 32)
      e.bootstrap("w1", snapshot().limit(20000), Seq("repo", "path", "commit"), "w")
      val d = snapshot().limit(20000)
        .withColumn("doc", to_json(struct(
          concat_ws("|", col("repo"), col("path"), col("commit")).as("id") +:
            lit("0").as("rev") +: Seq("repo", "path", "commit", "lang",
            "content").map(col): _*)))
        .withColumn("lsn", lit(0L)).select("doc", "lsn")
      e.load("w2", d, "doc", "w", seqCol = Some("lsn"))
    }

    val sStruct = timed("struct-native path") {
      new Engine(spark, freshLake(), numBuckets = 32)
        .bootstrap("repos", snapshot(), Seq("repo", "path", "commit"), "b:0")
    }
    // the JSON round-trip path (what bootstrap did before r3, and what a
    // nested snapshot still takes): to_json → json_tuple → infer → from_json
    val sJson = timed("json round-trip path") {
      val docs = snapshot()
        .withColumn("doc", to_json(struct(
          concat_ws("|", col("repo"), col("path"), col("commit")).as("id") +:
            lit("0").as("rev") +: Seq("repo", "path", "commit", "lang",
            "content").map(col): _*)))
        .withColumn("lsn", lit(0L)).select("doc", "lsn")
      new Engine(spark, freshLake(), numBuckets = 32)
        .load("repos", docs, "doc", "b:0", seqCol = Some("lsn"))
    }
    println(f"[bootstrap-probe] speedup: ${sJson / sStruct}%.2fx")
    spark.stop()
  }
}
