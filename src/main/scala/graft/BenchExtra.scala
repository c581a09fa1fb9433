package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round side bench (guide §1.4): times every declared query
  * with the noop sink under the SAME session shape as the frozen
  * `graft.Bench` query sweep (local[N], shuffle.partitions=N, AQE on),
  * but with repetitions (min-of-reps sheds host steal and warm-up) and an
  * optional formatted-plan dump per query for plans/r08/.
  *
  * Usage: runMain graft.BenchExtra [reps] [explainDir] [suffix] [only...]
  * Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  * Emits one JSON line: {"queries_min": {...}, "queries_all": {...}}.
  * This tool is measurement-only — `graft.Bench` stays the artifact of
  * record; these numbers go to OPTIMIZATION_r08.md.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val explainDir = args.lift(1).filter(_.nonEmpty)
    val suffix = args.lift(2).getOrElse("before")
    val only = args.drop(3).toSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft-bench"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.local.dir", "/dev/shm/graft-bench/spark-local")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prepare(spark, dir)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    val all = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[Double]]
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"bench-extra:$name")
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      all(name) = times
      System.err.println(
        f"[extra] $name%-28s min=${times.min}%6.3f " +
          times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      explainDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"${name}_$suffix.txt"), plan)
      }
    }
    val mins = all.map { case (k, v) => s""""$k":${f"${v.min}%.3f"}""" }
      .mkString("{", ",", "}")
    val raw = all.map { case (k, v) =>
      s""""$k":${v.map(t => f"$t%.3f").mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    println(s"""{"queries_min":$mins,"queries_all":$raw,"sf":"$dir"}""")
    spark.stop()
  }
}
