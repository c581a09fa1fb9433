package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cdc.EventGen
import graft.engine.Engine

/** Per-JOB wall-time breakdown of the exact Bench replay shape at a given
  * executor count — finds where a fresh-lake 2M-event apply spends time.
  * Usage: runMain graft.tools.BenchProbe [execs] [nEvents] */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val execs = args.headOption.map(_.toInt).getOrElse(4)
    val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val execCores = sys.env.getOrElse("GRAFT_EXEC_CORES", "2").toInt
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft-bench"))
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,$execCores,12288]")
      .config("spark.executor.memory", sys.env.getOrElse("GRAFT_EXEC_MEM", "3g"))
      .config("spark.locality.wait", "0s")
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.local.dir", "/dev/shm/graft-bench/spark-local")
      .config("spark.sql.shuffle.partitions",
        execs * execCores * sys.env.getOrElse("GRAFT_PART_MULT", "2").toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_BENCH_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"/dev/shm/graft-bench/events-$n"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir))) {
      val p = EventGen.Params(nEvents = n, nRepos = 2000, pathsPerRepo = 500)
      EventGen.events(spark, p, 32).toDF().write.mode("overwrite").parquet(dir)
    }

    // job-level accounting
    case class J(id: Int, t0: Long, desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Double, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, J(e.jobId, System.nanoTime(),
            Option(e.properties.getProperty("spark.job.description"))
              .orElse(Option(e.properties.getProperty("callSite.short")))
              .getOrElse("?")))
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val j = jobs.remove(e.jobId)
          if (j != null)
            done.add(((System.nanoTime() - j.t0) / 1e9,
              s"job${e.jobId} ${j.desc}"))
        }
      })

    def run(tag: String): Unit = {
      done.clear()
      val lake = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm/graft-bench"), "probe-lake-").toString
      val engine = new Engine(spark, lake, numBuckets = 32)
      val all = spark.read.parquet(dir)
      val t0 = System.nanoTime()
      engine.applyEvents("repos", all, s"probe:$tag")
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag execs=$execs wall=$wall%.2f s; jobs:")
      done.forEach { case (secs, desc) =>
        println(f"[probe]   $secs%7.2f s  $desc")
      }
      val sum = done.toArray.map(_.asInstanceOf[(Double, String)]._1).sum
      println(f"[probe] sum-of-jobs=$sum%.2f s (gaps=${wall - sum}%.2f s driver-side)")
      scala.sys.process.Process(Seq("rm", "-rf", lake)).!
    }

    // warm then two measured fresh-lake replays (the Bench sample shape)
    val allW = spark.read.parquet(dir)
    val lakeW = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-bench"), "probe-warm-").toString
    new Engine(spark, lakeW, 16).applyEvents("repos",
      allW.limit(100000), "probe:warm")
    run("s1")
    run("s2")
    spark.stop()
  }
}
