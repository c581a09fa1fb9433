package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cdc.EventGen
import graft.engine.Engine

/** Scaling check on REAL executor JVMs: `local-cluster[n, cores, mem]`
  * spawns separate executor processes (the honest analog of a
  * multi-executor cluster — one big local[32] JVM serializes on the
  * single-JVM memory manager and GC, which no real deployment does).
  * Usage: runMain graft.tools.ClusterCheck [nEvents] */
object ClusterCheck {
  def session(execs: Int, cores: Int): SparkSession = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft-bench"))
    val s = SparkSession.builder()
      .master(s"local-cluster[$execs,$cores,12288]")
      .appName(s"graft-cluster-$execs-$cores")
      .config("spark.executor.memory", sys.env.getOrElse("GRAFT_EXEC_MEM", "2g")) // heap ≠ worker capacity!
      .config("spark.locality.wait", "0s") // don't idle waiting for cache-local slots
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.local.dir", "/dev/shm/graft-bench/spark-local")
      .config("spark.sql.shuffle.partitions", execs * cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val p = EventGen.Params(nEvents = n, nRepos = 2000, pathsPerRepo = 500)
    val dir = s"/tmp/graft-prof-events2-$n"

    val execCores = sys.env.getOrElse("GRAFT_EXEC_CORES", "8").toInt
    Seq(1, 4).foreach { execs =>
      val spark = session(execs, execCores)
      try {
        if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
          EventGen.events(spark, p, 32).toDF()
            .write.mode("overwrite").parquet(dir)
        val all = spark.read.parquet(dir)
        val lake = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm/graft-bench"), "cc-lake-").toString
        val engine = new Engine(spark, lake, numBuckets = 32)
        engine.applyEvents("repos", all.limit(50000), "cc:warm") // JIT warm
        val t0 = System.nanoTime()
        engine.applyEvents("repos", all, "cc:0")
        val t1 = (System.nanoTime() - t0) / 1e9
        val runMs = new java.util.concurrent.atomic.AtomicLong
        val cpuMs = new java.util.concurrent.atomic.AtomicLong
        val gcMs = new java.util.concurrent.atomic.AtomicLong
        val nT = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              val m = e.taskMetrics
              if (m != null) {
                runMs.addAndGet(m.executorRunTime)
                cpuMs.addAndGet(m.executorCpuTime / 1000000)
                gcMs.addAndGet(m.jvmGCTime)
                nT.incrementAndGet()
              }
            }
          })
        val t0b = System.nanoTime()
        engine.applyEvents("repos", all, "cc:1")
        val t2 = (System.nanoTime() - t0b) / 1e9
        println(f"[metrics] execs=$execs tasks=${nT.get} " +
          f"run=${runMs.get / 1000.0}%.1fs cpu=${cpuMs.get / 1000.0}%.1fs " +
          f"gc=${gcMs.get / 1000.0}%.1fs busy-cores=${runMs.get / 1000.0 / t2}%.1f")
        val t0c = System.nanoTime()
        engine.applyEvents("repos", all.limit(1000), "cc:tiny")
        val tiny = (System.nanoTime() - t0c) / 1e9
        println(f"[cluster] execs=$execs tiny-batch-floor=$tiny%.2f s")
        println(f"[cluster] execs=$execs first=$t1%.2f s steady=$t2%.2f s " +
          f"eps=${n / t2}%.0f")
        scala.sys.process.Process(Seq("rm", "-rf", lake)).!
      } finally spark.stop()
    }
  }
}
