package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, least, lit}

import graft.cdc.EventGen
import graft.engine.Engine

/** r08: per-JOB attribution of one multi-batch replay at a cluster level —
  * job wall, task count, summed task time, summed CPU time — to locate
  * the non-scaling per-batch cost at 4N.
  * Usage: runMain graft.tools.JobProbe [execs] [nEvents] [batches] */
object JobProbe {
  private val Slices = 32

  def main(args: Array[String]): Unit = {
    val execs = args.headOption.map(_.toInt).getOrElse(4)
    val n = args.lift(1).map(_.toLong).getOrElse(4000000L)
    val batches = args.lift(2).map(_.toInt).getOrElse(4)
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
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.shuffle.partitions", execs * execCores *
        sys.env.getOrElse("GRAFT_PART_MULT", "2").toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"/dev/shm/graft-bench/events-$n-s$Slices"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir))) {
      val p = EventGen.Params(nEvents = n, nRepos = 2000, pathsPerRepo = 500)
      val per = math.max(1L, n / Slices)
      EventGen.events(spark, p, partitions = 32).toDF()
        .withColumn("slice",
          least(lit(Slices - 1), (col("lsn") / per).cast("int")))
        .write.partitionBy("slice").mode("overwrite").parquet(dir)
    }

    final case class J(start: Long) {
      var end = 0L
      var tasks = 0
      var taskMs = 0L
      var cpuMs = 0L
      var gcMs = 0L
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.put(e.jobId, J(System.nanoTime()))
          e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val j = jobs.get(e.jobId)
          if (j != null) j.end = System.nanoTime()
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val jid = stageToJob.get(e.stageId)
          val j = if (jid != null) jobs.get(jid) else null
          val m = e.taskMetrics
          if (j != null && m != null) j.synchronized {
            j.tasks += 1
            j.taskMs += m.executorRunTime
            j.cpuMs += m.executorCpuTime / 1000000
            j.gcMs += m.jvmGCTime
          }
        }
      })

    val lake = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-bench"), "jp-lake-").toString
    val engine = new Engine(spark, lake, numBuckets = 32)
    val all = spark.read.parquet(dir)
    // warm
    val lakeW = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-bench"), "jp-warm-").toString
    new Engine(spark, lakeW, 32).applyEvents("repos",
      all.filter(col("lsn") < 100000L * execs).drop("slice"), "warm:0")

    val per = n / batches
    val slicesPer = Slices / batches
    (0 until batches).foreach { b =>
      jobs.clear(); stageToJob.clear()
      val hi = if (b == batches - 1) n else (b + 1) * per
      val t0 = System.nanoTime()
      engine.applyEvents("repos",
        all.filter(col("slice") >= b * slicesPer &&
          col("slice") < (b + 1) * slicesPer &&
          col("lsn") >= b * per && col("lsn") < hi).drop("slice"),
        s"jp:$b")
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val rows = jobs.asScala.toSeq.sortBy(_._1)
      System.err.println(f"[jp] batch$b wall=$wall%.2f s, ${rows.size} jobs")
      rows.foreach { case (id, j) =>
        val w = (if (j.end > 0) j.end - j.start else 0L) / 1e9
        System.err.println(f"[jp]   job$id%-4d wall=$w%5.2f s tasks=${j.tasks}%3d " +
          f"taskTime=${j.taskMs / 1000.0}%6.1f s cpu=${j.cpuMs / 1000.0}%6.1f s " +
          f"gc=${j.gcMs / 1000.0}%5.1f s")
      }
    }
    spark.stop()
  }
}
