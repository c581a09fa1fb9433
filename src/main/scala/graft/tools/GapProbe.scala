package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, least, lit}

import graft.cdc.EventGen
import graft.engine.Engine

/** Per-BATCH accounting of the multi-batch replay at a given executor
  * count: for each micro-batch, wall time vs the UNION of job intervals
  * (true executor-busy window) — the difference is driver-side serial
  * cost (planning, scheduling rounds, Observation waits, snapshot IO).
  * Usage: runMain graft.tools.GapProbe [execs] [nEvents] [batches] */
object GapProbe {
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
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.sql.shuffle.partitions", execs * execCores *
        sys.env.getOrElse("GRAFT_PART_MULT", "1").toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.speculation",
        sys.env.getOrElse("GRAFT_BENCH_SPECULATION", "false"))
      .config("spark.speculation.interval", "200ms")
      .config("spark.speculation.quantile", "0.75")
      .config("spark.speculation.multiplier", "1.5")
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

    // interval accounting: job (start, end) pairs
    val intervals = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(e.jobId)
          if (t0 != 0L) intervals.add((t0, System.nanoTime()))
        }
      })

    def unionSecs(iv: Seq[(Long, Long)]): Double = {
      val sorted = iv.sortBy(_._1)
      var total = 0L; var curLo = 0L; var curHi = -1L
      sorted.foreach { case (lo, hi) =>
        if (lo > curHi) { total += curHi - curLo; curLo = lo; curHi = hi }
        else if (hi > curHi) curHi = hi
      }
      total += curHi - curLo
      (if (sorted.isEmpty) 0L else total) / 1e9
    }

    def replay(tag: String): Unit = {
      val lake = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm/graft-bench"), "gap-lake-").toString
      val engine = new Engine(spark, lake, numBuckets = 32)
      val all = spark.read.parquet(dir)
      val per = n / batches
      val slicesPer = Slices / batches
      var total = 0.0
      (0 until batches).foreach { b =>
        intervals.clear()
        val hi = if (b == batches - 1) n else (b + 1) * per
        val t0 = System.nanoTime()
        engine.applyEvents("repos",
          all.filter(col("slice") >= b * slicesPer &&
            col("slice") < (b + 1) * slicesPer &&
            col("lsn") >= b * per && col("lsn") < hi).drop("slice"),
          s"$tag:$b")
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events lag: give the bus a beat before reading
        Thread.sleep(200)
        val busy = unionSecs(intervals.toArray
          .map(_.asInstanceOf[(Long, Long)]).toSeq)
        total += wall
        println(f"[gap] $tag batch$b: wall=$wall%6.2f s jobs-busy=$busy%6.2f s " +
          f"driver-gap=${wall - busy}%5.2f s (${intervals.size()} jobs)")
      }
      println(f"[gap] $tag total=$total%.2f s")
      scala.sys.process.Process(Seq("rm", "-rf", lake)).!
    }

    // warm: PER-EXECUTOR-equal share (100k × executors) — a fixed 100k
    // gives each of 4 executors only 25k docs through its JIT and the
    // first measured replay runs ~16% slow at 4N vs 4% at N (measured)
    val warmN = sys.env.getOrElse("GRAFT_WARM_PER_EXEC", "100000").toLong * execs
    val lakeW = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-bench"), "gap-warm-").toString
    new Engine(spark, lakeW, 32).applyEvents("repos",
      spark.read.parquet(dir)
        .filter(col("lsn") < warmN).drop("slice"), "warm:0")
    replay("s1")
    replay("s2")
    replay("s3")
    spark.stop()
  }
}
