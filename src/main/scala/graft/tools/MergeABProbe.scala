package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.cdc.EventGen
import graft.engine.Engine

/** Steal-controlled A/B of the union-merge vs per-table-merge commit path:
  * alternates both paths WITHIN one warm session (same executors, same
  * JIT, interleaved so a host-steal burst hits both), on the exact Bench
  * multi-batch replay shape. Usage:
  * runMain graft.tools.MergeABProbe [execs] [nEvents] [batches] [reps] */
object MergeABProbe {
  private val Slices = 32

  def main(args: Array[String]): Unit = {
    val execs = args.headOption.map(_.toInt).getOrElse(1)
    val n = args.lift(1).map(_.toLong).getOrElse(4000000L)
    val batches = args.lift(2).map(_.toInt).getOrElse(4)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
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
      .config("spark.sql.shuffle.partitions", execs * execCores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.{least, lit}

    val dir = s"/dev/shm/graft-bench/events-$n-s$Slices"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir))) {
      val p = EventGen.Params(nEvents = n, nRepos = 2000, pathsPerRepo = 500)
      val per = math.max(1L, n / Slices)
      EventGen.events(spark, p, partitions = 32).toDF()
        .withColumn("slice",
          least(lit(Slices - 1), (col("lsn") / per).cast("int")))
        .write.partitionBy("slice").mode("overwrite").parquet(dir)
    }

    def replay(): Double = {
      val lake = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm/graft-bench"), "ab-lake-").toString
      val engine = new Engine(spark, lake, numBuckets = 32)
      val all = spark.read.parquet(dir)
      val per = n / batches
      val slicesPer = Slices / batches
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        val hi = if (b == batches - 1) n else (b + 1) * per
        engine.applyEvents("repos",
          all.filter(col("slice") >= b * slicesPer &&
            col("slice") < (b + 1) * slicesPer &&
            col("lsn") >= b * per && col("lsn") < hi).drop("slice"),
          s"ab:$b")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      scala.sys.process.Process(Seq("rm", "-rf", lake)).!
      secs
    }

    // warm both paths (JIT both code paths before measuring)
    sys.props("graft.union.merge") = "1"
    val lakeW = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-bench"), "ab-warm-").toString
    new Engine(spark, lakeW, 32).applyEvents("repos",
      spark.read.parquet(dir).filter(col("slice") === 0)
        .limit(100000).drop("slice"), "warm:u")
    sys.props("graft.union.merge") = "0"
    val lakeW2 = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-bench"), "ab-warm-").toString
    new Engine(spark, lakeW2, 32).applyEvents("repos",
      spark.read.parquet(dir).filter(col("slice") === 0)
        .limit(100000).drop("slice"), "warm:p")

    val hc = spark.sparkContext.hadoopConfiguration
    def variant(union: String, committer: Int): Double = {
      sys.props("graft.union.merge") = union
      hc.setInt("mapreduce.fileoutputcommitter.algorithm.version", committer)
      replay()
    }
    (0 until reps).foreach { r =>
      val u = variant("1", 2)
      val p1 = variant("0", 1)
      val p2 = variant("0", 2)
      println(f"[ab] rep$r execs=$execs n=$n batches=$batches: " +
        f"union-v2=$u%.2f s per-table-v1=$p1%.2f s per-table-v2=$p2%.2f s")
    }
    spark.stop()
  }
}
