package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.EventGen
import graft.engine.Engine

/** r08: time the REAL stages of Engine.load (json_tuple + max_by dedup,
  * the streaming-infer fold, from_json, the merge fan-out) in the exact
  * shapes load() builds them, at local[N].
  * Usage: runMain graft.tools.EngineProbe [nEvents] [cores]
  */
object EngineProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft-bench"))
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.local.dir", "/dev/shm/graft-bench/spark-local")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val p = EventGen.Params(nEvents = n, nRepos = 2000, pathsPerRepo = 500)
    val dir = s"/dev/shm/graft-bench/eventsprobe-$n"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
      EventGen.events(spark, p, 32).toDF().write.mode("overwrite").parquet(dir)
    val all = spark.read.parquet(dir)

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(
        f"[eng] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    // the exact keyed+dedup shape of load() (non-incremental)
    def keyed = all.withColumn("_seq", col("lsn").try_cast("long"))
      .select(col("*"), json_tuple(col("doc"), "_id", "id")
        .as(Seq("_jid0", "_jid1")))
      .withColumn("_docid", coalesce(col("_jid0"), col("_jid1")))
      .drop("_jid0", "_jid1")
    def latest = {
      val k = keyed
      k.filter(col("_docid").isNotNull)
        .groupBy(col("_docid"))
        .agg(max_by(struct(k.columns.map(col): _*), col("_seq")).as("_w"))
        .select(col("_w.*"))
    }

    (1 to 3).foreach { rep =>
      timed(s"r$rep json_tuple+max_by dedup (noop)") {
        latest.write.format("noop").mode("overwrite").save()
      }
      val lake = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm/graft-bench"), "engprobe-").toString
      val engine = new Engine(spark, lake, numBuckets = 32)
      val cached = latest.persist()
      timed(s"r$rep dedup+persist+infer fold (load job 1)") {
        engine.inferBatch("repos", cached, "doc")
      }
      timed(s"r$rep infer fold again (cache warm)") {
        engine.inferBatch("repos", cached, "doc")
      }
      val registry = engine.inferBatch("repos", cached, "doc")
      val schema = graft.flatten.Flattener
        .readSchema(registry.attributes(registry.name))
      val parsed = cached.select(col("_docid"), col("_seq"),
        from_json(col("doc"), schema).as("_gdoc"))
      timed(s"r$rep from_json over cached winners (noop)") {
        parsed.write.format("noop").mode("overwrite").save()
      }
      cached.unpersist()
      timed(s"r$rep FULL applyEvents") {
        engine.applyEvents("repos", all, s"probe:$rep")
        ()
      }
      scala.sys.process.Process(Seq("rm", "-rf", lake)).!
    }
    spark.stop()
  }
}
