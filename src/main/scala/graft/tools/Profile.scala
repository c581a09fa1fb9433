package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.EventGen
import graft.engine.Engine

/** Stage-level profiling of one CDC apply: where does a micro-batch spend
  * its wall time? Usage: runMain graft.tools.Profile [nEvents] [cores] */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(250000L)
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

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val p = EventGen.Params(nEvents = n, nRepos = 2000, pathsPerRepo = 500)
    val dir = s"/tmp/graft-prof-events2-$n"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
      EventGen.events(spark, p, cores).toDF()
        .write.mode("overwrite").parquet(dir)

    val all = spark.read.parquet(dir)
    timed("read+count parquet")(all.count())

    val lake = java.nio.file.Files.createTempDirectory("graft-prof-lake-").toString
    val engine = new Engine(spark, lake, numBuckets = 32)

    // manual stage replication of applyEvents/load for one batch
    val idExpr = coalesce(get_json_object(col("doc"), "$._id"),
      get_json_object(col("doc"), "$.id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idExpr).orderBy(col("lsn").desc)
    val latest = all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("_docid", idExpr)
    val deduped = latest.filter(col("op") =!= "delete").persist()
    timed("window dedup + persist")(deduped.count())
    timed("infer (jackson fold)")(engine.inferBatch("repos", deduped, "doc"))

    val registry = engine.inferBatch("repos", deduped, "doc")
    val rootElem = registry.attributes(registry.name)
    val schema = graft.flatten.Flattener.readSchema(rootElem)
    val parsed = deduped.select(col("_docid"),
      from_json(col("doc"), schema).as("_gdoc")).persist()
    timed("from_json parse + persist")(parsed.count())

    val tables = graft.catalog.Catalog.fromTree(registry)
    tables.foreach(t => engine.table(t).create(t.schema, t.keyColumns,
      if (t.isRoot) t.tablePk else t.fkColumns.last.sqlName))
    tables.foreach { t =>
      val frame = graft.flatten.Flattener.tableFrame(parsed, rootElem,
        tables, t, col("_gdoc"), withOrd = true)
      timed(s"flatten+dedup+merge ${t.fullName}") {
        engine.table(t).merge(
          frame.withColumn("_krn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(t.keyColumns.map(col): _*)
              .orderBy(col("_gord").desc)))
            .filter(col("_krn") === 1).drop("_krn", "_gord"),
          t.keyColumns, if (t.isRoot) t.tablePk else t.fkColumns.last.sqlName,
          "prof:0")
      }
    }

    // and one full applyEvents for comparison (fresh lake)
    val lake2 = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-bench"), "prof-lake2-").toString
    val engine2 = new Engine(spark, lake2, numBuckets = 32)

    // task-level accounting: is the wall time CPU, GC, shuffle, or idle?
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val nTasks = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            runMs.addAndGet(m.executorRunTime)
            cpuMs.addAndGet(m.executorCpuTime / 1000000)
            gcMs.addAndGet(m.jvmGCTime)
            deserMs.addAndGet(m.executorDeserializeTime)
            shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            nTasks.incrementAndGet()
          }
        }
      })

    timed("full applyEvents")(engine2.applyEvents("repos", all, "prof:0"))
    Seq(runMs, cpuMs, gcMs, shufR, shufW, nTasks, deserMs).foreach(_.set(0))
    val wall0 = System.nanoTime()
    engine2.applyEvents("repos", all, "prof:1")
    val wallS = (System.nanoTime() - wall0) / 1e9
    println(f"[profile] second applyEvents (steady) $wallS%8.2f s")
    println(f"[metrics] tasks=${nTasks.get} run=${runMs.get / 1000.0}%.1fs " +
      f"cpu=${cpuMs.get / 1000.0}%.1fs gc=${gcMs.get / 1000.0}%.1fs " +
      f"deser=${deserMs.get / 1000.0}%.1fs " +
      f"busy-cores=${runMs.get / 1000.0 / wallS}%.1f " +
      f"shufR=${shufR.get / 1e6}%.0fMB shufW=${shufW.get / 1e6}%.0fMB")

    spark.stop()
  }
}
