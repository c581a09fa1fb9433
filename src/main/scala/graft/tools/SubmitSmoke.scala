package graft.tools

import org.apache.spark.sql.SparkSession

/** Deployability smoke for plain `spark-submit` — proves the packaged jar
  * runs the engine end-to-end OUTSIDE sbt, on a multi-executor master, with
  * the SQL surface injected via `--conf spark.sql.extensions`:
  *
  * {{{
  *   sbt -batch package
  *   /opt/spark/bin/spark-submit \
  *     --master 'local-cluster[2,2,3072]' \
  *     --conf spark.executor.memory=2g \
  *     --conf spark.sql.extensions=graft.GraftExtensions \
  *     --class graft.tools.SubmitSmoke \
  *     target/scala-2.13/doctosqlspark_2.13-*.jar /tmp/graft-submit-smoke
  * }}}
  *
  * Unlike [[Smoke]] (an sbt-run dev loop with a pinned `local[4]` master),
  * this tool never calls `.master(...)` or sets extension config — both must
  * arrive from the submit command line, exactly as they would on a real
  * cluster. Asserts fail the JVM (nonzero exit) so the run is a usable CI
  * gate, and it prints the executor count it actually got so a
  * single-JVM fallback can't masquerade as the multi-executor proof. */
object SubmitSmoke {
  def main(args: Array[String]): Unit = {
    val lakeRoot = args.headOption.getOrElse("/tmp/graft-submit-smoke")
    val spark = SparkSession.builder()
      .appName("graft-submit-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // Spark 4.1's checksummed checkpoint file manager deadlocks in this
      // sandbox (see verify skill gotchas) — same setting the test
      // session uses for every streaming suite
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val master = spark.sparkContext.master

    // 1. engine end-to-end: load two revisions, expect the LWW winner
    val engine = new graft.engine.Engine(spark, lakeRoot, numBuckets = 8)
    val docs = Seq(
      """{"_id":"d1","_rev":"1.a","repo":"r1","path":"a.txt","n":1}""",
      """{"_id":"d1","_rev":"2.b","repo":"r1","path":"a.txt","n":2}""",
      """{"_id":"d2","_rev":"1.c","repo":"r2","path":"b.txt","n":7,
        |"tags":[{"id":"t1","v":"x"},{"id":"t2","v":"y"}]}""".stripMargin
        .replaceAll("\n", "")).toDF("doc")
    val stats = engine.load("submitsmoke", docs, "doc", commitTag = "ss:1")
    println(s"[submit-smoke] load: $stats")

    import graft.catalog.Catalog
    val tables = Catalog.fromTree(engine.loadRegistry("submitsmoke").get)
    val root = tables.find(_.isRoot).get
    val rootDf = engine.table(root).read().cache()
    val n = rootDf.count()
    assert(n == 2, s"expected 2 root rows (LWW per id), got $n")
    // numbers land as VARCHAR(38) per the reference's type mapping — cast back
    val d1n = rootDf.filter($"ID" === "d1")
      .select(org.apache.spark.sql.functions.col("N").cast("double"))
      .as[Double].head()
    assert(d1n == 2.0, s"expected d1 to carry rev 2.b's n=2, got $d1n")
    val child = tables.find(!_.isRoot)
    assert(child.nonEmpty, "expected a child table for the tags array")
    val cn = engine.table(child.get).read().count()
    assert(cn == 2, s"expected 2 child rows, got $cn")

    // 2. idempotent re-commit: same tag must be a no-op
    engine.load("submitsmoke", docs, "doc", commitTag = "ss:1")
    val n2 = engine.table(root).read().count()
    assert(n2 == 2, s"re-commit changed row count: $n2")

    // 3. extensions path: the injected functions must resolve in plain SQL
    //    (this only works if --conf spark.sql.extensions=graft.GraftExtensions
    //    reached the session — the library code never registered anything)
    val sh = spark.sql("SELECT simhash64('spark submit smoke') AS h").head().getLong(0)
    val lid = spark.sql("SELECT lang_id('the quick brown fox jumps') AS l")
      .head().getString(0)
    val sb = spark.sql("SELECT sample_bucket(42) AS b").head().getLong(0)
    println(s"[submit-smoke] simhash64=$sh lang_id=$lid sample_bucket(42)=$sb")
    assert(sh != 0L, "simhash64 returned 0 for non-empty text")
    assert(lid == "en", s"lang_id misread plain English as $lid")
    assert(sb == graft.ops.Sampling.bucketOf(42L), "sample_bucket mismatch")

    // 4. the lake as a STREAM through the packaged jar: the changefeed
    //    source must resolve by shortName (the DataSourceRegister service
    //    file travels in the jar) and drive an exactly-once Materialize
    //    rollup on this multi-executor master
    {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val srcRoot = s"$lakeRoot/mvsrc"
      val mvSrc = new graft.lake.LakeTable(spark, srcRoot, "SRC", numBuckets = 4)
      mvSrc.create(StructType(Seq(
        StructField("ID", StringType, nullable = false),
        StructField("LANG", StringType), StructField("SZ", LongType))),
        Seq("ID"), "ID")
      mvSrc.merge(Seq(("a", "en", 10L), ("b", "de", 4L)).toDF("ID", "LANG", "SZ"),
        Seq("ID"), "ID", "c1")
      val q = graft.streaming.Materialize.rollup(spark, srcRoot, "SRC",
        s"$lakeRoot/mvdst", "MV", "LANG", Map("BYTES" -> col("SZ")),
        s"$lakeRoot/mvckpt")
      q.processAllAvailable()
      mvSrc.merge(Seq(("c", "en", 5L)).toDF("ID", "LANG", "SZ"),
        Seq("ID"), "ID", "c2")
      q.processAllAvailable()
      q.stop()
      val mvState = new graft.lake.LakeTable(spark, s"$lakeRoot/mvdst", "MV",
        numBuckets = 4).read().collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      println(s"[submit-smoke] mv=$mvState")
      assert(mvState == Map("en" -> (2L, 15L), "de" -> (1L, 4L)),
        s"MV rollup diverged: $mvState")

      // 5. table-valued functions through the SAME extensions conf: the
      //    changefeed and commit history as plain FROM-clause SQL
      val histN = spark.sql(
        s"SELECT count(*) FROM graft_history('$srcRoot', 'SRC')")
        .head().getLong(0)
      assert(histN == mvSrc.snapshotVersions().size,
        s"graft_history rows $histN != retained snapshots")
      val chN = spark.sql(s"SELECT count(*) FROM graft_changes(" +
        s"'$srcRoot', 'SRC', 1, ${mvSrc.currentVersion()})")
        .head().getLong(0)
      assert(chN == 3, s"expected 3 net inserts in the full window, got $chN")
      println(s"[submit-smoke] tvf history=$histN changes=$chN")
    }

    // read membership AFTER the work so executor registration has settled;
    // getExecutorMemoryStatus counts the driver too, so executors = size - 1
    // on a real/local-cluster master (size itself under local[*])
    val members = spark.sparkContext.getExecutorMemoryStatus.size
    println(s"[submit-smoke] PASS master=$master members=$members rootRows=$n childRows=$cn")
    spark.stop()
  }
}
