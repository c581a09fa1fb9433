package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Catalog
import graft.cdc.EventGen
import graft.engine.Engine

/** Structured-Streaming path: change-event tail → lake tables via
  * foreachBatch, resumable from checkpoint (north rule: "resumable from
  * Spark checkpoints with per-partition lineage + metrics"). Uses a
  * durable file source so restart genuinely resumes from offsets. */
class StreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming ingest resumes from checkpoint; final state = clean batch replay") {
    import spark.implicits._

    val lakeRoot = SparkTestSession.tmpDir("graft-stream-lake-")
    val ckpt = SparkTestSession.tmpDir("graft-stream-ckpt-")
    val srcDir = SparkTestSession.tmpDir("graft-stream-src-")
    val engine = new Engine(spark, lakeRoot, numBuckets = 8)
    val p = EventGen.Params(nEvents = 600, nRepos = 10, pathsPerRepo = 8)
    val all = EventGen.events(spark, p, partitions = 2).toDF().cache()

    def dump(lo: Long, hi: Long, name: String): Unit =
      all.filter($"lsn" >= lo && $"lsn" < hi)
        .coalesce(1).write.json(s"$srcDir/$name")

    def startStream() = engine.stream("repos",
      spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", "1")
        .json(s"$srcDir/*/"),
      ckpt, queryName = "cdc-test")

    // phase 1: two source files, run, stop (simulated shutdown)
    dump(0, 200, "f1"); dump(200, 400, "f2")
    val q1 = startStream()
    q1.processAllAvailable()
    q1.stop()

    val rootSpec = Catalog.fromTree(engine.loadRegistry("repos").get)
      .find(_.isRoot).get
    assert(engine.table(rootSpec).read().count() > 0)

    // phase 2: a third file arrives; restart from the same checkpoint
    dump(400, 600, "f3")
    val q2 = startStream()
    q2.processAllAvailable()
    q2.stop()

    // final state equals a clean single-shot replay of all 600 events
    val cleanRoot = SparkTestSession.tmpDir("graft-clean-lake-")
    val cleanEngine = new Engine(spark, cleanRoot, numBuckets = 8)
    val cleanStats = cleanEngine.applyEvents("repos", all, "clean:0")
    val cleanSpec = Catalog.fromTree(cleanEngine.loadRegistry("repos").get)
      .find(_.isRoot).get

    def state(e: Engine, s: graft.catalog.TableSpec) =
      e.table(s).read().select("ID", "REV", "CONTENT").orderBy("ID")
        .collect().map(_.toString).toSeq

    assert(state(engine, rootSpec) == state(cleanEngine, cleanSpec))
    assert(state(engine, rootSpec).nonEmpty)

    // lineage: commit tags unique (idempotent application), batches span
    // the restart boundary
    val tags = engine.table(rootSpec).snapshot().lineage.map(_.tag)
    assert(tags.distinct.size == tags.size)
    assert(tags.size >= 2)

    // applied-event metrics: one JSONL line per micro-batch, spanning the
    // restart; applied counts are post-dedup, so across batches they are
    // bounded below by the clean single-shot apply (cross-batch updates
    // count once per batch) and above by the raw tail
    val metrics = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(lakeRoot, "_metrics_repos.jsonl"))
    assert(metrics.size() >= 3, s"expected ≥3 batch lines, got $metrics")
    val fields = "\"batchEvents\":(\\d+)".r
    val total = metrics.toArray.map(l =>
      fields.findFirstMatchIn(l.toString).get.group(1).toLong).sum
    val cleanApplied = cleanStats.batchEvents
    assert(total >= cleanApplied && total <= 600,
      s"metrics events sum $total outside [$cleanApplied, 600]")
    assert(metrics.toArray.forall(_.toString.contains("\"tables\":")))

    // the same log through the first-class read surface: typed rows,
    // same batch count, consistent event sum, every wall measured
    val mlog = engine.metricsLog("repos")
    val mrows = mlog.orderBy("ts", "batch").collect()
    assert(mrows.length == metrics.size())
    assert(mrows.map(_.getLong(mlog.columns.indexOf("batch_events"))).sum
      == total)
    assert(mrows.forall(_.getLong(mlog.columns.indexOf("wall_ms")) >= 0))
    assert(mrows.map(_.getString(mlog.columns.indexOf("query"))).distinct
      .forall(_.nonEmpty))
  }

  test("rebucket MID-STREAM: growth re-layout between micro-batches; old-layout reader stays consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

    val lakeRoot = SparkTestSession.tmpDir("graft-rebucket-lake-")
    val ckpt = SparkTestSession.tmpDir("graft-rebucket-ckpt-")
    val srcDir = SparkTestSession.tmpDir("graft-rebucket-src-")
    val engine = new Engine(spark, lakeRoot, numBuckets = 4)
    val p = EventGen.Params(nEvents = 400, nRepos = 8, pathsPerRepo = 6)
    val all = EventGen.events(spark, p, partitions = 2).toDF().cache()

    def dump(lo: Long, hi: Long, name: String): Unit =
      all.filter($"lsn" >= lo && $"lsn" < hi)
        .coalesce(1).write.json(s"$srcDir/$name")
    def startStream() = engine.stream("repos",
      spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", "1")
        .json(s"$srcDir/*/"), ckpt, queryName = "cdc-rebucket")

    dump(0, 200, "f1")
    val q1 = startStream(); q1.processAllAvailable(); q1.stop()

    val rootSpec = Catalog.fromTree(engine.loadRegistry("repos").get)
      .find(_.isRoot).get
    val lake = engine.table(rootSpec)
    assert(lake.snapshot().numBuckets == 4)
    // an OLD-LAYOUT reader planned before the re-layout (lazy plan pinned
    // to the pre-rebucket snapshot's segment files)
    val oldReader = lake.read().select("ID", "REV").orderBy("ID")
    val oldState = oldReader.collect().map(_.toString).toSeq

    // maintenance-window growth: 4 → 16 buckets, every table together
    engine.rebucket("repos", 16)
    // the in-flight old-layout reader still resolves (rebucket swaps the
    // snapshot atomically; superseded files live until vacuum's grace)
    assert(oldReader.collect().map(_.toString).toSeq == oldState)

    // stream continues from the SAME checkpoint; subsequent merges must
    // hash with the new modulus
    dump(200, 400, "f2")
    val q2 = startStream(); q2.processAllAvailable(); q2.stop()

    val snap = lake.snapshot()
    assert(snap.numBuckets == 16)
    val deltas = snap.segments.filter(_.kind == "delta")
    assert(deltas.nonEmpty, "post-rebucket batches should append deltas")
    // post-rebucket deltas hash with the NEW modulus: bucket ids beyond
    // the old range [0,4) appear (with ~120 keys, buckets 4-15 are hit
    // w.p. 1 - 2^-60), and live keys' new-modulus hashes cover the deltas
    val bucketIds = deltas.map(_.bucket).toSet
    assert(bucketIds.forall(b => b >= 0 && b < 16))
    assert(bucketIds.exists(_ >= 4),
      s"deltas $bucketIds all in the OLD modulus range — merge did not " +
        "pick up the re-layout")
    val keyBuckets = lake.read()
      .select(pmod(xxhash64(col("ID")), lit(16)).cast("int")).collect()
      .map(_.getInt(0)).toSet
    // tombstone-only buckets (deleted keys) may not appear in keyBuckets
    assert((bucketIds -- keyBuckets).size <= bucketIds.size / 2)

    // final state equals a clean replay (re-layout lost nothing)
    val cleanRoot = SparkTestSession.tmpDir("graft-rebucket-clean-")
    val cleanEngine = new Engine(spark, cleanRoot, numBuckets = 16)
    cleanEngine.applyEvents("repos", all, "clean:0")
    val cleanSpec = Catalog.fromTree(cleanEngine.loadRegistry("repos").get)
      .find(_.isRoot).get
    def state(e: Engine, s: graft.catalog.TableSpec) =
      e.table(s).read().select("ID", "REV", "CONTENT").orderBy("ID")
        .collect().map(_.toString).toSeq
    assert(state(engine, rootSpec) == state(cleanEngine, cleanSpec))
    assert(state(engine, rootSpec).nonEmpty)
  }
}
