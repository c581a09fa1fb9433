package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.LakeTable
import graft.lake.LakeTable.TableMerge

/** Multi-table single-job commit ([[LakeTable.mergeAll]]): equivalence
  * with per-table merges, partial-commit recovery, nested-segment reads
  * across compaction and schema evolution, and the shared-commit vacuum.
  */
class MergeAllSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schemaA = StructType(Seq(
    StructField("ID", StringType, nullable = false),
    StructField("V", StringType, nullable = true)))
  // same column name V, DIFFERENT type — the collision the per-table
  // payload structs exist to make impossible
  private val schemaB = StructType(Seq(
    StructField("ID", StringType, nullable = false),
    StructField("FK", StringType, nullable = false),
    StructField("V", LongType, nullable = true)))

  private def mkTables(): (String, LakeTable, LakeTable) = {
    val root = SparkTestSession.tmpDir("graft-mergeall-")
    val a = new LakeTable(spark, root, "A", numBuckets = 4, maxDeltas = 3)
    a.create(schemaA, Seq("ID"), "ID")
    val b = new LakeTable(spark, root, "B", numBuckets = 4, maxDeltas = 3)
    b.create(schemaB, Seq("FK", "ID"), "FK")
    (root, a, b)
  }

  private def dfA(rows: (String, String)*) = rows.toDF("ID", "V")
  private def dfB(rows: (String, String, Long)*) = rows.toDF("ID", "FK", "V")

  test("one write job commits both tables; reads resolve per table") {
    val (root, a, b) = mkTables()
    val snaps = LakeTable.mergeAll(root, Seq(
      TableMerge(a, dfA("a1" -> "x", "a2" -> "y"), Seq("ID"), "ID"),
      TableMerge(b, dfB(("b1", "a1", 7L), ("b2", "a2", 8L)),
        Seq("FK", "ID"), "FK")), "m1")
    assert(snaps("A").hasCommit("m1") && snaps("B").hasCommit("m1"))
    assert(snaps("A").lineage.last.upserted == 2)
    assert(snaps("B").lineage.last.upserted == 2)
    // segments live in the SHARED commit dir, nested per table
    assert(snaps("A").segments.forall(_.sub == "_p_A"))
    assert(snaps("B").segments.forall(_.sub == "_p_B"))
    assert(snaps("A").segments.forall(_.path.contains(LakeTable.SharedCommitsDir)))
    val gotA = a.read().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gotA == Map("a1" -> "x", "a2" -> "y"))
    val gotB = b.read().collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(gotB == Map("b1" -> 7L, "b2" -> 8L))
    // second multi-commit upserts; newest wins per table
    LakeTable.mergeAll(root, Seq(
      TableMerge(a, dfA("a1" -> "x2"), Seq("ID"), "ID"),
      TableMerge(b, dfB(("b1", "a1", 70L)), Seq("FK", "ID"), "FK")), "m2")
    assert(a.read().filter(col("ID") === "a1").head().getString(1) == "x2")
    assert(b.read().filter(col("ID") === "b1").head().getLong(2) == 70L)
  }

  test("two concurrent multi-table writers: every commit lands on both tables") {
    // the mergeAll commit path goes through the same create-exclusive
    // publish + retry as single-table merges — race two union commits
    val (root, a, b) = mkTables()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val nPer = 4
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        try (0 until nPer).foreach { i =>
          LakeTable.mergeAll(root, Seq(
            TableMerge(new LakeTable(spark, root, "A", 4, 3),
              dfA(s"w$w-k$i" -> s"va$w-$i"), Seq("ID"), "ID"),
            TableMerge(new LakeTable(spark, root, "B", 4, 3),
              dfB((s"i$w-$i", s"w$w-k$i", i.toLong)), Seq("FK", "ID"), "FK")),
            s"mw$w:c$i")
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")
    val tags = (for (w <- 0 until 2; i <- 0 until nPer) yield s"mw$w:c$i").toSet
    Seq(a, b).foreach { t =>
      val commits = t.snapshot().commits.toSet
      assert(tags.subsetOf(commits), s"${t.name} lost: ${tags -- commits}")
    }
    assert(a.read().count() == 2L * nPer)
    assert(b.read().count() == 2L * nPer)
  }

  test("exactly-once: full re-commit is a no-op; PARTIAL recovery skips committed tables") {
    val (root, a, b) = mkTables()
    LakeTable.mergeAll(root, Seq(
      TableMerge(a, dfA("a1" -> "x"), Seq("ID"), "ID"),
      TableMerge(b, dfB(("b1", "a1", 1L)), Seq("FK", "ID"), "FK")), "m1")
    val va = a.snapshot().version
    // full replay of the same tag: both tables untouched
    LakeTable.mergeAll(root, Seq(
      TableMerge(a, dfA("a1" -> "CLOBBER"), Seq("ID"), "ID"),
      TableMerge(b, dfB(("b1", "a1", 99L)), Seq("FK", "ID"), "FK")), "m1")
    assert(a.snapshot().version == va)
    assert(a.read().head().getString(1) == "x")
    assert(b.read().head().getLong(2) == 1L)
    // partial-crash shape: A committed m2 alone (e.g. via single merge),
    // the multi-commit retry must apply m2 ONLY to B
    a.merge(dfA("a2" -> "solo"), Seq("ID"), "ID", "m2")
    val va2 = a.snapshot().version
    LakeTable.mergeAll(root, Seq(
      TableMerge(a, dfA("a2" -> "CLOBBER"), Seq("ID"), "ID"),
      TableMerge(b, dfB(("b2", "a2", 2L)), Seq("FK", "ID"), "FK")), "m2")
    assert(a.snapshot().version == va2)
    assert(a.read().filter(col("ID") === "a2").head().getString(1) == "solo")
    assert(b.read().count() == 2)
    assert(b.snapshot().hasCommit("m2"))
  }

  test("torn commit: crash BETWEEN two tables' publishes, same-tag re-apply recovers") {
    // the crash-recovery face of the exactly-once contract (VERDICT r5
    // #8): the fault seam throws right after the FIRST table's snapshot
    // publish — a real mid-commit crash — then the same commitTag is
    // re-applied and must no-op the committed table while completing the
    // other, with no double-apply on either
    val (root, a, b) = mkTables()
    LakeTable.mergeAll(root, Seq(
      TableMerge(a, dfA("a1" -> "x"), Seq("ID"), "ID"),
      TableMerge(b, dfB(("b1", "a1", 1L)), Seq("FK", "ID"), "FK")), "seed")
    val boom = new RuntimeException("injected crash between table publishes")
    val thrown =
      try {
        LakeTable.afterTableCommit = _ => throw boom
        intercept[RuntimeException] {
          LakeTable.mergeAll(root, Seq(
            TableMerge(a, dfA("a1" -> "x2", "a3" -> "z"), Seq("ID"), "ID"),
            TableMerge(b, dfB(("b2", "a3", 2L)), Seq("FK", "ID"), "FK")),
            "torn")
        }
      } finally LakeTable.afterTableCommit = _ => ()
    assert(thrown eq boom)
    // torn state on disk: exactly ONE of the two tables carries the tag
    val committed = Seq(a, b).filter(_.snapshot().hasCommit("torn"))
    assert(committed.size == 1,
      s"expected exactly one committed table, got ${committed.map(_.name)}")
    val vFirst = committed.head.currentVersion()
    // recovery: re-apply the SAME tag with the SAME payload
    val snaps = LakeTable.mergeAll(root, Seq(
      TableMerge(a, dfA("a1" -> "x2", "a3" -> "z"), Seq("ID"), "ID"),
      TableMerge(b, dfB(("b2", "a3", 2L)), Seq("FK", "ID"), "FK")), "torn")
    assert(snaps("A").hasCommit("torn") && snaps("B").hasCommit("torn"))
    // the mid-crash-committed table did NOT advance again (no double apply)
    assert(committed.head.currentVersion() == vFirst)
    val gotA = a.read().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gotA == Map("a1" -> "x2", "a3" -> "z"))
    val gotB = b.read().collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(gotB == Map("b1" -> 1L, "b2" -> 2L))
  }

  test("deletes cascade through a multi-commit; at-cap buckets compact inline") {
    val (root, a, b) = mkTables()
    // lsn-domain rows so deletes need explicit lsns (same contract as merge)
    def seqA(rows: (String, String, Long)*) = rows.toDF("ID", "V", "lsn")
    def seqB(rows: (String, String, Long, Long)*) = rows.toDF("ID", "FK", "V", "lsn")
    LakeTable.mergeAll(root, Seq(
      TableMerge(a, seqA(("a1", "x", 1L), ("a2", "y", 2L)), Seq("ID"), "ID",
        rowSeqCol = Some("lsn")),
      TableMerge(b, seqB(("b1", "a1", 1L, 1L), ("b2", "a2", 2L, 2L)),
        Seq("FK", "ID"), "FK", rowSeqCol = Some("lsn"))), "m1")
    val dels = Seq(("a1", 10L)).toDF("ID", "lsn")
    val snaps = LakeTable.mergeAll(root, Seq(
      TableMerge(a, seqA(), Seq("ID"), "ID", deleteRootKeys = Some(dels),
        rowSeqCol = Some("lsn")),
      TableMerge(b, seqB(), Seq("FK", "ID"), "FK",
        deleteRootKeys = Some(dels), rowSeqCol = Some("lsn"))), "m2")
    assert(snaps("A").lineage.last.deleted == 1)
    assert(a.read().collect().map(_.getString(0)).toSeq == Seq("a2"))
    assert(b.read().collect().map(_.getString(0)).toSeq == Seq("b2"))
    // push A's buckets to the delta cap: compaction rewrites NESTED
    // segments (read path must unwrap sub structs during the base write)
    (3 to 8).foreach { i =>
      LakeTable.mergeAll(root, Seq(
        TableMerge(a, seqA((s"z$i", "v", i.toLong)), Seq("ID"), "ID",
          rowSeqCol = Some("lsn"))), s"m$i")
    }
    val sa = a.snapshot()
    assert(sa.segments.exists(_.kind == "base"))
    val ids = a.read().collect().map(_.getString(0)).toSet
    assert(!ids.contains("a1") && ids.contains("a2") && ids.contains("z8"))
  }

  test("schema evolution mid-stream: mixed plain/nested segments align on read") {
    val (root, a, _) = mkTables()
    a.merge(dfA("a1" -> "x"), Seq("ID"), "ID", "plain1") // top-level segment
    val evolved = schemaA.add("W", LongType)
    a.evolve(evolved, Seq("ID"), "ID")
    LakeTable.mergeAll(root, Seq(
      TableMerge(a, Seq(("a2", "y", 5L)).toDF("ID", "V", "W"),
        Seq("ID"), "ID")), "nested1")
    val got = a.read().orderBy("ID").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq(("a1", "x", -1L), ("a2", "y", 5L)))
  }

  test("ENGINE replay through the union-merge path equals the per-table path") {
    import graft.cdc.EventGen
    import graft.engine.Engine
    import graft.catalog.Catalog
    val p = EventGen.Params(nEvents = 800, nRepos = 12, pathsPerRepo = 8)
    val events = EventGen.events(spark, p, partitions = 2).toDF()
    def replay(union: Boolean): Seq[String] = {
      val prev = sys.props.get("graft.union.merge")
      sys.props("graft.union.merge") = if (union) "1" else "0"
      try {
        val root = SparkTestSession.tmpDir("graft-union-replay-")
        val e = new Engine(spark, root, numBuckets = 8)
        // two batches so the union path commits against existing tables too
        e.applyEvents("repos", events.filter(col("lsn") < 400), "b:0")
        e.applyEvents("repos", events.filter(col("lsn") >= 400), "b:1")
        val spec = Catalog.fromTree(e.loadRegistry("repos").get)
          .find(_.isRoot).get
        e.table(spec).read().select("ID", "REV", "CONTENT").orderBy("ID")
          .collect().map(_.toString).toSeq
      } finally {
        prev match {
          case Some(v) => sys.props("graft.union.merge") = v
          case None    => sys.props.remove("graft.union.merge")
        }
      }
    }
    val viaUnion = replay(union = true)
    val viaTables = replay(union = false)
    assert(viaUnion.nonEmpty)
    assert(viaUnion == viaTables)
  }

  test("shared vacuum GCs unreferenced commit dirs, keeps live ones") {
    val (root, a, b) = mkTables()
    LakeTable.mergeAll(root, Seq(
      TableMerge(a, dfA("a1" -> "x"), Seq("ID"), "ID"),
      TableMerge(b, dfB(("b1", "a1", 1L)), Seq("FK", "ID"), "FK")), "m1")
    // orphan: a commit dir no snapshot references (simulated failed write)
    val orphan = java.nio.file.Paths.get(root,
      LakeTable.SharedCommitsDir, "orphan-123")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("junk"), "x")
    // grace period first: nothing (even the orphan) is touched
    assert(LakeTable.vacuumShared(spark, root, graceMs = 600000L) == 0)
    assert(java.nio.file.Files.isDirectory(orphan))
    val removed = LakeTable.vacuumShared(spark, root, graceMs = 0L)
    assert(removed == 1)
    assert(!java.nio.file.Files.exists(orphan))
    // live segments untouched and readable
    assert(a.read().count() == 1 && b.read().count() == 1)
    // compact everything → shared dir drops out of the live set → GC'd
    a.compactAll("ca"); b.compactAll("cb")
    assert(LakeTable.vacuumShared(spark, root, graceMs = 0L) >= 1)
    assert(a.read().count() == 1 && b.read().count() == 1)
  }
}
