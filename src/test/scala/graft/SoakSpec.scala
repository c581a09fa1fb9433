package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Catalog
import graft.engine.Engine

/** Long-haul soak (VERDICT r6 #3): 1,000 micro-batches through the
  * foreachBatch apply path, proving at four orders of magnitude what the
  * r6 registry fix claims — steady-state batches leave ZERO registry IO
  * (file count stays O(schema-changes), not O(batches)), snapshot count
  * stays bounded by vacuum, and per-batch driver wall stays flat (no
  * O(batches) state creeps into the commit path). BASELINE.json's 10^10
  * story runs ~10^6 batches; a linear leak invisible at 10 batches is
  * unmissable at 10^3. */
class SoakSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("SOAK 1000 micro-batches: registry O(changes), snapshots bounded, flat wall") {
    import spark.implicits._
    val lakeRoot = SparkTestSession.tmpDir("graft-soak-lake-")
    val engine = new Engine(spark, lakeRoot, numBuckets = 2)
    val nBatches = 1000
    val keys = 40
    val walls = new Array[Double](nBatches)
    var lsn = 0L
    (0 until nBatches).foreach { b =>
      // constant-length fields (zero-padded) so the attribute tree is a
      // PURE function of the schema phase — any maxLength drift would
      // legitimately version the registry and blur the O(changes) count
      val docs = (0 until 5).map { k =>
        val id = f"d${(b * 5 + k) % keys}%02d"
        // three schema phases: base → +extra:number → extra widens to string
        val extra =
          if (b < 300) ""
          else if (b < 700) s""","extra":${(b % 90) + 10}"""
          else f""","extra":"s$b%04d""""
        val l = lsn
        lsn += 1
        (l, "update",
          f"""{"id":"$id","rev":"$b%04d.$k","content":"c$b%04d-$k"$extra}""")
      }
      val t0 = System.nanoTime()
      engine.applyEvents("soak", docs.toDF("lsn", "op", "doc"), s"soak:$b")
      walls(b) = (System.nanoTime() - t0) / 1e6
      // periodic maintenance window, as a production pipeline would run
      if ((b + 1) % 250 == 0)
        engine.maintain("soak", s"mnt:$b", vacuumGraceMs = 0L)
    }

    // registry file count = O(schema changes): exactly v1 (initial tree),
    // v2 (+extra as number, batch 300), v3 (extra widened to string,
    // batch 700) — 997 steady-state batches wrote NOTHING (the r6 fix;
    // before it this directory held ~1000 files)
    val regFiles = new java.io.File(lakeRoot, "_registry_soak")
      .listFiles().map(_.getName).filter(_.endsWith(".json")).sorted
    assert(regFiles.toSeq == Seq("v00001.json", "v00002.json", "v00003.json"),
      s"registry grew past O(schema-changes): ${regFiles.mkString(",")}")

    // snapshot log bounded by vacuum (keepSnapshots), not O(batches)
    val spec = Catalog.fromTree(engine.loadRegistry("soak").get)
      .find(_.isRoot).get
    val lake = engine.table(spec)
    assert(lake.snapshotVersions().size <= 16,
      s"snapshot log grew unboundedly: ${lake.snapshotVersions().size}")

    // final state: LWW per key over the whole soak
    assert(lake.read().count() == keys)

    // flat per-batch driver wall: median of an early window vs the final
    // window (medians over 200 batches shrug off host-steal bursts and
    // the occasional maintenance-adjacent batch)
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val early = median(walls.slice(100, 300))
    val late = median(walls.slice(800, 1000))
    info(f"per-batch wall ms: first100=${median(walls.slice(0, 100))}%.0f " +
      f"early(100-300)=$early%.0f mid(450-650)=${median(walls.slice(450, 650))}%.0f " +
      f"late(800-1000)=$late%.0f")
    assert(late <= early * 2.5,
      f"per-batch wall drifted: early=$early%.1f ms → late=$late%.1f ms")
  }
}
