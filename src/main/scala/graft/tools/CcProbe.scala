package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Convergence/scale probe for `Dedup.connectedComponents` —
  * `runMain graft.tools.CcProbe [nodes] [chainLen] [randomEdges] [cores]`.
  *
  * Builds a deterministic graph distributed via `spark.range` (never on
  * the driver): `nodes/chainLen` disjoint PATHS of length `chainLen`
  * (the adversarial case for label propagation — a naive min-label
  * sweep needs O(chainLen) rounds) plus `randomEdges` xxhash-derived
  * extra edges that splice chains into larger components. Prints rounds
  * to fixpoint, wall seconds, component count, and a correctness check
  * against the closed form when `randomEdges == 0` (components =
  * nodes/chainLen, every label = its chain's first node).
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val nodes = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val chainLen = args.lift(1).map(_.toInt).getOrElse(64)
    val randomEdges = args.lift(2).map(_.toLong).getOrElse(0L)
    val cores = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // chains: (i, i+1) except across chain boundaries
    val chain = spark.range(0, nodes - 1, 1, cores * 2)
      .filter(col("id") % chainLen =!= (chainLen - 1))
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
    val rand = if (randomEdges <= 0) chain.limit(0) else
      spark.range(0, randomEdges, 1, cores * 2)
        .select(pmod(xxhash64(col("id")), lit(nodes)).as("id1"),
          pmod(xxhash64(col("id") + 7777777L), lit(nodes)).as("id2"))
        .filter(col("id1") =!= col("id2"))
    val edges = chain.unionByName(rand)

    val t0 = System.nanoTime()
    val (cc, rounds) = graft.ops.Dedup.connectedComponentsWithStats(edges)
    val nComp = cc.select(countDistinct("component")).head().getLong(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val nEdges = edges.count()
    println(f"[ccprobe] nodes=$nodes chainLen=$chainLen randomEdges=$randomEdges " +
      f"cores=$cores edges=$nEdges rounds=$rounds wall=$wall%.2f s components=$nComp")
    if (randomEdges == 0) {
      // only chains with ≥2 nodes produce edges (and therefore CC rows):
      // nodes % chainLen == 1 leaves the final chain a lone edgeless node
      // (ADVICE r6 #4 — the old ceil-division expected one component too
      // many there and FAILed on a correct result)
      val full = (nodes + chainLen - 1) / chainLen
      val expect = if (nodes % chainLen == 1) full - 1 else full
      val wrong = cc.filter(col("component") =!=
        (col("id") - col("id") % chainLen)).count()
      println(s"[ccprobe] closed-form check: components=$nComp expect=$expect " +
        s"mislabeled=$wrong ${if (nComp == expect && wrong == 0) "OK" else "FAIL"}")
    }
    spark.stop()
  }
}
