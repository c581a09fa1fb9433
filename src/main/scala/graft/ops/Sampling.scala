package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation — the missing piece
  * between dedup and mixing: corpus recipes ("5% of English web, 80% of
  * code, all of math") need samples that are reproducible across runs,
  * cheap at 100 TB, and NESTED (raising a rate must grow the previous
  * sample, never reshuffle it, so ablations share rows).
  *
  * Hash-threshold sampling delivers all three: keep a row iff
  * `bucket(key) < rate · 2^24`, where `bucket` is the top 24 bits of a
  * splitmix64 mix of the key. No shuffle, no RNG state, no driver
  * coordination — a pure map-side filter that composes with scan pruning,
  * and because the bucket depends only on the key, per-stratum thresholds
  * give exact stratified control while keeping samples at different rates
  * nested by construction (`rate₁ ≤ rate₂ ⇒ sample₁ ⊆ sample₂`).
  *
  * The bucket is a native codegen kernel ([[graft.functions.expressions.
  * SampleBucket64]], SQL name `sample_bucket`) — ANSI-session-safe Java
  * long arithmetic; no UDF, no sampling-specific shuffle. The DuckDB
  * oracle replicates the mix in HUGEINT mod-2^64 arithmetic
  * (`SparkEntry.oracleSql("sample_stratified")`).
  */
object Sampling {

  /** splitmix64-style mix of a long key: golden-gamma multiply, then the
    * two xor-shift/multiply finalizer rounds (Steele et al., "Fast
    * Splittable Pseudorandom Number Generators", OOPSLA '14 — public
    * constants). The mix NEEDS mod-2^64 wraparound, which Java long
    * arithmetic gives for free — this is the eval target of the native
    * [[graft.functions.expressions.SampleBucket64]] kernel. */
  def splitmix64Of(key: Long): Long = {
    val z0 = key * 0x9E3779B97F4A7C15L
    val z1 = (z0 ^ (z0 >>> 30)) * 0xBF58476D1CE4E5B9L
    val z2 = (z1 ^ (z1 >>> 27)) * 0x94D049BB133111EBL
    z2 ^ (z2 >>> 31)
  }

  /** Sample bucket of a long key: [[splitmix64Of]]'s top 24 bits. Called
    * from generated code — keep public and allocation-free. */
  def bucketOf(key: Long): Long = splitmix64Of(key) >>> 40

  /** Uniform sample bucket in [0, 2^24) as a Column: the TOP 24 bits of
    * the mix (the top bits are non-negative on both the Spark side and
    * the unsigned-arithmetic oracle side — a plain `pmod` would disagree
    * with unsigned `%` because 2^64 is not a multiple of the modulus).
    * Backed by the native codegen kernel, NOT a built-in multiply chain:
    * under Spark 4's default ANSI mode a built-in `Multiply` throws
    * ARITHMETIC_OVERFLOW for essentially every key, so the column form
    * must not depend on the session's ANSI flag. SQL surface:
    * `sample_bucket(key)` via [[graft.GraftExtensions]]. */
  def sampleBucket(key: Column): Column =
    graft.functions.expressions.sampleBucket(key)

  /** The wrap-around built-ins form of the mix — the exact shape the
    * DuckDB oracle replicates in HUGEINT mod-2^64 arithmetic. Only valid
    * under non-ANSI sessions (the oracle environment); property-tested
    * ≡ [[splitmix64Of]], never used in a query plan. */
  private[graft] def splitmix64WrapCols(key: Column): Column = {
    val z0 = key * lit(0x9E3779B97F4A7C15L)
    val z1 = z0.bitwiseXOR(shiftrightunsigned(z0, 30)) * lit(0xBF58476D1CE4E5B9L)
    val z2 = z1.bitwiseXOR(shiftrightunsigned(z1, 27)) * lit(0x94D049BB133111EBL)
    z2.bitwiseXOR(shiftrightunsigned(z2, 31))
  }

  val BucketSpace: Long = 1L << 24

  /** `rate` ∈ [0,1] → integer bucket threshold. Computed once on the
    * driver so the plan carries exact integer literals (no per-row float
    * rounding to disagree with an oracle). */
  def thresholdOf(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    math.min((rate * BucketSpace).toLong, BucketSpace)
  }

  /** Key column of any type → the long the mix runs on: integral keys
    * cast (so the bucket is a pure function of the VALUE — stable if the
    * column later widens int → long), everything else (string URLs,
    * binary digests, structs) through the built-in `xxhash64` (ANSI-safe,
    * seed-stable across Spark versions by spec). */
  private def keyAsLong(df: DataFrame, keyCol: String): Column = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(keyCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => col(keyCol).cast("long")
      case _ => xxhash64(col(keyCol))
    }
  }

  /** Deterministic uniform sample: keep rows whose key-bucket falls under
    * `rate`. Pure filter — pushes past into the scan like any predicate.
    * Keys of any type (see [[keyAsLong]]). A NULL key has no identity to
    * sample by: its bucket is null, the comparison is null, and the row
    * is dropped at every rate (pinned by OpsSpec) — filter null keys out
    * (or synthesize keys) upstream if they must be kept. */
  def uniformSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(sampleBucket(keyAsLong(df, keyCol)) < lit(thresholdOf(rate)))

  /** Deterministic STRATIFIED sample: per-stratum rates (e.g. per
    * language), `defaultRate` for strata not in the map. The rate table is
    * O(strata) and broadcast — the big side never shuffles; at 100 TB this
    * is a map-side hash-lookup filter fused into the scan stage.
    *
    * Output preserves `df`'s column order (a USING join would move the
    * stratum column to the front). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.toSeq.map { case (s, r) => (s, thresholdOf(r)) }
      .toDF(strataCol, "_g_thresh")
    df.join(broadcast(ratesDf), Seq(strataCol), "left")
      .filter(sampleBucket(keyAsLong(df, keyCol)) <
        coalesce(col("_g_thresh"), lit(thresholdOf(defaultRate))))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Deterministic DISJOINT corpus split (train/val/test): label each row
    * with the first part whose cumulative rate covers its key-bucket.
    * Zero-shuffle — one native-kernel column plus a CASE chain of integer
    * literals, fused into the scan like [[uniformSample]]. Membership is
    * a pure function of the KEY, so splits are stable as the corpus grows
    * (a doc never migrates between train and test across runs — the
    * leakage guarantee recipes need), and the FIRST part at rate r is
    * exactly [[uniformSample]]'s sample at r (nesting by construction).
    * Rates must sum to 1; the LAST part is the unconditional `otherwise`
    * arm, so float rounding can never leave an unlabeled row — and a
    * NULL key (whose bucket is null, failing every `<` test) also lands
    * in the last part rather than falling out of the partition, matching
    * the SQL `CASE … ELSE` a recipe would write. */
  def split(df: DataFrame, keyCol: String,
      parts: Seq[(String, Double)], labelCol: String = "split"): DataFrame = {
    require(parts.nonEmpty, "split needs at least one part")
    require(parts.map(_._2).forall(r => r >= 0.0 && r <= 1.0),
      "part rates must be in [0,1]")
    require(math.abs(parts.map(_._2).sum - 1.0) < 1e-9,
      s"part rates must sum to 1, got ${parts.map(_._2).sum}")
    val cum = parts.scanLeft(0.0) { case (acc, (_, r)) => acc + r }.tail
    val b = sampleBucket(keyAsLong(df, keyCol))
    val labeled = parts.init.map(_._1).zip(cum.init.map(thresholdOf))
      .foldRight(lit(parts.last._1)) { case ((label, t), els) =>
        when(b < lit(t), lit(label)).otherwise(els)
      }
    df.withColumn(labelCol, labeled)
  }

  /** Deterministic EXACT-COUNT stratified take: the `target` smallest
    * key-buckets per stratum (ties broken by the key itself) — the
    * "exactly N docs per language" corpus recipe. Counts are exact where
    * rate-based sampling is only exact in expectation; nesting still
    * holds (`k₁ ≤ k₂ ⇒ take₁ ⊆ take₂`: the per-stratum order is fixed).
    * Cost: ONE shuffle (window partitioned by stratum, sorted by the
    * 24-bit bucket) against rate-sampling's zero — at 100 TB use this
    * when exact counts matter, rates when ±ε is fine. Stratum skew is
    * the partition-by column's skew: AQE splits oversized partitions,
    * and the sort key is a dense int so spills stay columnar-cheap. */
  def stratifiedTake(df: DataFrame, keyCol: String, strataCol: String,
      targets: Map[String, Long], defaultTarget: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val targetsDf = targets.toSeq.toDF(strataCol, "_g_target")
    val b = sampleBucket(keyAsLong(df, keyCol))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("_g_bucket"), col(keyCol))
    df.withColumn("_g_bucket", b)
      // null keys have no identity to rank by (same rule as uniformSample)
      // — and under asc-nulls-first they would silently eat take slots
      .filter(col("_g_bucket").isNotNull)
      .join(broadcast(targetsDf), Seq(strataCol), "left")
      .withColumn("_g_rn", row_number().over(w))
      .filter(col("_g_rn") <= coalesce(col("_g_target"), lit(defaultTarget)))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
