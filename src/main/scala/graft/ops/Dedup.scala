package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed to
  * scale: exact dedup is one hash-groupBy; the near-dup families
  * (MinHash+LSH, SimHash, embedding-LSH) all follow the same shape —
  * signature → band/bucket key → self-join WITHIN buckets only — so the
  * candidate join never goes quadratic and shuffles only on bucket keys.
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

  /** Character k-shingle hash set of a string (sorted, distinct). */
  def shingles(text: String, k: Int): Array[Long] = {
    if (text.length < k) return Array(mix(text.hashCode.toLong))
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + k <= text.length) {
      var h = 1125899906842597L
      var j = i
      while (j < i + k) { h = 31 * h + text.charAt(j); j += 1 }
      set.add(mix(h))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    out
  }

  /** MinHash signature: numHashes permutations via seeded affine mixes. */
  def minhashSignature(text: String, k: Int, numHashes: Int): Array[Long] = {
    val sh = shingles(text, k)
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

  /** MinHash + LSH near-duplicate pairs:
    * shingle → minhash → band hashes → explode(bands) → self-join within
    * (band, bandHash) buckets → distinct pairs → signature-estimate filter.
    * Scale: the only shuffles are the bucket groupBy-join and the final
    * distinct; no all-pairs comparison ever materializes.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigUdf = udf((s: String) => minhashSignature(s, shingleK, numHashes))
    val bandUdf = udf((sig: Seq[Long]) =>
      (0 until bands).map(b => mix(sig.slice(b * rows, (b + 1) * rows)
        .foldLeft(17L)((acc, h) => acc * 31 + h))).toArray)
    val estUdf = udf((a: Seq[Long], b: Seq[Long]) =>
      estJaccard(a.toArray, b.toArray))

    val sigs = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", sigUdf(col("text")))
      .withColumn("bandh", bandUdf(col("sig")))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(col("bandh")).as(Seq("band", "bh")))

    val l = banded.select(col("band"), col("bh"),
      col("id").as("id1"), col("sig").as("sig1"))
    val r = banded.select(col("band"), col("bh"),
      col("id").as("id2"), col("sig").as("sig2"))
    l.join(r, Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        estUdf(col("sig1"), col("sig2")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("id1", "id2").agg(max("est_jaccard").as("est_jaccard"))
  }

  /** n-gram Jaccard verification over candidate pairs: join texts back and
    * compute the exact shingle-set Jaccard. */
  def verifyJaccard(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 5, threshold: Double = 0.6): DataFrame = {
    val jacUdf = udf((x: String, y: String) => exactJaccard(x, y, shingleK))
    val t1 = df.select(col(idCol).as("id1"), col(textCol).as("t1"))
    val t2 = df.select(col(idCol).as("id2"), col(textCol).as("t2"))
    pairs.join(t1, "id1").join(t2, "id2")
      .withColumn("jaccard", round(jacUdf(col("t1"), col("t2")), 4))
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

  val simhashUdf = udf(simhash _)

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit keys — any
    * pair within Hamming distance 3 shares at least one exact band
    * (pigeonhole) — join within bands, verify distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hdUdf = udf((a: Long, b: Long) => hamming(a, b))
    // native codegen'd expression — no UDF in the scan
    val sh = df.select(col(idCol).as("id"),
      graft.functions.expressions.simhash64(col(textCol)).as("sh"))
    val banded = sh.select(col("id"), col("sh"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*
    )).as("bk")).select(col("id"), col("sh"),
      col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.select(col("band"), col("key"), col("id").as("id1"), col("sh").as("sh1"))
    val r = banded.select(col("band"), col("key"), col("id").as("id2"), col("sh").as("sh2"))
    l.join(r, Seq("band", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), hdUdf(col("sh1"), col("sh2")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id1", "id2").agg(min("hamming").as("hamming"))
  }

  // ---------- embedding near-dup ----------

  /** Embedding cosine near-dup via random-hyperplane LSH: b seeded
    * hyperplanes → sign bits → bucket join on the full signature →
    * exact cosine verify. Vectors bucketed once; join is per-bucket. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 12, minCosine: Double = 0.95, seed: Long = 42L): DataFrame = {
    val sigUdf = udf((v: Seq[Float]) => Similarity.hyperplaneSig(v.toArray, bits, seed))
    val cosUdf = udf((a: Seq[Float], b: Seq[Float]) =>
      Similarity.cosine(a.toArray, b.toArray))
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig", sigUdf(col("v")))
    val l = sigs.select(col("sig"), col("id").as("id1"), col("v").as("v1"))
    val r = sigs.select(col("sig"), col("id").as("id2"), col("v").as("v2"))
    l.join(r, Seq("sig"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(cosUdf(col("v1"), col("v2")), 4).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .groupBy("id1", "id2").agg(max("cosine").as("cosine"))
  }
}
