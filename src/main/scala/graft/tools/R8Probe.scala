package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** r08 optimization-round sub-pipeline probe: time each stage of the
  * expensive dedup queries in isolation (noop sink) and print candidate
  * volumes, so the optimization targets the stage that actually costs.
  * Usage: runMain graft.tools.R8Probe [sfDir] [reps]
  */
object R8Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(label: String)(f: => DataFrame): Unit = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[r8] $label%-42s min=${walls.min}%6.3f " +
        walls.map(w => f"$w%.3f").mkString("[", ",", "]"))
    }
    def count(label: String)(f: => DataFrame): Unit = {
      val n = f.count()
      System.err.println(f"[r8] $label%-42s n=$n")
    }

    // --- dedup_minhash_lsh stages ---
    def mhSigs = docs.select(col("doc_id").as("id"),
      graft.functions.expressions.minhashSig(col("text"), 5, 64).as("sig"))
    time("lsh: minhash_sig only")(mhSigs)
    def mhPairs = Dedup.minhashPairs(docs, "doc_id", "text",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.5)
    time("lsh: minhashPairs (cand+est)")(mhPairs)
    count("lsh: candidate pairs")(mhPairs)
    time("lsh: full (pairs+verify)")(
      Dedup.verifyJaccard(mhPairs.select("id1", "id2"), docs, "doc_id",
        "text", shingleK = 5, threshold = 0.9))

    // --- dedup_ngram_jaccard stages ---
    def ngCand = Dedup.minhashCandidates(docs, "doc_id", "text",
      numHashes = 96, rowsPerBand = 2, wordGrams = Some(3))
    time("ngram: word sig only")(docs.select(
      graft.functions.expressions.wordMinhashSig(col("text"), 3, 96)))
    time("ngram: candidates")(ngCand)
    count("ngram: candidate pairs")(ngCand)
    def ngPairs = Dedup.verifyJaccard(ngCand, docs, "doc_id", "text",
      threshold = 0.5, wordGrams = Some(3))
    time("ngram: full (cand+verify)")(ngPairs)
    count("ngram: verified pairs")(ngPairs)

    // --- dedup_components: CC over the verified pairs ---
    time("components: CC only (incl cand+verify)")(
      Dedup.connectedComponents(ngPairs.select("id1", "id2")))
    locally {
      val edges = ngPairs.select("id1", "id2").persist()
      edges.count()
      val t0 = System.nanoTime()
      val (out, rounds) = Dedup.connectedComponentsWithStats(edges)
      out.write.format("noop").mode("overwrite").save()
      System.err.println(f"[r8] components: CC loop alone " +
        f"${(System.nanoTime() - t0) / 1e9}%.3f s, rounds=$rounds")
      edges.unpersist()
    }

    // enumerated-candidate volume (pre-filter): how many pairs does the
    // bucket enumeration stream out before est/distinct?
    locally {
      import graft.functions.expressions.{wordMinhashSig => wsig}
      val sigs = docs.select(col("doc_id").as("id"),
        wsig(col("text"), 3, 96).as("sig"))
      val bandh = transform(sequence(lit(0), lit(47)),
        b => xxhash64(slice(col("sig"), b * 2 + 1, lit(2))))
      val banded = sigs.select(col("id"),
        posexplode(bandh).as(Seq("band", "bh")))
      count("ngram: banded rows")(banded)
      count("ngram: bucket count")(banded.groupBy("band", "bh").count())
      System.err.println("[r8] ngram: sum b*(b-1)/2 = " +
        banded.groupBy("band", "bh").count()
          .agg(sum(col("count") * (col("count") - 1) / 2)).head().get(0))
    }

    // --- dedup_embedding stages ---
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.select(col("vec_id"), col("embedding"))
    val scaled = base.filter(col("vec_id") < 25)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val jittered = base.filter(col("vec_id") >= 25 && col("vec_id") < 50)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) * lit(2.0f)),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
          .as("embedding"))
    def union = base.unionByName(scaled).unionByName(jittered)
    time("emb: union+sig only")(union.select(
      graft.functions.expressions.hyperplaneSig(col("embedding"), 48, 42L)))
    def embPairs = Dedup.embeddingPairs(union, "vec_id", "embedding",
      bits = 48, bands = 8, minCosine = 0.9)
    time("emb: full embeddingPairs")(embPairs)
    count("emb: out pairs")(embPairs)
    spark.stop()
  }
}
