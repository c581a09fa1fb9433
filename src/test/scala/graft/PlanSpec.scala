package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan guards: the properties that make the harness queries
  * scale (predicate pushdown to parquet, column pruning, broadcast of
  * dimension tables, map-side partial aggregation, single-shuffle
  * windows). A regression here is a silent 100×-scale performance bug
  * even while results stay correct. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q6: filters are pushed to the parquet scan") {
    val p = plan("q6_filter_pushdown")
    assert(p.contains("PushedFilters"))
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(l_discount.*"),
      s"discount filter not pushed:\n$p")
  }

  test("q6: scan reads only needed columns (pruning)") {
    val p = plan("q6_filter_pushdown")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_quantity"),
      s"column pruning failed: $readSchema")
  }

  test("q3: dimension joins broadcast, fact side streams") {
    val p = plan("q3_multi_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    // the big lineitem×orders join may be shuffle-based; dims must not be
    assert(!p.contains("CartesianProduct"))
  }

  test("q1: partial (map-side) aggregation before the exchange") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), s"no partial aggregation:\n$p")
    // codegen: whole-stage spans confirmed via codegen explain mode
    val cg = SparkEntry.queries("q1_agg")(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen subtrees"), cg.take(200))
  }

  test("cdc_latest_per_key: exactly one exchange (the window shuffle)") {
    val p = plan("cdc_latest_per_key")
    val exchanges = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*"))
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$p")
  }

  test("ann_bruteforce: scan pruned to (vec_id, embedding), no UDF in scan") {
    val df = SparkEntry.queries("ann_bruteforce")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("label"), s"pruning failed: $readSchema")
    // cosine is pure column expressions — TakeOrderedAndProject caps the sort
    assert(p.contains("TakeOrderedAndProject"), s"top-k not sort-limited:\n$p")
  }

  test("ann_lsh: probe filter reaches the scan as PARTITION pruning (IO prune)") {
    val p = plan("ann_lsh")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("sig"), s"probe filter not pruning partitions:\n$p")
    // the pruned scan must not also re-read every partition: the partition
    // count in the scan is bounded by the probe set (37/256 cells at the
    // harness's Hamming-2 radius)
    assert(!p.contains("PartitionFilters: []"), s"empty partition filter:\n$p")
  }

  test("ann_ivf: probe filter reaches the scan as PARTITION pruning (IO prune)") {
    val p = plan("ann_ivf")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell"), s"probe filter not pruning partitions:\n$p")
    assert(!p.contains("PartitionFilters: []"), s"empty partition filter:\n$p")
  }

  test("q2/q3: customer broadcast comes from AQE at small SF, not a forced hint") {
    // the hint was removed (customer grows with SF; forcing it OOMs at
    // 100×) — at sf0.001 AQE must still pick a broadcast join on its own
    val df = SparkEntry.queries("q2_join_agg")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin"),
      s"AQE did not broadcast customer at tiny SF:\n${executed.take(2000)}")
  }

  test("dedup_exact: single shuffle with partial aggregation") {
    val p = plan("dedup_exact")
    val exchanges = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*"))
    assert(exchanges == 1, s"expected 1 shuffle:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2)
  }

  test("q5: top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q5_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for limit:\n$p")
  }

  test("dedup_simhash: capped bucket collection hash-aggregates (no SortAggregate)") {
    // CollectUpTo must plan like collect_list itself (ObjectHashAggregate)
    // — a sort-based fallback would reintroduce the per-partition sort
    // the bucketPairs design removed
    val p = plan("dedup_simhash")
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
    assert(!p.contains("SortAggregate"),
      s"capped collect fell back to sort aggregation:\n${p.take(1500)}")
  }

  test("cdc_point_lookup: scan lists ONLY the looked-up keys' buckets") {
    val df = SparkEntry.queries("cdc_point_lookup")(spark, dir)
    // allowed buckets: the lake hashes the root key with xxhash64(seed 42)
    // mod 16 — replicate with the same Spark expression
    import org.apache.spark.sql.functions._
    val allowed = spark.range(1).select(
      SparkEntry.PointLookupIds.map(id =>
        pmod(xxhash64(lit(id)), lit(16)).cast("int")): _*)
      .head().toSeq.map(_.asInstanceOf[Int]).toSet
    val scanned = df.inputFiles.flatMap(
      "_gbucket=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt)).toSet
    assert(scanned.nonEmpty, "point lookup scanned no files")
    assert(scanned.subsetOf(allowed),
      s"scan touched non-key buckets: $scanned vs allowed $allowed")
    // and the lookup genuinely pruned: a full scan reads every bucket
    assert(allowed.size < 16 && scanned.size <= allowed.size)
  }

  test("cdc_changefeed: the seq-horizon filter pushes into the parquet scan") {
    // the incremental read's whole scale story: `_gseq > horizon` must
    // reach the reader (row-group stats then skip untouched data), and
    // it must sit there BEFORE the merge-on-read window, not after
    val p = plan("cdc_changefeed")
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(_gseq.*"),
      s"seq horizon not pushed to the scan:\n$p")
  }

  test("dedup jaccard verify: native kernels — no Scala UDF in either plan") {
    // VERDICT r4 #2: shingle + jaccard verify kernels were the last
    // Scala UDFs on a dedup hot path; both queries route verifyJaccard
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh").foreach { q =>
      val p = plan(q)
      assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
        s"$q fell back to a UDF:\n${p.take(1500)}")
    }
  }

  test("text_lang_id: pure column kernel — no Scala UDF in the plan") {
    val p = plan("text_lang_id")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"lang-id fell back to a UDF:\n${p.take(1500)}")
  }

  test("sample_stratified: map-side broadcast filter — zero shuffles on the corpus side") {
    val p = plan("sample_stratified")
    // the only Exchange allowed is the O(strata) rate table's broadcast;
    // the documents side must never shuffle — at 100 TB the sample is a
    // filter fused into the scan stage
    val shuffles = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*"))
    assert(shuffles == 0, s"sampling shuffled the corpus:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"rate table not broadcast:\n${p.take(1500)}")
    assert(!p.contains("ScalaUDF"), "sampling kernel fell back to a UDF")
  }

  test("sample_split: pure map-side CASE — no Exchange, no join, no UDF") {
    val p = plan("sample_split")
    val exchanges = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*"))
    assert(exchanges == 0, s"split shuffled or broadcast something:\n$p")
    assert(!p.contains("Join"), s"split must not join:\n${p.take(1500)}")
    assert(!p.contains("ScalaUDF"), "split kernel fell back to a UDF")
  }

  test("sample_take: exactly ONE corpus shuffle (the per-stratum window), targets broadcast") {
    val p = plan("sample_take")
    val shuffles = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*"))
    assert(shuffles == 1,
      s"exact-count take should cost exactly one hash exchange:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"targets table not broadcast:\n${p.take(1500)}")
    assert(!p.contains("ScalaUDF"), "take kernel fell back to a UDF")
  }
}
