package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    Seq(8, 32).foreach { cores =>
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // pure CPU: 2e9 xxhash evaluations, no IO
      val t0 = System.nanoTime()
      val r = spark.range(0, 2000000000L, 1, cores * 2)
        .select(sum(xxhash64(col("id")) % 1000)).head().getLong(0)
      println(f"[scale] cores=$cores pure-cpu ${(System.nanoTime()-t0)/1e9}%.2f s ($r)")
      // shuffle-heavy: 50M rows hash-agg
      val t1 = System.nanoTime()
      spark.range(0, 50000000L, 1, cores * 2)
        .groupBy(pmod(xxhash64(col("id")), lit(1000000)).as("k"))
        .agg(count(lit(1))).select(sum("k")).head()
      println(f"[scale] cores=$cores shuffle ${(System.nanoTime()-t1)/1e9}%.2f s")
      // string/allocation-heavy: 20M string builds + hashes (the shape of
      // JSON parse / UTF8 work in the ingest path)
      val t2 = System.nanoTime()
      spark.range(0, 20000000L, 1, cores * 2)
        .select(sum(length(sha2(concat(lit("doc-"), col("id").cast("string"),
          lit("-"), reverse(col("id").cast("string"))), 256))))
        .head()
      println(f"[scale] cores=$cores string-heavy ${(System.nanoTime()-t2)/1e9}%.2f s")
      spark.stop()
    }
  }
}
