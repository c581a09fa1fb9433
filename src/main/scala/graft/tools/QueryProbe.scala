package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one harness query repeatedly and print its formatted plan —
  * `runMain graft.tools.QueryProbe <name> [sfDir] [reps]`. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_embedding")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.prepare(spark, dir)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[qprobe] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (sys.env.get("QPROBE_EXPLAIN").contains("1"))
      println(graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
