package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.cdc.ChangeEvent
import graft.streaming.StreamOps

/** Diagnostic: batch progression of the stateful streaming ops. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val in = MemoryStream[ChangeEvent](spark)
    val q = StreamOps.latestState(in.toDF())
      .writeStream.format("memory").queryName("state")
      .outputMode(OutputMode.Update()).start()
    in.addData(ChangeEvent(1, "insert", new Timestamp(1700000000000L),
      """{"id":"a","rev":"r1","repo":"a"}"""))
    (1 to 15).foreach { i =>
      Thread.sleep(1000)
      val p = q.lastProgress
      if (p != null)
        println(s"[probe] t=$i batchId=${p.batchId} rows=${p.numInputRows}")
    }
    q.stop(); spark.stop()
  }
}
