package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark suites (tests fork a single JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // Spark 4.1's checksummed checkpoint file manager deadlocks in this
      // sandbox (state-store delta writes await checksum futures that
      // never complete) — stateful streaming needs it off here
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // non-default FileSystem for the control-plane FS-API tests
      .config("spark.hadoop.fs.graftfs.impl", "graft.GraftTestFs")
      // object-store-shaped FileSystem (no append, replace-rename): the
      // control plane must survive it with the `create` publish strategy
      .config("spark.hadoop.fs.graftobj.impl", "graft.GraftObjFs")
      .config("spark.hadoop.graft.fio.publish.graftobj", "create")
      // HDFS-rename-contract FileSystem (rename fails on existing dest)
      .config("spark.hadoop.fs.grafthdfs.impl", "graft.GraftHdfsLikeFs")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
