package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` doorway the streaming changefeed source needs:
  * a v1 `Source.getBatch` must return a DataFrame whose logical plan is
  * marked `isStreaming = true` (MicroBatchExecution asserts it), and the
  * only constructor for that is `SparkSession.internalCreateDataFrame`.
  * Same-package shim, nothing else reaches in. */
object GraftSqlShims {
  def streamingDataFrame(
      spark: classic.SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = true)
}
