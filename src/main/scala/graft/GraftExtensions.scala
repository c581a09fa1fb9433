package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Library integration point for plain-SQL users:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions()(_))
  *   spark.sql("SELECT simhash64(text), minhash_sig(text, 5, 64) FROM docs")
  * }}}
  *
  * Injects every graft native expression into the session's
  * FunctionRegistry at session build — the SparkSessionExtensions seam the
  * Spark docs prescribe for third-party Catalyst extensions (no session
  * mutation, works in Thrift/Connect deployments where library code never
  * runs on the driver before SQL does). The same builders back
  * [[graft.functions.expressions.registerAll]] for sessions that already
  * exist. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.all.foreach(ext.injectFunction)
    // table-valued functions: changefeeds / time travel / history /
    // metrics as plain FROM-clause citizens (Delta's table_changes shape)
    graft.functions.GraftTableFunctions.all.foreach(ext.injectTableFunction)
  }
}
