package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.Engine
import graft.lake.LakeTable

/** TABLE-VALUED SQL functions over the lake — changefeeds, time travel,
  * commit history and batch metrics for plain-SQL users (the Delta
  * `table_changes(...)` / `DESCRIBE HISTORY` surface, rebuilt on this
  * snapshot log):
  *
  * {{{
  *   SELECT * FROM graft_changes('/lake', 'REPOS', 3, 7)      -- net diff
  *   SELECT * FROM graft_changes_cdf('/lake', 'REPOS', 3, 7)  -- 4-valued
  *   SELECT * FROM graft_at('/lake', 'REPOS', 1700000000000)  -- as-of ts
  *   SELECT * FROM graft_history('/lake', 'REPOS')            -- commits
  *   SELECT * FROM graft_metrics('/lake', 'repos')            -- batches
  * }}}
  *
  * Injected at session build via `spark.sql.extensions=graft.GraftExtensions`
  * (`injectTableFunction`), or into an existing session with
  * [[GraftTableFunctions.registerAllTables]]. Arguments must be literals:
  * the builder runs during ANALYSIS — it resolves the lake table once and
  * splices the reader's logical plan (bucket-pruned diffs, threshold-walk
  * time travel, driver-side history) into the outer query, so all the
  * library readers' pruning survives into the SQL form.
  *
  * Consequence of analysis-time resolution (document-level contract): a
  * TVF call binds to the lake state visible when the QUERY is analyzed —
  * snapshot-isolation per query, the same as holding the library
  * reader's DataFrame. A `CREATE TEMP VIEW` over a TVF therefore
  * FREEZES that binding (Spark stores the analyzed plan): the view
  * keeps answering from the creation-time snapshot and, like any held
  * DataFrame, can hit vacuumed segments later. Re-issue the TVF query
  * (or recreate the view) for fresh state; pin the version for feeds
  * held across time, exactly as with the library readers. */
object GraftTableFunctions {
  import GraftFunctions.{arity, intLit, longLit}

  type Entry =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  private def strLit(e: Expression, fn: String, arg: String): String =
    e match {
      // a StringType Literal's value is always a UTF8String (Literal's
      // constructor validates it) — one case suffices
      case Literal(u: UTF8String, StringType) => u.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal, got $other")
    }

  private def spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("graft table function: no active session"))

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.logical

  private def open(root: String, name: String): LakeTable =
    new LakeTable(spark, root, name)

  private def fn(name: String, usage: String,
      builder: Seq[Expression] => LogicalPlan): Entry =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.GraftTableFunctions", null, name,
        usage, "", "", "", "", "", "", "built-in"),
      builder)

  val all: Seq[Entry] = Seq(
    fn("graft_changes",
      "graft_changes(root, table, fromVersion, toVersion) - classified " +
        "net changefeed (insert/update/delete + _change_type) between " +
        "two snapshot versions, bucket-pruned to changed segments",
      es => { arity("graft_changes", es, 4)
        plan(open(strLit(es(0), "graft_changes", "root"),
          strLit(es(1), "graft_changes", "table"))
          .readChangesBetween(intLit(es(2), "graft_changes", "fromVersion"),
            intLit(es(3), "graft_changes", "toVersion"))) }),
    fn("graft_changes_cdf",
      "graft_changes_cdf(root, table, fromVersion, toVersion) - Delta-CDF " +
        "form: updates as update_preimage/update_postimage pairs",
      es => { arity("graft_changes_cdf", es, 4)
        plan(open(strLit(es(0), "graft_changes_cdf", "root"),
          strLit(es(1), "graft_changes_cdf", "table"))
          .readChangesBetweenCdf(
            intLit(es(2), "graft_changes_cdf", "fromVersion"),
            intLit(es(3), "graft_changes_cdf", "toVersion"))) }),
    fn("graft_changes_since",
      "graft_changes_since(root, table, horizonSeq) - seq-space " +
        "changefeed: net upserts + deletes past a visibility-seq " +
        "horizon, from the current snapshot (Hudi incremental query)",
      es => { arity("graft_changes_since", es, 3)
        plan(open(strLit(es(0), "graft_changes_since", "root"),
          strLit(es(1), "graft_changes_since", "table"))
          .readChangesSince(
            longLit(es(2), "graft_changes_since", "horizonSeq"))) }),
    fn("graft_at",
      "graft_at(root, table, tsMillis) - time travel: the table state " +
        "as of the commit wall clock (TIMESTAMP AS OF)",
      es => { arity("graft_at", es, 3)
        plan(open(strLit(es(0), "graft_at", "root"),
          strLit(es(1), "graft_at", "table"))
          .readAsOf(longLit(es(2), "graft_at", "tsMillis"))) }),
    fn("graft_history",
      "graft_history(root, table) - one row per retained snapshot: " +
        "version, publish clock, operation, commit tag, lineage counters",
      es => { arity("graft_history", es, 2)
        plan(open(strLit(es(0), "graft_history", "root"),
          strLit(es(1), "graft_history", "table")).history()) }),
    fn("graft_metrics",
      "graft_metrics(root, entity) - applied-event metrics log: one row " +
        "per streamed micro-batch (events, docs, deletes, skips, wall)",
      es => { arity("graft_metrics", es, 2)
        plan(new Engine(spark, strLit(es(0), "graft_metrics", "root"))
          .metricsLog(strLit(es(1), "graft_metrics", "entity"))) }),
  )

  /** Register every table function into an EXISTING session (the
    * counterpart of `expressions.registerAll`; new sessions get them via
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def registerAllTables(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
}
