package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (temporal) join: each left row picks the newest right row with
  * the same key and `rightTime <= leftTime` (inclusive) — "the dimension
  * revision valid at event time", the canonical CDC enrichment join that
  * Spark has no built-in operator for.
  *
  * Implementation is the UNION-AND-SWEEP form, not a range join: tag and
  * union the two inputs on (key, time), then one window sweep per key in
  * time order carries the latest right payload forward into every left
  * row (`last(..., ignoreNulls)` over unbounded-preceding). The payload
  * travels as ONE struct per right row — never per-column — so a right
  * revision is carried atomically: a genuine null in the newest matching
  * right row stays null instead of resurrecting the previous revision's
  * value (per-column ignoreNulls sweeps mix fields across revisions).
  * Cost at scale: ONE hash shuffle on the key + a sort within
  * partitions — no key×key row explosion, no range-predicate nested
  * loop, and a 10^6-event hot key costs a bigger sort, never a cross
  * product. Ties (right.time == left.time) sort the right row FIRST, so
  * an exactly concurrent revision is visible, matching the `<=`
  * contract. Null keys follow SQL join semantics: a null key never
  * matches (null-key right rows are dropped; null-key left rows pass
  * through unenriched).
  *
  * `tolerance`: optional max staleness in the time column's own units —
  * a match older than `leftTime - tolerance` nulls out (the row is kept;
  * this is a LEFT as-of join).
  *
  * Contract: (`keyCols`, `timeCol`) must be unique on the right side
  * (true for any lsn/event-id stream); duplicate right times within a
  * key would make the carried payload order-dependent. */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      tolerance: Option[Long] = None,
  ): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    val leftPayload = left.columns.filterNot(keyCols.contains).toSeq
    val rightPayload = right.columns
      .filterNot(c => keyCols.contains(c) || c == timeCol).toSeq
    val overlap = leftPayload.intersect(rightPayload)
    require(overlap.isEmpty,
      s"ambiguous payload columns ${overlap.mkString(", ")} — alias one side")
    require(left.columns.contains(timeCol) && right.columns.contains(timeCol),
      s"both sides need the time column $timeCol")

    val keyC = keyCols.map(col)
    // the right payload rides as ONE struct (`_rp`), non-null on every
    // right row, null on left rows — `last(_rp, ignoreNulls)` then
    // carries whole revisions atomically
    val rpType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        "_rt", right.schema(timeCol).dataType) +:
        rightPayload.map(c => right.schema(c)))
    // tag 0 = right (sorts first on time ties → visible to a same-time
    // left row), tag 1 = left. Null-key right rows can never match under
    // SQL equality — drop them (partitionBy would group null==null).
    val taggedRight = right
      .filter(keyC.map(_.isNotNull).reduce(_ && _))
      .select(
        (keyC :+ col(timeCol).as("_t") :+ lit(0).as("_tag")) :+
          struct((col(timeCol).as("_rt") +: rightPayload.map(col)): _*)
            .as("_rp"): _*)
    val taggedLeft = left.select(
      (keyC :+ col(timeCol).as("_t") :+ lit(1).as("_tag")) ++
        Seq(lit(null).cast(rpType).as("_rp")) ++
        leftPayload.filterNot(_ == timeCol).map(col): _*)

    val w = Window.partitionBy(keyC: _*)
      .orderBy(col("_t").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)
      .withColumn("_rp", last(col("_rp"), ignoreNulls = true).over(w))
    val matched = carried.filter(col("_tag") === 1)
    val bounded = tolerance.fold(matched) { tol =>
      matched.withColumn("_rp",
        when(col("_rp").isNull || col("_t") - col("_rp")("_rt") > tol,
          lit(null).cast(rpType)).otherwise(col("_rp")))
    }
    bounded.select(
      (keyC :+ col("_t").as(timeCol)) ++
        leftPayload.filterNot(_ == timeCol).map(col) ++
        Seq(col("_rp")("_rt").as(s"${timeCol}_asof")) ++
        rightPayload.map(c => col("_rp")(c).as(c)): _*)
  }
}
