package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks up the most recent
  * right row with the same key and `rightTime <= leftTime` (backward
  * direction, inclusive). The reference has no relational joins at all
  * (SURVEY.md §2.3) — this is part of the engine's extension surface
  * for time-series/feature-store workloads.
  *
  * Implementation is the single-shuffle union trick, not a join: tag
  * both sides, shuffle ONCE by key, sort within partitions by
  * (key, time, side), and carry the right side's payload forward with
  * `last(ignoreNulls)` over an unbounded-preceding window. A join-based
  * formulation would shuffle both sides AND explode on (key, time-range)
  * pairs; this shape is linear in rows and never materializes candidate
  * pairs — the property that matters when both sides are 100 TB-scale
  * event streams.
  *
  * Right-side rows must be unique per (key, time) — pre-aggregate to
  * make ties impossible (and results deterministic); the method asserts
  * nothing and simply takes the LAST right row in (time, payload-order)
  * among equals, so callers wanting determinism should dedupe first.
  */
object AsOfJoin {

  /** @param left       left side (the "probe" events)
    * @param right      right side (the "state" to look up, e.g. quotes)
    * @param keys       equi-join key columns present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  right-side payload columns to carry (must not
    *                   collide with left column names)
    * @param inner      true drops left rows with no match (as-of inner);
    *                   false keeps them with null payload (as-of left)
    */
  def join(
      left: DataFrame, right: DataFrame,
      keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      inner: Boolean = false): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one payload column")
    val leftCols = left.columns.toSeq
    require(rightCols.forall(c => !leftCols.contains(c)),
      s"right payload columns collide with left columns: " +
        s"${rightCols.filter(leftCols.contains).mkString(",")}")

    // side 0 = right, 1 = left: at equal timestamps the right row sorts
    // FIRST, so an inclusive (<=) match sees state changes effective at
    // the probe's own timestamp. The right payload travels as ONE
    // struct: `last(ignoreNulls)` then distinguishes "no right row yet"
    // (null struct) from "matched a right row whose payload values are
    // null" (non-null struct with null fields).
    val t = "__asof_t"
    val side = "__asof_side"
    val pay = "__asof_payload"
    val payType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val l = left.select(
      (keys.map(col) :+ col(leftTime).as(t) :+ lit(1).as(side)) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(payType).as(pay): _*)
    // SQL join semantics: NULL never equals NULL and `t >= null` is
    // never true, so right rows with a null key or null time can match
    // nothing — drop them BEFORE the union (otherwise the window's
    // partitionBy, which groups nulls together, would hand their
    // payload to null-keyed left rows). Null-keyed/null-timed LEFT rows
    // need no special case: ascending nulls-first ordering places them
    // before every right row of their partition, so they come out
    // unmatched.
    val r = right
      .filter((keys.map(col(_).isNotNull) :+ col(rightTime).isNotNull).reduce(_ && _))
      .select(
        (keys.map(col) :+ col(rightTime).as(t) :+ lit(0).as(side)) ++
          leftCols.filterNot(keys.contains).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(rightCols.map(col): _*).as(pay): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__asof_m", last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
    val kept = if (inner) matched.filter(col("__asof_m").isNotNull) else matched
    kept.select(
      leftCols.map(c => if (c == leftTime) col(t).as(leftTime) else col(c)) ++
        rightCols.map(c => col(s"__asof_m.$c").as(c)): _*)
  }

  /** Match predicate for [[join]] results under a tolerance: carry the
    * right time as a payload column and null-out/drop matches older
    * than `leftTime - tolerance` with this condition. */
  def withinTolerance(leftTime: Column, matchedRightTime: Column,
      tolerance: Column): Column =
    matchedRightTime.isNotNull &&
      leftTime.cast("long") - matchedRightTime.cast("long") <= tolerance.cast("long")
}
