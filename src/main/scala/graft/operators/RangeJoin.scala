package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bin bucketing. The reference engine
  * has no relational joins at all (SURVEY.md §2.3) — like [[AsOfJoin]],
  * this is part of the engine's extension surface, covering the other
  * common temporal-join shape: "which interval(s) contain this point"
  * (IP-range lookups, validity windows, time-range containment).
  *
  * Spark's built-in answer to `p BETWEEN s AND e` with no equi-key is a
  * BroadcastNestedLoopJoin (O(n·m) compares, and only if one side fits
  * in the driver). The scale-safe decomposition used here is the
  * standard one: pick a bin width `w`, explode each interval into the
  * bins it covers (`floor(s/w) .. floor(e/w)`), map each point to its
  * single bin (`floor(p/w)`), equi-join on the bin id, then apply the
  * exact `s <= p <= e` residual. The shuffle is linear — points move
  * once, intervals are replicated only `len/w + 1` times — and the join
  * is a plain shuffled hash/sort-merge join that AQE can skew-split,
  * so the plan survives both sides being 100 TB. Choosing `w` near the
  * typical interval length keeps the replication factor ~2 while
  * keeping bins selective.
  */
object RangeJoin {

  private final val Bin = "__rj_bin"
  private final val P = "__rj_p"
  private final val S = "__rj_s"
  private final val E = "__rj_e"

  /** Floor division that is exact for negative longs too (pmod is
    * non-negative for a positive modulus, unlike `%`). */
  private def floorDiv(x: Column, w: Long): Column =
    (x - pmod(x, lit(w))) / lit(w)

  /** Join `points` to every row of `intervals` whose [start, end] range
    * (inclusive on both ends) contains the point. All three expressions
    * must be long-castable and in the same unit (epoch days, seconds,
    * …); `binWidth` is in that unit. Extra equi-keys can be listed in
    * `keys` — columns that must exist under the same name on both
    * sides, which tightens the bin join and lets Spark co-partition on
    * (key, bin).
    *
    * Null points, null bounds, and inverted (`start > end`, i.e. empty)
    * intervals match nothing, mirroring SQL BETWEEN semantics. The
    * result carries all columns of both inputs (keys once); callers
    * project/aggregate on top.
    */
  def pointInInterval(
      points: DataFrame, pointExpr: Column,
      intervals: DataFrame, startExpr: Column, endExpr: Column,
      binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val pts = points
      .withColumn(P, pointExpr.cast("long"))
      .filter(col(P).isNotNull)
      .withColumn(Bin, floorDiv(col(P), binWidth).cast("long"))
    // Guard s <= e BEFORE sequence(): Spark's sequence(a, b) with a > b
    // silently generates a DESCENDING range instead of an empty one,
    // which would resurrect empty intervals as matches.
    val ivs = intervals
      .withColumn(S, startExpr.cast("long"))
      .withColumn(E, endExpr.cast("long"))
      .filter(col(S).isNotNull && col(E).isNotNull && col(S) <= col(E))
      .withColumn(Bin,
        explode(sequence(floorDiv(col(S), binWidth).cast("long"),
          floorDiv(col(E), binWidth).cast("long"))))
    pts.join(ivs, keys :+ Bin)
      .filter(col(S) <= col(P) && col(P) <= col(E))
      .drop(Bin, P, S, E)
  }
}
