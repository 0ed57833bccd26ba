package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins — the hand-rolled complement to AQE's
  * skew-join splitting, for when a handful of hot keys would otherwise
  * pin a 100 TB shuffle on a few executors.
  *
  * Salted join: the skewed (big) side gets a random salt in [0, salts);
  * the small side is exploded `salts` times so every salted key finds
  * its match. Join key cardinality grows by `salts`, shuffle skew drops
  * by the same factor. Correctness is unchanged — each big-side row
  * still meets each matching small-side row exactly once.
  *
  * Use AQE (`spark.sql.adaptive.skewJoin.enabled`) first; salt when the
  * skew is in an aggregation key or AQE's split granularity (shuffle
  * blocks) is too coarse for the hot key.
  */
object Skew {

  /** Equi-join `big` with `small` on `key`, salting the big side.
    * Join types preserving correctness under an exploded small side:
    * inner/cross and the left-family (unmatched SMALL rows are the ones
    * duplicated `salts` times, so right/full outer would emit them
    * multiply). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val ok = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti")
    require(ok.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin does not preserve $joinType semantics (small side is exploded)")
    val bigS = big.withColumn("__salt", (rand(42) * salts).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-proof aggregation: partial aggregate on
    * (key, salt), then final aggregate on key. `partial` must be an
    * algebraic partial (e.g. sum/count) and `fin` its combiner —
    * the classic sum-of-sums / sum-of-counts decomposition. */
  def saltedAgg(
      df: DataFrame, key: String, valueCol: String, salts: Int,
      partial: Column => Column, fin: Column => Column): DataFrame =
    saltedAggs(df, key, salts,
      (valueCol, partial, fin, s"${valueCol}_agg"))

  /** Multi-aggregate form of [[saltedAgg]]: every (valueCol, partial,
    * final, outName) tuple rides ONE salted pass — one scan, one
    * (key, salt) shuffle, one (key) shuffle — instead of a pass per
    * aggregate joined after. */
  def saltedAggs(
      df: DataFrame, key: String, salts: Int,
      aggs: (String, Column => Column, Column => Column, String)*): DataFrame = {
    require(salts > 0 && aggs.nonEmpty)
    val parts = aggs.zipWithIndex.map { case ((v, partial, _, _), i) =>
      partial(col(v)).as(s"__part$i")
    }
    val fins = aggs.zipWithIndex.map { case ((_, _, fin, out), i) =>
      fin(col(s"__part$i")).as(out)
    }
    df.withColumn("__salt", (rand(42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(parts.head, parts.tail: _*)
      .groupBy(col(key))
      .agg(fins.head, fins.tail: _*)
  }
}
