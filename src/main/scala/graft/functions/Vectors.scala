package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns, built from
  * `zip_with`/`aggregate` higher-order functions so the arithmetic stays
  * inside whole-stage codegen — no UDF, no driver round-trip.
  *
  * Element order of the fold is left-to-right, matching a straight
  * summation in other engines so results are bit-comparable when both
  * sides use double precision.
  */
object Vectors {

  private def fold(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** HOF formulation — allocates an intermediate array per evaluation;
    * kept as the differential baseline for [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Native codegen dot product (no per-row allocation) — same
    * left-to-right double accumulation as [[dotHof]], bit-identical
    * results, ~20x faster on n^2 pair scoring. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity computed as dot/(|a||b|) in double precision.
    * NULL when either vector has zero norm — see [[cosineFromNorms]]. */
  def cosine(a: Column, b: Column): Column =
    cosineFromNorms(a, b, norm(a), norm(b))

  /** dot/(na·nb) with precomputed norms; NULL (which every comparison
    * and filter excludes) when either norm is zero. Spark 4 runs ANSI
    * mode, where a plain double division throws DIVIDE_BY_ZERO — one
    * zero vector anywhere in a 100 TB corpus would kill the whole job
    * (LshNearDupSpec pins the exclusion). `try_divide` is bit-identical
    * to `/` for every nonzero divisor, so oracle parity is untouched. */
  def cosineFromNorms(va: Column, vb: Column, na: Column, nb: Column): Column =
    try_divide(dot(va, vb), na * nb)
}
