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

  def dot(a: Column, b: Column): Column =
    fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column =
    sqrt(fold(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity computed as dot/(|a||b|) in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
