package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}

/** The engine's serializable predicate IR — exactly the surface the
  * reference's `retrieval/Expression.java:29-301` supports: EQ leaves
  * over string-valued columns, combined with AND/OR
  * (`Expression.isSupported:205-227` rejects everything else). Richer
  * predicates stay in plain `Column`s and are handled by Catalyst; this
  * IR exists only for the index-consulting pruner.
  */
sealed trait Pred {
  /** Residual row-level filter — always applied after pruning, because
    * block-level pruning is coarse (reference comment at
    * `BlockIndexedFileInputFormat.java:669-679`). Comparison is on the
    * stringified column, mirroring the reference's String.equals after
    * reflective getter access (`FilterRecordReader.java:88-96`). */
  def toColumn: Column = this match {
    case Eq(c, v)  => col(c).cast("string") === lit(v)
    case And(l, r) => l.toColumn && r.toColumn
    case Or(l, r)  => l.toColumn || r.toColumn
  }

  /** All (column, value) leaves (cf. `getAllColumnNames`,
    * `BlockIndexedFileInputFormat.java:717-733`). */
  def leaves: Seq[Eq] = this match {
    case e: Eq     => Seq(e)
    case And(l, r) => l.leaves ++ r.leaves
    case Or(l, r)  => l.leaves ++ r.leaves
  }

  def columns: Set[String] = leaves.map(_.column).toSet
}

final case class Eq(column: String, value: String) extends Pred
final case class And(left: Pred, right: Pred) extends Pred
final case class Or(left: Pred, right: Pred) extends Pred

object Pred {
  /** Translate the supported subset of a filter `Column` into the IR,
    * the analog of the Pig->ET translation
    * (`Expression.newInstance:233-261`). The column is resolved against
    * `df`'s analyzed plan first (Spark 4's Column API builds unresolved
    * Connect-style nodes). Returns None when any node falls outside
    * EQ/AND/OR-over-literals — callers then skip index pruning and let
    * Catalyst evaluate the filter over a full scan (the reference's
    * safe-fallback stance). Normalizes `lit == col` to `col == lit`
    * (`Expression.java:242-246`).
    */
  def fromColumn(df: DataFrame, c: Column): Option[Pred] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    df.filter(c).queryExecution.analyzed
      .collectFirst { case f: LFilter => f.condition }
      .flatMap(fromExpression)
  }

  /** Translate a RESOLVED Catalyst expression (e.g. a pushed filter
    * condition inside the optimizer). Same supported subset.
    *
    * Cast handling must be conservative — index keys are
    * `cast(col as string)`, so a leaf is answerable only when the
    * comparison value's string form provably equals the key of every
    * matching row:
    *   - bare `attr == literal` (the analyzer inserts no cast only when
    *     the types already agree): stringify the literal through
    *     Catalyst's own Cast — raw `toString` leaks internal reps
    *     (DateType epoch days, TimestampType micros).
    *   - `cast(attr as string) == string` — exactly the index's
    *     stringify semantics.
    *   - casts AROUND A LITERAL are constant-folded by evaluating them
    *     first (sound: a matching row satisfies attr == foldedValue, so
    *     its key is stringify(foldedValue)); this keeps
    *     `ts === "2012-04-15 00:00:00"` and `intCol === "07"` prunable
    *     with the CORRECT key ("7", not "07").
    *   - any OTHER cast around the attribute (Cast(longCol, double)
    *     from `longCol === 7.0` coercion, truncating
    *     `ts.cast("date") === d`, ...) is NOT answerable from string
    *     keys: return None so callers fall back to a full scan — the
    *     reference's `Expression.isSupported` safe-fallback stance.
    */
  def fromExpression(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Pred] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Or => COr, EqualTo, Literal, AttributeReference, Cast, Expression => CExpr}
    import org.apache.spark.sql.types.StringType
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    // Evaluate a literal-rooted cast chain to the value the comparison
    // will actually use; None on eval failure (ANSI cast error) — never
    // guess.
    def foldLiteral(x: CExpr): Option[Literal] = x match {
      case l: Literal => Some(l)
      case c @ Cast(inner, t, _, _) =>
        foldLiteral(inner).flatMap { l =>
          try Some(Literal(Cast(l, t, tz, c.evalMode).eval(null), t))
          catch { case _: Exception => None }
        }
      case _ => None
    }
    def stringify(l: Literal): Option[String] =
      if (l.value == null) None
      else
        try Option(Cast(l, StringType, tz).eval(null)).map(_.toString)
        catch { case _: Exception => None }
    def leaf(a: CExpr, b: CExpr): Option[Eq] = a match {
      case attr: AttributeReference =>
        foldLiteral(b).flatMap(stringify).map(Eq(attr.name, _))
      case Cast(attr: AttributeReference, StringType, _, _) =>
        foldLiteral(b).filter(_.dataType == StringType)
          .flatMap(stringify).map(Eq(attr.name, _))
      case _ => None
    }
    def go(x: CExpr): Option[Pred] = x match {
      case CAnd(l, r) => for { a <- go(l); b <- go(r) } yield And(a, b)
      case COr(l, r)  => for { a <- go(l); b <- go(r) } yield Or(a, b)
      case EqualTo(l, r) => leaf(l, r).orElse(leaf(r, l))
      case _ => None
    }
    go(e)
  }
}
