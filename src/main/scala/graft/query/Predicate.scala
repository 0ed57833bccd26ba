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
    * condition inside the optimizer). Same supported subset. */
  def fromExpression(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Pred] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Or => COr, EqualTo, Literal, AttributeReference, Cast, Expression => CExpr}
    import org.apache.spark.sql.types.StringType
    def attrName(x: CExpr): Option[String] = x match {
      case a: AttributeReference                => Some(a.name)
      case Cast(a: AttributeReference, _, _, _) => Some(a.name)
      case _                                    => None
    }
    // Stringify through Catalyst's own Cast so the value matches the
    // index's `cast(col as string)` EXACTLY — a raw v.toString leaks
    // internal representations (DateType days, TimestampType micros)
    // and would make pruning silently drop every file.
    def litStr(x: CExpr): Option[String] = {
      def viaCast(l: Literal): Option[String] =
        try Option(Cast(l, StringType,
            Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
          .eval(null)).map(_.toString)
        catch { case _: Exception => None }
      x match {
        case l @ Literal(v, _) if v != null                => viaCast(l)
        case Cast(l @ Literal(v, _), _, _, _) if v != null => viaCast(l)
        case _                                             => None
      }
    }
    def go(x: CExpr): Option[Pred] = x match {
      case CAnd(l, r) => for { a <- go(l); b <- go(r) } yield And(a, b)
      case COr(l, r)  => for { a <- go(l); b <- go(r) } yield Or(a, b)
      case EqualTo(l, r) =>
        (for { n <- attrName(l); v <- litStr(r) } yield Eq(n, v))
          .orElse(for { n <- attrName(r); v <- litStr(l) } yield Eq(n, v))
      case _ => None
    }
    go(e)
  }
}
