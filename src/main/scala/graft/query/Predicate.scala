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
    * `BlockIndexedFileInputFormat.java:669-679`). EQ compares on the
    * stringified column, mirroring the reference's String.equals after
    * reflective getter access (`FilterRecordReader.java:88-96`);
    * BETWEEN compares numerically (decimal literals — exact against
    * integral columns). */
  def toColumn: Column = this match {
    case Eq(c, v)  => col(c).cast("string") === lit(v)
    case Between(c, lo, hi, loInc, hiInc) =>
      val conds =
        lo.map(l => if (loInc) col(c) >= lit(l.underlying) else col(c) > lit(l.underlying)).toSeq ++
        hi.map(h => if (hiInc) col(c) <= lit(h.underlying) else col(c) < lit(h.underlying)).toSeq
      conds.reduceOption(_ && _).getOrElse(lit(true))
    case And(l, r) => l.toColumn && r.toColumn
    case Or(l, r)  => l.toColumn || r.toColumn
  }

  /** Schema-aware residual: semantically identical to [[toColumn]] but
    * expressed NATIVELY (`col === 7L`) whenever the leaf value
    * round-trips exactly through the column's type, because the
    * string-compare form (`cast(col as string) === "7"`) cannot be
    * pushed into the parquet reader — it forfeits row-group min/max and
    * dictionary skipping on every numeric index column. Equivalence
    * needs stringify to be injective on the type, so only integral /
    * boolean / date / timestamp columns switch (float/double keep the
    * string form: NaN != NaN and -0.0 == 0.0 break the bijection).
    * Columns absent from the schema keep the string form too. */
  def toColumnFor(schema: org.apache.spark.sql.types.StructType): Column = this match {
    case Eq(c, v) =>
      schema.find(_.name == c)
        .flatMap(f => Pred.typedEq(c, v, f.dataType))
        .getOrElse(col(c).cast("string") === lit(v))
    case b: Between => b.toColumn
    case And(l, r) => l.toColumnFor(schema) && r.toColumnFor(schema)
    case Or(l, r)  => l.toColumnFor(schema) || r.toColumnFor(schema)
  }

  /** All leaf predicates (cf. `getAllColumnNames`,
    * `BlockIndexedFileInputFormat.java:717-733`). */
  def leaves: Seq[Pred] = this match {
    case And(l, r) => l.leaves ++ r.leaves
    case Or(l, r)  => l.leaves ++ r.leaves
    case leaf      => Seq(leaf)
  }

  def columns: Set[String] = leaves.map {
    case Eq(c, _)                => c
    case Between(c, _, _, _, _)  => c
    case other                   => sys.error(s"non-leaf in leaves: $other")
  }.toSet
}

final case class Eq(column: String, value: String) extends Pred

/** Numeric range leaf — the "almost free via the index table" extension
  * SURVEY.md §7.2 calls out (the reference only executes EQ,
  * `retrieval/Expression.java:205-227`). A file qualifies when ANY of
  * its indexed values falls in the range; the exact bound check runs
  * driver-side in BigDecimal, so pruning is sound for every integral
  * key (index keys are strings; string ORDER is meaningless for
  * numbers, hence value-level testing rather than key-range seeks).
  * Bounds are None for open ends. */
final case class Between(
    column: String,
    lo: Option[BigDecimal], hi: Option[BigDecimal],
    loInc: Boolean, hiInc: Boolean) extends Pred

final case class And(left: Pred, right: Pred) extends Pred
final case class Or(left: Pred, right: Pred) extends Pred

object Pred {

  /** Translation cap for IN/InSet lists (larger ones fall back to a
    * full scan — see fromExpression). */
  val MaxInValues = 1000

  /** IN desugars to an OR tree of EQ leaves: the postings lookup is
    * already batched across leaves, so each value costs one keyed index
    * probe, exactly like the reference would evaluate `c = v1 OR c = v2`.
    * The tree is built BALANCED — the recursive consumers (leaves,
    * toColumn, qualify) walk depth O(log n), so a 50k-value IN cannot
    * blow the driver stack the way a left-leaning reduce would. */
  def in(column: String, values: Seq[String]): Pred = {
    require(values.nonEmpty, "IN requires at least one value")
    def build(vs: IndexedSeq[String]): Pred =
      if (vs.length == 1) Eq(column, vs.head)
      else {
        val (l, r) = vs.splitAt(vs.length / 2)
        Or(build(l), build(r))
      }
    build(values.toIndexedSeq)
  }

  /** `col === <typed v>` when `v` round-trips exactly through `t`
    * (parse, stringify back, compare); None otherwise. */
  private[query] def typedEq(
      c: String, v: String,
      t: org.apache.spark.sql.types.DataType): Option[Column] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types._
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    t match {
      case StringType => Some(col(c) === lit(v))
      case ByteType | ShortType | IntegerType | LongType | BooleanType |
          DateType | TimestampType =>
        try {
          val parsed = Cast(Literal(v), t, tz).eval(null)
          if (parsed == null) None
          else {
            val back = Option(Cast(Literal(parsed, t), StringType, tz).eval(null))
              .map(_.toString)
            if (back.contains(v))
              Some(col(c) === org.apache.spark.sql.graftbridge.ColumnBridge
                .column(Literal(parsed, t)))
            else None
          }
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  /** Does `value` (an index key, stringified) satisfy a leaf? Exact:
    * BigDecimal for ranges, string equality for EQ. Non-numeric keys
    * never satisfy a numeric range. */
  private[graft] def leafMatches(leaf: Pred, value: String): Boolean = leaf match {
    case Eq(_, v) => v == value
    case Between(_, lo, hi, loInc, hiInc) =>
      try {
        val d = BigDecimal(value)
        lo.forall(l => if (loInc) d >= l else d > l) &&
          hi.forall(h => if (hiInc) d <= h else d < h)
      } catch { case _: NumberFormatException => false }
    case other => sys.error(s"not a leaf: $other")
  }
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
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Or => COr, EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In => CIn, InSet, Literal, AttributeReference, Cast, Expression => CExpr}
    import org.apache.spark.sql.types.{StringType, ByteType, ShortType, IntegerType, LongType, DataType}
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
    // Floating-point attrs never translate as bare EQ: SQL equality is
    // not the string-key bijection (0.0 == -0.0 but keys "0.0" != "-0.0";
    // Spark even treats NaN = NaN as true) — pruning on such keys drops
    // sound rows. The explicit cast-to-string form below stays available
    // (string compare IS the index semantics there).
    def floating(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType => true
      case _ => false
    }
    def leaf(a: CExpr, b: CExpr): Option[Eq] = a match {
      case attr: AttributeReference if !floating(attr.dataType) =>
        foldLiteral(b).flatMap(stringify).map(Eq(attr.name, _))
      case Cast(attr: AttributeReference, StringType, _, _) =>
        foldLiteral(b).filter(_.dataType == StringType)
          .flatMap(stringify).map(Eq(attr.name, _))
      case _ => None
    }
    // Numeric range leaves, integral attributes only: an integral
    // value's stringified key always round-trips exactly through
    // BigDecimal, which is what makes Between's driver-side bound check
    // sound. Floating-point attrs are rejected (fall back to full scan).
    def integral(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    def intAttr(x: CExpr): Option[String] = x match {
      case a: AttributeReference if integral(a.dataType) => Some(a.name)
      case _ => None
    }
    def decOf(x: CExpr): Option[BigDecimal] =
      foldLiteral(x).filter(l => integral(l.dataType))
        .flatMap(l => Option(l.value)).map(v => BigDecimal(v.toString))
    def rangeLeaf(a: CExpr, b: CExpr, mk: (String, BigDecimal) => Between): Option[Pred] =
      for { n <- intAttr(a); d <- decOf(b) } yield mk(n, d)
    def go(x: CExpr): Option[Pred] = x match {
      case CAnd(l, r) => for { a <- go(l); b <- go(r) } yield And(a, b)
      case COr(l, r)  => for { a <- go(l); b <- go(r) } yield Or(a, b)
      case EqualTo(l, r) => leaf(l, r).orElse(leaf(r, l))
      case GreaterThan(l, r) =>
        rangeLeaf(l, r, (n, d) => Between(n, Some(d), None, loInc = false, hiInc = false))
          .orElse(rangeLeaf(r, l, (n, d) => Between(n, None, Some(d), loInc = false, hiInc = false)))
      case GreaterThanOrEqual(l, r) =>
        rangeLeaf(l, r, (n, d) => Between(n, Some(d), None, loInc = true, hiInc = false))
          .orElse(rangeLeaf(r, l, (n, d) => Between(n, None, Some(d), loInc = false, hiInc = true)))
      case LessThan(l, r) =>
        rangeLeaf(l, r, (n, d) => Between(n, None, Some(d), loInc = false, hiInc = false))
          .orElse(rangeLeaf(r, l, (n, d) => Between(n, Some(d), None, loInc = false, hiInc = false)))
      case LessThanOrEqual(l, r) =>
        rangeLeaf(l, r, (n, d) => Between(n, None, Some(d), loInc = false, hiInc = true))
          .orElse(rangeLeaf(r, l, (n, d) => Between(n, Some(d), None, loInc = true, hiInc = false)))
      // very large IN lists don't translate: 50k index probes cost more
      // than the scan they'd save, and the residual Column the IR
      // rebuilds would be a 50k-way boolean tree — full scan instead
      case CIn(a, list) if list.nonEmpty && list.length <= MaxInValues =>
        a match {
          case attr: AttributeReference if !floating(attr.dataType) =>
            val vs = list.map(v => foldLiteral(v).flatMap(stringify))
            if (vs.forall(_.isDefined)) Some(in(attr.name, vs.map(_.get))) else None
          case _ => None
        }
      case InSet(attr: AttributeReference, set)
          if set.nonEmpty && set.size <= MaxInValues && !floating(attr.dataType) =>
        val vs = set.toSeq.map(v =>
          if (v == null) None else stringify(Literal(v, attr.dataType)))
        if (vs.forall(_.isDefined)) Some(in(attr.name, vs.map(_.get))) else None
      case _ => None
    }
    go(e)
  }
}
