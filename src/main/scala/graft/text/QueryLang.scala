package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The text QUERY LANGUAGE: a Lucene-QueryParser-shaped surface
  * (`ETL/src/.../HDFSQueryEngine.java:75-82` parses queries with a real
  * Lucene `QueryParser` against a default field) compiled to DataFrame
  * plans over the positional postings table. Grammar:
  *
  * {{{
  *   query  := or
  *   or     := and ((OR)? and)*          // adjacency = OR, Lucene's default
  *   and    := unary (AND unary)*
  *   unary  := NOT unary | atom
  *   atom   := '(' query ')' | [field:] word | [field:] word '*'
  *           | [field:] '"' word+ '"'
  * }}}
  *
  * Semantics (all set operations are over doc_ids; scores ride along):
  *  - a TERM matches docs containing it in the (default or scoped)
  *    field, contributing its term frequency to the score;
  *  - a trailing-`*` PREFIX term matches docs containing any term with
  *    that prefix (Lucene `engineer*`), scoring the summed tf of the
  *    matching terms — compiled to a RANGE SCAN of the term-sorted
  *    postings (`term >= p AND term < p⁺`), so at 100 TB it prunes to
  *    the prefix's row groups instead of enumerating the dictionary;
  *  - a PHRASE matches docs with the words consecutive in one field,
  *    contributing the occurrence count (positional-intersection
  *    semantics of [[TextIndex.searchPhrase]]);
  *  - AND intersects (inner join), OR unions (full-outer join), scores
  *    summing across branches — the additive clause scoring of a Lucene
  *    BooleanQuery;
  *  - NOT under an AND subtracts its operand's match set (anti-join,
  *    Lucene MUST_NOT); a pure-negative (sub)query complements against
  *    the indexed-doc universe with score 0 — docs the index has never
  *    seen (no token in any indexed field) do not resurface. NOT
  *    directly under OR is rejected as it is in Lucene (the reference
  *    engine throws on `a OR NOT b` too — a match-everything branch).
  *
  * Every plan the compiler emits is index-only: postings lookups,
  * joins, and aggregations — never a scan of the raw corpus. At 100 TB
  * the postings table is term-bucketed parquet, so each leaf resolves
  * with row-group-pruned lookups and the boolean algebra runs on
  * (doc_id, score) rows many orders smaller than the text.
  */
object QueryLang {

  // ---------------------------------------------------------------- AST
  sealed trait Node
  final case class Term(field: Option[String], word: String) extends Node
  final case class Prefix(field: Option[String], prefix: String) extends Node
  final case class Phrase(field: Option[String], words: Seq[String]) extends Node
  final case class And(children: Seq[Node]) extends Node
  final case class Or(children: Seq[Node]) extends Node
  final case class Not(child: Node) extends Node

  final case class ParseException(msg: String) extends IllegalArgumentException(msg)

  // -------------------------------------------------------------- lexer
  private sealed trait Tok
  private final case class WordTok(s: String) extends Tok
  private final case class QuotedTok(s: String) extends Tok
  private final case class FieldTok(name: String) extends Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok

  private def lex(q: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LParen; i += 1 }
      else if (c == ')') { out += RParen; i += 1 }
      else if (c == '"') {
        val end = q.indexOf('"', i + 1)
        if (end < 0) throw ParseException(s"unterminated phrase at offset $i")
        out += QuotedTok(q.substring(i + 1, end))
        i = end + 1
      } else {
        val start = i
        while (i < n && !q.charAt(i).isWhitespace &&
          q.charAt(i) != '(' && q.charAt(i) != ')' &&
          q.charAt(i) != '"' && q.charAt(i) != ':') i += 1
        val w = q.substring(start, i)
        if (i < n && q.charAt(i) == ':') {
          if (w.isEmpty) throw ParseException(s"empty field name at offset $start")
          out += FieldTok(w)
          i += 1
        } else w match {
          case "" => throw ParseException(s"unexpected character '${q.charAt(i)}' at offset $i")
          case "AND" => out += AndTok
          case "OR" => out += OrTok
          case "NOT" => out += NotTok
          case _ => out += WordTok(w)
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- parser
  /** Parse a query string into its AST. Operators are the UPPERCASE
    * keywords (lowercase `and`/`or`/`not` are ordinary terms, as in
    * Lucene); bare adjacency is OR. */
  def parse(query: String): Node = {
    var toks = lex(query)
    if (toks.isEmpty) throw ParseException("empty query")

    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }

    def parseOr(): Node = {
      val children = Seq.newBuilder[Node]
      children += parseAnd()
      var more = true
      while (more) peek match {
        case Some(OrTok) => next(); children += parseAnd()
        case Some(LParen | NotTok | WordTok(_) | QuotedTok(_) | FieldTok(_)) =>
          children += parseAnd() // implicit OR (Lucene default operator)
        case _ => more = false
      }
      children.result() match { case Seq(one) => one; case cs => Or(cs) }
    }

    def parseAnd(): Node = {
      val children = Seq.newBuilder[Node]
      children += parseUnary()
      while (peek.contains(AndTok)) { next(); children += parseUnary() }
      children.result() match { case Seq(one) => one; case cs => And(cs) }
    }

    def parseUnary(): Node = peek match {
      case Some(NotTok) => next(); Not(parseUnary())
      case _ => parseAtom()
    }

    def parseAtom(): Node = next() match {
      case LParen =>
        val inner = parseOr()
        if (!peek.contains(RParen)) throw ParseException("expected ')'")
        next(); inner
      case WordTok(w) => termOf(None, w)
      case QuotedTok(p) => phraseOf(None, p)
      case FieldTok(f) => next() match {
        case WordTok(w) => termOf(Some(f), w)
        case QuotedTok(p) => phraseOf(Some(f), p)
        case t => throw ParseException(s"expected term or phrase after '$f:', got $t")
      }
      case t => throw ParseException(s"unexpected $t")
    }

    def termOf(field: Option[String], w: String): Node = {
      val star = w.indexOf('*')
      if (star < 0) Term(field, w)
      else if (star == w.length - 1 && w.length > 1) Prefix(field, w.init)
      else throw ParseException(
        s"'*' is only supported as a trailing prefix wildcard, got '$w'")
    }

    def phraseOf(field: Option[String], body: String): Node = {
      val words = body.split("\\s+").filter(_.nonEmpty).toSeq
      if (words.isEmpty) throw ParseException("empty phrase")
      if (words.size == 1) Term(field, words.head) else Phrase(field, words)
    }

    val root = parseOr()
    if (toks.nonEmpty) throw ParseException(s"trailing input: $toks")
    root
  }

  // ----------------------------------------------------------- compiler
  /** Compile a parsed query against a FIELDED postings table
    * (field, term, doc_id, tf, positions) — see
    * [[TextIndex.buildFieldedPostings]]. Returns (doc_id, score). */
  def compile(postings: DataFrame, node: Node, defaultField: String): DataFrame =
    eval(postings, node, defaultField) match {
      case Matches(df) => df
      case Complement(excluded) =>
        universe(postings).join(excluded, Seq("doc_id"), "left_anti")
          .withColumn("score", lit(0L))
    }

  /** Parse + compile in one call. */
  def run(postings: DataFrame, query: String, defaultField: String): DataFrame =
    compile(postings, parse(query), defaultField)

  /** Match sets flow as either a concrete (doc_id, score) frame or the
    * COMPLEMENT of one — so `NOT x` composes algebraically (AND with a
    * complement = anti-join) without materializing the universe unless
    * a pure-negative query forces it. */
  private sealed trait Res
  private final case class Matches(df: DataFrame) extends Res
  private final case class Complement(excluded: DataFrame) extends Res

  private def universe(postings: DataFrame): DataFrame =
    postings.select("doc_id").distinct()

  private def eval(fp: DataFrame, node: Node, dflt: String): Res = node match {
    case Term(field, word) =>
      Matches(fp
        .filter(col("field") === field.getOrElse(dflt) &&
          col("term") === word.toLowerCase)
        .select(col("doc_id"), col("tf").as("score")))

    case Prefix(field, p) =>
      // range scan over the term-sorted postings: [p, p⁺) where p⁺ is p
      // with its last char incremented — this reaches the parquet scan
      // as min/max-prunable bounds; the startsWith residual keeps the
      // semantics exact independent of any collation subtlety (free: it
      // evaluates only on rows the range already admitted). A doc can
      // match several terms under the prefix, hence the tf sum.
      val pl = p.toLowerCase
      // the incremented-last-char upper bound is only valid when the
      // successor is a real scalar char: past U+D7FF it would be an
      // unpaired surrogate, which UTF8String encodes as '?' (0x3F) —
      // an upper bound BELOW the prefix that drops every match. Fall
      // back to the residual-only branch there (rare terms; exactness
      // is what matters, the range bound is just a pruning aid).
      val range =
        if (pl.last >= '\uD7FF') col("term").startsWith(pl)
        else col("term") >= pl &&
          col("term") < pl.init + (pl.last + 1).toChar &&
          col("term").startsWith(pl)
      Matches(fp
        .filter(col("field") === field.getOrElse(dflt) && range)
        .groupBy("doc_id").agg(sum(col("tf")).as("score")))

    case Phrase(field, words) =>
      // positional-intersection phrase count over the scoped field —
      // the searchPhrase plan with the field filter pushed into the
      // postings lookup
      val scoped = fp.filter(col("field") === field.getOrElse(dflt))
      Matches(TextIndex.searchPhrase(
          scoped.select("term", "doc_id", "tf", "positions"), words)
        .select(col("doc_id"), col("occ").as("score")))

    case Not(child) => eval(fp, child, dflt) match {
      case Matches(df) => Complement(df)
      case Complement(excluded) =>
        // double negation: NOT (universe \ E) = E within the universe;
        // scores were lost at the inner NOT, so re-enter at 0 like any
        // pure-negative clause
        Matches(universe(fp).join(excluded.select("doc_id"), Seq("doc_id"), "left_semi")
          .withColumn("score", lit(0L)))
    }

    case And(children) =>
      val evaled = children.map(eval(fp, _, dflt))
      val pos = evaled.collect { case Matches(df) => df }
      val neg = evaled.collect { case Complement(df) => df }
      val base =
        if (pos.nonEmpty)
          pos.reduce { (l, r) =>
            l.select(col("doc_id"), col("score").as("sl"))
              .join(r.select(col("doc_id"), col("score").as("sr")), "doc_id")
              .select(col("doc_id"), (col("sl") + col("sr")).as("score"))
          }
        else universe(fp).withColumn("score", lit(0L)) // pure-negative AND
      Matches(neg.foldLeft(base)((acc, x) => acc.join(x, Seq("doc_id"), "left_anti")))

    case Or(children) =>
      val evaled = children.map(eval(fp, _, dflt))
      if (evaled.exists(_.isInstanceOf[Complement]))
        // `a OR NOT b` is a match-everything branch; Lucene's parser
        // rejects it and so does this compiler
        throw ParseException("NOT is not allowed directly under OR")
      val dfs = evaled.collect { case Matches(df) => df }
      Matches(dfs.reduce(_ unionByName _)
        .groupBy("doc_id").agg(sum("score").as("score")))
  }
}
