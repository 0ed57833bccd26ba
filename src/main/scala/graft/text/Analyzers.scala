package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable analyzers — the reference lets jobs choose a Lucene
  * analyzer by class name (`AbstractLuceneIndexingReducer.java:80-97`);
  * here an analyzer is just a named `Column => Column` producing a token
  * array, and the registry is a plain map (§2.10: "tokenizer function
  * registry"). Field-value extractors (`Functional.F1` plug-ins keyed by
  * field, `HadoopSplitIndexingMapper.java:48-76`) follow the same shape:
  * a `Map[String, Column]` of named expressions.
  */
object Analyzers {

  type Analyzer = Column => Column

  /** The reference's default: whitespace analysis, lowercased (the
    * shared tokenizer — same definition the index build uses). */
  val whitespace: Analyzer = graft.functions.TextFunctions.tokens

  /** Word-character analysis: splits on anything non-alphanumeric
    * (strips punctuation/quotes — the `excite` query-log shape). */
  val word: Analyzer = text =>
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** BPE-ish sub-token counter shape: words plus standalone punctuation
    * marks, the usual pre-tokenizer regex. */
  val wordPunct: Analyzer = text =>
    filter(regexp_extract_all(lower(text), lit("[\\p{L}\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0)),
      t => length(t) > 0)

  val registry: Map[String, Analyzer] = Map(
    "whitespace" -> whitespace,
    "word" -> word,
    "word_punct" -> wordPunct)

  def byName(name: String): Analyzer =
    registry.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown analyzer '$name' (have: ${registry.keys.mkString(", ")})"))
}
