package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable relevance scoring — the reference exposes Lucene's
  * similarity as a pluggable class on the indexing/retrieval jobs
  * (`AbstractLuceneIndexingReducer.java:80-97`); here a similarity is a
  * named column expression over the per-(term, doc) match statistics,
  * registered like [[Analyzers]]. All inputs are exact integers (tf, df,
  * docLen, nDocs) or derived from exact integer sums (avgDocLen), so a
  * SQL oracle reproduces every score bit-for-bit.
  */
object Similarities {

  /** Per-match statistics every similarity scores from:
    * tf = occurrences of the term in the doc, df = docs containing the
    * term, docLen = tokens in the doc, avgDocLen = corpus mean doc
    * length, nDocs = corpus size. */
  final case class ScoreInputs(
      tf: Column, df: Column, docLen: Column, avgDocLen: Column, nDocs: Column)

  type Similarity = ScoreInputs => Column

  /** Raw summed term frequency — the reference engine's effective
    * default scoring and this engine's q21 behavior. */
  val termFrequency: Similarity = in => in.tf.cast("double")

  /** Classic smoothed TF-IDF: tf * ln(1 + N/df). */
  val tfIdf: Similarity = in =>
    in.tf * log(lit(1.0) + in.nDocs.cast("double") / in.df)

  /** BM25 (k1 = 1.2, b = 0.75), the Lucene-default idf form
    * ln(1 + (N - df + 0.5)/(df + 0.5)) — rare terms outweigh common
    * ones and long documents are length-normalized, fixing the
    * sum-of-tf pathology where common-term docs outrank rare-term
    * matches. */
  val bm25: Similarity = { in =>
    val k1 = 1.2
    val b = 0.75
    val idf = log(lit(1.0) +
      (in.nDocs - in.df + lit(0.5)) / (in.df + lit(0.5)))
    val tfNorm = (in.tf * (k1 + 1)) /
      (in.tf + lit(k1) * (lit(1 - b) + lit(b) * in.docLen / in.avgDocLen))
    idf * tfNorm
  }

  val registry: Map[String, Similarity] = Map(
    "tf" -> termFrequency,
    "tfidf" -> tfIdf,
    "bm25" -> bm25)

  def byName(name: String): Similarity =
    registry.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown similarity '$name' (have: ${registry.keys.mkString(", ")})"))
}
