package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: token counting, quality
  * stats, marker-based language ID, and document fingerprinting — the
  * per-document scoring surface of a training-data pipeline, all
  * integer/digest outputs so the oracle compare is exact.
  */
object TextAnalysisQueries extends QueryModule {

  private val EnMarkers = Seq("the", "a")

  /** Token/quality statistics (counts only — no float ratios, exact
    * across engines; ratios are a trivial projection downstream). */
  private def q31TokenStats(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      array_max(transform(toks, t => length(t))).as("max_tok_len"),
      TextFunctions.markerCount(toks, EnMarkers).as("n_stopwords"))
  }

  private val q31Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(LEN(tk) AS INT) AS n_tokens,
      |  CAST(LEN(LIST_DISTINCT(tk)) AS INT) AS n_uniq,
      |  CAST(LIST_MAX(LIST_TRANSFORM(tk, x -> LEN(x))) AS INT) AS max_tok_len,
      |  CAST(LEN(LIST_FILTER(tk, x -> x IN ('the', 'a'))) AS INT) AS n_stopwords
      |FROM t""".stripMargin

  /** Marker-based language ID (the SQL-expressible classifier; the
    * richer n-gram-profile classifier lives in LangId and is
    * unit-tested — profiles aren't expressible as one SQL oracle). */
  private def q32LangId(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("lang"),
      when(TextFunctions.markerCount(toks, EnMarkers) >= 1, lit("en"))
        .otherwise(lit("und")).as("predicted"))
  }

  private val q32Sql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN LEN(LIST_FILTER(tk, x -> x IN ('the', 'a'))) >= 1
      |       THEN 'en' ELSE 'und' END AS predicted
      |FROM t""".stripMargin

  /** Normalized-content fingerprint (md5 over the canonical token
    * stream). */
  private def q33Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"))

  private val q33Sql =
    """SELECT doc_id,
      |  MD5(ARRAY_TO_STRING(
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0),
      |    ' ')) AS fp
      |FROM documents""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q31_token_stats", q31TokenStats, Some(q31Sql)),
    Q("q32_lang_id", q32LangId, Some(q32Sql)),
    Q("q33_fingerprint", q33Fingerprint, Some(q33Sql)))
}
