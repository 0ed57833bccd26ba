package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-data pipeline — the operators working
  * TOGETHER, which is what the engine exists for: quality-filter the
  * corpus, keep one canonical document per exact-duplicate group, and
  * emit the export manifest (id + content fingerprint + size). Each
  * stage is a verified operator elsewhere (q44, q24, q33); this query
  * proves the composition end-to-end against one SQL oracle.
  */
object PipelineQueries extends QueryModule {

  private def q50PipelineExport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // canonical = smallest doc_id per exact content digest (q24 shape)
    val canonical = docs
      .groupBy(md5(col("text")).as("digest"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val kept = TextAnalysisQueries.qualityScores(docs)
      .filter(col("keep") === 1)
      .select("doc_id", "n_tokens")
    docs.join(canonical, "doc_id")
      .join(kept, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        TextFunctions.fingerprint(col("text")).as("fp"))
  }

  private val q50Sql =
    """WITH canonical AS (
      |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text)),
      |t AS (
      |  SELECT doc_id,
      |    CAST(LEN(text) AS INT) AS n_chars,
      |    CAST(LEN(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS INT) AS n_alpha,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, CAST(LEN(tk) AS INT) AS n_tokens,
      |    CAST(LEN(tk) BETWEEN 5 AND 1000 AS INT) +
      |    CAST(LEN(LIST_FILTER(tk, x -> x IN ('the', 'a'))) * 20 >= LEN(tk) AS INT) +
      |    CAST(n_alpha * 2 >= n_chars AS INT) +
      |    CAST(LIST_MAX(LIST_TRANSFORM(tk, x -> LEN(x))) <= 25 AS INT) AS hits
      |  FROM t),
      |kept AS (SELECT doc_id, n_tokens FROM h WHERE hits = 4)
      |SELECT d.doc_id, k.n_tokens,
      |  MD5(ARRAY_TO_STRING(
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(d.text)), '\s+'), x -> LEN(x) > 0),
      |    ' ')) AS fp
      |FROM documents d
      |JOIN canonical c ON c.doc_id = d.doc_id
      |JOIN kept k ON k.doc_id = d.doc_id""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q50_pipeline_export", q50PipelineExport, Some(q50Sql)))
}
