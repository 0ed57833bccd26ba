package graft.text

import graft.build.IndexBuilder
import graft.functions.TextFunctions
import graft.query.{Eq, PruneReport, PrunedScanner}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Block-granular text index: term -> byte ranges of the data files
  * containing at least one document with that term — the reference's
  * Lucene `DocType.BLOCK` "HadoopSplit" flavor ("a cheater's block-level
  * index", `lucene/indexing/HadoopSplitDocument.java:39`), rebuilt as a
  * multi-valued key over the sparse-index machinery: tokens are just
  * another [[IndexBuilder.IndexKeys]] entry, so build, incremental
  * maintenance, gen-versioning, freshness fallback, and pruned scans all
  * come from the same code path as column indexes.
  *
  * A term scan prunes data files by posting list, then re-checks rows
  * with a contains-filter on the text column (the residual for a derived
  * key). At 100 TB this is the difference between grepping every shard
  * and opening only shards whose index says the term occurs.
  */
object BlockTextIndex {

  /** Reserved key name for the token pseudo-column. */
  val TermKey = "__term__"

  def termKeys(textCol: String): IndexBuilder.IndexKeys =
    Seq(TermKey -> TextFunctions.tokens(col(textCol)))

  def build(
      spark: SparkSession,
      dataDir: String,
      textCol: String,
      indexRoot: String,
      capBytes: Long = IndexBuilder.DefaultCapBytes,
      overwrite: Boolean = false): Unit =
    IndexBuilder.buildKeyed(spark, dataDir, termKeys(textCol), indexRoot, capBytes, overwrite)

  /** Pruned scan of documents containing `term`. */
  def scanForTerm(
      spark: SparkSession,
      dataDir: String,
      textCol: String,
      term: String,
      indexRoot: String): (DataFrame, PruneReport) =
    PrunedScanner.scanWithReport(
      spark, dataDir, Eq(TermKey, term.toLowerCase), indexRoot,
      residual = Some(array_contains(TextFunctions.tokens(col(textCol)), term.toLowerCase)))
}
