package graft.text

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Full-text indexing and retrieval as DataFrame programs — the Spark
  * rebuild of the reference's Lucene module (SURVEY.md §3.3): build an
  * inverted index, then answer parse -> search -> top-k -> doc fetch ->
  * count -> random sample, with postings stored as a Parquet table
  * instead of Lucene shards on HDFS
  * (`lucene/indexing/AbstractLuceneIndexingReducer.java`,
  * `lucene/retrieval/HDFSQueryEngine.java:53-153`).
  *
  * Tokenization is whitespace analysis, the reference's default
  * (`AbstractLuceneIndexingJob.java:79-80`), lowercased.
  *
  * Scale shape: the postings table is (term, doc_id, tf), written
  * sorted by term so a term lookup prunes parquet row groups via
  * min/max; scoring a query is one semi-join-shaped filter over the
  * postings (pushed to the scan) plus one aggregation by doc — no
  * full-corpus pass. At 100 TB the postings table would additionally be
  * bucketed by term to make repeated lookups shuffle-free.
  */
object TextIndex {

  /** Lowercased whitespace tokens, empties dropped — the single shared
    * tokenizer (index build and query residuals must never disagree). */
  def tokens(text: Column): Column = graft.functions.TextFunctions.tokens(text)

  /** Build the postings table (term, doc_id, tf) from a corpus.
    * The reference's RECORD DocType: one "document" per row
    * (`elephanttwin.thrift:6-9`). */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.dedup.Dedup.parallelize(docs, idCol)
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Persist postings sorted by term (parquet min/max-prunable lookups). */
  def writePostings(postings: DataFrame, path: String): Unit =
    postings.repartition(col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Disjunctive (Lucene default-OR) match: postings rows for any query
    * term. */
  private def hits(postings: DataFrame, terms: Seq[String]): DataFrame =
    postings.filter(col("term").isin(terms.map(_.toLowerCase): _*))

  /** Top-k by summed term frequency (the analog of
    * `searcher.search(query, numHits)` -> TopDocs,
    * `HDFSQueryEngine.java:75-88`), deterministically tiebroken by
    * doc_id. Catalyst plans TakeOrderedAndProject: per-partition top-k,
    * k-row driver merge — no global sort. */
  def searchTopK(postings: DataFrame, terms: Seq[String], k: Int): DataFrame =
    hits(postings, terms)
      .groupBy("doc_id")
      .agg(sum("tf").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Hit count (`HDFSQueryEngine.count:65-69`) — distinct docs matching
    * any term; a single aggregate, not a materialize-then-count (the
    * reference's MAX_HITS=1,000,000 inefficiency is gone). */
  def countHits(postings: DataFrame, terms: Seq[String]): DataFrame =
    hits(postings, terms).agg(countDistinct(col("doc_id")).as("n"))

  /** Deterministic sample of matching docs — ports the random n-of-hits
    * sampler (`HDFSQueryEngine.java:109-153`) with an md5-prefix
    * selection so the sample is reproducible across engines/runs. */
  def sampleHits(postings: DataFrame, terms: Seq[String], hexPrefix: String): DataFrame =
    hits(postings, terms)
      .groupBy("doc_id")
      .agg(sum("tf").as("score"))
      .filter(substring(md5(col("doc_id").cast("string")), 1, hexPrefix.length) === hexPrefix)
}
