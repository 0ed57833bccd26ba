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

  /** Build the postings table (term, doc_id, tf, positions) from a
    * corpus. The reference's RECORD DocType: one "document" per row
    * (`elephanttwin.thrift:6-9`). `positions` (sorted token offsets, the
    * Lucene postings-with-positions analog) is what makes conjunctive
    * AND queries verifiable and PHRASE queries answerable from the index
    * alone (`HDFSQueryEngine.java:75-82` runs a full Lucene QueryParser;
    * positions are the part of that surface a tf-only table cannot
    * serve). Costs one int per token — the same asymptotics as the text
    * itself, standard for positional indexes. */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.dedup.Dedup.parallelize(docs, idCol)
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))

  /** Multi-field postings (field, term, doc_id, tf, positions) — the
    * reference indexes several record fields into one Lucene index with
    * field-scoped query terms (`bio:engineer`;
    * `HDFSQueryEngine.java:75-82`, default field wiring
    * `HDFSRetrievalDemo.java:65-87`); here each (fieldName, column)
    * pair contributes its own postings under a `field` discriminator,
    * which [[QueryLang]] scopes lookups by. */
  def buildFieldedPostings(
      docs: DataFrame, idCol: String, fields: Seq[(String, String)]): DataFrame = {
    require(fields.nonEmpty, "at least one (fieldName, column) pair")
    fields.map { case (fieldName, column) =>
      buildPostings(docs, idCol, column).withColumn("field", lit(fieldName))
    }.reduce(_ unionByName _)
  }

  /** Persist postings sorted by term (parquet min/max-prunable lookups). */
  def writePostings(postings: DataFrame, path: String): Unit =
    postings.repartition(col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Persist fielded postings clustered by (field, term) so a scoped
    * term lookup prunes to one field's row groups. */
  def writeFieldedPostings(postings: DataFrame, path: String): Unit =
    postings.repartition(col("field"), col("term"))
      .sortWithinPartitions("field", "term", "doc_id")
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

  /** Conjunctive (AND) match: docs containing EVERY query term, scored
    * by summed term frequency. One postings lookup for all terms, one
    * aggregation; a doc qualifies iff it matched as many DISTINCT terms
    * as the query has (each (term, doc) is one postings row). The
    * conjunctive half of the reference's QueryParser surface
    * (`HDFSQueryEngine.java:75-82`). */
  def searchAll(postings: DataFrame, terms: Seq[String]): DataFrame = {
    val qs = terms.map(_.toLowerCase).distinct
    hits(postings, qs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nterms"), sum("tf").as("score"))
      .filter(col("nterms") === qs.size)
      .select("doc_id", "score")
  }

  /** PHRASE match from positional postings: docs where the words occur
    * consecutively, with the number of occurrences. Each phrase slot i
    * joins its term's postings row and shifts the positions left by i —
    * a phrase occurrence starting at p leaves p in EVERY slot's adjusted
    * array, so occurrences = |intersection of the m arrays|. The join is
    * a broadcast of the (tiny) slot list; the per-doc work is codegen'd
    * array ops, no explode of positions. Repeated words in the phrase
    * are handled naturally (each slot joins the same postings row). */
  def searchPhrase(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val spark = postings.sparkSession
    import spark.implicits._
    val slots = phrase.map(_.toLowerCase).zipWithIndex.toDF("term", "slot")
    postings.join(broadcast(slots), "term")
      .select(col("doc_id"), col("slot"),
        transform(col("positions"), p => p - col("slot")).as("adj"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nslots"), collect_list(col("adj")).as("arrs"))
      .filter(col("nslots") === phrase.length)
      .withColumn("occ",
        size(aggregate(
          slice(col("arrs"), 2, phrase.length - 1),
          element_at(col("arrs"), 1),
          (acc, x) => array_intersect(acc, x))).cast("long"))
      .filter(col("occ") >= 1)
      .select("doc_id", "occ")
  }

  /** Scored disjunctive retrieval under a REGISTERED similarity
    * ([[Similarities]]): per matched (term, doc), score
    * sim(tf, df, docLen, avgDocLen, nDocs), summed per doc. Document
    * norms (lengths) are aggregated from the postings here; a 100 TB
    * deployment persists that table next to the postings at build time
    * (Lucene's norms file) instead of recomputing — same one-line
    * aggregation, run once. avgDocLen is derived exact-sum/count so
    * both engines (and any SQL oracle) agree bit-for-bit. */
  def searchScored(
      postings: DataFrame, terms: Seq[String],
      similarity: String = "bm25"): DataFrame =
    searchScoredWith(postings,
      postings.groupBy("doc_id").agg(sum("tf").as("doc_len")),
      terms, similarity)

  /** [[searchScored]] with the norms PROVIDED — the persisted-norms
    * path (`PostingsStore.normsLive`, Lucene's norms file): the corpus
    * stats read a tiny one-row-per-doc table instead of re-aggregating
    * every postings row per query. `norms` must be (doc_id, doc_len)
    * covering exactly the docs with ≥1 token. */
  def searchScoredWith(
      postings: DataFrame, norms: DataFrame, terms: Seq[String],
      similarity: String = "bm25"): DataFrame = {
    val sim = Similarities.byName(similarity)
    val qs = terms.map(_.toLowerCase).distinct
    val stats = norms.agg(count(lit(1)).as("n_docs"),
      (sum("doc_len").cast("double") / count(lit(1))).as("avg_len"))
    // (term, doc) rows are unique, so df is a plain count
    val dfs = hits(postings, qs).groupBy("term").agg(count(lit(1)).as("df"))
    hits(postings, qs)
      .join(broadcast(dfs), "term")
      .join(norms, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s", sim(Similarities.ScoreInputs(
        col("tf"), col("df"), col("doc_len"), col("avg_len"), col("n_docs"))))
      .groupBy("doc_id")
      .agg(sum("s").as("score"))
  }

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
