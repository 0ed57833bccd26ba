package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Debug utility: read exactly one byte range `[start, end)` of one
  * file — the rebuild of `OneSplitInputFormat`
  * (`retrieval/OneSplitInputFormat.java:31-54`), which the reference
  * uses with `TestIndexedReader` to eyeball the rows an index entry
  * points at. The `_metadata` split columns give the same block
  * identity the sparse index records, so a posting's range can be
  * inspected directly. */
object RangeScan {

  /** Rows whose read-split lies inside `[start, end)` of `file`. */
  def readRange(spark: SparkSession, file: String, start: Long, end: Long): DataFrame =
    spark.read.parquet(file)
      .withColumn("_block_start", col("_metadata.file_block_start"))
      .withColumn("_block_end",
        col("_metadata.file_block_start") + col("_metadata.file_block_length"))
      .filter(col("_block_start") >= start && col("_block_end") <= end)

  /** Rows of the blocks a specific index posting covers — the
    * TestIndexedReader flow: look the value up, read only its ranges.
    * Honors the LIVE generation only (rows whose gen matches the file's
    * descriptor), same as every other query path — an incrementally
    * rebuilt file's stale postings are ignored, not unioned in. */
  def readPosting(
      spark: SparkSession, indexRoot: String,
      file: String, column: String, value: String): DataFrame = {
    import spark.implicits._
    import graft.build.IndexBuilder
    // Postings store canonical (scheme-less) paths; a scheme-qualified
    // caller path (file:///...) must be canonicalized for BOTH the
    // descriptor lookup and the postings filter or it matches zero rows.
    val canonicalFile = IndexBuilder.canonicalPath(file)
    val liveGen = IndexBuilder.loadDescriptors(spark, indexRoot)
      .get(canonicalFile).map(_.modificationTime)
    val ranges = IndexBuilder.postings(spark, indexRoot)
      .filter(col("column") === column && col("value") === value &&
        col("file") === canonicalFile &&
        liveGen.map(col("gen") === _).getOrElse(lit(false)))
      .select("ranges").as[Seq[graft.intervals.Block]]
      .collect().flatten
    if (ranges.isEmpty) return spark.read.parquet(file).limit(0)
    val df = spark.read.parquet(file)
      .withColumn("_bs", col("_metadata.file_block_start"))
    val cond = ranges.map(b => col("_bs") >= b.start && col("_bs") < b.end).reduce(_ || _)
    df.filter(cond).drop("_bs")
  }
}
