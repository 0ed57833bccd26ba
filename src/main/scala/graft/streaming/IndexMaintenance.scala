package graft.streaming

import graft.build.IndexBuilder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental index maintenance as a Structured Streaming job — the
  * extension SURVEY.md §2.9/§7.3-M8 plans on top of the reference (which
  * is batch-only; its operational mode was re-running the indexing job
  * and skipping files with `hasPreviousIndex`,
  * `AbstractBlockIndexingJob.java:359-364`).
  *
  * The file-source stream provides discovery and exactly-once batch
  * semantics over arriving files; each micro-batch triggers an
  * incremental build that indexes exactly the not-yet-fresh files and
  * appends gen-stamped postings (see IndexBuilder.buildIncremental —
  * idempotent, so replayed batches after a crash are no-ops).
  *
  * `Trigger.AvailableNow` drains everything currently present and
  * stops — the catch-up/cron shape. Pass a processing-time trigger for
  * continuous maintenance.
  */
object IndexMaintenance extends org.apache.spark.internal.Logging {

  def runAvailableNow(
      spark: SparkSession,
      dataDir: String,
      columns: Seq[String],
      indexRoot: String,
      checkpointDir: String,
      capBytes: Long = IndexBuilder.DefaultCapBytes): StreamingQuery = {
    val schema = spark.read.parquet(dataDir).schema
    val stream = spark.readStream.schema(schema).parquet(dataDir)
    stream.writeStream
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        val indexed = IndexBuilder.buildIncremental(spark, dataDir, columns, indexRoot, capBytes)
        if (indexed.nonEmpty)
          logInfo(s"IndexMaintenance batch $batchId: indexed ${indexed.size} file(s)")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming maintenance of the IVF ANN index — the vector twin of
    * [[runAvailableNow]]: new embedding files stream in, and each
    * micro-batch delta-assigns its vectors under the index's PERSISTED
    * centroids and appends them gen-stamped
    * (`AnnIndex.appendIvf` — map-only, no retrain, no base re-scan).
    * The first batch against a missing index trains and builds it.
    *
    * Exactly-once composition: a replayed batch after a crash appends a
    * duplicate generation for the same ids, and the index's live view
    * resolves per-id to the latest generation with identical content
    * (assignment under a fixed model is a pure function) — so replays
    * are CONTENT-idempotent without any dedup state in the stream
    * (AnnIndexSpec pins upsert semantics; StreamingIndexSpec pins
    * stream-built ≡ batch-built). Compaction on staleness stays a
    * batch-side decision (`AnnIndex.compactIvf`), exactly like postings
    * compaction. */
  def runIvfAvailableNow(
      spark: SparkSession,
      vecDir: String,
      indexDir: String,
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nlist: Int = 16): StreamingQuery = {
    val schema = spark.read.parquet(vecDir).schema
    val stream = spark.readStream.schema(schema).parquet(vecDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val p = new org.apache.hadoop.fs.Path(s"$indexDir/centroids")
        val exists = p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
        if (!exists)
          graft.similarity.AnnIndex.buildIvf(batch, indexDir, idCol, vecCol, nlist)
        else
          graft.similarity.AnnIndex.appendIvf(batch, indexDir, idCol, vecCol)
        logInfo(s"IndexMaintenance IVF batch $batchId: ${if (exists) "append" else "build"}")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
