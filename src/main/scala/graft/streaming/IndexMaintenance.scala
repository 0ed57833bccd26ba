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
}
