package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables (see
  * TESTDATA.md). One parquet file per table under the scale-factor dir.
  *
  * `events.ts` normalization: [[events]] always hands query code a
  * session-TZ TimestampType column regardless of how the generator
  * wrote the parquet — TIMESTAMP(NANOS) (read as a nanos long under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, which sessions still
  * set for compatibility with that generation) or naive TIMESTAMP
  * (micros, isAdjustedToUTC=false, which Spark reads as
  * TIMESTAMP_NTZ). NTZ would otherwise poison downstream consumers
  * that require an event-time-capable type (`withWatermark` rejects
  * NTZ outright); sessions run with timeZone=UTC, so the NTZ→LTZ cast
  * is value-preserving against the DuckDB oracle's naive reading.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integral division: `/` is a double Divide and 2024-era nano
        // longs exceed double's 2^53 exact range (1 µs rounding errors)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
