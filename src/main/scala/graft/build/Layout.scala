package graft.build

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers for the 100 TB patterns: bucketing for
  * co-located (shuffle-free) joins and repeated aggregations on the
  * same key.
  *
  * Bucketed tables pre-shuffle once at write time; every later
  * equi-join or aggregation on the bucket key reads co-partitioned data
  * and skips its Exchange. The break-even is one join — any table
  * joined more than once on the same key should be bucketed. (Tables
  * live in the session catalog/warehouse, the Spark-native equivalent
  * of the reference pinning index partitioning to a fixed
  * HashPartitioner on both write and read sides,
  * `io/TextLongPairWritable.java:134-142` /
  * `BlockIndexedFileInputFormat.java:419-423`.)
  */
object Layout {

  /** Write `df` as a bucketed+sorted catalog table. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
