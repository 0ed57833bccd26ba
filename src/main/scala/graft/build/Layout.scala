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

  /** Write `df` as a bucketed+sorted catalog table.
    *
    * Overwrite is made robust across JVMs: the in-memory catalog dies
    * with the session but the warehouse DIRECTORY does not, and a new
    * session's `saveAsTable(Overwrite)` then behaves as CREATE and
    * refuses the orphan location ([LOCATION_ALREADY_EXISTS]). Drop the
    * catalog entry and delete the stale location explicitly first. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    if (mode == SaveMode.Overwrite) {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write
      .mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
