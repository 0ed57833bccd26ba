package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL oracle
  * over the same parquet tables. Column names/aliases MUST match between
  * the two — the driver's comparator sorts columns by name before
  * hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def queries: Seq[Q]
}
