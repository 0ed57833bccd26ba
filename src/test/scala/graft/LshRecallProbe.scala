package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement tool (not a test): per-query exact-hit counts of
  * [[graft.similarity.Ann.lshTopK]] against brute force at every
  * testdata scale, for candidate LSH structures — the measurement
  * behind q30's 8-band decision (r12: the 4-band/16-plane structure
  * cleared the hits>=2 floor at sf0.001/sf0.01 but dropped to 1 hit
  * for query 1 at sf0.1).
  *
  * `sbt "Test/runMain graft.LshRecallProbe"`
  */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
      val q = emb.filter(col("vec_id") < 3)
      val exact = graft.similarity.Ann.bruteForceTopK(emb, q, 5)
        .select("query_id", "neighbor_id")
      for ((np, b) <- Seq((16, 4), (24, 6), (28, 7), (32, 8), (16, 8))) {
        val approx = graft.similarity.Ann.lshTopK(emb, q, 5, nPlanes = np, bands = b)
        val hits = approx
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
          .orderBy("query_id")
          .collect().map(r => s"q${r.getLong(0)}=${r.getLong(1)}").mkString(" ")
        println(s"[lsh-recall] $sf planes=$np bands=$b hits: $hits")
      }
    }
    spark.stop()
  }
}
