package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev tool: time q154's stages separately. */
object Q154Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val DA = graft.dedup.DedupArtifacts
    val H = DA.PHashMaxHamming
    val isDeltaId = col("doc_id") % DA.DeltaMod === DA.DeltaRem
    def fp = DA.phashes(spark, dir)
      .select(col("media_id").as("doc_id"), col("phash").as("simhash"))
    def cand = graft.dedup.Dedup.bandedCrossCandidates(fp, H, isDeltaId)
    def newPairs = cand
      .filter(bit_count(col("a_sim").bitwiseXOR(col("b_sim"))) <= H)
      .select(col("a_id").as("doc_i"), col("b_id").as("doc_j")).distinct()
    def time(label: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[p] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    time("raw-candidates")(cand.count())
    time("new-pairs")(newPairs.count())
    time("full-q154")(SparkEntry.queries("q154_incr_media_clusters")(spark, dir).count())
    spark.stop()
  }
}
