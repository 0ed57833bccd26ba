package graft

import graft.dedup.Dedup
import graft.operators.DedupQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The registered shingle-frequency cut (q53) must be RECALL-ONLY on the
  * test corpora: dropping shingles with df > MaxShingleFreq before the
  * quadratic candidate join loses a pair only if EVERY shingle the pair
  * shares is hot. This spec asserts (a) cut and uncut pair sets are
  * identical at every scale factor, and (b) the structural reason — each
  * true pair shares at least one below-cut shingle, with measured
  * margin. */
class DedupCutSpec extends AnyFunSuite {

  private val N = 3
  private val Threshold = 0.8

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("DedupCutSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"frequency cut is recall-only: cut == uncut pair set ($sf)") {
      val docs = Tables.documents(spark, s"/root/testdata/$sf")
      val uncut = pairs(Dedup.exactJaccardPairs(docs, "doc_id", "text", N, Threshold))
      val cut = pairs(Dedup.exactJaccardPairs(docs, "doc_id", "text", N, Threshold,
        maxShingleFreq = DedupQueries.MaxShingleFreq))
      assert(uncut.nonEmpty)
      assert(cut == uncut, s"missing=${uncut -- cut}, spurious=${cut -- uncut}")
    }
  }

  test("every true pair shares a below-cut shingle, with margin (sf0.01)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val sh = Dedup.shingleTable(docs, "doc_id", "text", N)
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val tp = Dedup.exactJaccardPairs(docs, "doc_id", "text", N, Threshold)
    val minSharedDf = tp
      .join(sh.select(col("doc_id").as("doc_i"), col("sh")), "doc_i")
      .join(sh.select(col("doc_id").as("doc_j"), col("sh")), Seq("doc_j", "sh"))
      .join(dfreq, "sh")
      .groupBy("doc_i", "doc_j").agg(min(col("df")).as("min_df"))
    val worst = minSharedDf.agg(max(col("min_df"))).first().getLong(0)
    assert(worst <= DedupQueries.MaxShingleFreq / 2,
      s"cut margin eroded: a true pair's best shared shingle has df=$worst " +
        s"vs cut ${DedupQueries.MaxShingleFreq}")
  }
}
