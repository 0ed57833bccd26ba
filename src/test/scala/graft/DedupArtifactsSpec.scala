package graft

import graft.dedup.{Dedup, DedupArtifacts}
import graft.operators.Components
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ingest-time dedup artifacts must be EXACTLY the from-scratch
  * operator outputs (the differential proof the oracle gate repeats at
  * sf0.01 every round), and the prepare must be an idempotent no-op
  * when fresh. */
class DedupArtifactsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("DedupArtifactsSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("persisted minhash pairs equal the from-scratch operator output") {
    import spark.implicits._
    val art = DedupArtifacts.minHashPairs(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val fresh = Dedup.minHashDedupPairs(
        Tables.documents(spark, sfDir), "doc_id", "text",
        DedupArtifacts.N, DedupArtifacts.Threshold,
        DedupArtifacts.K, DedupArtifacts.Bands)
      .as[(Long, Long)].collect().toSet
    assert(art == fresh)
    assert(art.nonEmpty, "the sf0.001 corpus has planted near-dups")
  }

  test("persisted clusters equal components over the from-scratch pairs") {
    import spark.implicits._
    val art = DedupArtifacts.clusters(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val docs = Tables.documents(spark, sfDir)
    val edges = Dedup.minHashDedupPairs(docs, "doc_id", "text",
        DedupArtifacts.N, DedupArtifacts.Threshold,
        DedupArtifacts.K, DedupArtifacts.Bands)
      .select(col("doc_i").as("src"), col("doc_j").as("dst"))
    val fresh = Components.connectedComponents(
        docs.select(col("doc_id").as("id")), edges)
      .as[(Long, Long)].collect().toSet
    assert(art == fresh)
    // every document appears exactly once
    assert(art.size == docs.count())
  }

  test("persisted cut pairs equal the from-scratch cut operator output") {
    import spark.implicits._
    val art = DedupArtifacts.cutPairs(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val fresh = Dedup.exactJaccardPairs(
        Tables.documents(spark, sfDir), "doc_id", "text",
        DedupArtifacts.N, DedupArtifacts.Threshold,
        maxShingleFreq = DedupArtifacts.MaxShingleFreq)
      .as[(Long, Long)].collect().toSet
    assert(art == fresh)
  }

  test("persisted shingle index equals the from-scratch shingle table") {
    import spark.implicits._
    val art = DedupArtifacts.shingles(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val fresh = Dedup.shingleTable(
        Tables.documents(spark, sfDir), "doc_id", "text", DedupArtifacts.N)
      .as[(Long, Long)].collect().toSet
    assert(art == fresh)
    assert(art.nonEmpty)
  }

  test("persisted sem pairs equal the from-scratch q28 operator output") {
    import spark.implicits._
    val art = DedupArtifacts.semPairs(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val fresh = graft.similarity.Ann
      .cosineNearDupPairs(Tables.embeddings(spark, sfDir),
        DedupArtifacts.SemThreshold)
      .as[(Long, Long)].collect().toSet
    assert(art == fresh)
    assert(art.nonEmpty)
  }

  test("incremental cluster maintenance equals the full recompute") {
    import spark.implicits._
    val incr = SparkEntry.queries("q142_incremental_clusters")(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val full = SparkEntry.queries("q49_dedup_clusters")(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    assert(incr == full,
      s"incremental diverged: only_incr=${(incr -- full).take(3)} " +
        s"only_full=${(full -- incr).take(3)}")
  }

  test("prepare is an idempotent no-op while the source is unchanged") {
    DedupArtifacts.prepare(spark, sfDir)
    val t0 = System.nanoTime()
    DedupArtifacts.prepare(spark, sfDir)
    val secs = (System.nanoTime() - t0) / 1e9
    // a fresh-check no-op is one meta-file stat+read, far under a
    // rebuild (which runs MinHash + components + the cut join)
    assert(secs < 2.0, f"second prepare took $secs%.1f s — rebuilt?")
  }
}
