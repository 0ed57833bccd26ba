package graft.similarity

import graft.Tables
import graft.dedup.DedupArtifacts
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MAINTAINED ANN indexes as per-corpus ingest artifacts — the
  * [[AnnIndex]] lifecycle (build → gen-stamped append → live-view read)
  * persisted once per (corpus fingerprint, params) and read by the
  * oracle-gated maintained-index queries (q164/q165), the same
  * persist-once economics as `DedupArtifacts` (reference:
  * `AbstractBlockIndexingJob.java:122-152` — index at build time, every
  * query reads it).
  *
  * Both builds are genuine MAINTENANCE histories, not one-shot writes —
  * and deliberately DIFFERENT histories, so the two live-view read
  * paths are each under the oracle:
  *  - IVF: gen 0 indexes the full corpus, then the standard delta batch
  *    (id ≡ DeltaRem mod DeltaMod) is RE-INGESTED as a gen-1 UPSERT
  *    (the re-embedded-documents scenario) — q164 reads through
  *    latest-gen RESOLUTION. Assignment under a fixed model is a pure
  *    per-row function, so the resolved view is bit-identical to the
  *    gen-0 build and q45's recall bound holds deterministically.
  *  - LSH: gen 0 indexes the BASE, the delta appends as gen 1 with
  *    `newIds = true` (banded signatures are a per-vector property of
  *    seed/planes alone — no training, so base∪delta ≡ full rebuild
  *    exactly) — q165 reads the APPEND-ONLY PLAIN view with the probe's
  *    bucket filters pushed below it, the common-case economics.
  *
  * Staleness: one meta file fingerprints the embeddings table
  * (`Layout.sourceFingerprint`) + params; mismatch or partial state
  * (missing meta, or an index tree whose own `_INDEX_META` marker is
  * gone) rebuilds. Meta written LAST.
  */
object AnnArtifacts {

  /** Index parameters — MUST mirror the registered q45/q30 builds
    * (`SimilarityQueries.q45AnnIvf`/`q30AnnLsh`): same trainer inputs,
    * same seeded planes, or the maintained read path would not be
    * comparable to the oracle's asserted recall bounds. */
  val IvfNlist = 16
  val LshPlanes = 16
  val LshBands = 8

  /** v2: the LSH history becomes append-only (base build + newIds delta
    * append), putting the plain-read probe path under the oracle. */
  private val Version = 2

  private def root(sfDir: String): String =
    s"${DedupArtifacts.artifactBase}/graft_ann/v$Version/${DedupArtifacts.corpusKey(sfDir)}"
  def ivfDir(sfDir: String): String = s"${root(sfDir)}/ivf"
  def lshDir(sfDir: String): String = s"${root(sfDir)}/lsh"
  private def metaPath(sfDir: String) = s"${root(sfDir)}/_META"

  private def fingerprint(s: SparkSession, sfDir: String): String =
    s"v$Version:ivf$IvfNlist:lsh$LshPlanes/$LshBands:" +
      graft.build.Layout.sourceFingerprint(s, s"$sfDir/embeddings.parquet")

  private def emb(s: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(s, sfDir).select("vec_id", "embedding")

  /** Build-or-reuse both maintained indexes for `sfDir`'s embeddings. */
  def ensure(s: SparkSession, sfDir: String): Unit = synchronized {
    val fp = fingerprint(s, sfDir)
    val rootP = new Path(root(sfDir))
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val meta = new Path(metaPath(sfDir))
    val fresh = fs.exists(meta) && {
      val in = fs.open(meta)
      (try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()) == fp
    } && AnnIndex.isComplete(s, ivfDir(sfDir)) &&
      AnnIndex.isComplete(s, lshDir(sfDir))
    if (fresh) return
    if (fs.exists(rootP)) fs.delete(rootP, true)
    val e = emb(s, sfDir)
    val isDelta = col("vec_id") % DedupArtifacts.DeltaMod === DedupArtifacts.DeltaRem
    val delta = e.filter(isDelta)
    AnnIndex.buildIvf(e, ivfDir(sfDir), nlist = IvfNlist)
    AnnIndex.appendIvf(delta, ivfDir(sfDir)) // re-ingest upsert, gen 1
    AnnIndex.buildBanded(e.filter(!isDelta), lshDir(sfDir),
      nPlanes = LshPlanes, bands = LshBands)
    AnnIndex.appendBanded(delta, lshDir(sfDir),
      nPlanes = LshPlanes, bands = LshBands, newIds = true)
    val out = fs.create(meta, true)
    try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
