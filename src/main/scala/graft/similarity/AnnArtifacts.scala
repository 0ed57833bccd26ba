package graft.similarity

import graft.Tables
import graft.build.MetaIO
import graft.dedup.DedupArtifacts
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MAINTAINED ANN indexes as per-corpus ingest artifacts — the
  * [[AnnIndex]] lifecycle (build → gen-stamped append → live-view read
  * → compact) persisted once per (corpus fingerprint, params) and read
  * by the oracle-gated maintained-index queries (q164/q165/q166), the
  * same persist-once economics as `DedupArtifacts` (reference:
  * `AbstractBlockIndexingJob.java:122-152` — index at build time, every
  * query reads it).
  *
  * Three GENUINE maintenance histories — deliberately DIFFERENT, so
  * each live-view read regime is under the oracle:
  *  - IVF (`ivf`): gen 0 indexes the full corpus, then the standard
  *    delta batch (id ≡ DeltaRem mod DeltaMod) is RE-INGESTED as a
  *    gen-1 UPSERT (the re-embedded-documents scenario) — q164 reads
  *    through the BOUNDED tracked-upsert resolution (the meta records
  *    gen 1 as the upsert generation; untouched ids stay a pruned plain
  *    read behind a broadcast anti-join, gen 1 alone is reduced).
  *    Assignment under a fixed model is a pure per-row function, so the
  *    resolved view is bit-identical to the gen-0 build and q45's
  *    recall bound holds deterministically.
  *  - LSH (`lsh`): gen 0 indexes the BASE, the delta appends as gen 1
  *    with `newIds = true` (banded signatures are a per-vector property
  *    of seed/planes alone — no training, so base∪delta ≡ full rebuild
  *    exactly) — q165 reads the APPEND-ONLY PLAIN view with the probe's
  *    bucket filters pushed below it, the common-case economics.
  *  - COMPACTED IVF (`ivfc`): base build + delta append + a full
  *    `compactIvf` retrain — q166 reads THROUGH the compacted index
  *    (one generation, plain, staleness 0), gating the post-compact
  *    read path that was previously only spec-pinned. The compact
  *    retrains on the same corpus with the same trainer, so the result
  *    is bit-identical to the from-scratch q45 build.
  *  - UNTRUSTED IVF (`ivfu`): the in-stream-compact hazard REPLAYED
  *    BATCH-SIDE, so even the fourth regime is under the oracle — base
  *    build, then `compactIvf(appendOnly = false)` over the FULL corpus
  *    (the compact's snapshot covered a batch the checkpoint had not
  *    delivered), then that batch re-appends declaring `newIds = true`
  *    (truthfully, from the stream's view — but the content is already
  *    in gen 0, which is exactly why the compact stamped the
  *    declarations untrusted). q168 reads through the FULL latest-gen
  *    resolution this meta forces; assignment is a pure function, so
  *    the content-identical duplicates collapse to the corpus
  *    assignment and q45's recall bound holds deterministically.
  *  - IVF-PQ (`ivfpq`): the CODE-CARRYING index (FAISS IVFADC — codes
  *    are ~2% of the raw-vector bytes, the layout that stays
  *    cache-resident at 100 TB where inverted lists of floats cannot) —
  *    base build, delta appended `newIds = true` under the PERSISTED
  *    codebook/centroids. q169 reads ADC over the probed cells' codes +
  *    exact rerank of the shortlist, gating the two-stage read under
  *    the oracle's recall bound.
  *  - IVF-PQ UPSERT (`ivfpqu`): the same base/delta split appended
  *    UNDECLARED, so the meta tracks gen 1 as an upsert generation and
  *    q170 reads the codes through the BOUNDED tracked-upsert
  *    resolution — with this, the regime machinery is oracle-gated on
  *    ALL THREE persisted structures (raw-IVF, banded, coded). A
  *    duplicate or resurrected code row would DOUBLE a vector's summed
  *    ADC distance and shift the shortlist, so the recall gate
  *    exercises exactly the hazard the bounded view must avoid.
  *
  * Staleness: one meta file fingerprints the embeddings table
  * (`Layout.sourceFingerprint`) + params; mismatch or partial state
  * (missing meta, or an index tree whose own `_INDEX_META` marker is
  * gone) rebuilds. Meta written LAST, atomically ([[MetaIO]]).
  */
object AnnArtifacts {

  /** Index parameters — MUST mirror the registered q45/q30 builds
    * (`SimilarityQueries.q45AnnIvf`/`q30AnnLsh`): same trainer inputs,
    * same seeded planes, or the maintained read path would not be
    * comparable to the oracle's asserted recall bounds. */
  val IvfNlist = 16
  val LshPlanes = 16
  val LshBands = 8

  /** PQ model — MUST mirror the registered q123/q124 parameters
    * (`SimilarityQueries`: 8 subspaces × 8 dims, 16 centroids per
    * subspace, deterministic first-ids codebook) for the same
    * comparability reason. */
  val PqNSub = 8
  val PqSubDim = 8
  val PqNCent = 16

  /** v3: + `ivfc` (the compacted history, q166) and the r16 meta
    * protocol (tracked upsert generations, persisted banded model
    * params) — both index trees carry new `_INDEX_META` keys, so the
    * artifact epoch moves with them.
    * v4: IVF generations carry the vector (the FAISS inverted-list
    * trade) — the probe path reads vectors from the index partitions
    * and never joins the corpus.
    * v5: + `lshu` (the UNDECLARED-append banded history, q167) — the
    * bounded tracked-upsert BANDED read regime joins the oracle gate.
    * v6: + `ivfu` (the untrusted history, q168) — the in-stream-compact
    * hazard replayed batch-side, putting the FULL-resolution read
    * regime under the oracle and completing the matrix.
    * v7: + `ivfpq` (the code-carrying IVFADC index, q169) — the
    * storage-bounded trade joins the oracle gate.
    * v8: + `ivfpqu` (the undeclared-append PQ history, q170) — the
    * bounded tracked-upsert CODED read regime joins the gate.
    * v9: + `vecs` (the id-bucketed vectors table, q171) — the PQ
    * refine fetch becomes a point lookup instead of a corpus scan.
    * v10: PQ codebooks train on the lowest nCent ids PRESENT
    * (`pqCodebookPresent`) — the base corpus excludes the delta ids, so
    * the literal `id < nCent` filter was persisting a 14-of-16-centroid
    * codebook; the review fix changes the codes, so the epoch moves. */
  private val Version = 10

  private def root(sfDir: String): String =
    s"${DedupArtifacts.artifactBase}/graft_ann/v$Version/${DedupArtifacts.corpusKey(sfDir)}"
  def ivfDir(sfDir: String): String = s"${root(sfDir)}/ivf"
  def lshDir(sfDir: String): String = s"${root(sfDir)}/lsh"
  def ivfCompactDir(sfDir: String): String = s"${root(sfDir)}/ivfc"
  def lshUpsertDir(sfDir: String): String = s"${root(sfDir)}/lshu"
  def ivfUntrustedDir(sfDir: String): String = s"${root(sfDir)}/ivfu"
  def ivfPqDir(sfDir: String): String = s"${root(sfDir)}/ivfpq"
  def ivfPqUpsertDir(sfDir: String): String = s"${root(sfDir)}/ivfpqu"

  /** The corpus vectors in `Layout.writeBucketDirs` form over
    * `bucket = vec_id` (pmod(vec_id, 64) directories, id-sorted files):
    * the REFINE-FETCH layout — a driver-bounded shortlist prunes its
    * vector reads to matching directories + exact ids (the reference's
    * MapFile point-lookup economics, `BlockIndexedFileInputFormat
    * .java:419-431`), so the PQ two-stage read never scans the corpus:
    * ADC reads nprobe/nlist of the CODES, rerank reads ≤ |shortlist|
    * id-buckets of the VECTORS. */
  def vecsDir(sfDir: String): String = s"${root(sfDir)}/vecs"
  private def metaPath(sfDir: String) = s"${root(sfDir)}/_META"

  private def fingerprint(s: SparkSession, sfDir: String): String =
    s"v$Version:ivf$IvfNlist:lsh$LshPlanes/$LshBands:" +
      s"pq$PqNSub/$PqSubDim/$PqNCent:" +
      graft.build.Layout.sourceFingerprint(s, s"$sfDir/embeddings.parquet")

  private def emb(s: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(s, sfDir).select("vec_id", "embedding")

  /** Build-or-reuse all the maintained index histories for `sfDir`'s
    * embeddings. */
  def ensure(s: SparkSession, sfDir: String): Unit = synchronized {
    val conf = s.sparkContext.hadoopConfiguration
    val fp = fingerprint(s, sfDir)
    val rootP = new Path(root(sfDir))
    val fs = rootP.getFileSystem(conf)
    val meta = new Path(metaPath(sfDir))
    val fresh = MetaIO.read(conf, meta).contains(fp) &&
      AnnIndex.isComplete(s, ivfDir(sfDir)) &&
      AnnIndex.isComplete(s, lshDir(sfDir)) &&
      AnnIndex.isComplete(s, ivfCompactDir(sfDir)) &&
      AnnIndex.isComplete(s, lshUpsertDir(sfDir)) &&
      AnnIndex.isComplete(s, ivfUntrustedDir(sfDir)) &&
      AnnIndex.isComplete(s, ivfPqDir(sfDir)) &&
      AnnIndex.isComplete(s, ivfPqUpsertDir(sfDir)) &&
      fs.exists(new Path(vecsDir(sfDir)))
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
    AnnIndex.buildIvf(e.filter(!isDelta), ivfCompactDir(sfDir), nlist = IvfNlist)
    AnnIndex.appendIvf(delta, ivfCompactDir(sfDir), newIds = true)
    AnnIndex.compactIvf(e, ivfCompactDir(sfDir), nlist = IvfNlist)
    // the UNDECLARED banded append (same base/delta split as `lsh`, but
    // the conservative default): the meta records gen 1 as an upsert
    // generation and q167 reads through the BOUNDED banded resolution —
    // banded rows are per-vector, so the resolved view is still exactly
    // base∪delta and q30's recall bound holds deterministically
    AnnIndex.buildBanded(e.filter(!isDelta), lshUpsertDir(sfDir),
      nPlanes = LshPlanes, bands = LshBands)
    AnnIndex.appendBanded(delta, lshUpsertDir(sfDir),
      nPlanes = LshPlanes, bands = LshBands)
    // the untrusted history (q168): the in-stream-compact hazard,
    // batch-replayed — the compact's corpus snapshot already contains
    // the delta batch the checkpoint has not delivered, and its
    // `appendOnly = false` meta stamps the index untrusted IN the
    // staged swap; the late delivery then re-appends the same content
    // under `newIds = true` (truthful from the stream's view), and the
    // untrusted meta routes every read through full latest-gen
    // resolution, collapsing the content-identical duplicates
    AnnIndex.buildIvf(e.filter(!isDelta), ivfUntrustedDir(sfDir), nlist = IvfNlist)
    AnnIndex.compactIvf(e, ivfUntrustedDir(sfDir), nlist = IvfNlist,
      appendOnly = false)
    AnnIndex.appendIvf(delta, ivfUntrustedDir(sfDir), newIds = true)
    // the code-carrying IVFADC history (q169): base build trains both
    // models, the delta appends declared under the PERSISTED
    // codebook/centroids — the plain two-stage read (ADC over probed
    // cells' codes, exact rerank of the shortlist)
    // ONE base build for both PQ histories: the build is deterministic
    // (that determinism is what the append≡rebuild spec pins), and the
    // two histories share the identical gen-0 tree — copy the completed
    // base BEFORE the divergent appends instead of paying the heaviest
    // stage (train both models + code the whole base corpus) twice
    AnnIndex.buildIvfPq(e.filter(!isDelta), ivfPqDir(sfDir),
      nlist = IvfNlist, nSub = PqNSub, subDim = PqSubDim, nCent = PqNCent)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new Path(ivfPqDir(sfDir)), fs, new Path(ivfPqUpsertDir(sfDir)),
      false, conf)
    AnnIndex.appendIvfPq(delta, ivfPqDir(sfDir), newIds = true)
    // the undeclared PQ append (q170): same base/delta split, the
    // conservative default — gen 1 is tracked as an upsert generation
    // and the coded read goes through the bounded resolution
    AnnIndex.appendIvfPq(delta, ivfPqUpsertDir(sfDir))
    // the refine-fetch layout (q171): vectors keyed by id into pb
    // directories, so a shortlist's vector reads prune to its buckets
    graft.build.Layout.writeBucketDirs(
      e.select(col("vec_id").as("bucket"), col("embedding")),
      vecsDir(sfDir))
    MetaIO.write(conf, meta, fp)
  }
}
