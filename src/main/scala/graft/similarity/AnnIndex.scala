package graft.similarity

import graft.functions.Vectors
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance for the two persisted ANN index structures
  * (IVF cells, sign-LSH bands) — the ingest-side counterpart of
  * [[Ann.ivfTopK]]/[[Ann.lshTopK]]'s in-query builds, applying the
  * gen-stamped-append pattern of the sparse index
  * (`IndexBuilder.buildIncremental` / `streaming.IndexMaintenance`;
  * reference economics: index once, skip what's already indexed —
  * `AbstractBlockIndexingJob.java:359-364`) to the vector indexes:
  *
  *  - BUILD trains the model (IVF centroids on the bounded sample /
  *    LSH planes by seed) and writes the full assignment, gen 0;
  *  - APPEND assigns ONLY the delta batch under the PERSISTED model —
  *    a map-only projection per vector, never a retrain, never a
  *    re-scan of the base (exactly how production IVF ingests: FAISS
  *    `add` does not move centroids) — into its own `gen=N` directory;
  *    a re-ingested id supersedes its older rows (latest gen wins);
  *  - COMPACT retrains on the current corpus and rewrites gen 0 when
  *    [[staleness]] (the delta fraction) says the model has drifted —
  *    the posting-compaction step of the same lifecycle.
  *
  * Append ≡ rebuild is EXACT, not approximate: assignment under a fixed
  * model is a pure per-row function, so base-assign ∪ delta-assign is
  * bit-identical to assigning the union from scratch (AnnIndexSpec pins
  * it for both structures, and pins compact ≡ the registered q45/q30
  * from-scratch builds).
  *
  * PHYSICAL LAYOUT (the plan a 100 TB probe wants, now on disk, not in
  * prose): IVF assignments are written `partitionBy(cell)` inside each
  * generation directory, so a query's `nprobe` cells prune statically to
  * their partitions' files — the reference's hash-partitioned index
  * where a point lookup touches one part file
  * (`BlockIndexedFileInputFormat.java:419-431`), keyed by geometry.
  * Banded rows are range-clustered by `bucket` (repartitionByRange +
  * sortWithinPartitions before the write), so a probe's bucket IN-list
  * pushes to parquet and skips whole row groups/files by min-max stats.
  * AnnIndexSpec plan-asserts both: the pruned IVF probe's scan carries
  * cell partition filters and reads only the probe cells' partitions;
  * the banded probe's scan outputs a fraction of the table's rows.
  *
  * DURABILITY PROTOCOL: a small `_INDEX_META` file — written LAST on
  * build and after every append — carries the generation counter, the
  * append-only flag, and the last applied streaming batch id. The meta
  * is the completion marker: a crash between the centroid and
  * assignment writes (or mid-append) leaves no meta update, and
  * [[isComplete]] reports the index absent/unfinished so the next build
  * deletes the partial state and rebuilds — never the permanent
  * append-onto-missing-state failure a path-probe invited. Appends are
  * additionally FILE-idempotent: each lands in its own `gen=N`
  * directory with overwrite semantics, so a crashed-and-replayed append
  * overwrites its own partial output instead of duplicating rows. The
  * gen counter itself is a meta read — O(1), never an O(index) max-scan
  * per delta batch, which is what keeps per-batch ingest cost
  * O(|delta|) at any corpus size.
  *
  * LIVE VIEWS: the per-id latest-gen reduce only matters for upserts.
  * An append that declares `newIds = true` (a dated ingest batch whose
  * ids are new by construction — the common case) keeps the index
  * append-only, and the live views serve a PLAIN read: no shuffle, no
  * self-join, and partition/bucket pruning can push below the view.
  * One undeclared append flips the flag permanently until the next
  * compact; the reduce path then resolves upserts, and probe filters
  * apply only AFTER resolution (pruning a superseded id's old partition
  * out from under the reduce would resurrect its stale row — the views
  * order filter and reduce per flag, AnnIndexSpec pins the upsert
  * case).
  *
  * Single-writer assumption, like `DedupArtifacts`: build/append/compact
  * from one job at a time; a production deployment stages and renames.
  */
object AnnIndex {

  private def centroidsPath(dir: String) = s"$dir/centroids"
  private def assignPath(dir: String) = s"$dir/assignments"
  private def bandedPath(dir: String) = s"$dir/banded"
  private def metaPath(dir: String) = s"$dir/_INDEX_META"

  // --------------------------------------------------- meta protocol

  /** (next-append generation, append-only so far, last applied
    * streaming batch). Written last: its presence IS index
    * completeness. */
  private final case class Meta(gen: Long, appendOnly: Boolean, batch: Long)

  private def fsOf(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def readMeta(s: SparkSession, dir: String): Option[Meta] = {
    val fs = fsOf(s, dir)
    val p = new Path(metaPath(dir))
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val line = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      val kv = line.split(';').flatMap { f =>
        f.split('=') match { case Array(k, v) => Some(k -> v); case _ => None }
      }.toMap
      for (g <- kv.get("gen").flatMap(_.toLongOption))
        yield Meta(g, kv.get("plain").forall(_ == "true"),
          kv.get("batch").flatMap(_.toLongOption).getOrElse(-1L))
    }
  }

  /** Meta writes are ATOMIC (temp file + overwrite-rename): an in-place
    * create would truncate the old marker before the new bytes land, so
    * a crash mid-write on an APPEND would destroy the completion marker
    * of a perfectly intact index — and the next maintenance pass would
    * treat it as partial and rebuild from one micro-batch. */
  private def writeMeta(s: SparkSession, dir: String, m: Meta): Unit = {
    val fs = fsOf(s, dir)
    val tmp = new Path(metaPath(dir) + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"gen=${m.gen};plain=${m.appendOnly};batch=${m.batch}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      tmp.toUri, s.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(metaPath(dir)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Whether a COMPLETE index lives at `dir` — true only once the
    * build's meta (written after every data file) landed. A partially
    * built tree (crash between writes) reports false, and the next
    * build deletes and rebuilds it. */
  def isComplete(s: SparkSession, dir: String): Boolean =
    readMeta(s, dir).isDefined

  /** The last streaming batch id applied to the index (-1 when none) —
    * the replay guard for exactly-once foreachBatch maintenance. The
    * batch id rides the SAME meta write as the append's gen/flag
    * update (`batchId` on build/append), so "recorded" always means
    * "fully applied": there is no window where the data landed but a
    * replay would re-append it under a new generation. */
  def lastAppliedBatch(s: SparkSession, dir: String): Long =
    readMeta(s, dir).map(_.batch).getOrElse(-1L)

  /** Next-append bookkeeping shared by both structures: reserve the
    * generation from the meta (O(1)), and flip the append-only flag off
    * forever if this append may upsert. A meta-less tree is a partial
    * or legacy build — gen-dir layout and legacy flat layout cannot mix
    * (conflicting partition discovery), so it must be rebuilt; we throw
    * with that instruction instead of corrupting it. */
  private def reserveGen(s: SparkSession, dir: String, newIds: Boolean,
      batchId: Long): (Long, Meta) =
    readMeta(s, dir) match {
      case Some(m) => (m.gen,
        Meta(m.gen + 1, m.appendOnly && newIds, math.max(m.batch, batchId)))
      case None => throw new IllegalStateException(
        s"no complete index at $dir (missing ${metaPath(dir)}): build it " +
          "first — a legacy/partial tree must be rebuilt, not appended to")
    }

  // ------------------------------------------------------------- IVF

  /** Train centroids on `corpus` (the [[Ann.trainCentroids]] bounded
    * deterministic sample) and write the full index: centroids
    * (cell, c), assignments under `gen=0` partitioned by cell, meta
    * LAST. */
  def buildIvf(
      corpus: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 16, lloydIters: Int = 2, batchId: Long = -1L): Unit = {
    val s = corpus.sparkSession
    val cs = Ann.trainCentroids(corpus, idCol, vecCol, nlist, lloydIters)
    val fs = fsOf(s, indexDir)
    if (fs.exists(new Path(indexDir))) fs.delete(new Path(indexDir), true)
    import s.implicits._
    cs.toSeq.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("cell", "c").write.parquet(centroidsPath(indexDir))
    writeAssignGen(assignWith(corpus, cs, idCol, vecCol), indexDir, 0L)
    writeMeta(s, indexDir, Meta(gen = 1L, appendOnly = true, batch = batchId))
  }

  /** Assign ONLY the delta under the persisted centroids and write it
    * into the next `gen=N` directory. Map-only: the centroid model is a
    * plan-time constant, the delta is the only thing read or written —
    * and the generation comes from the meta, so nothing of the base is
    * scanned either. `newIds = true` declares the batch's ids new by
    * construction (dated ingest), keeping the plain-read live view;
    * the default conservatively routes readers through upsert
    * resolution. Overwrite of the reserved gen dir makes a replayed
    * crash-append idempotent at the file level. */
  def appendIvf(
      delta: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      newIds: Boolean = false, batchId: Long = -1L): Unit = {
    val s = delta.sparkSession
    val (gen, next) = reserveGen(s, indexDir, newIds, batchId)
    writeAssignGen(
      assignWith(delta, centroidArray(s, indexDir), idCol, vecCol),
      indexDir, gen)
    writeMeta(s, indexDir, next)
  }

  /** One generation's assignment files: `gen=N/cell=C/part-*` —
    * repartitioned by cell first so each cell's rows land in few files
    * (at 100 TB the repartition width scales with the batch; the
    * per-cell file grouping is what the probe-side partition pruning
    * skips against). */
  private def writeAssignGen(assigned: DataFrame, indexDir: String, gen: Long): Unit =
    assigned
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${assignPath(indexDir)}/gen=$gen")

  /** Retrain on the current corpus and rewrite the whole index at
    * gen 0 — the compaction step once [[staleness]] crosses the
    * deployment's drift budget. Resets the append-only flag: a
    * compacted index is one generation, trivially plain-readable.
    *
    * STAGED: the rebuild lands in a sibling `.compact.tmp` tree (meta
    * last), and only then swaps in (delete old, rename). A crash
    * mid-rebuild leaves the OLD index fully intact and complete — never
    * the deleted-old/half-new state an in-place rewrite risks, which a
    * streaming replay would "recover" by rebuilding from one micro-batch
    * (losing every earlier batch). The delete→rename gap is covered by
    * [[recover]]: a complete tmp beside a missing/partial index is
    * adopted by rename. */
  def compactIvf(
      corpus: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 16, lloydIters: Int = 2, batchId: Long = -1L): Unit = {
    val s = corpus.sparkSession
    recover(s, indexDir)
    val tmp = compactTmp(indexDir)
    buildIvf(corpus, tmp, idCol, vecCol, nlist, lloydIters, batchId)
    val fs = fsOf(s, indexDir)
    fs.delete(new Path(indexDir), true)
    if (!fs.rename(new Path(tmp), new Path(indexDir)))
      throw new java.io.IOException(
        s"compact swap failed: could not rename $tmp over $indexDir")
  }

  private def compactTmp(dir: String) = s"${dir.stripSuffix("/")}.compact.tmp"

  /** Adopt a completed-but-unswapped compaction: if the index tree is
    * missing/partial while a COMPLETE `.compact.tmp` sits beside it
    * (crash between the swap's delete and rename), rename it in.
    * Returns whether a recovery happened. Safe to call any time —
    * no-op unless exactly that state is found. */
  def recover(s: SparkSession, indexDir: String): Boolean = {
    val tmp = compactTmp(indexDir)
    if (!isComplete(s, indexDir) && isComplete(s, tmp)) {
      val fs = fsOf(s, indexDir)
      fs.delete(new Path(indexDir), true)
      fs.rename(new Path(tmp), new Path(indexDir))
    } else false
  }

  /** Record that upserts are POSSIBLE from here on (plain reads off
    * until the next compact) — used by in-stream compaction, whose
    * corpus snapshot may include not-yet-processed batches that will
    * later re-append as duplicate content; the latest-gen reduce
    * resolves them, a plain read would not. */
  private[graft] def markUpsertsPossible(s: SparkSession, dir: String): Unit =
    readMeta(s, dir).foreach(m =>
      if (m.appendOnly) writeMeta(s, dir, m.copy(appendOnly = false)))

  /** Fraction of live assignment rows that arrived by append (gen > 0)
    * — the drift signal a deployment compacts on. */
  def staleness(s: SparkSession, indexDir: String): Double = {
    val r = ivfAssignments(s, indexDir)
      .agg(count(lit(1)).as("n"),
        sum(when(col("gen") > 0, 1L).otherwise(0L)).as("d"))
      .head()
    if (r.getLong(0) == 0) 0.0 else r.getLong(1).toDouble / r.getLong(0)
  }

  /** The meta as the READ-SIDE contract: a meta-less tree is partial or
    * legacy and must not be silently served (a legacy multi-gen upsert
    * history read "plain" would return superseded duplicates) — the
    * same IllegalStateException the write side throws. */
  private def metaOrThrow(s: SparkSession, dir: String): Meta =
    readMeta(s, dir).getOrElse(throw new IllegalStateException(
      s"no complete index at $dir (missing ${metaPath(dir)}): build it " +
        "first — a legacy/partial tree must be rebuilt, not read"))

  /** Raw partitioned read; gen/cell are partition columns (discovered
    * as ints when small) — normalize to the long schema the flat
    * layout had. The meta's gen counter is the COMMIT POINTER: only
    * generations below it are visible, so an orphan gen directory from
    * a crashed, never-replayed append (data landed, meta didn't) stays
    * invisible instead of leaking stale duplicates into plain reads —
    * the filter is on the partition column, so the orphan's files are
    * statically pruned, not just filtered. */
  private def rawAssignments(s: SparkSession, indexDir: String, committedGen: Long): DataFrame =
    s.read.parquet(assignPath(indexDir))
      .filter(col("gen") < committedGen)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("gen").cast("long").as("gen"))

  /** The LIVE assignment (vec_id, cell, gen): latest generation wins
    * per id, so a re-ingested vector supersedes its older rows — the
    * postings `gen` convention. When the meta says the history is
    * append-only (every append declared `newIds`, or the index was just
    * built/compacted), the reduce is the identity and the view is a
    * PLAIN read — no shuffle, and a `cells` probe filter prunes the
    * scan to its partitions. With upserts in the history, the probe
    * filter applies only AFTER latest-gen resolution: pruning first
    * could read a superseded row whose newer generation lives in an
    * unprobed cell and resurrect it. */
  def ivfAssignments(s: SparkSession, indexDir: String,
      cells: Option[Seq[Long]] = None): DataFrame = {
    val meta = metaOrThrow(s, indexDir)
    val appendOnly = meta.appendOnly
    val raw = rawAssignments(s, indexDir, meta.gen)
    if (appendOnly)
      cells.fold(raw)(cs => raw.filter(col("cell").isin(cs: _*)))
    else {
      val live = raw
        .groupBy("vec_id")
        .agg(max(struct(col("gen"), col("cell"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"), col("m.gen").as("gen"))
      cells.fold(live)(cs => live.filter(col("cell").isin(cs: _*)))
    }
  }

  /** Persisted centroids as the driver-side array (cell-ordered),
    * shared by append-time assignment and query-time probing. */
  private def centroidArray(s: SparkSession, indexDir: String): Array[Array[Double]] = {
    import s.implicits._
    s.read.parquet(centroidsPath(indexDir))
      .orderBy("cell").select("c").as[Seq[Double]].collect().map(_.toArray)
  }

  /** Map-only nearest-cell assignment under a fixed centroid model
    * ([[Ann.cellScoresFor]]'s constant-folded projection). */
  private def assignWith(
      df: DataFrame, cs: Array[Array[Double]],
      idCol: String, vecCol: String): DataFrame = {
    val cellScores = Ann.cellScoresFor(cs)
    df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("n", Vectors.norm(col("v")))
      .withColumn("cell",
        array_min(cellScores(struct(col("v").as("v"), col("n").as("n"))))
          .getField("cell"))
      .select("vec_id", "cell")
  }

  /** [[Ann.ivfTopK]] through the MAINTAINED index: probe cells from the
    * persisted centroids, corpus cells from the persisted assignment
    * (one id-keyed join to fetch the vectors), exact rerank. The probe
    * cell set is collected driver-side (it is `nprobe` × |queries|
    * values of a broadcast-small query set) and pushed into the
    * assignment read, so an append-only index SCANS ONLY THE PROBE
    * CELLS' partitions — nprobe/nlist of the files, the reference's
    * point-lookup-touches-one-part-file economics. With a
    * freshly-compacted index this is bit-identical to the registered
    * q45 build (same trainer, same assignment, same probe —
    * AnnIndexSpec pins it). */
  def ivfTopKFromIndex(
      s: SparkSession, indexDir: String, corpus: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cellScores = Ann.cellScoresFor(centroidArray(s, indexDir))
    val queryCells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Vectors.norm(col(vecCol)).as("qn"))
      .withColumn("cell",
        explode(slice(array_sort(cellScores(
          struct(col("qv").as("v"), col("qn").as("n")))), 1, nprobe)
          .getField("cell")))
    val probeCells = queryCells.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val corpusCells = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        Vectors.norm(col(vecCol)).as("cn"))
      .join(ivfAssignments(s, indexDir, cells = Some(probeCells))
        .select(col("vec_id").as("neighbor_id"), col("cell")), "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Vectors.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  // ------------------------------------------------------ sign-LSH

  /** Write the banded signature index (vec_id, band, bucket) under
    * `gen=0` — the [[Ann.bandedSignatures]] table under maintenance.
    * The model here is (nPlanes, bands, seed, dim): planes are
    * seed-derived, so nothing beyond the parameters needs persisting.
    * Meta written LAST (completion marker). */
  def buildBanded(
      corpus: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 16, bands: Int = 8, seed: Long = 42L): Unit = {
    val s = corpus.sparkSession
    val fs = fsOf(s, indexDir)
    if (fs.exists(new Path(indexDir))) fs.delete(new Path(indexDir), true)
    writeBandedGen(
      Ann.bandedSignatures(corpus, idCol, vecCol, nPlanes, bands, seed)
        .withColumnRenamed(idCol, "vec_id"),
      indexDir, 0L)
    writeMeta(s, indexDir, Meta(gen = 1L, appendOnly = true, batch = -1L))
  }

  /** Band ONLY the delta under the same seeded planes and write it into
    * the next `gen=N` directory (gen from the meta — O(1)). Banded rows
    * are per-vector, so append ≡ rebuild is exact by construction.
    * `newIds` as in [[appendIvf]]. */
  def appendBanded(
      delta: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 16, bands: Int = 8, seed: Long = 42L,
      newIds: Boolean = false, batchId: Long = -1L): Unit = {
    val s = delta.sparkSession
    val (gen, next) = reserveGen(s, indexDir, newIds, batchId)
    writeBandedGen(
      Ann.bandedSignatures(delta, idCol, vecCol, nPlanes, bands, seed)
        .withColumnRenamed(idCol, "vec_id"),
      indexDir, gen)
    writeMeta(s, indexDir, next)
  }

  /** One generation's banded files, RANGE-CLUSTERED by bucket
    * (repartitionByRange gives files disjoint bucket ranges;
    * sortWithinPartitions gives row groups tight min-max stats), so a
    * probe's bucket IN-list skips whole files/row groups at the parquet
    * layer — the (band, bucket)-keyed twin of the IVF cell
    * partitioning. */
  private def writeBandedGen(banded: DataFrame, indexDir: String, gen: Long): Unit =
    banded
      // explicit partition count: an AQE-coalesced range shuffle would
      // collapse small generations into one wide-range file and erase
      // the min-max selectivity the probe prunes against
      .repartitionByRange(
        banded.sparkSession.sessionState.conf.numShufflePartitions,
        col("bucket"))
      .sortWithinPartitions("bucket", "band")
      .write.mode("overwrite").parquet(s"${bandedPath(indexDir)}/gen=$gen")

  /** Same commit-pointer read as [[rawAssignments]]. */
  private def rawBanded(s: SparkSession, indexDir: String, committedGen: Long): DataFrame =
    s.read.parquet(bandedPath(indexDir))
      .filter(col("gen") < committedGen)
      .select(col("vec_id"), col("band"), col("bucket"),
        col("gen").cast("long").as("gen"))

  /** The LIVE banded rows (vec_id, band, bucket): a re-ingested id's
    * latest generation supersedes its older band rows. Append-only
    * history → plain read with an optional (band, bucket)-superset
    * probe filter pushed into the scan; upserts in the history → the
    * latest-gen join resolves FIRST, then the filter applies (same
    * resurrect hazard as [[ivfAssignments]]). */
  def bandedRowsLive(s: SparkSession, indexDir: String,
      probe: Option[(Seq[Int], Seq[Long])] = None): DataFrame = {
    def probeFilter(df: DataFrame): DataFrame = probe.fold(df) {
      case (bs, ks) =>
        df.filter(col("band").isin(bs: _*) && col("bucket").isin(ks: _*))
    }
    val meta = metaOrThrow(s, indexDir)
    val raw = rawBanded(s, indexDir, meta.gen)
    if (meta.appendOnly) probeFilter(raw).select("vec_id", "band", "bucket")
    else {
      val live = raw.join(
          raw.groupBy("vec_id").agg(max("gen").as("gen")),
          Seq("vec_id", "gen"))
        .select("vec_id", "band", "bucket")
      probeFilter(live)
    }
  }

  /** [[Ann.lshTopK]] through the MAINTAINED banded index: corpus-side
    * bands from the persisted table (joined to the vectors by id),
    * query-side bands on the fly under the same seeded planes. The
    * query set's (band, bucket) keys are collected driver-side and
    * pushed as a superset filter into the banded read — on the
    * range-clustered layout an append-only index reads only matching
    * buckets' row groups, never the whole table. Bit-identical to the
    * registered q30 in-query build (same planes, same candidate set,
    * same exact rerank; AnnIndexSpec pins it). */
  def lshTopKFromIndex(
      s: SparkSession, indexDir: String, corpus: DataFrame, queries: DataFrame,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 16, bands: Int = 8, seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val planes = Ann.hyperplanes(nPlanes, dim, seed)
    val qBand = Ann.bandedRows(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        "query_id", "qv", planes, bands)
      .withColumn("qn", Vectors.norm(col("qv")))
    val qKeys = qBand.select("band", "bucket").distinct().collect()
    val probe = (qKeys.map(_.getInt(0)).toSeq.distinct,
      qKeys.map(_.getLong(1)).toSeq.distinct)
    val cBand = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        Vectors.norm(col(vecCol)).as("cn"))
      .join(bandedRowsLive(s, indexDir, probe = Some(probe))
        .select(col("vec_id").as("neighbor_id"), col("band"), col("bucket")),
        "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cBand.join(broadcast(qBand), Seq("band", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
      .distinct()
      .withColumn("sim", Vectors.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
