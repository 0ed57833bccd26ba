package graft.similarity

import graft.functions.Vectors
import org.apache.hadoop.fs.Path
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
  *    `add` does not move centroids) — and appends it gen-stamped;
  *    a re-ingested id supersedes its older rows (latest gen wins);
  *  - COMPACT retrains on the current corpus and rewrites gen 0 when
  *    [[staleness]] (the delta fraction) says the model has drifted —
  *    the posting-compaction step of the same lifecycle.
  *
  * Append ≡ rebuild is EXACT, not approximate: assignment under a fixed
  * model is a pure per-row function, so base-assign ∪ delta-assign is
  * bit-identical to assigning the union from scratch (AnnIndexSpec pins
  * it for both structures, and pins compact ≡ the registered q45/q30
  * from-scratch builds). At 100 TB the assignment tables are written
  * `partitionBy(cell)` / bucketed by (band, bucket) next to the corpus,
  * and a query reads only its probe cells' files — appends land as new
  * files in the same layout, which is what keeps per-batch ingest cost
  * O(|delta|) at any corpus size.
  *
  * Single-writer assumption, like `DedupArtifacts`: build/append/compact
  * from one job at a time; a production deployment stages and renames.
  */
object AnnIndex {

  private def centroidsPath(dir: String) = s"$dir/centroids"
  private def assignPath(dir: String) = s"$dir/assignments"
  private def bandedPath(dir: String) = s"$dir/banded"

  // ------------------------------------------------------------- IVF

  /** Train centroids on `corpus` (the [[Ann.trainCentroids]] bounded
    * deterministic sample) and write the full index: centroids
    * (cell, c) + assignments (vec_id, cell, gen=0). */
  def buildIvf(
      corpus: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 16, lloydIters: Int = 2): Unit = {
    val s = corpus.sparkSession
    val cs = Ann.trainCentroids(corpus, idCol, vecCol, nlist, lloydIters)
    val fs = new Path(indexDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(indexDir))) fs.delete(new Path(indexDir), true)
    import s.implicits._
    cs.toSeq.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("cell", "c").write.parquet(centroidsPath(indexDir))
    assignWith(corpus, cs, idCol, vecCol)
      .withColumn("gen", lit(0L))
      .write.parquet(assignPath(indexDir))
  }

  /** Assign ONLY the delta under the persisted centroids and append it
    * with the next generation stamp. Map-only: the centroid model is a
    * plan-time constant, the delta is the only thing read or written. */
  def appendIvf(
      delta: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val s = delta.sparkSession
    val gen = s.read.parquet(assignPath(indexDir))
      .agg(max("gen")).head().getLong(0) + 1L
    assignWith(delta, centroidArray(s, indexDir), idCol, vecCol)
      .withColumn("gen", lit(gen))
      .write.mode("append").parquet(assignPath(indexDir))
  }

  /** Retrain on the current corpus and rewrite the whole index at
    * gen 0 — the compaction step once [[staleness]] crosses the
    * deployment's drift budget. */
  def compactIvf(
      corpus: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 16, lloydIters: Int = 2): Unit =
    buildIvf(corpus, indexDir, idCol, vecCol, nlist, lloydIters)

  /** Fraction of live assignment rows that arrived by append (gen > 0)
    * — the drift signal a deployment compacts on. */
  def staleness(s: SparkSession, indexDir: String): Double = {
    val r = ivfAssignments(s, indexDir)
      .agg(count(lit(1)).as("n"),
        sum(when(col("gen") > 0, 1L).otherwise(0L)).as("d"))
      .head()
    if (r.getLong(0) == 0) 0.0 else r.getLong(1).toDouble / r.getLong(0)
  }

  /** The LIVE assignment (vec_id, cell, gen): latest generation wins
    * per id, so a re-ingested vector supersedes its older rows — the
    * postings `gen` convention. The per-id reduce only matters for
    * upserts; an append-only history reduces to itself. */
  def ivfAssignments(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(assignPath(indexDir))
      .groupBy("vec_id")
      .agg(max(struct(col("gen"), col("cell"))).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"), col("m.gen").as("gen"))

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
    * (one id-keyed join to fetch the vectors — at scale, co-located by
    * the bucketed layout), exact rerank. With a freshly-compacted index
    * this is bit-identical to the registered q45 build (same trainer,
    * same assignment, same probe — AnnIndexSpec pins it). */
  def ivfTopKFromIndex(
      s: SparkSession, indexDir: String, corpus: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cellScores = Ann.cellScoresFor(centroidArray(s, indexDir))
    val corpusCells = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        Vectors.norm(col(vecCol)).as("cn"))
      .join(ivfAssignments(s, indexDir)
        .select(col("vec_id").as("neighbor_id"), col("cell")), "neighbor_id")
    val queryCells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Vectors.norm(col(vecCol)).as("qn"))
      .withColumn("cell",
        explode(slice(array_sort(cellScores(
          struct(col("qv").as("v"), col("qn").as("n")))), 1, nprobe)
          .getField("cell")))
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

  /** Write the banded signature index (vec_id, band, bucket, gen=0) —
    * the [[Ann.bandedSignatures]] table under maintenance. The model
    * here is (nPlanes, bands, seed, dim): planes are seed-derived, so
    * nothing beyond the parameters needs persisting. */
  def buildBanded(
      corpus: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 16, bands: Int = 8, seed: Long = 42L): Unit = {
    val s = corpus.sparkSession
    val fs = new Path(indexDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(indexDir))) fs.delete(new Path(indexDir), true)
    Ann.bandedSignatures(corpus, idCol, vecCol, nPlanes, bands, seed)
      .withColumn("gen", lit(0L))
      .write.parquet(bandedPath(indexDir))
  }

  /** Band ONLY the delta under the same seeded planes and append it
    * gen-stamped. Banded rows are per-vector, so append ≡ rebuild is
    * exact by construction. */
  def appendBanded(
      delta: DataFrame, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 16, bands: Int = 8, seed: Long = 42L): Unit = {
    val s = delta.sparkSession
    val gen = s.read.parquet(bandedPath(indexDir))
      .agg(max("gen")).head().getLong(0) + 1L
    Ann.bandedSignatures(delta, idCol, vecCol, nPlanes, bands, seed)
      .withColumn("gen", lit(gen))
      .write.mode("append").parquet(bandedPath(indexDir))
  }

  /** The LIVE banded rows (vec_id, band, bucket): a re-ingested id's
    * latest generation supersedes its older band rows. */
  def bandedRowsLive(s: SparkSession, indexDir: String): DataFrame = {
    val raw = s.read.parquet(bandedPath(indexDir))
    raw.join(
        raw.groupBy("vec_id").agg(max("gen").as("gen")),
        Seq("vec_id", "gen"))
      .select("vec_id", "band", "bucket")
  }

  /** [[Ann.lshTopK]] through the MAINTAINED banded index: corpus-side
    * bands from the persisted table (joined to the vectors by id),
    * query-side bands on the fly under the same seeded planes —
    * bit-identical to the registered q30 in-query build (same planes,
    * same candidate set, same exact rerank; AnnIndexSpec pins it). */
  def lshTopKFromIndex(
      s: SparkSession, indexDir: String, corpus: DataFrame, queries: DataFrame,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 16, bands: Int = 8, seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val planes = Ann.hyperplanes(nPlanes, dim, seed)
    val cBand = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        Vectors.norm(col(vecCol)).as("cn"))
      .join(bandedRowsLive(s, indexDir)
        .select(col("vec_id").as("neighbor_id"), col("band"), col("bucket")),
        "neighbor_id")
    val qBand = Ann.bandedRows(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        "query_id", "qv", planes, bands)
      .withColumn("qn", Vectors.norm(col("qv")))
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
