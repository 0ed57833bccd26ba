package graft.similarity

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline and
  * a random-hyperplane sign-LSH bucketed variant as the scale path.
  *
  * Scale notes: brute force is a broadcast of the (small) query set
  * against the full corpus — one pass, no shuffle of the corpus, per-
  * partition top-k then a k-row merge. The LSH variant buckets the
  * corpus by signature so each query only scores its probe buckets;
  * the PERSISTED forms ([[bandedSignatures]] under
  * `Layout.writeBucketDirs`, `AnnIndex.buildBanded`'s range-clustered
  * generations) put that on disk so repeated queries touch only
  * matching files — the same skipping architecture as the sparse
  * index, measured in DedupArtifactsSpec/AnnIndexSpec.
  */
object Ann {

  /** Exact top-k neighbors for each query vector (cross score + window):
    * (query_id, neighbor_id, rank), self-matches excluded, ties broken
    * by neighbor id. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    scoredTopK(corpus, queries, k, idCol, vecCol, extraCols = Nil,
      pairFilter = lit(true))

  /** Shared exact top-k machinery: broadcast the (small) query set,
    * score every corpus row, rank per query. `extraCols` are carried
    * from BOTH sides (suffixed q/c) so `pairFilter` can constrain the
    * pair stream BEFORE the ranking window. Norms are computed once
    * per ROW, not once per pair inside the cross product — same
    * arithmetic (dot / (|q||c|)), 3x fewer array folds on the
    * quadratic path. */
  private def scoredTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String, vecCol: String,
      extraCols: Seq[String], pairFilter: Column): DataFrame = {
    def side(df: DataFrame, id: String, v: String, n: String, sfx: String) =
      df.select(col(idCol).as(id) +: col(vecCol).as(v) +:
        Vectors.norm(col(vecCol)).as(n) +:
        extraCols.map(e => col(e).as(s"$e$sfx")): _*)
    val q = side(queries, "query_id", "qv", "qn", "_q")
    val c = side(corpus, "neighbor_id", "cv", "cn", "_c")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .filter(pairFilter)
      .withColumn("sim", Vectors.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** HARD-NEGATIVE MINING for contrastive training: each query's top-k
    * cosine neighbors drawn ONLY from rows carrying a different label —
    * the near-misses that teach a retriever the decision boundary
    * (same exact arithmetic and broadcast shape as [[bruteForceTopK]];
    * the label inequality is one more predicate on the scored stream,
    * applied BEFORE the ranking window so negatives never crowd out of
    * the top-k by same-label rows). */
  def hardNegativesTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame =
    scoredTopK(corpus, queries, k, idCol, vecCol,
      extraCols = Seq(labelCol),
      pairFilter = col(s"${labelCol}_c") =!= col(s"${labelCol}_q"))

  /** Deterministic pseudo-random unit-ish hyperplanes: values derived
    * from a seeded hash, fixed at plan time. `private[graft]` so specs
    * can recompute signatures and assert the pigeonhole recall bound. */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH signature: one bit per hyperplane (sign of the dot
    * product), as a long. */
  def signSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(Vectors.dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** (band, bucket) structs slicing a signature column — shared by both
    * LSH paths so the mask logic lives once. JVM shifts are mod-64:
    * a 64-bit band must mask with -1L, not (1L<<64)-1 == 0. */
  private def bandStructs(sig: Column, bands: Int, rowsPerBand: Int): Seq[Column] = {
    val mask = if (rowsPerBand >= 64) -1L else (1L << rowsPerBand) - 1
    (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(sig, b * rowsPerBand).bitwiseAND(lit(mask)).as("bucket"))
    }
  }

  /** Vector dimension of the corpus, or None when it is empty. */
  private def dimOf(corpus: DataFrame, vecCol: String): Option[Int] =
    corpus.select(size(col(vecCol))).head(1).headOption.map(_.getInt(0))

  /** LSH-bucketed ANN: candidates = corpus vectors sharing any signature
    * band with the query (multi-table sign-LSH), exact cosine rerank of
    * candidates only, top-k per query. Approximation affects recall
    * only — scores of returned neighbors are exact. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    require(nPlanes % bands == 0)
    val rowsPerBand = nPlanes / bands
    val dimOpt = dimOf(corpus, vecCol)
    if (dimOpt.isEmpty)
      // derive the empty schema from the inputs so the id column type
      // (long, string, ...) matches the non-empty path for downstream unions
      return queries.select(col(idCol).as("query_id"))
        .crossJoin(corpus.select(col(idCol).as("neighbor_id")))
        .withColumn("rank", lit(0)).limit(0)
    val planes = hyperplanes(nPlanes, dimOpt.get, seed)

    def banded(df: DataFrame, id: String, nCol: String): DataFrame = {
      val sig = signSignature(col(vecCol), planes)
      df.select(col(idCol).as(id), col(vecCol),
          Vectors.norm(col(vecCol)).as(nCol), sig.as("sig"))
        .select(col(id), col(vecCol), col(nCol),
          explode(array(bandStructs(col("sig"), bands, rowsPerBand): _*)).as("bb"))
        .select(col(id), col(vecCol), col(nCol),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }

    val cBand = banded(corpus, "neighbor_id", "cn").withColumnRenamed(vecCol, "cv")
    val qBand = banded(queries, "query_id", "qn").withColumnRenamed(vecCol, "qv")
    val cand = cBand.join(broadcast(qBand), Seq("band", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("sim", Vectors.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** IVF (inverted-file) ANN: the corpus is partitioned into `nlist`
    * Voronoi cells around centroid vectors; each query scores only the
    * `nprobe` nearest cells' members, exactly reranked. Complements
    * [[lshTopK]] as the second classic scale path: at 100 TB the
    * assigned corpus is written `partitionBy(cell)` once, and a query
    * reads nprobe/nlist of the data — the same file-skipping
    * architecture as the sparse index, keyed by geometry instead of
    * values.
    *
    * Centroids train DRIVER-SIDE on a bounded deterministic sample (the
    * first `max(64*nlist, 2048)` vectors by id): seed = first `nlist`,
    * then `lloydIters` rounds of Lloyd recentering over the sample in a
    * tight local loop. This is how production IVF trains (FAISS trains
    * on a sample, not the corpus) — the distributed passes pay off only
    * for ASSIGNMENT, never for training, and the driver loop is exact-
    * deterministic (fixed iteration order, no partial-agg reordering).
    * Refinement matters exactly when the corpus has cluster structure —
    * on the isotropic test embeddings it is recall-neutral
    * (OperatorsSpec measures both regimes; the clustered case asserts
    * non-degradation). Every returned SCORE is exact regardless. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 32, nprobe: Int = 8, lloydIters: Int = 2): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist)
    val cs = trainCentroids(corpus, idCol, vecCol, nlist, lloydIters)
    val cellScores = cellScoresFor(cs)

    def project(df: DataFrame, outId: String, vOut: String, nOut: String): DataFrame =
      df.select(col(idCol).as(outId), col(vecCol).as(vOut),
          Vectors.norm(col(vecCol)).as(nOut))
        .withColumn("vn", struct(col(vOut).as("v"), col(nOut).as("n")))

    val corpusCells = project(corpus, "neighbor_id", "cv", "cn")
      .withColumn("cell", array_min(cellScores(col("vn"))).getField("cell"))
      .drop("vn")
    val queryCells = project(queries, "query_id", "qv", "qn")
      .withColumn("cell",
        explode(slice(array_sort(cellScores(col("vn"))), 1, nprobe).getField("cell")))
      .drop("vn")

    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Vectors.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Driver-side deterministic Lloyd centroid training on a bounded
    * sample (the first `max(64*nlist, 2048)` vectors by id): seed =
    * first `nlist`, then `lloydIters` recentering rounds in a tight
    * local loop with fixed iteration order — exact-deterministic, the
    * way production IVF trains (on a sample, never the corpus). Shared
    * by [[ivfTopK]] and [[semanticDedup]]. */
  private[similarity] def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, lloydIters: Int): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val trainCap = math.max(64 * nlist, 2048)
    val train: Array[Array[Double]] =
      corpus.orderBy(col(idCol)).limit(trainCap)
        .select(col(vecCol).cast("array<double>"))
        .as[Seq[Double]].collect().map(_.toArray)
    var cs: Array[Array[Double]] = train.take(nlist).map(_.clone())
    for (_ <- 1 to lloydIters if train.length > nlist) {
      val cn = cs.map(l2)
      val dim = cs(0).length
      val sums = Array.fill(cs.length)(new Array[Double](dim))
      val counts = new Array[Long](cs.length)
      train.foreach { v =>
        val vn = l2(v)
        var best = 0; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < cs.length) {
          var dot = 0.0; var i = 0
          while (i < dim) { dot += v(i) * cs(c)(i); i += 1 }
          val sim = dot / (vn * cn(c))
          if (sim > bestSim) { bestSim = sim; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      // empty cells keep their previous centroid
      cs = cs.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old else sums(c).map(_ / counts(c))
      }
    }
    cs
  }

  private def l2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** Nearest-cell assignment as a MAP-ONLY projection: the centroids
    * are plan-time literal arrays (constant-folded by Catalyst), so per
    * row we evaluate nlist codegen'd dot products into an array of
    * (negsim, cell) structs — array_min picks the best cell (struct
    * ordering = lexicographic, so ties break on the lower cell id).
    * No crossJoin, no aggregation, no window: assignment costs zero
    * shuffles at any corpus size. Input column: a struct (v, n). */
  private[similarity] def cellScoresFor(cs: Array[Array[Double]]): Column => Column = { vn =>
    array(cs.toSeq.zipWithIndex.map { case (cvec, i) =>
      val centLit = array(cvec.toSeq.map(lit): _*)
      struct(
        // coalesce: a zero-norm vector (or degenerate centroid) has no
        // defined cosine — rank it worst in EVERY cell so array_min
        // still assigns it deterministically (ties -> lowest cell id)
        // instead of ANSI-throwing on the division
        coalesce(
          try_divide(-Vectors.dot(vn.getField("v"), centLit),
            vn.getField("n") * lit(l2(cvec))),
          lit(Double.MaxValue)).as("negsim"),
        lit(i.toLong).as("cell"))
    }: _*)
  }

  /** Driver-side twin of the QUERY side of [[cellScoresFor]] — the
    * nprobe probe cells of one query vector, computed in a tight local
    * loop instead of a Spark job. BIT-IDENTICAL to the Catalyst
    * `slice(array_sort(cellScores(struct(v, n))), 1, nprobe).cell`
    * plan by construction (AnnLocalProbeSpec pins it over the whole
    * test corpus): same float→double element casts, same left-to-right
    * double accumulation as [[graft.functions.expressions.DotProduct]],
    * same `-dot / (n·cn)` operation order as the column expression,
    * `try_divide`'s zero-divisor null → MaxValue coalesce, and
    * java.lang.Double total ordering (NaN greatest, -0.0 < 0.0 — what
    * Catalyst's double ordering uses) with ties to the lower cell id.
    * `v = None` mirrors a NULL vector: every cell scores MaxValue and
    * the slice returns cells 0..nprobe-1. The probe paths use this so
    * the probe-cell choice costs ZERO jobs once the (tiny) query set is
    * collected — the job it replaces was one of 3-4 serialized driver
    * actions per maintained-ANN read (guide §2.6). */
  private[graft] def queryProbeCellsLocal(
      v: Option[Array[Double]], cs: Array[Array[Double]],
      nprobe: Int): Seq[Long] = {
    val scored: Seq[(Double, Long)] = v match {
      case None => cs.indices.map(i => (Double.MaxValue, i.toLong))
      case Some(x) =>
        val n = math.sqrt(dotLocal(x, x))
        cs.indices.map { i =>
          val c = cs(i)
          val div = n * l2(c)
          val negsim =
            if (x.length != c.length) Double.MaxValue // DotProduct nulls on length mismatch
            else if (div == 0.0) Double.MaxValue      // try_divide's zero-divisor null
            else -dotLocal(x, c) / div
          (negsim, i.toLong)
        }
    }
    scored.sorted(Ordering.Tuple2(
        Ordering.Double.TotalOrdering, Ordering.Long))
      .take(nprobe).map(_._2)
  }

  /** Left-to-right double accumulation over equal-length arrays — the
    * driver-side twin of the DotProduct expression's fold. */
  private def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023): cluster the
    * embedding space with the same deterministic IVF centroids as
    * [[ivfTopK]], then WITHIN each cell drop every vector that has a
    * close (cosine >= threshold) neighbor with a smaller id — one
    * representative survives per within-cell duplicate neighborhood.
    * Returns (idCol, cell, kept).
    *
    * Scale shape: this is the paper's point — the O(n²) similarity
    * comparison runs per CELL, never over the corpus: assignment is the
    * map-only constant-folded projection, the self-join shuffles on the
    * cell key only (candidate volume is cell-local, (n/nlist)² per
    * cell), and the verdict join is id-keyed. Cell assignment is
    * cosine-based, so a scaled copy of a vector lands in its original's
    * cell EXACTLY (cosine is scale-invariant — every cell score is
    * identical), which is what makes near-duplicate capture
    * deterministic rather than probabilistic for true dups. */
  def semanticDedup(
      corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 16, lloydIters: Int = 2): DataFrame = {
    val cs = trainCentroids(corpus, idCol, vecCol, nlist, lloydIters)
    val cellScores = cellScoresFor(cs)
    // consumed THREE times (both sides of the within-cell self-join and
    // the final assignment projection) — materialize so the per-row
    // centroid scoring (nlist dot products per vector) runs once, the
    // same boundary lshNearDupPairs puts under its banded self-join
    val cells = corpus
      .select(col(idCol), col(vecCol).as("v"), Vectors.norm(col(vecCol)).as("n"))
      .withColumn("cell",
        array_min(cellScores(struct(col("v").as("v"), col("n").as("n"))))
          .getField("cell"))
      .localCheckpoint(eager = false)
    val dropped = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") &&
          col(s"b.$idCol") < col(s"a.$idCol"))
      .filter(Vectors.cosineFromNorms(col("a.v"), col("b.v"), col("a.n"), col("b.n")) >= threshold)
      .select(col(s"a.$idCol").as(idCol)).distinct()
    cells.select(col(idCol), col("cell"))
      .join(dropped.withColumn("d", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("d"), lit(false)).as("dropped"))
      .withColumn("kept", !col("dropped"))
      .drop("dropped")
  }

  /** LSH-bucketed near-dup PAIRS — the scale path behind
    * [[cosineNearDupPairs]]' exact O(n^2): sign-LSH band buckets
    * generate candidates, exact cosine keeps only pairs >= threshold.
    * Precision exact; recall is the banding knob, with a DETERMINISTIC
    * pigeonhole guarantee: cutting the signature into `bands` bands,
    * a pair whose signatures differ in fewer than `bands` bits MUST
    * share an identical band — so recall is provably 1.0 for every pair
    * within that hamming budget (LshNearDupSpec asserts the registered
    * corpus/threshold stays inside it). At 100 TB the banded table is
    * the only thing shuffled — candidate volume is bucket-local, the
    * n^2 never materializes. Near the decision boundary of a LOW
    * threshold (the test corpus' 0.45 ≈ 63°) the hamming budget forces
    * wide bands and candidates grow toward n^2 — that cost is inherent
    * to the angle, not the algorithm; at production near-dup thresholds
    * (>= 0.9) the same code yields tight buckets. */
  def lshNearDupPairs(
      corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 16, bands: Int = 8, seed: Long = 42L): DataFrame = {
    require(nPlanes % bands == 0)
    val rowsPerBand = nPlanes / bands
    val dimOpt = dimOf(corpus, vecCol)
    if (dimOpt.isEmpty)
      // schema derived from the input so the id type matches the
      // non-empty path (see lshTopK)
      return corpus.select(col(idCol).as("id_i"))
        .crossJoin(corpus.select(col(idCol).as("id_j"))).limit(0)
    val planes = hyperplanes(nPlanes, dimOpt.get, seed)
    val sig = signSignature(col(vecCol), planes)
    val banded = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        Vectors.norm(col(vecCol)).as("n"), sig.as("sig"))
      .select(col("id"), col("v"), col("n"),
        explode(array(bandStructs(col("sig"), bands, rowsPerBand): _*)).as("bb"))
      .select(col("id"), col("v"), col("n"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      // consumed by both sides of the self-join. LAZY measured-and-kept
      // (r11 same-JVM alternating A/B at sf0.1 via q51: lazy MIN 1.195 s
      // vs eager 1.222 s over 5 iters) — unlike the q122 case, the
      // first-consumer stage materializes it once and the self-join's
      // other side reads the cached blocks; eager just adds a
      // synchronous extra job up front.
      .localCheckpoint(eager = false)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .filter(Vectors.cosineFromNorms(col("a.v"), col("b.v"), col("a.n"), col("b.n")) >= threshold)
      .select(col("a.id").as("id_i"), col("b.id").as("id_j"))
      .distinct()
  }

  /** The PERSISTABLE sign-LSH banded signature table (id, band, bucket)
    * — [[lshNearDupPairs]]' candidate-generation state as an ingest
    * artifact, the embedding twin of the text pipeline's persisted
    * `banded` table (reference economics: index once at build time,
    * every consumer reads it — `AbstractBlockIndexingJob.java:122-152`).
    * Rows are a PER-VECTOR property, so filtering the table to any id
    * subset equals rebuilding it over that subset: one table serves
    * full-corpus self-joins, base-side probe joins, and delta-side
    * internal joins. Persisted via `Layout.writeBucketDirs`
    * (pb = pmod(bucket, N) directories, bucket-sorted files) so a
    * cap-bounded probe reads only matching directories — see
    * `DedupArtifacts.semBanded` for the artifact form. */
  def bandedSignatures(
      corpus: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      nPlanes: Int = 64, bands: Int = 8, seed: Long = 42L): DataFrame = {
    require(nPlanes % bands == 0)
    val dimOpt = dimOf(corpus, vecCol)
    if (dimOpt.isEmpty)
      return corpus.select(col(idCol), lit(0).as("band"), lit(0L).as("bucket"))
        .limit(0)
    bandedRows(corpus, idCol, vecCol, hyperplanes(nPlanes, dimOpt.get, seed), bands)
      .select(idCol, "band", "bucket")
  }

  /** Banded rows CARRYING the vector column — (idCol, vecCol,
    * extraCols..., band, bucket) — with caller-supplied planes, so it
    * stays streaming-safe (no action at plan-construction time; a
    * streaming delta can band itself against a static base's planes).
    * `extraCols` ride along untouched (e.g. the event-time column a
    * watermarked consumer must keep). */
  private[graft] def bandedRows(
      df: DataFrame, idCol: String, vecCol: String,
      planes: Array[Array[Double]], bands: Int,
      extraCols: Seq[String] = Nil): DataFrame = {
    require(planes.length % bands == 0)
    val rowsPerBand = planes.length / bands
    val carried = extraCols.map(col)
    df.withColumn("__sig", signSignature(col(vecCol), planes))
      .select(col(idCol) +: col(vecCol) +: carried :+
        explode(array(bandStructs(col("__sig"), bands, rowsPerBand): _*)).as("bb"): _*)
      .select(col(idCol) +: col(vecCol) +: carried :+
        col("bb.band").as("band") :+ col("bb.bucket").as("bucket"): _*)
  }

  /** Candidate self-join over a persisted banded table: vectors sharing
    * any (band, bucket), normalized to id_i < id_j. NOT distinct —
    * [[verifyCosinePairs]] folds the multi-band dedupe into a shuffle
    * it must do anyway (the `Dedup.lshCandidatesFromBanded` rule). */
  def selfCandidatesFromBanded(banded: DataFrame, idCol: String = "vec_id"): DataFrame =
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_i"), col(s"b.$idCol").as("id_j"))

  /** Cross-set candidates over a persisted banded table: the probe side
    * (a delta ingest batch) BROADCASTS, so the corpus side is consumed
    * by a map-side hash join on (band, bucket) and NEVER scans beyond
    * its matching buckets — the scale fix for [[cosineCrossPairs]]'
    * full-base evaluation. When the banded table carries the
    * `Layout.writeBucketDirs` physical layout (`pb` directories), a
    * cap-bounded probe additionally prunes the base SCAN to its bucket
    * neighborhoods' directories — the files-read counterpart of the
    * map-side join's rows-read bound (no-op for in-query banded tables
    * and for day-scale deltas past the cap, where scanning all
    * directories behind the hash join is the right plan). Output
    * normalized to (id_i, id_j) = (min, max). */
  def crossCandidatesFromBanded(
      banded: DataFrame, isProbe: Column, idCol: String = "vec_id"): DataFrame = {
    val probe = banded.filter(isProbe)
    val base = graft.build.Layout.pruneToProbe(banded.filter(!isProbe), probe)
    broadcast(probe).as("a")
      .join(base.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(least(col(s"a.$idCol"), col(s"b.$idCol")).as("id_i"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("id_j"))
  }

  /** Exact-cosine verification of a candidate (id_i, id_j) stream —
    * the same dot/(na*nb)-in-doubles arithmetic as
    * [[cosineCrossPairs]], applied to CANDIDATES ONLY: distinct the
    * multi-band hits once, fetch both endpoints' vectors by id, keep
    * pairs reaching `threshold`. Precision is exact by construction;
    * recall is the candidate generator's banding budget.
    * `broadcastCand` marks a candidate set bounded by a delta batch's
    * bucket neighborhoods (broadcast back onto the corpus, the q109
    * hit-set shape); leave it false when candidates are corpus-sized
    * (artifact build), where the id-keyed joins co-locate under the
    * bucketed layout instead. */
  def verifyCosinePairs(
      cand: DataFrame, corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastCand: Boolean = false): DataFrame = {
    val dedup = cand.distinct()
    val pairs = if (broadcastCand) broadcast(dedup) else dedup
    val v = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      Vectors.norm(col(vecCol)).as("__n"))
    pairs
      .join(v.select(col("__id").as("id_i"), col("__v").as("va"),
        col("__n").as("na")), "id_i")
      .join(v.select(col("__id").as("id_j"), col("__v").as("vb"),
        col("__n").as("nb")), "id_j")
      .filter(Vectors.cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")) >= threshold)
      .select("id_i", "id_j")
  }

  /** All corpus pairs with cosine >= threshold (embedding near-dup
    * detection). Exact O(n^2) scoring — suitable as the verification
    * baseline; production path is [[lshNearDupPairs]]. */
  def cosineNearDupPairs(
      corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // per-row norms: the n^2 stage evaluates ONE dot per pair instead of
    // three; dot/(na*nb) is arithmetically identical to cosine(va, vb)
    val a = corpus.select(col(idCol).as("id_i"), col(vecCol).as("va"),
      Vectors.norm(col(vecCol)).as("na"))
    val b = corpus.select(col(idCol).as("id_j"), col(vecCol).as("vb"),
      Vectors.norm(col(vecCol)).as("nb"))
    a.crossJoin(b)
      .filter(col("id_i") < col("id_j"))
      .filter(Vectors.cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")) >= threshold)
      .select("id_i", "id_j")
  }

  /** Cross-set cosine near-dup pairs between a LARGE base and a SMALL
    * delta batch — the incremental-ingest primitive (q157/q158): the
    * delta broadcasts with precomputed norms, the base streams through
    * one map-side evaluation (never shuffled, never self-joined), and
    * each base×delta pair is generated exactly once, so no distinct is
    * needed downstream. Pair orientation is normalized to
    * (id_i, id_j) = (min, max) to compose with [[cosineNearDupPairs]]'
    * output. The sets must be id-disjoint (caller's base/delta split
    * rule guarantees it).
    *
    * 100 TB shape: cost scales with |base| × |delta| map-side work per
    * ingest batch, with the broadcast bounded by the batch — at real
    * scale the base side is first cut by an ANN index ([[lshNearDupPairs]]'
    * banding or [[ivfTopK]]'s routing); this exact form is the verify
    * kernel those candidate generators feed. */
  def cosineCrossPairs(
      base: DataFrame, delta: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = base.select(col(idCol).as("base_id"), col(vecCol).as("va"),
      Vectors.norm(col(vecCol)).as("na"))
    val d = delta.select(col(idCol).as("delta_id"), col(vecCol).as("vb"),
      Vectors.norm(col(vecCol)).as("nb"))
    a.crossJoin(broadcast(d))
      .filter(Vectors.cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")) >= threshold)
      .select(least(col("base_id"), col("delta_id")).as("id_i"),
        greatest(col("base_id"), col("delta_id")).as("id_j"))
  }

  // ---------------------------------------------------------------- PQ

  /** (id, sub, subvector) expansion shared by the PQ paths. */
  private def subVectors(
      df: DataFrame, idCol: String, vecCol: String,
      nSub: Int, subDim: Int, idAs: String, vecAs: String): DataFrame =
    df.select(col(idCol).as(idAs),
        explode(sequence(lit(0), lit(nSub - 1))).as("sub"),
        col(vecCol).as("__v"))
      .select(col(idAs), col("sub"),
        slice(col("__v"), col("sub") * subDim + 1, lit(subDim)).as(vecAs))

  /** Squared L2 between two float subvectors, accumulated in index order
    * in doubles — the fold both engines reproduce bit-for-bit. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic PQ codebook — the first `nCent` ids' subvectors, as
    * (cid, sub, cv). Codebook TRAINING is a pluggable input (k-means on
    * a bounded sample, [[ivfTopK]]'s `trainCentroids` pattern); every
    * consumer's plan is identical under trained centroids. */
  def pqCodebook(
      corpus: DataFrame, nSub: Int, subDim: Int, nCent: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    subVectors(corpus.filter(col(idCol) < nCent), idCol, vecCol,
      nSub, subDim, "cid", "cv")

  /** [[pqCodebook]] robust to arbitrary id ranges: the lowest `nCent`
    * ids PRESENT (a TakeOrdered — no global sort), not `id < nCent`.
    * On a corpus whose ids start at 0 the two are identical (which is
    * why the maintained index's ≡-q124 pin holds), but a delta-keyed
    * or re-keyed corpus — or a streaming first batch that does not
    * carry the low ids — would hand the literal filter an EMPTY or
    * partial training set and silently degrade every code. The
    * maintained builds use this form.
    *
    * Centroid ids are REMAPPED to a dense 0..nCent-1 range (rank order
    * of the training ids — order-preserving, so the argmin's
    * lower-cid tie-break picks the same centroid as under raw ids): the
    * persisted codes must be small ints independent of the id domain,
    * because the read paths cast them to int for the packed code arrays
    * — raw vec_ids past 2^31 would wrap, and two training ids congruent
    * mod 2^32 would silently merge centroids and corrupt ADC. The
    * window runs over the already-TakeOrdered `nCent` rows, never the
    * corpus. */
  private[similarity] def pqCodebookPresent(
      corpus: DataFrame, nSub: Int, subDim: Int, nCent: Int,
      idCol: String, vecCol: String): DataFrame = {
    val w = Window.orderBy(col(idCol))
    val train = corpus.orderBy(col(idCol)).limit(nCent)
      .withColumn("__cid", row_number().over(w).cast("long") - 1)
    subVectors(train, "__cid", vecCol, nSub, subDim, "cid", "cv")
  }

  /** PQ code assignment (Jégou et al. 2011): snap every subvector to its
    * nearest codebook centroid — (id, sub, code), `nSub` codes per
    * vector. Scale shape: the `nCent·nSub`-row codebook broadcasts, the
    * distance evaluation is map-side behind that join, and the argmin
    * pre-combines in the partial `min(struct(d2, cid))` (ties to the
    * lower centroid id), so the only shuffle carries `nSub` rows per
    * vector — never the embeddings. */
  def pqCodes(
      corpus: DataFrame, nSub: Int, subDim: Int, nCent: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqCodesWith(corpus, pqCodebook(corpus, nSub, subDim, nCent, idCol, vecCol),
      nSub, subDim, idCol, vecCol)

  /** [[pqCodes]] under a caller-supplied codebook (cid, sub, cv) — the
    * maintained-index paths assign appends under the PERSISTED codebook
    * rather than re-deriving one, which is what makes append ≡ rebuild
    * exact (assignment under a fixed codebook is a pure function). */
  private[similarity] def pqCodesWith(
      corpus: DataFrame, codebook: DataFrame, nSub: Int, subDim: Int,
      idCol: String, vecCol: String): DataFrame =
    subVectors(corpus, idCol, vecCol, nSub, subDim, idCol, "x")
      .join(broadcast(codebook), "sub")
      .select(col(idCol), col("sub"), col("cid"), l2sq(col("x"), col("cv")).as("d2"))
      .groupBy(col(idCol), col("sub"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col(idCol), col("sub"), col("m.cid").as("code"))

  /** The query side of ADC under a caller-supplied codebook: per query,
    * the `nSub·nCent` table of subspace distances to every centroid —
    * (query_id, sub, code, d2), broadcast-small by construction. */
  private[similarity] def pqDistTable(
      queries: DataFrame, codebook: DataFrame, nSub: Int, subDim: Int,
      idCol: String, vecCol: String): DataFrame =
    subVectors(queries, idCol, vecCol, nSub, subDim, "query_id", "qv")
      .join(broadcast(codebook), "sub")
      .select(col("query_id"), col("sub"), col("cid").as("code"),
        l2sq(col("qv"), col("cv")).as("d2"))

  /** PQ-ADC ANN (asymmetric distance computation + exact rerank): the
    * query builds a `nSub·nCent` lookup table of subspace distances to
    * every centroid; each corpus vector's approximate distance is the
    * sum of `nSub` table entries selected by its CODES — the corpus
    * floats are never touched for scoring. The ADC shortlist is then
    * reranked with exact cosine against the raw vectors (the standard
    * IVF-PQ + refine step), so approximation affects recall only and
    * every returned score is exact.
    *
    * Scale shape: the distance table (|queries|·nSub·nCent rows) and the
    * shortlist (|queries|·`shortlist` ids) broadcast; the corpus-side
    * work is one map-side join over the CODES (nSub ints per vector —
    * the 32x-compressed representation is all that streams) plus a
    * partial-sum aggregate to `|queries|` rows per vector. Only the
    * shortlist's raw vectors are fetched for rerank. */
  def pqAdcTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int = 50, nSub: Int = 8, subDim: Int = 8, nCent: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val codes = pqCodes(corpus, nSub, subDim, nCent, idCol, vecCol)
    val table = pqDistTable(queries,
      pqCodebook(corpus, nSub, subDim, nCent, idCol, vecCol),
      nSub, subDim, idCol, vecCol)
    val aw = Window.partitionBy("query_id").orderBy(col("adist").asc, col(idCol).asc)
    val cand = codes.join(broadcast(table), Seq("sub", "code"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum("d2").as("adist"))
      .withColumn("r", row_number().over(aw))
      .filter(col("r") <= shortlist)
      .select(col("query_id"), col(idCol).as("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Vectors.norm(col(vecCol)).as("qn"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Vectors.norm(col(vecCol)).as("cn"))
    val rw = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    cv.join(broadcast(cand), "neighbor_id")
      .join(broadcast(qv), "query_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Vectors.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
