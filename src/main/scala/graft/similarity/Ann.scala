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
  * at 100 TB the bucketed table would be written out partitioned by
  * signature prefix so repeated queries touch only matching files (the
  * same skipping architecture as the sparse index).
  */
object Ann {

  /** Exact top-k neighbors for each query vector (cross score + window):
    * (query_id, neighbor_id, rank), self-matches excluded, ties broken
    * by neighbor id. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms are computed once per ROW here, not once per pair inside the
    // cross product — same arithmetic (dot / (|q||c|)), 3x fewer array
    // folds on the quadratic path
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Vectors.norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Vectors.norm(col(vecCol)).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

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
    cand.withColumn("sim", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
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
    * Centroids seed as the first `nlist` corpus vectors by id
    * (deterministic), then `lloydIters` rounds of Lloyd refinement
    * recenter each cell on its member mean (one corpus pass per
    * iteration; the nlist x dim centroid table lives on the driver).
    * Measured honestly: refinement matters exactly when the corpus has
    * cluster structure — on the isotropic test embeddings it is
    * recall-neutral (OperatorsSpec measures both regimes; the clustered
    * case asserts non-degradation). The means are per-dimension `avg`
    * aggregations — partial-aggregation order can wiggle the last ulp
    * of a centroid coordinate, immaterial to a recall knob; every
    * returned SCORE is exact regardless. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      nlist: Int = 32, nprobe: Int = 8, lloydIters: Int = 2): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist)
    val spark = corpus.sparkSession
    import spark.implicits._

    def centsDf(cs: Seq[(Long, Seq[Double])]): DataFrame =
      broadcast(cs.toDF("cell", "centv")
        .select(col("cell"), col("centv"),
          Vectors.norm(col("centv")).as("centn")))

    val seed: Seq[(Long, Seq[Double])] =
      corpus.orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
        .as[(Long, Seq[Double])].collect().toSeq

    var cs = seed
    for (_ <- 1 to lloydIters) {
      val assigned = corpus
        .crossJoin(centsDf(cs))
        .withColumn("negsim",
          -Vectors.dot(col(vecCol), col("centv")) /
            (Vectors.norm(col(vecCol)) * col("centn")))
        .groupBy(col(idCol))
        .agg(min(struct(col("negsim"), col("cell"))).as("best"),
          first(col(vecCol)).as("v"))
        .select(col("best.cell").as("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      val means = assigned.groupBy("cell", "dim")
        .agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(rows =>
          rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        .toMap
      // empty cells keep their previous centroid
      cs = cs.map { case (cell, old) => cell -> means.getOrElse(cell, old) }
    }

    val cents = centsDf(cs)

    // nearest-centroid assignment via min(struct(dist, cell)): one pass,
    // no window shuffle; ties break on the lower cell id
    def assign(df: DataFrame, id: String, vec: String, n: Int): DataFrame = {
      val scored = df.crossJoin(cents)
        .withColumn("negsim",
          -Vectors.dot(col(vec), col("centv")) /
            (Vectors.norm(col(vec)) * col("centn")))
      if (n == 1)
        scored.groupBy(col(id))
          .agg(min(struct(col("negsim"), col("cell"))).as("best"))
          .select(col(id), col("best.cell").as("cell"))
      else
        scored
          .withColumn("rk", row_number().over(
            Window.partitionBy(id).orderBy(col("negsim").asc, col("cell").asc)))
          .filter(col("rk") <= n)
          .select(col(id), col("cell"))
    }

    val corpusCells = assign(corpus, idCol, vecCol, 1)
      .join(corpus, idCol)
      .select(col(idCol).as("neighbor_id"), col("cell"),
        col(vecCol).as("cv"), Vectors.norm(col(vecCol)).as("cn"))
    val queryCells = assign(queries, idCol, vecCol, nprobe)
      .join(queries, idCol)
      .select(col(idCol).as("query_id"), col("cell"),
        col(vecCol).as("qv"), Vectors.norm(col(vecCol)).as("qn"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
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
      .localCheckpoint(false) // consumed by both sides of the self-join
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .filter(Vectors.dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")) >= threshold)
      .select(col("a.id").as("id_i"), col("b.id").as("id_j"))
      .distinct()
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
      .filter(Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select("id_i", "id_j")
  }
}
