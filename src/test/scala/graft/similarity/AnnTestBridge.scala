package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}

/** Test-only bridge into Ann's private[similarity] kernels, so specs in
  * package graft can pin the driver-side probe twin against the
  * Catalyst scoring without widening production visibility. */
object AnnTestBridge {
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, lloydIters: Int): Array[Array[Double]] =
    Ann.trainCentroids(corpus, idCol, vecCol, nlist, lloydIters)

  def cellScoresFor(cs: Array[Array[Double]]): Column => Column =
    Ann.cellScoresFor(cs)

  def queryProbeCellsLocal(v: Option[Array[Double]],
      cs: Array[Array[Double]], nprobe: Int): Seq[Long] =
    Ann.queryProbeCellsLocal(v, cs, nprobe)
}
