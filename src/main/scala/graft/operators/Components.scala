package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS into dedup CLUSTERS (keep `min(doc_id)` per component, drop the
  * rest): iterative min-label propagation, each round one join + one
  * min-aggregation, materialized per round (iterative lineage otherwise
  * grows exponentially). Deterministic: the component id is the smallest
  * node id in the component.
  *
  * Scale: each round is one-hop label propagation followed by pointer
  * jumping (comp := comp of comp — path compression), so convergence is
  * O(log diameter) rounds rather than O(diameter): a 40-node chain
  * closes in ~7 rounds, dup clusters (tiny, dense) in 2-3.
  */
object Components {

  /** @param nodes one column `id`
    * @param edges columns `src`, `dst` (undirected; either orientation)
    * @return (id, comp) with comp = min id reachable */
  def connectedComponents(
      nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = true)
    var labels = nodes.select(col("id"), col("id").as("comp"))
      .localCheckpoint(eager = true)
    // convergence = label-sum fixed point: labels only ever DECREASE
    // (least/min of monotone inputs), so Σcomp strictly drops while any
    // node changed — one aggregation per round instead of a full-table
    // join against the previous labels. decimal(38,0) keeps the sum
    // exact for any node count × 64-bit ids.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // sum over zero rows is null — map it to 0 so an empty node set
      // converges on the first check instead of NPE-ing in compareTo
      val s = df.agg(sum(col("comp").cast("decimal(38,0)"))).first().getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // join+least instead of union+min: self-referential unions trip
      // Catalyst's union constraint rewrite (missing-attribute crash)
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(sym("dst")).agg(min("comp").as("nmin"))
        .withColumnRenamed("dst", "id")
      val hopped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
      // pointer jump: comp := comp's comp (labels always satisfy
      // comp <= id with every comp value itself a node, so the inner
      // self-join is total and monotone)
      val updated = hopped.as("x")
        .join(hopped.select(col("id").as("cid"), col("comp").as("ccomp")),
          col("x.comp") === col("cid"))
        .select(col("x.id").as("id"), col("ccomp").as("comp"))
        .localCheckpoint(eager = true)
      val newSum = labelSum(updated)
      labels = updated
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      i += 1
    }
    labels
  }
}
