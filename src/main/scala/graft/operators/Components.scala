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

  /** Edge-count cap for the driver union-find fast path. Collected
    * volume is bounded by construction: the RAW (un-symmetrized) edge
    * list collects as `Array[(Long, Long)]` — `Tuple2` is
    * `@specialized` on `Long`, so 1M edges is ~1M tuple objects of two
    * primitive longs (~32 MB with headers), plus a boxed HashMap over
    * the touched-node universe — a few hundred MB worst case on a
    * driver heap that budgets gigabytes. The incremental-merge
    * contraction graphs (q142/q154/q158) are delta-bounded and sit far
    * under it; corpus-scale dedup graphs at 100 TB exceed it and take
    * the distributed iteration, so the scale path is unchanged. Only
    * EDGES gate the fast path — the node universe (corpus-sized for
    * cluster maps) never collects: singletons are label = self,
    * appended as a map-side coalesce. */
  private val SmallGraphMaxEdges = 1000000L

  /** @param nodes one column `id`
    * @param edges columns `src`, `dst` (undirected; either orientation)
    * @return (id, comp) with comp = min id reachable */
  def connectedComponents(
      nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the RAW edges once: the gate count, the fast-path
    // collect, and the iterative path's symmetrization all read these
    // checkpointed blocks instead of re-running the edge subtree
    val raw = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(eager = true)
    // FAST PATH measured on the merge queries (r11, same-JVM
    // alternating A/B at sf0.1): the iterative path pays ~3 rounds x
    // (2 joins + agg + checkpoint + convergence action) even on a
    // 2k-edge contraction graph — driver union-find replaces all of it
    // with one bounded collect and one broadcast join. Union-find needs
    // only ONE orientation per edge, so the collect is the
    // un-symmetrized list, typed (specialized tuples — primitive longs,
    // not GenericRow boxes), at half the volume of the old
    // symmetrized-Row collect.
    val nEdges = raw.count()
    if (nEdges <= SmallGraphMaxEdges) {
      val s = nodes.sparkSession
      import s.implicits._
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        // path compression
        var c = x
        while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      raw.as[(Long, Long)].collect().foreach { case (x, y) =>
        val a = find(x); val b = find(y)
        // min-id representative: union by label order keeps comp = min
        if (a < b) parent(b) = a else if (b < a) parent(a) = b
      }
      // snapshot the key set BEFORE the resolve loop: find() writes
      // path-compression updates into `parent` while we read it, which
      // is only safe while compression never INSERTS (no rehash) — an
      // invariant a snapshot makes irrelevant rather than load-bearing
      val ks = parent.keys.toArray
      val labelDf = ks.map(x => (x, find(x))).toSeq.toDF("id", "comp")
      // every non-edge node is its own singleton component
      return nodes.select(col("id"))
        .join(broadcast(labelDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    }
    val sym = raw
      .union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = true)
    connectedComponentsIterative(nodes, sym, maxIter)
  }

  /** The distributed min-label-propagation + pointer-jumping iteration —
    * the 100 TB path, also exercised directly by ComponentsSpec's
    * fast-vs-iterative differential. `sym` must already be symmetrized
    * and materialized. */
  private[graft] def connectedComponentsIterative(
      nodes: DataFrame, sym: DataFrame, maxIter: Int = 25): DataFrame = {
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
