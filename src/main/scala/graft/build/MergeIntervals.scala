package graft.build

import graft.intervals.{Block, IntervalOps}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Aggregation buffer: an unordered bag of ranges, normalized lazily.
  * Kept as a case class so the Catalyst product encoder applies. */
final case class IntervalBuf(blocks: Seq[Block])

/** The one genuinely custom UDAF in the engine (SURVEY.md §2.10): merges
  * the byte ranges observed for one (file, column, value) group into a
  * sorted, non-overlapping, size-capped posting list.
  *
  * Ports the reducer-side overlap merge of
  * `indexing/MapFileIndexingReducer.java:52-107` (cap = dfs.block.size
  * there): ranges from different mappers may overlap when a record spans
  * a block boundary; adjacent ranges are coalesced while the combined
  * range stays within `cap`, preserving downstream split parallelism.
  *
  * Scale note: the buffer for one group is bounded by the number of
  * read-splits of a single file (~file_size / maxPartitionBytes), not by
  * row count — map-side partial aggregation collapses each split's rows
  * to one range before shuffle, so this aggregation shuffles O(distinct
  * values x splits) tiny rows, never data rows.
  */
final case class MergeIntervals(cap: Long)
    extends Aggregator[Block, IntervalBuf, Seq[Block]] {

  override def zero: IntervalBuf = IntervalBuf(Nil)

  override def reduce(b: IntervalBuf, a: Block): IntervalBuf = {
    // append + periodic renormalize keeps the buffer near-sorted without
    // O(n^2) insertion; posting lists per group are small by construction
    val appended = b.blocks :+ a
    if (appended.length % 64 == 0) IntervalBuf(IntervalOps.normalize(appended))
    else IntervalBuf(appended)
  }

  override def merge(b1: IntervalBuf, b2: IntervalBuf): IntervalBuf =
    IntervalBuf(IntervalOps.normalize(b1.blocks ++ b2.blocks))

  override def finish(r: IntervalBuf): Seq[Block] =
    IntervalOps.coalesceCapped(r.blocks, cap)

  override def bufferEncoder: Encoder[IntervalBuf] = ExpressionEncoder[IntervalBuf]()
  override def outputEncoder: Encoder[Seq[Block]] = ExpressionEncoder[Seq[Block]]()
}
