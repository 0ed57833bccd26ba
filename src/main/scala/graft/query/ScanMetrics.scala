package graft.query

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Row-level observability parity with the reference (R10): the
  * scanned-vs-qualified counters `FilterRecordReader` logs per task
  * (`retrieval/FilterRecordReader.java:42-44, 66-70, 136-139`), rebuilt
  * on `Dataset.observe` — metrics ride the job itself (no second pass)
  * and surface through a QueryExecutionListener after each action.
  *
  * Usage:
  * {{{
  * ScanMetrics.register(spark)
  * val df = ScanMetrics.observed(prunedDf, residual)   // scan -> observe -> filter -> observe
  * df.count()
  * ScanMetrics.last("graft_scan")   // Some((rowsScanned, rowsQualified))
  * }}}
  *
  * NAMING CONTRACT: use one name per observed() pipeline. An action
  * whose plan carries only one of the two observe nodes (cached/split
  * subtree) updates just that side and keeps the other from the
  * previous publish — correct for repeated actions over ONE pipeline;
  * two different pipelines sharing a name would pair sides from
  * different queries. */
object ScanMetrics {

  val ScannedMetric = "rows_scanned"
  val QualifiedMetric = "rows_qualified"

  private val results = new ConcurrentHashMap[String, (Long, Long)]()
  // weak keys: a stopped/dropped session must not be pinned for the JVM
  // lifetime just because metrics were once registered on it
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, QueryExecutionListener]())

  /** Wrap a scan with scanned/qualified counters around `residual`. */
  def observed(scan: DataFrame, residual: org.apache.spark.sql.Column,
      name: String = "graft_scan"): DataFrame =
    scan
      .observe(s"${name}_in", count(lit(1)).as(ScannedMetric))
      .filter(residual)
      .observe(s"${name}_out", count(lit(1)).as(QualifiedMetric))

  /** Install the listener once per session. */
  def register(spark: SparkSession): Unit =
    registered.computeIfAbsent(spark, { s =>
      val l = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
          // Pair _in/_out strictly WITHIN this QueryExecution when both
          // sides are present — one observed() scan puts both nodes in
          // one plan, so the common case publishes a whole pair
          // atomically (never a mixed pair from two concurrent queries
          // sharing a name). When an action's plan carries only ONE of
          // the nodes (e.g. it ran over a cached/split subtree of the
          // observed scan), update just that side and keep the other
          // from the previous complete pair instead of clobbering it
          // with -1.
          val metrics = qe.observedMetrics
          val ins = metrics.collect {
            case (n, row) if n.endsWith("_in") =>
              n.dropRight(3) -> row.getAs[Long](ScannedMetric)
          }
          val outs = metrics.collect {
            case (n, row) if n.endsWith("_out") =>
              n.dropRight(4) -> row.getAs[Long](QualifiedMetric)
          }
          (ins.keySet ++ outs.keySet).foreach { b =>
            results.compute(b, { (_, prev) =>
              val p = Option(prev).getOrElse((-1L, -1L))
              (ins.getOrElse(b, p._1), outs.getOrElse(b, p._2))
            })
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
      }
      s.listenerManager.register(l)
      l
    })

  /** (rowsScanned, rowsQualified) from the most recent action that ran
    * an observed scan under `name`; -1 for a side not yet reported. */
  def last(name: String = "graft_scan"): Option[(Long, Long)] =
    Option(results.get(name))

  // ------------------------- opt-in per-query observation (r12) ------
  // The observe node sits BETWEEN scan and residual, which blocks
  // parquet pushdown of the residual — so observation must never be on
  // in a timed or production path. Bench enables it around ONE extra
  // untimed pass over the indexed family; PrunedScanner.scanWithReport
  // attaches the counters only while a label is set on the building
  // thread (DataFrame CONSTRUCTION happens inside the labelled block).
  private val observeLabel = new ThreadLocal[String]
  private val useCounter = new java.util.concurrent.atomic.AtomicLong
  private val issuedCounts = new ConcurrentHashMap[String, java.lang.Long]()

  /** Run `f` with pruned-scan observation enabled under `label`.
    * Starts CLEAN: any leftover pairs a previous pass under the same
    * label published after its drain deadline (drain keeps partial
    * pairs on purpose) are discarded here — labels are reused across
    * bench passes within one JVM, and a stale completed pair from the
    * last pass would otherwise be summed into this pass's drain,
    * inflating its counters. */
  def withObservation[T](label: String)(f: => T): T = {
    results.keySet.removeIf(k => k == label || k.startsWith(label + "#"))
    issuedCounts.remove(label)
    observeLabel.set(label)
    try f finally observeLabel.remove()
  }

  /** The next observation name for the current thread's label, or None
    * when observation is off. The per-use counter suffix keeps
    * observation names unique when one query builds several pruned
    * scans (Spark rejects duplicate observed names in a plan). */
  private[graft] def nextObservationName(): Option[String] =
    Option(observeLabel.get()).map { l =>
      issuedCounts.merge(l, 1L, (a, b) => a + b)
      s"$l#${useCounter.getAndIncrement()}"
    }

  /** How many observation names a label's block issued — zero means
    * the query never routed through scanWithReport (e.g. it prunes via
    * the transparent rule), so a caller can skip the publish poll
    * instead of waiting out its deadline. */
  def issuedCount(label: String): Long =
    Option(issuedCounts.get(label)).map(_.longValue).getOrElse(0L)

  /** Sum-and-remove every published pair for `label` — both counters
    * summed across all of that query's observed scans, cleared so the
    * next query's pass starts clean. None when nothing (complete) was
    * published. */
  def drain(label: String): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val ks = results.keySet.asScala
      .filter(k => k == label || k.startsWith(label + "#")).toSeq
    // remove only COMPLETE pairs; a partial pair (one side still -1 —
    // its completing publish hasn't landed yet) stays in the map so the
    // late publish upgrades it for a subsequent drain instead of being
    // silently discarded here. The conditional remove(k, v) keeps a
    // pair that completed between our read and the removal.
    val vs = ks.flatMap { k =>
      Option(results.get(k)) match {
        case Some(v) if v._1 >= 0 && v._2 >= 0 && results.remove(k, v) => Some(v)
        case _ => None
      }
    }
    if (vs.isEmpty) None else Some((vs.map(_._1).sum, vs.map(_._2).sum))
  }
}
