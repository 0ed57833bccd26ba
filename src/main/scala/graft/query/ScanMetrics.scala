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
}
