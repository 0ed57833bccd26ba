package graft.plans

import graft.query.{Pred, PrunedScanner}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** Transparent index-consulting scan pruning — the custom planner hook
  * the reference implements as `getSplits` split filtering
  * (`retrieval/BlockIndexedFileInputFormat.java:110-187`) and SURVEY.md
  * §4 R2 maps to "a FileIndex that consults the index table".
  *
  * The rule rewrites `Filter(cond, scan(parquet dir))` when:
  *   1. the scanned root path is registered in the session conf
  *      `spark.graft.indexes` (format `dataDir=indexRoot;...`), and
  *   2. `cond` (or some conjunct of it) translates into the EQ/AND/OR
  *      IR,
  * replacing the relation's file listing with only the files the sparse
  * index proves relevant (plus freshness fallbacks). The Filter itself
  * is left in place — it is the mandatory residual re-check, and
  * Catalyst additionally pushes it into the parquet reader.
  *
  * Soundness: non-translatable predicates leave the plan untouched
  * (full scan); a conjunct suffices for pruning because dropping
  * conjuncts only widens the file set. Idempotence under the
  * fixed-point optimizer batch is ensured with a TreeNodeTag.
  *
  * Usage:
  * {{{
  * spark.conf.set("spark.graft.indexes", s"$dataDir=$indexRoot")
  * spark.experimental.extraOptimizations ++= Seq(GraftPruneRule(spark))
  * // or: --conf spark.sql.extensions=graft.plans.GraftSparkExtensions
  * spark.read.parquet(dataDir).filter($"event_type" === "error") // pruned
  * }}}
  */
case class GraftPruneRule(spark: SparkSession) extends Rule[LogicalPlan] with Logging {

  import GraftPruneRule._

  private def registry: Map[String, String] =
    GraftPruneRule.parseRegistry(spark.conf.getOption(IndexesConf))
      .map { case (d, i) => normalize(d) -> i }

  // the ONE canonical identity function (IndexBuilder's) — a diverging
  // reimplementation here would silently stop matching registerIndex keys
  private def normalize(p: String): String =
    graft.build.IndexBuilder.canonicalPath(p)

  /** Identities are scheme-less paths, so the engine can only prune
    * datasets living on the session's DEFAULT filesystem; roots on any
    * other FS are left untouched (full scan) rather than resolved
    * against the wrong filesystem. */
  private def onDefaultFs(p: org.apache.hadoop.fs.Path): Boolean = {
    val defaultUri = org.apache.hadoop.fs.FileSystem.getDefaultUri(
      spark.sparkContext.hadoopConfiguration)
    val u = p.toUri
    (u.getScheme == null || u.getScheme == defaultUri.getScheme) &&
      (u.getAuthority == null || u.getAuthority == defaultUri.getAuthority)
  }

  /** The largest translatable conjunct-tree of `cond` (ANDs may be
    * partially translated; OR requires both sides). */
  private def translatableConjuncts(
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Option[Pred] =
    cond match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        (translatableConjuncts(l), translatableConjuncts(r)) match {
          case (Some(a), Some(b)) => Some(graft.query.And(a, b))
          case (a, b)             => a.orElse(b)
        }
      case e => Pred.fromExpression(e)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // partitionSchema must be empty: the replacement InMemoryFileIndex
    // is built from bare leaf files and cannot reconstruct hive
    // partition values — hive-partitioned datasets fall back to Spark's
    // own partition pruning untouched. Exactly ONE root path required:
    // for spark.read.parquet(dirA, dirB) the pruned listing would be
    // rebuilt from the registered root alone, silently dropping the
    // other directories' files from the scan.
    case f @ Filter(cond, lr @ LogicalRelation(rel: HadoopFsRelation, _, _, _, _))
        if lr.getTagValue(PrunedTag).isEmpty && registry.nonEmpty &&
          rel.partitionSchema.isEmpty && rel.location.rootPaths.length == 1 &&
          onDefaultFs(rel.location.rootPaths.head) =>
      val roots = rel.location.rootPaths.map(p => normalize(p.toString))
      val hit = roots.flatMap(r => registry.get(r).map(r -> _)).headOption
      (hit, translatableConjuncts(cond)) match {
        case (Some((dataDir, indexRoot)), Some(pred)) =>
          val (files, report) = PrunedScanner.selectFiles(spark, dataDir, pred, indexRoot)
          logInfo(s"GraftPruneRule: $dataDir pred=$pred -> " +
            s"${report.selectedFiles}+${report.fallbackFiles}/${report.totalFiles} files, " +
            s"bytes ratio ${report.bytesRatio}")
          val prunedIndex = new InMemoryFileIndex(
            spark, files.map(new org.apache.hadoop.fs.Path(_)),
            Map.empty, Some(rel.dataSchema))
          val prunedRel = rel.copy(location = prunedIndex)(spark)
          val newLr = lr.copy(relation = prunedRel)
          newLr.setTagValue(PrunedTag, true)
          Filter(cond, newLr)
        case _ => f
      }
  }
}

object GraftPruneRule {
  val IndexesConf = "spark.graft.indexes"
  val PrunedTag: TreeNodeTag[Boolean] = TreeNodeTag[Boolean]("graft.pruned")

  /** Tolerant parse of the `dataDir=indexRoot;...` registry conf —
    * segments without '=' are ignored rather than erroring (shared by
    * the rule and Graft.registerIndex so both sides agree). */
  def parseRegistry(conf: Option[String]): Map[String, String] =
    conf.map(_.split(";").filter(_.contains("=")).map { kv =>
      val Array(d, i) = kv.split("=", 2)
      d -> i
    }.toMap).getOrElse(Map.empty)
}

/** `spark.sql.extensions`-style injection for new sessions. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(GraftPruneRule(_))
}
