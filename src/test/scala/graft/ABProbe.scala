package graft

import org.apache.spark.sql.SparkSession

/** Scratch dev tool: same-JVM ALTERNATING timing of registered queries
  * — interleaving the runs makes box noise hit every query equally, so
  * relative comparisons (e.g. two formulations registered side by side,
  * like q143 vs q155) are trustworthy on this steal-prone host where
  * sequential runs are not.
  *
  * Provenance note: the r11 lazy-vs-eager checkpoint A/B cited in
  * Ann.scala / PipelineQueries.scala / TextAnalysisQueries.scala was
  * run with a TEMPORARY source-level toggle (a sys-prop read at the
  * five audited localCheckpoint sites) that was removed once the
  * decision landed; re-running that experiment requires re-introducing
  * the toggle. The measured numbers live in the site comments. */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 4
    val names = (if (args.length > 2) args(2)
      else "q143_phash_neardup,q155_phash_h3").split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = names.map(n => n -> SparkEntry.queries(n))
    fns.foreach { case (_, fn) => fn(spark, dir).count() } // warm all once
    val mins = scala.collection.mutable.Map.empty[String, Double]
    (1 to iters).foreach { i =>
      fns.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        mins(name) = math.min(mins.getOrElse(name, Double.MaxValue), t)
        println(f"[ab] $name iter $i: $t%.3f s")
      }
    }
    mins.toSeq.sortBy(_._1).foreach { case (n, t) =>
      println(f"[ab] $n MIN: $t%.3f s")
    }
    spark.stop()
  }
}
