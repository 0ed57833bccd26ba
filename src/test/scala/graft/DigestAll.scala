package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement tool (not a test; the LshRecallProbe convention):
  * dumps every registered query's normalized analyzed-plan digest (and
  * the normalized plan text) so digest stability can be diffed across
  * JVMs, session configs, and session histories — the instrument that
  * found the lambda-identity and HOF-variable-counter instabilities the
  * Bench.planDigest normalizer strips.
  * `sbt "Test/runMain graft.DigestAll /tmp/dg/d.txt"` twice + diff. */
object DigestAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintWriter(args(0))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        // the SAME normalizer the bench uses (shared, so this tool can
        // never validate a different rule than the one floors run on)
        val df = fn(spark, "/root/testdata/sf0.1")
        val d = Bench.planDigest(df)
        val s = df.queryExecution.analyzed.toString
          .replaceAll("lambda ([A-Za-z][A-Za-z0-9]*)_\\d+", "lambda $1")
          .replaceAll("(lambdavariable\\([^()]*(?:\\([^()]*\\)[^()]*)*), \\d+\\)", "$1)")
          .replaceAll("#\\d+", "#")
          .replaceAll("Lambda\\$\\d+", "Lambda")
          .replaceAll("/0x[0-9a-fA-F]+", "")
          .replaceAll("@[0-9a-fA-F]+", "@")
        out.println(s"$n $d")
        // also dump the normalized plan for diffing
        val pw = new java.io.PrintWriter(s"${args(0)}.plans.$n")
        pw.println(s); pw.close()
      } catch { case e: Throwable => out.println(s"$n ERR ${e.getMessage}") }
    }
    out.close(); spark.stop()
  }
}
