package graft

import org.apache.spark.sql.SparkSession

/** Scratch dev tool: same-JVM alternating A/B of the graft.eagerAB
  * toggle (lazy vs eager localCheckpoint at the five audited
  * multi-consumer sites) for each named query — alternation makes box
  * noise hit both sides equally. Not part of the library surface. */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 4
    val names = (if (args.length > 2) args(2)
      else "q51_embed_neardup_lsh").split(',').toSeq
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
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def a() = { sys.props.remove("graft.eagerAB"); fn(spark, dir) }
      def b() = { sys.props("graft.eagerAB") = "1"; fn(spark, dir) }
      a().count(); b().count() // warm both once
      var minA = Double.MaxValue
      var minB = Double.MaxValue
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime(); a().count(); val ta = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); b().count(); val tb = (System.nanoTime() - t1) / 1e9
        minA = math.min(minA, ta); minB = math.min(minB, tb)
        println(f"[ab] $name iter $i: lazy=$ta%.3f s eager=$tb%.3f s")
      }
      println(f"[ab] $name MIN: lazy=$minA%.3f s eager=$minB%.3f s")
    }
    spark.stop()
  }
}
