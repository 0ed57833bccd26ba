package graft

import graft.dedup.Dedup
import graft.operators.DedupQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale canary for the dedup family: the round-4 q63 bug (94.9M join
  * rows at sf0.1 vs 966K at sf0.01 — 98× rows for 10× data, a hung
  * bench) is the class of failure a COUNTER catches long before a
  * timeout does. For each registered near-dup operator this spec
  * computes the size of its quadratic step — candidate pairs for the
  * banded families, inverted-index join rows (Σ df·(df−1)/2 over join
  * keys) for the frequency-cut families — at sf0.01 and sf0.1, and
  * fails if growth exceeds [[MaxGrowth]]× for the 10× data step.
  * q26 (uncut exact Jaccard) is the one intentionally-quadratic oracle
  * anchor and is excluded by design.
  */
class DedupScaleSpec extends AnyFunSuite {

  /** 10× data × a 3× polylog/skew allowance. Uncut q63 measured 98×. */
  private val MaxGrowth = 30.0

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("DedupScaleSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(sf: String): DataFrame =
    Tables.documents(spark, s"/root/testdata/$sf")

  /** Inverted-index join rows for a (doc_id, key) table: Σ df·(df−1)/2. */
  private def joinRows(keyed: DataFrame, key: String): Long =
    keyed.groupBy(key).agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - 1) / 2)).first().getDecimal(0).longValue()

  private val families: Seq[(String, String => Long)] = Seq(
    "q53 shingle-cut join rows" -> { sf =>
      val sh = Dedup.shingleTable(docs(sf), "doc_id", "text", 3)
      val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") > DedupQueries.MaxShingleFreq).select("sh")
      joinRows(sh.join(hot, Seq("sh"), "left_anti"), "sh")
    },
    "q63 winnow-cut join rows" -> { sf =>
      val fps = Dedup.winnowFingerprints(docs(sf), "doc_id", "text", 8, 4)
      val hot = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") > DedupQueries.MaxFpFreq).select("fp")
      joinRows(fps.join(hot, Seq("fp"), "left_anti"), "fp")
    },
    "q25 minhash candidate pairs" -> { sf =>
      val sh = Dedup.shingleTable(docs(sf), "doc_id", "text", 3)
      Dedup.lshCandidates(Dedup.minHashSignatures(sh, 32), 16, 2).count()
    },
    "q27 simhash candidate pairs" -> { sf =>
      Dedup.bandedCandidates(Dedup.simHash(docs(sf), "doc_id", "text"), 10).count()
    })

  for ((name, count) <- families) {
    test(s"$name grow sub-quadratically sf0.01 -> sf0.1") {
      val small = count("sf0.01")
      val big = count("sf0.1")
      assert(small > 0, s"$name: empty at sf0.01 — counter not counting")
      val growth = big.toDouble / small
      info(f"$name: sf0.01=$small sf0.1=$big growth=$growth%.1fx")
      assert(growth <= MaxGrowth,
        f"$name grows $growth%.1fx for 10x data (cap $MaxGrowth) — " +
          "quadratic candidate generation, would hang at scale")
    }
  }
}
