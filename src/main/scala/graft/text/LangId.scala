package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram language identification — the "richer" classifier
  * behind the SQL-expressible marker heuristic of q32: train a
  * per-language profile (top-K character n-grams by document frequency)
  * from labeled data, then classify by profile overlap. The classic
  * Cavnar-Trenkle shape, as two DataFrame programs.
  *
  * Scale: profiles are `languages x topK` rows (tiny — broadcast);
  * classification is one explode + one broadcast join + one argmax
  * aggregation, linear in corpus size, no shuffle of the text itself.
  */
object LangId {

  /** Lowercased text with whitespace normalized to '_' so word
    * boundaries carry signal. Project this to a CONCRETE column before
    * gram extraction — Catalyst re-evaluates subexpressions inside HOF
    * lambdas per element. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", "_")

  /** Distinct character n-grams of an already-[[normalize]]d column. */
  def charGrams(norm: Column, n: Int): Column =
    when(length(norm) >= n,
      array_distinct(transform(sequence(lit(1), length(norm) - (n - 1)),
        i => substr(norm, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Train per-language profiles: the top-K n-grams by document
    * frequency per language, weighted by inverse rank (rank 1 = weight
    * topK .. rank topK = weight 1 — the Cavnar-Trenkle rank trick kept
    * in integer arithmetic). Ties broken lexicographically so training
    * is deterministic. Returns (lang, gram, weight). */
  def trainProfiles(
      docs: DataFrame, langCol: String, textCol: String,
      n: Int = 3, topK: Int = 200): DataFrame = {
    val grams = docs
      .select(col(langCol).as("lang"), normalize(col(textCol)).as("__norm"))
      .select(col("lang"), explode(charGrams(col("__norm"), n)).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("lang").orderBy(col("df").desc, col("gram").asc)
    grams.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("lang"), col("gram"), (lit(topK) + 1 - col("rank")).as("weight"))
  }

  /** Classify each document as the language whose profile it overlaps
    * most (sum of matched gram weights; score ties broken by the
    * lexicographically LAST language, consistently; docs matching no
    * profile gram get "und"). Returns (idCol, predicted). */
  def classify(
      docs: DataFrame, profiles: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val grams = docs
      .select(col(idCol), normalize(col(textCol)).as("__norm"))
      .select(col(idCol), explode(charGrams(col("__norm"), n)).as("gram"))
    val scored = grams.join(broadcast(profiles), "gram")
      .groupBy(col(idCol), col("lang"))
      .agg(sum("weight").as("score"))
      .groupBy(col(idCol))
      .agg(max(struct(col("score"), col("lang"))).as("best"))
      .select(col(idCol), col("best.lang").as("predicted"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("predicted"), lit("und")).as("predicted"))
  }
}
