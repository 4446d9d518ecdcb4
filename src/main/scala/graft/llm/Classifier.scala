package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** fastText-style shallow linear text classifier — the standard
  * quality-filter stage of LLM pretraining pipelines (a CCNet/LLaMA-style
  * "quality classifier" is exactly this: a linear model over bag-of-words
  * features, thresholded): `logit = bias + Σ_features w(f) / n_features`.
  *
  * Spark shape (same as [[Unigram]]'s, the Zipf-safe one): the weight
  * table is BROADCAST against exploded features — never shuffled on the
  * token key, where "the" alone would be one partition — then ONE
  * aggregation keyed by doc id. Trained quality-filter vocabularies are
  * bounded (~10⁵ terms), far under broadcast limits; at 100 TB the only
  * corpus-sized exchange is the per-doc aggregation.
  *
  * Oracle-ability: the summed statistic is Σ weight·count with weights the
  * caller controls. With weights chosen as exact binary fractions (the
  * oracle query uses multiples of 2⁻¹⁰), every partial sum is exactly
  * representable in double, so the sum is order-independent and
  * cross-engine exact; the logit derives from it in one expression.
  */
object Classifier {

  /** Per-document linear score over whitespace-token features (plus word
    * n-grams up to `wordNgrams`, fastText-style). Returns
    * `(idCol, n_features, sum_weight, logit, keep)`; documents with no
    * features are absent (nothing to score). `keep` is `logit > 0`.
    */
  def scoreLinear(df: DataFrame, idCol: String, textCol: String,
      weights: Map[String, Double], bias: Double = 0.0,
      wordNgrams: Int = 1): DataFrame = {
    require(wordNgrams >= 1, s"wordNgrams must be >= 1: $wordNgrams")
    require(weights.nonEmpty, "Classifier: weights must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val w = broadcast(weights.toSeq.toDF("token", "weight"))
    val features = (2 to wordNgrams).foldLeft(TextFunctions.tokens(col(textCol)))(
      (acc, n) => concat(acc, TextFunctions.shingles(col(textCol), n)))
    df.select(col(idCol), explode(features).as("__feat"))
      .join(w, col("__feat") === col("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_features"),
        sum(coalesce(col("weight"), lit(0.0))).as("sum_weight"))
      .withColumn("logit", lit(bias) + col("sum_weight") / col("n_features"))
      .withColumn("keep", col("logit") > 0)
  }

  /** Filter form: keep only documents the classifier accepts. */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      weights: Map[String, Double], bias: Double = 0.0,
      wordNgrams: Int = 1): DataFrame = {
    val kept = scoreLinear(df, idCol, textCol, weights, bias, wordNgrams)
      .filter(col("keep")).select(col(idCol).as("__keep_id"))
    df.join(kept, col(idCol) === col("__keep_id"), "left_semi")
  }
}
