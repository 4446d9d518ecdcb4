package graft.llm

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._

import graft.functions.{LinearLogit, LinearScoreSum, TextFunctions}

/** fastText-style shallow linear text classifier — the standard
  * quality-filter stage of LLM pretraining pipelines (a CCNet/LLaMA-style
  * "quality classifier" is exactly this: a linear model over bag-of-words
  * features, thresholded): `logit = bias + Σ_features w(f) / n_features`.
  *
  * Spark shape: scoring is MAP-ONLY — the weight table rides as a
  * per-executor hash map inside the native [[LinearScoreSum]] expression
  * (same reference-object pattern as the BPE encoder), so there is no
  * explode, no join, and no aggregation; the score fuses into the
  * enclosing scan stage and [[qualityFilter]] is a plain filter — ONE
  * scan of the corpus, zero shuffles at 100 TB. The earlier broadcast-join
  * formulation (explode features ⋈ broadcast weights → doc-keyed agg) had
  * the same per-executor memory envelope for the table but paid a
  * corpus-sized exchange to score and a second scan to filter; the spec
  * keeps it as the cross-checked reference shape.
  *
  * Oracle-ability: the summed statistic is Σ weight·count with weights the
  * caller controls. With weights chosen as exact binary fractions (the
  * oracle query uses multiples of 2⁻¹⁰), every partial sum is exactly
  * representable in double, so the sum is order-independent and
  * cross-engine exact; the logit derives from it in one expression.
  */
object Classifier {

  /** Unigram + word-n-gram feature array (fastText-style), shared by both
    * entry points so score and filter can never disagree.
    */
  private def featuresOf(textCol: Column, wordNgrams: Int): Column =
    (2 to wordNgrams).foldLeft(TextFunctions.tokens(textCol))(
      (acc, n) => concat(acc, TextFunctions.shingles(textCol, n)))

  /** Σ weight(f) over a feature array column (unmatched → 0.0). */
  def linearScore(features: Column, weights: Map[String, Double]): Column =
    GraftShims.toColumn(LinearScoreSum(GraftShims.toExpression(features), weights))

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
    val feats = featuresOf(col(textCol), wordNgrams)
    df.select(col(idCol), size(feats).cast("long").as("n_features"),
        linearScore(feats, weights).as("sum_weight"))
      .filter(col("n_features") > 0)
      .withColumn("logit", lit(bias) + col("sum_weight") / col("n_features"))
      .withColumn("keep", col("logit") > 0)
  }

  /** Filter form: keep only documents the classifier accepts — one scan,
    * zero shuffles, original columns untouched (the gate is a row filter
    * fused into whatever stage produces `df`). The whole decision
    * statistic is the single [[LinearLogit]] node, so the feature array
    * is computed ONCE per row (a size/sum/size conjunction would
    * re-evaluate it per conjunct — FilterExec does no cross-conjunct
    * subexpression elimination). Featureless documents produce a null
    * logit and are dropped, matching [[scoreLinear]]'s absence semantics.
    */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      weights: Map[String, Double], bias: Double = 0.0,
      wordNgrams: Int = 1): DataFrame = {
    require(wordNgrams >= 1, s"wordNgrams must be >= 1: $wordNgrams")
    require(weights.nonEmpty, "Classifier: weights must be non-empty")
    val feats = featuresOf(col(textCol), wordNgrams)
    val logit = GraftShims.toColumn(
      LinearLogit(GraftShims.toExpression(feats), weights, bias))
    df.filter(logit > 0)
  }
}
