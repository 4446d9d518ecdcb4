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

  /** Full-batch logistic-regression TRAINING for the linear quality
    * classifier — the in-engine path from labeled examples ("wikipedia
    * vs raw crawl") to the weight table [[qualityFilter]] broadcasts.
    * Model = exactly the scoring model (mean-pooled bag-of-features
    * logit), so trained weights and the filter can never disagree.
    *
    * Scale shape, per iteration: ONE map-only residual pass over the
    * cached prepared frame + one exploded feature aggregation whose
    * map-side partials are bounded by the vocabulary (top-`vocabSize`
    * features by frequency, fixed before iterating — the fastText bucket
    * bound); driver state is O(vocabSize) weights. Gradients aggregate as
    * NANO-QUANTIZED integers (each doc's contribution
    * `round(r_d/n_d · 1e9)` summed as exact decimals), so training is
    * bit-DETERMINISTIC across partitionings, retries, and cluster layouts
    * — float-sum reassociation never makes two runs disagree. Labels:
    * `labelCol` cast to double, 1.0 = keep-class.
    *
    * Returns (weights over the vocabulary, bias, per-iteration mean
    * log-loss). The loss history is reporting only (rounded, not part of
    * the deterministic state).
    */
  def trainLogistic(df: DataFrame, textCol: String, labelCol: String,
      iters: Int = 20, lr: Double = 1.0, vocabSize: Int = 4096,
      wordNgrams: Int = 1, l2: Double = 0.0)
      : (Map[String, Double], Double, Seq[Double]) = {
    require(iters >= 1 && lr > 0 && vocabSize >= 1 && wordNgrams >= 1 && l2 >= 0,
      s"trainLogistic: bad hyperparameters (iters=$iters lr=$lr " +
        s"vocabSize=$vocabSize wordNgrams=$wordNgrams l2=$l2)")
    import org.apache.spark.storage.StorageLevel
    val spark = df.sparkSession
    import spark.implicits._
    val prep = prepared(df, textCol, labelCol, wordNgrams)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // fixed vocabulary: top-K features by occurrence, ties by feature
      // string — deterministic, one bounded-top-k job
      val vocab = Mix.capPerKey(
        prep.select(explode(col("__f")).as("f")).groupBy("f")
          .agg(count(lit(1)).as("c"))
          .select(col("f"), struct((-col("c")).as("negC"), col("f").as("tie")).as("o")),
        lit(1), col("o"), "f", n = vocabSize)
        .select("f").as[String].collect().sorted
      require(vocab.nonEmpty, "trainLogistic: no features in the corpus")
      val vocabDf = broadcast(vocab.toSeq.toDF("f"))
      var w: Map[String, Double] = vocab.map(_ -> 0.0).toMap
      var bias = 0.0
      val m = prep.count().toDouble
      var losses = Vector.empty[Double]
      for (_ <- 1 to iters) {
        val p = probability(w, bias)
        val scored = residualized(prep, w, bias)
          .withColumn("__loss",
            -(col("__y") * log(greatest(p, lit(1e-12))) +
              (lit(1.0) - col("__y")) * log(greatest(lit(1.0) - p, lit(1e-12)))))
        val head = scored.agg(sum(col("__rq")).as("b"), sum(col("__loss")).as("l"))
          .collect()(0)
        val biasGrad = head.getDecimal(0).doubleValue() / 1e9 / m
        losses :+= head.getDouble(1) / m
        val grads = scored
          .withColumn("__c",
            round(col("__rq").cast("double") / col("__n")).cast("decimal(28,0)"))
          .select(explode(col("__f")).as("f"), col("__c"))
          .join(vocabDf, Seq("f")) // broadcast vocab gate keeps partials bounded
          .groupBy("f").agg(sum(col("__c")).as("g"))
          .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue() / 1e9)
          .toMap
        w = w.map { case (f, wf) =>
          f -> (wf * (1.0 - lr * l2) - lr * grads.getOrElse(f, 0.0) / m)
        }
        bias -= lr * biasGrad
      }
      (w, bias, losses)
    } finally prep.unpersist(false)
  }

  /** `(__y, __f, __n)` projection shared by training and [[logisticGradient]]. */
  private def prepared(df: DataFrame, textCol: String, labelCol: String,
      wordNgrams: Int): DataFrame =
    df.select(col(labelCol).cast("double").as("__y"),
        featuresOf(col(textCol), wordNgrams).as("__f"))
      .filter(size(col("__f")) > 0 && col("__y").isNotNull)
      .withColumn("__n", size(col("__f")).cast("double"))

  private def probability(w: Map[String, Double], bias: Double): Column =
    lit(1.0) / (lit(1.0) + exp(-(lit(bias) + linearScore(col("__f"), w) / col("__n"))))

  /** Adds `__rq`, the nano-quantized residual `round((p − y)·1e9)`. */
  private def residualized(prep: DataFrame, w: Map[String, Double],
      bias: Double): DataFrame =
    prep.withColumn("__rq",
      round((probability(w, bias) - col("__y")) * 1e9).cast("decimal(28,0)"))

  /** One full-batch gradient under FIXED weights — the sufficient
    * statistic each [[trainLogistic]] iteration aggregates, exposed for
    * inspection and for the external oracle (the quantized integer sums
    * are engine-exact; the eigensolve-style division of labor from
    * PCA/BPE training applies: the statistic is oracle-checked, the loop
    * consuming it is spec-pinned). Output: one `(feature, grad)` row per
    * weight-table feature occurring in the corpus, plus a `__bias__` row;
    * grads are UNNORMALIZED sums (divide by the example count for the
    * mean-gradient step).
    */
  def logisticGradient(df: DataFrame, textCol: String, labelCol: String,
      weights: Map[String, Double], bias: Double = 0.0,
      wordNgrams: Int = 1): DataFrame = {
    require(weights.nonEmpty, "Classifier: weights must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val scored = residualized(prepared(df, textCol, labelCol, wordNgrams), weights, bias)
    val wDf = broadcast(weights.keys.toSeq.sorted.toDF("feature"))
    val grads = scored
      .withColumn("__c",
        round(col("__rq").cast("double") / col("__n")).cast("decimal(28,0)"))
      .select(explode(col("__f")).as("feature"), col("__c"))
      .join(wDf, Seq("feature"))
      .groupBy("feature").agg((sum(col("__c")) / 1e9).as("grad"))
    grads.unionByName(scored.agg((sum(col("__rq")) / 1e9).as("grad"))
      .select(lit("__bias__").as("feature"), col("grad")))
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
