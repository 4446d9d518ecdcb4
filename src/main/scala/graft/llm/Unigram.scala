package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model corpus scoring — the classic cheap "perplexity"
  * quality signal: documents made of rare tokens score differently from
  * documents made of common ones. Two passes:
  *
  *  1. [[frequencies]]: corpus unigram counts, one map-side-combined
  *     shuffle on the token, truncated to the `maxVocab` most frequent
  *     tokens (bounded top-k, no global sort of the long tail).
  *  2. [[score]]: per-document sufficient statistics via a BROADCAST join
  *     of exploded tokens against the vocab — broadcasting the (bounded)
  *     vocabulary instead of shuffling tokens sidesteps the Zipf skew that
  *     would melt a shuffle join on the token key ("the" alone would be one
  *     partition), then one aggregation keyed by doc id.
  *
  * Outputs exact integer statistics (token count, sum of corpus
  * frequencies) rather than a floating log-prob: -log p derives from them
  * in one expression, and integer sums are reproducible bit-for-bit across
  * engines and row orders, so the operator stays oracle-checkable.
  */
object Unigram {

  /** The scoring unit: whitespace tokens for `ngram` = 1, word n-grams
    * (space-joined shingles) above — a bigram/trigram LM uses the same
    * two-pass plan, only the unit changes.
    */
  private def grams(textCol: Column, ngram: Int): Column =
    if (ngram == 1) TextFunctions.tokens(textCol)
    else TextFunctions.shingles(textCol, ngram)

  /** (token, freq) for the `maxVocab` most frequent scoring units; ties
    * broken by token text for determinism.
    */
  def frequencies(df: DataFrame, textCol: String, maxVocab: Int = 100000,
      ngram: Int = 1): DataFrame =
    df.select(explode(grams(col(textCol), ngram)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token")).limit(maxVocab)

  /** Per-document (idCol, n_tokens, sum_freq, oov): scoring-unit count,
    * summed corpus frequency of in-vocab units, and out-of-vocab count.
    * Documents with no units are absent (nothing to score — for `ngram`
    * = n that includes every doc shorter than n tokens). Derive e.g.
    * `avg -log p = ln(N) - ln(sum_freq / n_tokens)`-style signals
    * downstream, or filter on `oov`; a bigram score (`ngram` = 2) over a
    * unigram one approximates the classic KenLM-style fluency gate.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      maxVocab: Int = 100000, ngram: Int = 1): DataFrame = {
    val vocab = broadcast(frequencies(df, textCol, maxVocab, ngram))
    df.select(col(idCol), explode(grams(col(textCol), ngram)).as("__tok"))
      .join(vocab, col("__tok") === col("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("freq"), lit(0L))).as("sum_freq"),
        sum(when(col("freq").isNull, 1L).otherwise(0L)).as("oov"))
  }
}
