package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. 2020, arXiv:1911.00359):
  * score every document with a cheap language-model signal, then split each
  * language into equal head/middle/tail thirds by score rank — the classic
  * "keep the head, maybe the middle, drop the tail" curation gate.
  *
  * The ranking is exact ntile semantics (what a SQL oracle states as
  * `ntile(k) OVER (PARTITION BY stratum ORDER BY score DESC, tie)`), but
  * computed WITHOUT a per-stratum global window — one language holding half
  * the corpus must not funnel through one partition. Same two-phase trick
  * as [[Mix.budgetSelect]] / [[Mix.deterministicShuffle]]:
  *
  *   1. one map-side-combined count per (stratum, score) — bounded driver
  *      state because callers quantize the score (`round(_, 4)`), enforced
  *      fail-fast like budgetSelect's codebook cap;
  *   2. the driver prefix-sums those counts into per-group rank offsets;
  *      each row's global rank is offset + its row_number inside a window
  *      partitioned by (stratum, score) — parallel tie groups, never a
  *      stratum-wide sort — and the ntile bucket is a closed-form
  *      expression of (rank, stratum size).
  */
object Perplexity {

  /** Append an ntile-style `bucket` column (1..k, ranked by `score`
    * DESCENDING then `tie` ascending, within each `strata` group). Rows
    * with a null score are dropped (nothing to rank); a null stratum is a
    * loud row-side error. Bucket sizes follow SQL ntile: `n % k` leading
    * buckets get the extra row.
    */
  def ntileBuckets(df: DataFrame, score: Column, strata: Column, tie: Column,
      k: Int = 3, maxGroups: Long = 1L << 17): DataFrame = {
    require(k >= 1, s"ntileBuckets: k must be positive: $k")
    val out = df.columns
    for (c <- Seq("__strat", "__score", "__off", "__n", "__rank", "__s2", "__v2"))
      require(!out.contains(c),
        s"ntileBuckets: input column '$c' collides with an internal name")
    val sNorm = strata.cast("string")
    val scored = df
      .withColumn("__strat", when(sNorm.isNotNull, sNorm).otherwise(
        raise_error(lit("ntileBuckets: stratum is null for some row — " +
          "coalesce the strata expression to a sentinel first"))))
      .withColumn("__score", score.cast("double"))
    // job 1: per-(stratum, score) counts. orderBy+limit = TakeOrdered, so a
    // pathological unquantized score fails fast instead of OOMing the
    // driver (same contract as budgetSelect's distinct-score cap)
    val groups = scored.groupBy("__strat", "__score").count()
      .orderBy("__strat", "__score").limit((maxGroups + 1).toInt).collect()
    require(groups.length <= maxGroups,
      s"ntileBuckets: more than $maxGroups (stratum, score) groups — " +
        "quantize the score (e.g. round(s, 4)) so driver state stays bounded")
    // driver: per stratum, walk scores DESCENDING → rank offset per group
    val offsets = groups.filterNot(_.isNullAt(1))
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (strat, rows) =>
        val sorted = rows.sortBy(-_._2)
        val n = sorted.map(_._3).sum
        sorted.zip(sorted.scanLeft(0L)(_ + _._3))
          .map { case ((_, sc, _), off) => (strat, sc, off, n) }
      }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__s2", "__v2", "__off", "__n")
    // job 2: per-(stratum, score) windows (parallel tie groups) + offset;
    // null-score rows drop out on the inner join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__strat", "__score").orderBy(tie)
    val ranked = scored
      .join(broadcast(offDf),
        col("__strat") === col("__s2") && col("__score") === col("__v2"))
      .withColumn("__rank", col("__off") + row_number().over(w))
    // ntile(k) closed form: q = n/k, rem = n%k; the first rem buckets hold
    // q+1 rows. q=0 ⇒ rem=n ⇒ the first branch always fires (no div-by-0).
    val q = floor(col("__n") / k).cast("long")
    val rem = col("__n") - q * k
    val r = col("__rank")
    val bucket = when(r <= rem * (q + lit(1L)),
        (r + q) / (q + lit(1L)))              // ceil(r / (q+1))
      .otherwise(rem + (r - rem * (q + lit(1L)) + q - 1) / q) // rem + ceil(r'/q)
    ranked.withColumn("bucket", floor(bucket).cast("int"))
      .select(out.map(col) :+ col("bucket"): _*)
  }

  /** CCNet head/middle/tail: rank every document inside its stratum
    * (language, typically) by average corpus token frequency — common-token
    * documents read as low-perplexity "head" — and label equal thirds.
    * Output: (idCol, stratum, n_tokens, sum_freq, ppl_bucket).
    *
    * The LM signal is [[Unigram.score]]'s integer sufficient statistics
    * (corpus vocabulary built in the same call, one bounded shuffle +
    * broadcast), so the whole operator stays oracle-exact; a real CCNet
    * deployment would swap the score expression for a trained KenLM and
    * keep the bucketing machinery unchanged. Documents with no tokens have
    * nothing to score and are absent, like Unigram.score.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      strata: Column, maxVocab: Int = 100000, k: Int = 3): DataFrame = {
    val stats = Unigram.score(df, idCol, textCol, maxVocab)
    val scored = df.select(col(idCol), strata.as("stratum"))
      .join(stats, Seq(idCol))
    val labeled = ntileBuckets(scored,
      round(col("sum_freq").cast("double") / col("n_tokens"), 4),
      col("stratum"), col(idCol), k)
    val label =
      if (k == 3)
        when(col("bucket") === 1, "head")
          .when(col("bucket") === 2, "middle").otherwise("tail")
      else col("bucket").cast("string")
    labeled.select(col(idCol), col("stratum"), col("n_tokens"),
      col("sum_freq"), label.as("ppl_bucket"))
  }
}
