package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and weighted mixing — how a training-data
  * pipeline blends sources ("20% crawl, 30% books, 50% code") so the same
  * input rows are selected on every run, on any cluster layout.
  *
  * Selection hashes a caller-supplied deterministic expression (an id, a
  * content digest) into [0, 1e6) and keeps rows under `rate · 1e6` — a
  * map-only filter that pushes toward the scan, needs no shuffle, no RNG
  * state, and composes with partition pruning. Unlike `df.sample`, results
  * are independent of partitioning and stable across retries — at 100 TB,
  * speculative re-execution of a task MUST resample identically.
  */
object Mix {

  private val Buckets = 1000000L

  /** Keep a deterministic `rate` fraction of rows, selected by `hash`. */
  def sampleDeterministic(df: DataFrame, rate: Double, hash: Column): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.filter(pmod(hash, lit(Buckets)) < (rate * Buckets).toLong)
  }

  /** Weighted union of sources: each (frame, rate, hash) is independently
    * down-sampled then unioned by name. Schemas must align.
    */
  def weighted(sources: Seq[(DataFrame, Double, Column)]): DataFrame = {
    require(sources.nonEmpty, "mix: at least one source")
    sources.map { case (df, r, h) => sampleDeterministic(df, r, h) }
      .reduce(_ unionByName _)
  }

  /** Stratified deterministic sample: keep a per-stratum fraction of rows
    * ("50% of en, 10% of zh, …"), selected by `hash` as in
    * [[sampleDeterministic]]. Strata not in `rates` keep `defaultRate`.
    *
    * Still a map-only filter — the per-stratum threshold is a CASE
    * expression over the stratum column, so there is no groupBy, no
    * per-stratum pass, and no skew sensitivity: a 90%-English corpus costs
    * the same scan as a uniform one. (The alternative,
    * `df.stat.sampleBy`, draws per-row randoms — unstable across retries
    * and not pushdown-friendly.)
    */
  def stratified(df: DataFrame, strata: Column, rates: Map[String, Double],
      hash: Column, defaultRate: Double = 0.0): DataFrame = {
    (defaultRate +: rates.values.toSeq).foreach(r =>
      require(r >= 0 && r <= 1, s"rate must be in [0,1]: $r"))
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toLong)) {
      case (acc, (k, r)) => when(strata === k, lit((r * Buckets).toLong)).otherwise(acc)
    }
    df.filter(pmod(hash, lit(Buckets)) < threshold)
  }
}
