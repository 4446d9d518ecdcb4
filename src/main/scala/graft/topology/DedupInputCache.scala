package graft.topology

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-slot-per-session registry of the NearDupDedup input cache.
  *
  * The component persists + eagerly materializes its input frame at
  * component-apply time (the r19 fix for AQE broadcast sub-jobs racing to
  * populate the lazy cache and re-running the whole upstream funnel once
  * per consumer). The release hook runs from `Compiled.run()`'s finally —
  * but many consumers never call run(): they compile and read `projected`
  * (the declared-query surface, plan dumps), so each such compile used to
  * leak one MEMORY_AND_DISK cache for the session's lifetime.
  *
  * This registry bounds that to AT MOST ONE live cache per session (the
  * documented one-slot discipline of the ExactSubstr suffix cache):
  * registering a new cache unpersists the previous occupant — by the time
  * a consumer compiles the next topology, the previous projected frame has
  * been consumed or abandoned — and the returned hook releases the slot
  * exactly once, staying idempotent if run() and a later register both
  * fire. unpersist(false) only un-marks cached blocks; a concurrently
  * running plan over the old frame still computes correct results.
  */
private[topology] object DedupInputCache {

  private val slot =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()

  /** Register `df` as the session's one live dedup-input cache, releasing
    * any previous occupant. Returns the release hook for `ctx.onCleanup`.
    */
  def register(spark: SparkSession, df: DataFrame): () => Unit = {
    val prev = slot.put(spark, df)
    if (prev != null && (prev ne df)) prev.unpersist(false)
    () => {
      // release only if still the occupant (a later compile may already
      // have replaced — and unpersisted — this frame)
      if (slot.remove(spark, df)) df.unpersist(false)
    }
  }
}
