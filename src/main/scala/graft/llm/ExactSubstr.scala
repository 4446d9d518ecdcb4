package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact-substring deduplication at ARBITRARY alignment (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499): flag every k-token window that repeats anywhere in
  * the corpus and keep only its globally-first occurrence. The paper builds
  * a corpus-wide suffix array; the Spark-native shape is the rolling-window
  * self-group — every token position emits its k-gram, duplicates meet in
  * ONE keyed aggregation — which finds the same ≥k-token repeats (a
  * duplicated substring of length L ≥ k is exactly a run of L−k+1 flagged
  * windows; merged intervals recover it).
  *
  * Complements the other dedup family members: [[Dedup.tokenChunks]] span
  * dedup only sees repeats aligned to fixed chunk boundaries,
  * [[Dedup.cdcChunks]] realigns on content but still samples boundaries;
  * this one is position-exhaustive — any repeated k-run is caught no matter
  * how the surrounding text shifts.
  *
  * Scale shape (the 100 TB contract):
  *  - window emission is map-only (posexplode over one tokenize pass);
  *  - the ONLY corpus-keyed shuffle is on the fixed-width window hash: the
  *    first-occurrence aggregate is map-side combined (partial_min /
  *    partial_count collapse each partition's occurrences before the
  *    exchange), and the flag join REUSES the same exchange
  *    (ReusedExchange — pinned in PlanShapeSpec) rather than re-shuffling
  *    the window stream;
  *  - flagged rows carry only (id, pos) scalars; join fan-out equals the
  *    true number of duplicated occurrences — the answer's own size;
  *  - per-doc interval union is one doc-keyed aggregation whose state is
  *    bounded by the document's own length, the same stance as
  *    [[Dedup.dedupSpans]]'s reassembly;
  *  - driver state: none.
  */
object ExactSubstr {

  /** Every k-token window of every document: (idCol, pos, __h) with `pos`
    * 0-based and `__h` the window hash. Map-only; documents shorter than k
    * tokens emit nothing (nothing can repeat). `hash` defaults to the
    * fixed-width `xxhash64` long (the production key); pass `md5` to make
    * the key an external SQL engine can recompute verbatim — the two keys
    * flag identical sets short of a 64-bit collision (ExactSubstrSpec
    * asserts the equality on real corpora).
    */
  def windows(df: DataFrame, idCol: String, textCol: String, k: Int,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    require(k >= 1, s"ExactSubstr.windows: k must be positive: $k")
    df.select(col(idCol),
        posexplode(TextFunctions.shingles(col(textCol), k)).as(Seq("pos", "__g")))
      .select(col(idCol), col("pos"), hash(col("__g")).as("__h"))
  }

  /** Occurrences that duplicate an EARLIER window: (idCol, pos) for every
    * window whose (id, pos) is not the minimum over its hash group. The
    * keeper is the globally-first occurrence under (id, pos) ordering —
    * deterministic and restatable by a SQL oracle.
    */
  def flaggedWindows(df: DataFrame, idCol: String, textCol: String, k: Int,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    // explicit hash repartition BEFORE the aggregate: the first-occurrence
    // agg and the flag join both consume this one exchange (ReusedExchange)
    // — without it each side builds its own shuffle of the full window
    // stream and the tokenize+shingle scan runs twice. The null-id filter
    // sits BELOW the shared exchange on purpose: downstream joins infer
    // IsNotNull(id) on the probe side only, and an inferred filter in one
    // consumer's subtree but not the other's breaks the subtree equality
    // ReuseExchange needs — stating it once here keeps both sides identical
    val w = windows(df, idCol, textCol, k, hash)
      .filter(col(idCol).isNotNull)
      .repartition(col("__h"))
    val firsts = w.groupBy("__h")
      .agg(min(struct(col(idCol), col("pos"))).as("__first"),
        count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= 2)
    w.join(firsts, "__h")
      .filter(struct(col(idCol), col("pos")) =!= col("__first"))
      .select(col(idCol), col("pos"))
  }

  /** Token-count of the interval union `∪ [p, p+k)` over a SORTED position
    * array: consecutive gaps clipped at k, plus k for the last interval.
    * `sequence(1, n-1)` would run DESCENDING for n = 1 (Spark generates
    * start→stop either direction), hence the explicit single-interval case.
    */
  private def unionLength(ps: Column, k: Int): Column =
    when(size(ps) === 0, lit(0L))
      .when(size(ps) === 1, lit(k.toLong))
      .otherwise(aggregate(
        transform(sequence(lit(1), size(ps) - 1),
          i => least(element_at(ps, i + 1) - element_at(ps, i), lit(k))),
        lit(0L), (acc, x) => acc + x) + k)

  /** Per-document integer sufficient statistics of the dedup decision:
    * (idCol, n_windows, n_dup_windows, n_tokens_removed) where
    * `n_tokens_removed` is the interval-union token count of the flagged
    * windows — exact integers an external SQL engine recomputes verbatim
    * (the oracle strategy of [[Dsir.importanceStats]]). Every input
    * document appears, zeros when nothing is flagged.
    */
  def dedupStats(df: DataFrame, idCol: String, textCol: String, k: Int,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    val perDoc = flaggedWindows(df, idCol, textCol, k, hash)
      .groupBy(idCol).agg(sort_array(collect_list(col("pos"))).as("__ps"))
    df.select(col(idCol),
        greatest(size(TextFunctions.tokens(col(textCol))) - (k - 1), lit(0))
          .cast("long").as("n_windows"))
      .join(perDoc, Seq(idCol), "left")
      // size(null) is -1 with ANSI off — branch on the null, don't coalesce
      .select(col(idCol), col("n_windows"),
        when(col("__ps").isNull, lit(0L))
          .otherwise(size(col("__ps")).cast("long")).as("n_dup_windows"),
        when(col("__ps").isNull, lit(0L))
          .otherwise(unionLength(col("__ps"), k)).as("n_tokens_removed"))
  }

  /** The cleaned corpus: every flagged window's tokens removed, first
    * occurrences kept verbatim. Returns (idCol, text) with `text`
    * re-joined from the surviving tokens; untouched documents pass through
    * token-normalized (single-space joined), matching [[Dedup.dedupSpans]]'s
    * contract. The kept/dropped decision is a map-side HOF over the token
    * array and the doc's own flagged positions — no further shuffle beyond
    * [[dedupStats]]'s two.
    */
  def removeDuplicateWindows(df: DataFrame, idCol: String, textCol: String,
      k: Int, hash: Column => Column = xxhash64(_)): DataFrame = {
    val perDoc = flaggedWindows(df, idCol, textCol, k, hash)
      .groupBy(idCol).agg(sort_array(collect_list(col("pos"))).as("__ps"))
    df.join(perDoc, Seq(idCol), "left")
      .select(col(idCol), array_join(
        filter(TextFunctions.tokens(col(textCol)),
          (tok, i) => !exists(coalesce(col("__ps"), array().cast("array<int>")),
            p => p <= i && i < p + k)),
        " ").as("text"))
  }
}
