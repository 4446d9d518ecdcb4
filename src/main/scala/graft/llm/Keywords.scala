package graft.llm

import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-document keyword extraction — the classic "frequent in the document,
  * not ubiquitous in the corpus" tf-idf shape, kept in integer sufficient
  * statistics (term frequency + a document-frequency cutoff) so the result
  * is reproducible bit-for-bit by an external SQL engine, with a total
  * (tf DESC, term ASC) order for deterministic ranks.
  *
  * Scale posture: term frequencies aggregate on the (doc, term) composite
  * key — the doc id component spreads even Zipf-head terms uniformly, so
  * the exchange cannot hot-spot on "the". Document frequencies reduce the
  * already-distinct (doc, term) pairs with map-side combine; only the
  * UBIQUITOUS terms (df above the cutoff — a handful of stopword-like
  * strings by construction) are broadcast back, never the full vocabulary.
  * The final per-doc ranking is a bounded CollectTopK aggregate, k rows per
  * (doc, partition), not a window over every pair.
  */
object Keywords {

  /** Top-`k` terms per document by (tf DESC, term ASC), excluding terms
    * appearing in more than `maxDocFrac` of the documents. Output:
    * (idCol, rank, term, tf); documents whose every term is ubiquitous
    * (or with no tokens) are absent.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
      maxDocFrac: Double = 0.5): DataFrame = {
    require(k > 0 && maxDocFrac > 0, s"bad config: k=$k maxDocFrac=$maxDocFrac")
    // ONE explode + (doc, term) aggregation; everything else derives from
    // it. Deriving df/nDocs from separate explode chains re-scanned and
    // re-exploded the corpus twice more (measured: the tf exchange reuses
    // across the dfreq rollup and the anti-join, and the doc count needs
    // no explode at all — a size() scan suffices)
    val tf = df
      .select(col(idCol).as("__id"),
        explode(TextFunctions.tokens(col(textCol))).as("__term"))
      .groupBy("__id", "__term").agg(count(lit(1)).as("tf"))
    // distinct doc ids with ≥1 token == distinct __id in tf, without
    // touching tf (count_distinct, not a row count: duplicate or null ids
    // must not inflate the denominator the blocklist fraction divides by)
    val nDocs = broadcast(
      df.filter(size(TextFunctions.tokens(col(textCol))) > 0)
        .agg(count_distinct(col(idCol)).as("__n")))
    val blocked = broadcast(
      tf.groupBy("__term").agg(count(lit(1)).as("__df"))
        .crossJoin(nDocs)
        .filter(col("__df") > lit(maxDocFrac) * col("__n"))
        .select("__term"))
    val kept = tf.join(blocked, Seq("__term"), "left_anti")
    val key = GraftShims.toExpression(
      struct((-col("tf")).as("ntf"), col("__term").as("t")))
    val topk = GraftShims.toColumn(new CollectTopK(key, k, true).toAggregateExpression())
    kept.groupBy("__id").agg(topk.as("__topk"))
      .select(col("__id"), posexplode(col("__topk")))
      .select(col("__id").as(idCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.t").as("term"),
        (-col("col.ntf")).as("tf"))
  }
}
