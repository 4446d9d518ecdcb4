package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diffing of two corpus versions — consecutive crawls, monthly
  * dumps — by unique key (canonical URL, doc id) and content: which rows
  * were `added`, `removed`, `changed`, `unchanged`. The audit step that
  * decides what an incremental pipeline reprocesses (pairs with
  * [[Dedup.incrementalDedupVerified]] and [[Lexical.appendToIndex]]: only
  * `added`/`changed` rows need signatures or postings).
  *
  * One full-outer shuffle join on the key — the minimum for a diff; with
  * both snapshots written bucketed by the key, the exchange disappears
  * entirely (the co-located fact-fact join PlanShapeSpec pins for
  * bucketed tables). Pass a content HASH column instead of raw text when
  * diffing 100 TB snapshots: the join then carries 8-byte fingerprints,
  * not documents.
  */
object Diff {

  /** (keyCol, status) for every key present in either snapshot. Content
    * equality is null-safe (`<=>`); a key present with null content on
    * both sides is `unchanged`.
    */
  def corpusDiff(old: DataFrame, cur: DataFrame, keyCol: String,
      contentCol: String): DataFrame = {
    val o = old.select(col(keyCol).as("__k"), col(contentCol).as("__oc"))
      .withColumn("__op", lit(1))
    val c = cur.select(col(keyCol).as("__k"), col(contentCol).as("__cc"))
      .withColumn("__cp", lit(1))
    o.join(c, Seq("__k"), "full_outer")
      .select(col("__k").as(keyCol),
        when(col("__op").isNull, "added")
          .when(col("__cp").isNull, "removed")
          .when(col("__oc") <=> col("__cc"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The diff rolled up to one row per status — the dashboard number. */
  def diffSummary(old: DataFrame, cur: DataFrame, keyCol: String,
      contentCol: String): DataFrame =
    corpusDiff(old, cur, keyCol, contentCol)
      .groupBy("status").agg(count(lit(1)).as("cnt"))
}
