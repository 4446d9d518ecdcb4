package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: find (and drop) documents whose text contains
  * any benchmark phrase as a contiguous run of normalized tokens — the
  * standard n-gram-overlap gate a training-data pipeline runs against its
  * eval sets before training.
  *
  * Scale contract: the corpus side is map-only up to one distinct — each
  * document explodes to its (id, token-n-gram hash) pairs, phrase-length by
  * phrase-length, and candidates are matched with a BROADCAST left-semi
  * join against the hashed benchmark n-grams (the benchmark set is small by
  * definition: thousands of eval rows vs a 100 TB corpus). Only matching
  * doc ids reach the final distinct; no document text ever crosses a
  * shuffle. False-positive rate is the 64-bit hash collision rate —
  * negligible, and decontamination tolerates dropping an extra doc.
  */
object Decontaminate {

  /** Canonical text normalization shared by corpus and benchmark sides
    * (see [[TextFunctions.normalizeText]] for the oracle-equivalent SQL).
    */
  def normalize(text: Column): Column = TextFunctions.normalizeText(text)

  def normalizePhrase(p: String): String =
    p.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  /** Distinct ids of documents containing at least one of `phrases`
    * (token-boundary exact match after [[normalize]]). Output: (idCol).
    *
    * ONE corpus scan regardless of how many distinct phrase lengths the
    * benchmark set has: the document is normalized and tokenized once and
    * every needed k-gram length is cut from that one token array
    * (shinglesMulti), hashed, and semi-joined against the union of all
    * phrase hashes — grams of different lengths are different strings, so
    * cross-length matches are exactly the (already accepted) 64-bit
    * collision rate. A per-length loop would rescan and re-tokenize the
    * 100 TB side once per length.
    */
  def flagged(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val norm = phrases.map(normalizePhrase).filter(_.nonEmpty).distinct
    require(norm.nonEmpty, "decontaminate: no non-empty phrases")
    val lens = norm.map(_.split(' ').length).distinct.sorted
    val bench = broadcast(
      norm.toDF("__phrase").select(xxhash64(col("__phrase")).as("__ph")))
    df.select(col(idCol),
        explode(TextFunctions.shinglesMulti(normalize(col(textCol)), lens)).as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("__gh"))
      .join(bench, col("__gh") === col("__ph"), "left_semi")
      .select(idCol)
      .distinct()
  }

  /** Corpus with every contaminated document removed (anti-join on id). */
  def clean(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val bad = flagged(df, idCol, textCol, phrases)
      .withColumnRenamed(idCol, "__contaminated")
    df.join(bad, col(idCol) === col("__contaminated"), "left_anti")
  }
}
