package graft.llm

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, WordpieceEncodeWords}

/** WordPiece (BERT-style) subword segmentation — the greedy
  * longest-match-first counterpart to the merge-driven [[Bpe]] encoder,
  * completing the tokenizer family: BPE trains and encodes by merge
  * ranks, WordPiece encodes against a fixed piece vocabulary with `##`
  * continuations and whole-word `[UNK]` fallback.
  *
  * Map-only at any scale: the vocabulary rides the native
  * [[WordpieceEncodeWords]] expression as one per-executor hash set
  * (never a join, never plan structure), so encoding fuses into the scan
  * stage like BPE's native path.
  */
object Wordpiece {

  /** Encode to a flat piece stream: each word's pieces joined by spaces,
    * words joined by spaces (piece boundaries stay visible through the
    * `##` prefixes). Output: (idCol, `wp_pieces`). Blank docs drop.
    */
  def encode(df: DataFrame, idCol: String, textCol: String, vocab: Seq[String],
      unk: String = "[UNK]", maxWordLen: Int = 32): DataFrame =
    df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol),
        array_join(encodeWordsCol(TextFunctions.tokens(col(textCol)), vocab, unk,
          maxWordLen), " ").as("wp_pieces"))

  /** The raw per-word encoding column (array<string>, one entry per input
    * word) for callers composing their own shapes.
    */
  def encodeWordsCol(words: Column, vocab: Seq[String], unk: String = "[UNK]",
      maxWordLen: Int = 32): Column =
    GraftShims.toColumn(WordpieceEncodeWords(
      GraftShims.toExpression(words), vocab, unk, maxWordLen))
}

/** Unigram-LM (SentencePiece-style) OPTIMAL segmentation under integer
  * piece costs (scaled −log probabilities): per-word Viterbi DP inside
  * the native [[graft.functions.UnigramSegmentCost]] expression, doc
  * statistics assembled with map-only array folds — zero shuffles, zero
  * joins, the whole operator lives in the scan stage.
  */
object UnigramSegment {

  /** Per-doc integer statistics of the min-cost segmentation:
    * (idCol, n_words, total_cost, total_pieces, n_unk). `unkCost` is
    * charged per unreachable (or over-`maxWordLen`) word as one piece;
    * choose it so no single vocab piece costs exactly `unkCost` (the unk
    * counter keys on the exact combined value). Blank docs drop.
    */
  def segmentStats(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Int)], unkCost: Int = 1000,
      maxWordLen: Int = 32): DataFrame = {
    val comb = GraftShims.toColumn(graft.functions.UnigramSegmentCost(
      GraftShims.toExpression(TextFunctions.tokens(col(textCol))),
      vocab, unkCost, maxWordLen))
    val unkComb = unkCost.toLong * 64 + 1
    df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), comb.as("__c"))
      .select(col(idCol),
        size(col("__c")).cast("long").as("n_words"),
        aggregate(col("__c"), lit(0L), (a, x) => a + shiftright(x, 6))
          .as("total_cost"),
        aggregate(col("__c"), lit(0L), (a, x) => a + x.bitwiseAND(lit(63L)))
          .as("total_pieces"),
        size(filter(col("__c"), x => x === lit(unkComb))).cast("long").as("n_unk"))
  }
}
