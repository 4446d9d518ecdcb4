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
