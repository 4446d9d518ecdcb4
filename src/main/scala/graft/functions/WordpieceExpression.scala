package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `WordpieceEncodeWords(words, vocab)` — greedy longest-match-first
  * WordPiece segmentation (the BERT tokenizer's word splitter, Wu et al.
  * 2016) of each word in an `array<string>` column, as ONE native
  * expression whose vocabulary is a codegen reference object.
  *
  * Same design argument as [[BpeEncodeWords]] (SURVEY §7.2 order): a
  * 30k-piece production vocabulary must be per-row DATA, not plan
  * structure — one expression node, one hash set shipped per executor,
  * and the per-word loop stays inside whole-stage codegen.
  *
  * Vocabulary convention is BERT's: a piece starting a word is its
  * surface form; a continuation piece is prefixed `##`. Per word the
  * matcher takes the LONGEST vocab piece matching at the cursor (trying
  * `min(remaining, maxPieceChars)` down to 1) and advances; if no piece
  * matches at any cursor — or the word exceeds `maxWordLen` code points —
  * the WHOLE word becomes `unk` (BERT semantics: unsplittable words are
  * not partially emitted). Output: one string per input word, its pieces
  * joined by single spaces (`"customer"` → `"cust ##omer"`).
  */
case class WordpieceEncodeWords(child: Expression, vocab: Seq[String],
    unk: String = "[UNK]", maxWordLen: Int = 32) extends UnaryExpression {

  override def prettyName: String = "wordpiece_encode_words"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  @transient private lazy val pieces: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  /** Longest piece surface length (continuations measured without the
    * `##`), bounding the per-cursor backoff scan.
    */
  @transient private lazy val maxPieceChars: Int =
    if (vocab.isEmpty) 1
    else vocab.iterator
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max.max(1)

  def encodeArray(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      out(i) = if (input.isNullAt(i)) null else encodeOne(input.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  private def encodeOne(word: String): UTF8String = {
    if (word.isEmpty) return UTF8String.fromString("")
    if (word.codePointCount(0, word.length) > maxWordLen)
      return UTF8String.fromString(unk)
    val sb = new java.lang.StringBuilder(word.length * 2)
    var start = 0
    var first = true
    while (start < word.length) {
      // longest-match backoff: end from start+maxPieceChars chars down to 1
      var end = word.offsetByCodePoints(start,
        math.min(maxPieceChars, word.codePointCount(start, word.length)))
      var hit: String = null
      while (hit == null && end > start) {
        val sub = word.substring(start, end)
        val cand = if (first) sub else "##" + sub
        if (pieces.contains(cand)) hit = cand
        else end = word.offsetByCodePoints(end, -1)
      }
      if (hit == null) return UTF8String.fromString(unk)
      if (!first) sb.append(' ')
      sb.append(hit)
      start = end
      first = false
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    encodeArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpEncode", this,
      classOf[WordpieceEncodeWords].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeArray($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `UnigramSegmentCost(words, vocab)` — Viterbi (min-cost) segmentation
  * of each word under a unigram piece model with integer costs (scaled
  * −log probabilities, the SentencePiece decode objective), as ONE native
  * expression. Completes the tokenizer family: BPE segments by merge
  * rank, WordPiece greedily, unigram-LM OPTIMALLY.
  *
  * Per word the DP runs over end positions with a lexicographic
  * `(total cost, piece count)` objective packed into one long —
  * `combined = cost · 64 + pieces` (piece count < 64 enforced via
  * `maxWordLen`) — so "cheapest, then fewest pieces" is a plain integer
  * `min`, deterministic and restatable as SQL `min()`. An unreachable (or
  * over-long) word costs `unkCost` as ONE piece. Output: one combined
  * long per input word; unpack with `div 64` / `% 64`.
  */
case class UnigramSegmentCost(child: Expression, vocab: Seq[(String, Int)],
    unkCost: Int = 1000, maxWordLen: Int = 32) extends UnaryExpression {
  require(maxWordLen < 64, s"maxWordLen must stay below 64 (piece-count packing): $maxWordLen")
  // the output packs cost*64 + nPieces (unpacked with shiftright / &63),
  // which only round-trips for non-negative costs
  require(unkCost >= 0, s"unkCost must be non-negative (cost*64 packing): $unkCost")
  vocab.foreach { case (p, cst) =>
    require(cst >= 0, s"vocab cost must be non-negative (cost*64 packing): '$p' -> $cst")
  }

  override def prettyName: String = "unigram_segment_cost"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  @transient private lazy val cost: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    for ((p, c) <- vocab) if (!m.containsKey(p)) m.put(p, c)
    m
  }

  @transient private lazy val maxPieceChars: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_._1.length).max.max(1)

  def costArray(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (input.isNullAt(i)) null
               else java.lang.Long.valueOf(costOne(input.getUTF8String(i).toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val Unreachable = java.lang.Long.MAX_VALUE

  private def costOne(word: String): Long = {
    val unk = unkCost.toLong * 64 + 1
    if (word.isEmpty) return 0L
    // code-point gate, matching WordpieceEncodeWords — the two family
    // members must agree on which words are over-long
    if (word.codePointCount(0, word.length) > maxWordLen) return unk
    val len = word.length
    val best = new Array[Long](len + 1)
    java.util.Arrays.fill(best, Unreachable)
    best(0) = 0L
    var j = 1
    while (j <= len) {
      var l = 1
      val lmax = math.min(j, maxPieceChars)
      while (l <= lmax) {
        if (best(j - l) != Unreachable) {
          val c = cost.get(word.substring(j - l, j))
          if (c != null) {
            val cand = best(j - l) + c.longValue() * 64 + 1
            if (cand < best(j)) best(j) = cand
          }
        }
        l += 1
      }
      j += 1
    }
    if (best(len) == Unreachable) unk else best(len)
  }

  override protected def nullSafeEval(input: Any): Any =
    costArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSeg", this,
      classOf[UnigramSegmentCost].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.costArray($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `UnigramViterbiPieces(words, vocab)` — the PIECES of each word's
  * min-cost unigram-LM segmentation (the argmin [[UnigramSegmentCost]]
  * only scores), flattened across the word array, for the Viterbi-EM
  * E-step of unigram vocabulary TRAINING: explode + one bounded
  * aggregation turns this column into per-piece use counts.
  *
  * Objective and DP are [[UnigramSegmentCost]]'s exactly (packed
  * `cost·64 + 1` per piece — lexicographic (cost, piece-count) under one
  * integer `min`). The backtrace is deterministic and RESTATABLE: from
  * end position j, the chosen piece length is the SMALLEST l with
  * `best(j−l) + cost(word[j−l..j))·64 + 1 = best(j)` — in SQL, a
  * `min(v.l)` scalar subquery over the inlined vocab with that equality
  * as the predicate, so an external engine replays the exact multiset of
  * pieces. Words that are empty, longer than `maxWordLen` code points,
  * or unsegmentable contribute NO pieces (training skips them; the
  * trainer seeds every corpus character, so unreachable words cannot
  * occur there).
  *
  * Reference behavior anchor: SentencePiece's unigram trainer
  * (Kudo 2018) alternates expected-count collection with pruning; this
  * expression is the count-collection step under hard (Viterbi)
  * assignments, quantized to integers so cross-engine replay is exact.
  */
case class UnigramViterbiPieces(child: Expression, vocab: Seq[(String, Int)],
    maxWordLen: Int = 10) extends UnaryExpression {
  require(maxWordLen >= 1 && maxWordLen < 64,
    s"maxWordLen must be in [1, 64) (piece-count packing): $maxWordLen")
  vocab.foreach { case (p, c) =>
    require(p.nonEmpty, "UnigramViterbiPieces: empty vocab piece")
    require(c >= 0, s"vocab cost must be non-negative (cost*64 packing): '$p' -> $c")
  }

  override def prettyName: String = "unigram_viterbi_pieces"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  @transient private lazy val cost: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    for ((p, c) <- vocab) if (!m.containsKey(p)) m.put(p, c)
    m
  }

  @transient private lazy val maxPieceChars: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_._1.length).max.max(1)

  private val Unreachable = java.lang.Long.MAX_VALUE

  def piecesOf(input: ArrayData): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val n = input.numElements()
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i))
        appendPieces(input.getUTF8String(i).toString, out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def appendPieces(word: String,
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    if (word.isEmpty) return
    if (word.codePointCount(0, word.length) > maxWordLen) return
    val len = word.length
    val best = new Array[Long](len + 1)
    java.util.Arrays.fill(best, Unreachable)
    best(0) = 0L
    var j = 1
    while (j <= len) {
      var l = 1
      val lmax = math.min(j, maxPieceChars)
      while (l <= lmax) {
        if (best(j - l) != Unreachable) {
          val c = cost.get(word.substring(j - l, j))
          if (c != null) {
            val cand = best(j - l) + c.longValue() * 64 + 1
            if (cand < best(j)) best(j) = cand
          }
        }
        l += 1
      }
      j += 1
    }
    if (best(len) == Unreachable) return
    // smallest-l backtrace: at each end position the FIRST length whose
    // predecessor-plus-piece cost equals the DP minimum is the parent —
    // the SQL restatement's min(v.l) under the same equality
    val pieces = new scala.collection.mutable.ArrayBuffer[String]()
    j = len
    while (j > 0) {
      var l = 1
      var chosen = 0
      val lmax = math.min(j, maxPieceChars)
      while (l <= lmax && chosen == 0) {
        if (best(j - l) != Unreachable) {
          val c = cost.get(word.substring(j - l, j))
          if (c != null && best(j - l) + c.longValue() * 64 + 1 == best(j))
            chosen = l
        }
        l += 1
      }
      // chosen > 0 always: best(j) < Unreachable was produced by some l
      pieces += word.substring(j - chosen, j)
      j -= chosen
    }
    var k = pieces.length - 1
    while (k >= 0) {
      out += UTF8String.fromString(pieces(k))
      k -= 1
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    piecesOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVit", this,
      classOf[UnigramViterbiPieces].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.piecesOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
