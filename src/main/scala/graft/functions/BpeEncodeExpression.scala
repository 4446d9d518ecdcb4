package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `BpeEncodeWords(words, merges)` — byte-pair-encode each word of an
  * `array<string>` column under a fixed merge table, as ONE native
  * expression whose state is the broadcast-referenced table.
  *
  * Why a custom Expression (SURVEY §7.2 preference order): the
  * chained-`replace` encoder (`graft.llm.Bpe.applyMerges`) folds one
  * `replace` node per merge rule into the plan, so a production-sized
  * vocabulary (32 k rules) would build a 32 k-deep expression tree that
  * Catalyst cannot analyze, let alone codegen. Here the rule count moves
  * out of the PLAN and into per-row data: one expression node, a hash map
  * of pair→rank shipped once per executor via the codegen reference
  * object, and the canonical lowest-rank merge loop of the original BPE
  * implementation (Sennrich et al. 2016) evaluated per word. Work per
  * word is O(len · merges-applied) with O(1) hash lookups — independent
  * of table size — and the call stays inside the surrounding
  * whole-stage-codegen stage.
  *
  * Output per word is the same delimiter form as the chained path:
  * Open + symbol + Close per symbol ("that" → ⟨t⟩⟨h⟩⟨a⟩⟨t⟩ pre-merge),
  * delimiter characters stripped from input. On well-ordered tables (every
  * rule's inputs are chars or outputs of earlier rules — the invariant
  * training produces) the result is byte-identical to sequential
  * rank-order replacement; BpePropertySpec checks the equality
  * mechanically on random tables.
  *
  * reference: the semantics mirror the merge loop of baker-era BPE
  * tooling and the published algorithm; no reference code is involved.
  */
case class BpeEncodeWords(child: Expression, merges: Seq[(String, String)],
    open: String, close: String) extends UnaryExpression {

  override def prettyName: String = "bpe_encode_words"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  /** pair → rank; the key joiner is `open`, which cannot occur inside a
    * symbol (delimiter chars are stripped from input).
    */
  @transient private lazy val rank: java.util.HashMap[String, Integer] =
    BpeMerge.buildRank(merges, open)

  /** Encode every word of the array (public: the generated code calls it
    * through the codegen reference object).
    */
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
    val syms = BpeMerge.mergedSymbols(word, merges, rank, open, close)
    val sb = new java.lang.StringBuilder(word.length * 3 + 2)
    sb.append(open)
    var k = 0
    while (k < syms.size()) {
      if (k > 0) sb.append(close).append(open)
      sb.append(syms.get(k))
      k += 1
    }
    sb.append(close)
    UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    encodeArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the merge table rides along as ONE reference object; per row the
    // generated code makes a single call into the loop above, keeping the
    // surrounding stage fused regardless of table size
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncodeWords].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encodeArray($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The canonical BPE merge machinery shared by [[BpeEncodeWords]] and
  * [[BpeEncodeOffsets]]: one implementation of the split-strip-merge loop
  * so the two expressions cannot drift.
  */
private[functions] object BpeMerge {

  def buildRank(merges: Seq[(String, String)],
      open: String): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    for (((a, b), i) <- merges.zipWithIndex)
      if (!m.containsKey(a + open + b)) m.put(a + open + b, i)
    m
  }

  /** Code-point split (delimiter chars stripped, same contract as
    * `Bpe.wrapChars`), then the canonical loop: merge ALL occurrences of
    * the lowest-ranked adjacent pair present, left-to-right
    * non-overlapping, until none remains.
    */
  def mergedSymbols(word: String, merges: Seq[(String, String)],
      rank: java.util.HashMap[String, Integer], open: String,
      close: String): java.util.ArrayList[String] = {
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      val s = word.substring(i, i + cc)
      if (s != open && s != close) syms.add(s)
      i += cc
    }
    var go = syms.size() >= 2
    while (go) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size() - 1) {
        val r = rank.get(syms.get(j) + open + syms.get(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) go = false
      else {
        val (a, b) = merges(best)
        val next = new java.util.ArrayList[String](syms.size())
        var k = 0
        while (k < syms.size()) {
          if (k + 1 < syms.size() && syms.get(k) == a && syms.get(k + 1) == b) {
            next.add(a + b); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
        go = syms.size() >= 2
      }
    }
    syms
  }
}

/** `BpeEncodeOffsets(text, merges)` — the whole token-offset encode
  * ([[graft.llm.Bpe.encodeWithOffsets]]) as ONE native expression: walk
  * the text once, tokenize on the `\s+`/`\S+` run boundary (the exact
  * class of `TextFunctions.tokens`' split — space, tab, LF, VT, FF, CR),
  * merge each word under the shared [[BpeMerge]] loop, and emit every
  * symbol with BOTH offset bases as
  * `array<struct<tok, s, e, norm_s, norm_e>>`:
  *
  *   - `s`/`e` — [s, e) code-point offsets in the ORIGINAL text (the
  *     primary contract: slice the raw text at [s, e) and get the token)
  *   - `norm_s`/`norm_e` — offsets in the single-space NORMALIZED text
  *     (words joined by one space): the base external prefix-sum
  *     restatements can derive, and the right one for pipelines that
  *     normalize whitespace before training
  *
  * Why native (SURVEY §7.2): the composed form (matchSpans × 2 + encode +
  * per-word `aggregate` folds) measured 3.5–8.3 s at sf0.1 on the
  * single-row-group bench file — interpreted HOF lambdas over ~1M
  * tokens; this walk is one JVM pass per row inside whole-stage codegen.
  * Offsets advance by SYMBOL length, so a word containing the reserved
  * delimiter chars (stripped by the merge contract) shifts within that
  * word only — the same caveat the composed form had.
  */
case class BpeEncodeOffsets(child: Expression, merges: Seq[(String, String)],
    open: String, close: String) extends UnaryExpression {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def prettyName: String = "bpe_encode_offsets"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("s", IntegerType, nullable = false),
    StructField("e", IntegerType, nullable = false),
    StructField("norm_s", IntegerType, nullable = false),
    StructField("norm_e", IntegerType, nullable = false))),
    containsNull = false)

  // the library wrapper coalesces null text to "" (the `tokens` contract:
  // null → empty token list), so this expression is plain null-intolerant
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${dt.catalogString}")
  }

  @transient private lazy val rank: java.util.HashMap[String, Integer] =
    BpeMerge.buildRank(merges, open)

  private def isSpace(c: Char): Boolean = // Java regex \s, exactly
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def encode(u: UTF8String): ArrayData = {
    val text = u.toString
    val out = new java.util.ArrayList[InternalRow]()
    var i = 0      // UTF-16 cursor
    var cp = 0     // code points consumed (raw base)
    var normNext = 0
    var first = true
    while (i < text.length) {
      if (isSpace(text.charAt(i))) { i += 1; cp += 1 }
      else {
        val wordStartCp = cp
        val ws = i
        while (i < text.length && !isSpace(text.charAt(i))) {
          i += Character.charCount(text.codePointAt(i))
          cp += 1
        }
        val word = text.substring(ws, i)
        val wordCpLen = cp - wordStartCp
        val normStart = if (first) 0 else normNext
        val syms = BpeMerge.mergedSymbols(word, merges, rank, open, close)
        var rawOff = wordStartCp
        var normOff = normStart
        var k = 0
        while (k < syms.size()) {
          val sym = syms.get(k)
          val len = sym.codePointCount(0, sym.length)
          out.add(InternalRow(UTF8String.fromString(sym),
            rawOff, rawOff + len, normOff, normOff + len))
          rawOff += len
          normOff += len
          k += 1
        }
        normNext = normStart + wordCpLen + 1
        first = false
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(a: Any): Any =
    encode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeOffsets", this,
      classOf[BpeEncodeOffsets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `BpeSymbolPairs(encodedWords)` — the flat array of adjacent-symbol
  * pair strings ("a b") across an array of delimiter-encoded words: one
  * BPE training step's pre-aggregation rows, as ONE native expression.
  *
  * Replaces the interpreted HOF chain
  * `flatten(transform(ws, e => symbolPairs(e)))` (per-word lambda →
  * sequence → element_at concat), whose lambda bodies never enter
  * whole-stage codegen — the profile showed the training-step scan
  * dominated by lambda evaluation, not the count aggregate. Pairs never
  * cross word boundaries; words with fewer than two symbols contribute
  * nothing; null words are skipped (the HOF form's transform maps a null
  * element to null and flatten drops nothing — but encoded words are
  * never null in practice; the property spec pins equality on real
  * encodings).
  */
case class BpeSymbolPairs(child: Expression, open: String, close: String)
    extends UnaryExpression {

  override def prettyName: String = "bpe_symbol_pairs"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  def pairsOf(input: ArrayData): ArrayData = {
    val sep = close + open
    val out = new java.util.ArrayList[UTF8String]()
    val n = input.numElements()
    var w = 0
    while (w < n) {
      if (!input.isNullAt(w)) {
        val enc = input.getUTF8String(w).toString
        if (enc.length > 2) {
          // interior = enc minus the outer delimiters; split on Close+Open
          var prevStart = 1
          var prev: String = null
          val stop = enc.length - 1
          while (prevStart <= stop) {
            val cut = enc.indexOf(sep, prevStart)
            val end = if (cut < 0 || cut >= stop) stop else cut
            val sym = enc.substring(prevStart, end)
            if (prev != null) out.add(UTF8String.fromString(prev + " " + sym))
            prev = sym
            prevStart = end + 2
          }
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    pairsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpePairs", this,
      classOf[BpeSymbolPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pairsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `BpeSymbols(encodedWords, open, close)` — every SYMBOL of every
  * delimiter-encoded word, flattened: the unigram sibling of
  * [[BpeSymbolPairs]], built for [[graft.llm.Bpe.trainWordpiece]]'s
  * per-step symbol counts. Same design argument: the equivalent HOF
  * chain (`flatten(transform(_, symbols))`) evaluates its lambdas
  * interpreted and dominates the counting scan (the measured reason
  * BpeSymbolPairs exists); this walk fuses into whole-stage codegen.
  */
case class BpeSymbols(child: Expression, open: String, close: String)
    extends UnaryExpression {

  override def prettyName: String = "bpe_symbols"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  def symbolsOf(input: ArrayData): ArrayData = {
    val sep = close + open
    val out = new java.util.ArrayList[UTF8String]()
    val n = input.numElements()
    var w = 0
    while (w < n) {
      if (!input.isNullAt(w)) {
        val enc = input.getUTF8String(w).toString
        if (enc.length > 2) {
          var prevStart = 1
          val stop = enc.length - 1
          while (prevStart <= stop) {
            val cut = enc.indexOf(sep, prevStart)
            val end = if (cut < 0 || cut >= stop) stop else cut
            out.add(UTF8String.fromString(enc.substring(prevStart, end)))
            prevStart = end + 2
          }
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    symbolsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeSymbols", this,
      classOf[BpeSymbols].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.symbolsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
