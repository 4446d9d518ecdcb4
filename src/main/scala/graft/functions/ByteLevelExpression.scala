package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The GPT-2 byte↔unicode bijection (Radford et al. 2019, `encoder.py`
  * `bytes_to_unicode`): every byte value gets a PRINTABLE code point —
  * printable latin bytes map to themselves, the rest (controls, space,
  * 0x7F–0xA0, 0xAD) map to 256+n in byte order — so a byte-level BPE
  * vocabulary is plain strings with no escaping and NO possible
  * out-of-vocabulary input: any byte sequence tokenizes. Space becomes
  * `Ġ` (U+0120), newline `Ċ` (U+010A); a UTF-8 `é` becomes the familiar
  * `Ã©` pair.
  */
object ByteLevel {
  /** byte value → mapped char (all in the BMP, one Java char each). */
  val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val printable = (b >= '!' && b <= '~') || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** mapped char → byte value (the inverse; -1 for unmapped chars). */
  val charToByte: Array[Int] = {
    val out = Array.fill(0x200)(-1)
    var b = 0
    while (b < 256) { out(byteToChar(b)) = b; b += 1 }
    out
  }

  /** Map a string's UTF-8 BYTES through the table. */
  def map(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xFF)); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Invert [[map]]: mapped chars back to raw bytes, decoded as UTF-8
    * (invalid sequences follow the JVM's replacement-char convention).
    * Chars outside the bijection's range fail loudly — they cannot have
    * come from [[map]].
    */
  def unmap(s: UTF8String): UTF8String = {
    val str = s.toString
    val bytes = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      val b = if (c < 0x200) charToByte(c) else -1
      require(b >= 0, s"byte_level: char U+${Integer.toHexString(c)} is not in the byte map")
      bytes(i) = b.toByte
      i += 1
    }
    UTF8String.fromBytes(bytes)
  }
}

/** `VocabIds(symbols, vocab, unkId)` — map each symbol string of an
  * `array<string>` column to its 0-based vocabulary id (`unkId` when
  * absent): the tokenize→ids bridge between the BPE/WordPiece encoders
  * (symbol STRINGS) and sequence packing / training consumers (id
  * ARRAYS). The vocabulary is a per-executor hash map, not plan structure
  * — the [[WordpieceEncodeWords]] argument again; a `array_position` over
  * a 32 k literal vocab would be O(|vocab|) per token AND bloat the plan.
  */
case class VocabIds(child: Expression, vocab: Seq[String], unkId: Int)
    extends UnaryExpression {

  override def prettyName: String = "vocab_ids"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    for ((p, i) <- vocab.zipWithIndex) if (!m.containsKey(p)) m.put(p, i)
    m
  }

  def mapArray(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (input.isNullAt(i)) null else {
        val id = ids.get(input.getUTF8String(i).toString)
        if (id == null) Integer.valueOf(unkId) else id
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    mapArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabIds", this, classOf[VocabIds].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mapArray($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `UnicodeToBytes(str)` — invert [[ByteLevel.map]] on a STRING column:
  * mapped symbol text back to the raw bytes it encodes, decoded as UTF-8.
  * With [[VocabIds]]' inverse lookup this closes the byte-level
  * round trip: `decode(encode(text)) = text` for any input (the byte map
  * is a bijection and merges only regroup symbols). Chars outside the
  * bijection fail loudly — they cannot have come from the encoder.
  */
case class UnicodeToBytes(child: Expression) extends UnaryExpression {

  override def prettyName: String = "unicode_to_bytes"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.catalogString}")

  def unmap(s: UTF8String): UTF8String = ByteLevel.unmap(s)

  override protected def nullSafeEval(input: Any): Any =
    unmap(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unmapBytes", this, classOf[UnicodeToBytes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.unmap($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `BytesToUnicodeWords(words)` — apply [[ByteLevel.map]] to every element
  * of an `array<string>` column: the byte-level pretokenized pieces become
  * merge-ready symbol strings. One native walk per piece, inside the
  * surrounding whole-stage-codegen stage.
  */
case class BytesToUnicodeWords(child: Expression) extends UnaryExpression {

  override def prettyName: String = "bytes_to_unicode_words"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  def mapArray(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      out(i) = if (input.isNullAt(i)) null else ByteLevel.map(input.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    mapArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteMap", this, classOf[BytesToUnicodeWords].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mapArray($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
