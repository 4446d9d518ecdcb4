package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One primitive text-normalization step of the public HuggingFace
  * `tokenizer.json` `normalizer` chain, replicated EXACTLY (the import
  * seam's contract: encode the same ids the publishing stack encodes, or
  * refuse at load — never silently diverge). Each op mirrors the
  * published semantics of the `tokenizers` normalizer of the same name:
  *
  *   - [[HfNormOp.BertClean]] — BERT's `_clean_text`: drop U+0000,
  *     U+FFFD and control/format characters (Unicode category C*, except
  *     TAB/LF/CR which count as whitespace), map every whitespace
  *     character (TAB/LF/CR/space or category Zs) to a single space.
  *   - [[HfNormOp.BertChinese]] — BERT's `_tokenize_chinese_chars`: wrap
  *     every CJK-block code point in spaces so each becomes its own word.
  *   - [[HfNormOp.Nfd]] — canonical decomposition (what BERT-family
  *     files spell as a `NFD` step before `StripAccents`).
  *   - [[HfNormOp.StripAccents]] — remove non-spacing marks (category
  *     Mn) from the CURRENT form; files pair it with NFD.
  *   - [[HfNormOp.Lower]] — full Unicode lowercase (Locale.ROOT).
  *   - [[HfNormOp.Prepend]] — prepend a marker to non-empty text (the
  *     Llama/SentencePiece `Prepend "▁"` convention).
  *   - [[HfNormOp.Replace]] — literal string replace (the Llama
  *     `Replace " " → "▁"` space-marking step; regex patterns are
  *     refused at load, only the `String` pattern spelling arrives here).
  */
sealed trait HfNormOp extends Serializable
object HfNormOp {
  case object BertClean extends HfNormOp
  case object BertChinese extends HfNormOp
  case object Nfd extends HfNormOp
  case object StripAccents extends HfNormOp
  case object Lower extends HfNormOp
  final case class Prepend(marker: String) extends HfNormOp
  final case class Replace(from: String, to: String) extends HfNormOp
}

/** `HfNormalize(text, ops)` — apply an imported tokenizer.json normalizer
  * chain IN FILE ORDER in one native walk (order matters: BERT files run
  * clean → chinese-chars → NFD+strip → lowercase; Llama files run
  * prepend → replace). A native expression because NFD / Unicode
  * categories have no Column-algebra spelling; the chain is per-executor
  * data, codegen-friendly, map-only.
  */
case class HfNormalize(child: Expression, ops: Seq[HfNormOp])
    extends UnaryExpression {

  override def prettyName: String = "hf_normalize"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.catalogString}")

  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(HfNormalize.applyOps(s.toString, ops))

  override protected def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hfNorm", this, classOf[HfNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HfNormalize {

  /** BERT `_is_whitespace`: TAB/LF/CR/space or category Zs. */
  private def isWs(cp: Int): Boolean =
    cp == '\t' || cp == '\n' || cp == '\r' || cp == ' ' ||
      Character.getType(cp) == Character.SPACE_SEPARATOR

  /** BERT `_is_control`: TAB/LF/CR are NOT control; any other category-C*
    * code point (Cc, Cf, Co, Cs, Cn) is.
    */
  private def isCtl(cp: Int): Boolean =
    cp != '\t' && cp != '\n' && cp != '\r' && {
      val t = Character.getType(cp)
      t == Character.CONTROL || t == Character.FORMAT ||
        t == Character.PRIVATE_USE || t == Character.SURROGATE ||
        t == Character.UNASSIGNED
    }

  /** BERT `_is_chinese_char` CJK blocks (the reference list). */
  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
      (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
      (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
      (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

  private def mapCodePoints(s: String)(f: (StringBuilder, Int) => Unit): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      f(sb, cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  private[functions] def applyOps(s0: String, ops: Seq[HfNormOp]): String =
    ops.foldLeft(s0) { (s, op) =>
      op match {
        case HfNormOp.BertClean =>
          mapCodePoints(s) { (sb, cp) =>
            if (cp == 0 || cp == 0xFFFD || isCtl(cp)) ()
            else if (isWs(cp)) sb.append(' ')
            else sb.appendAll(Character.toChars(cp))
          }
        case HfNormOp.BertChinese =>
          mapCodePoints(s) { (sb, cp) =>
            if (isCjk(cp)) {
              sb.append(' '); sb.appendAll(Character.toChars(cp)); sb.append(' ')
            } else sb.appendAll(Character.toChars(cp))
          }
        case HfNormOp.Nfd => Normalizer.normalize(s, Normalizer.Form.NFD)
        case HfNormOp.StripAccents =>
          mapCodePoints(s) { (sb, cp) =>
            if (Character.getType(cp) != Character.NON_SPACING_MARK)
              sb.appendAll(Character.toChars(cp))
          }
        case HfNormOp.Lower => s.toLowerCase(java.util.Locale.ROOT)
        case HfNormOp.Prepend(m) => if (s.isEmpty) s else m + s
        case HfNormOp.Replace(from, to) => s.replace(from, to)
      }
    }
}
