package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `MatchSpans(text, pattern)` — every non-empty, non-overlapping regex
  * match of `pattern` in `text` as an `array<struct<s:int, e:int>>` of
  * 0-based [s, e) offsets, left to right: the TAGGER half of the span-
  * attribute data model whose rewrite half is
  * [[TextFunctions.redactSpans]]/[[TextFunctions.cutSpans]] (Dolma-style
  * "offsets as data": a tagging job emits spans into a sidecar once, and
  * any later mix decides what to do with them — redact, cut, filter —
  * without re-running the tagger).
  *
  * Offsets are CODE-POINT offsets — the unit of Spark's `substring` /
  * `length` and therefore of `redactSpans`' fold — not Java's UTF-16
  * indices. The conversion is one forward walk shared by all of a row's
  * boundaries (matches are ordered and non-overlapping, so boundaries are
  * non-decreasing): O(chars + matches) per row, not O(chars × matches).
  * On ASCII text the two units coincide; on text with supplementary
  * characters (emoji) a UTF-16 index would silently shift every
  * downstream rewrite — MatchSpansSpec pins the emoji case end to end.
  *
  * Why a custom Expression (SURVEY §7.2 preference order): no built-in
  * exposes match OFFSETS (`regexp_extract_all` returns the matched
  * strings), and reconstructing offsets via `locate` breaks on repeated
  * matches; a UDF would pay per-row boxing on full-corpus tagging scans.
  * `doGenCode` emits one call into the shared matcher walk, fused into
  * whole-stage codegen. The pattern is a compile-time literal (compiled
  * once per operator, not per row); zero-length matches are dropped —
  * they carry no content and `redactSpans` ignores them anyway.
  *
  * Reference behavior anchor: the reference's closest surface is
  * RegexMatch (filter/regex_match.go), which FILTERS on a pattern; span
  * extraction is part of this repo's LLM-pipeline extension surface.
  */
case class MatchSpans(child: Expression, pattern: String) extends UnaryExpression {

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override def prettyName: String = "match_spans"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("s", IntegerType, nullable = false),
      StructField("e", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${dt.catalogString}")
  }

  /** Shared by eval and generated code (via addReferenceObj), so the two
    * paths cannot drift.
    */
  def spansOf(u: UTF8String): ArrayData = {
    val s = u.toString
    val m = compiled.matcher(s)
    val utf16 = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (m.find()) if (m.end() > m.start()) utf16 += ((m.start(), m.end()))
    // one forward UTF-16 → code-point walk over the ordered boundaries;
    // match boundaries never split a surrogate pair, so each lands
    // exactly on a code-point boundary
    var i = 0
    var cp = 0
    def advanceTo(bound: Int): Int = {
      while (i < bound) { i += Character.charCount(s.codePointAt(i)); cp += 1 }
      cp
    }
    new GenericArrayData(utf16.map { case (st, en) =>
      InternalRow(advanceTo(st), advanceTo(en))
    }.toArray[Any])
  }

  override protected def nullSafeEval(a: Any): Any =
    spansOf(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matchSpans", this, classOf[MatchSpans].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.spansOf($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MatchSpans =
    copy(child = newChild)
}

object MatchSpans {
  /** Column API; the pattern is validated eagerly (a bad pattern fails at
    * plan time with the compile error, not per task at runtime).
    */
  def apply(text: Column, pattern: String): Column = {
    java.util.regex.Pattern.compile(pattern)
    GraftShims.toColumn(MatchSpans(GraftShims.toExpression(text), pattern))
  }
}
