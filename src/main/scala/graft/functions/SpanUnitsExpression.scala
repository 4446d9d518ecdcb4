package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `SpanUnits(text, spans, from, to)` — rewrites every [s, e) span offset
  * of `spans` between the THREE units the span-attribute ecosystem
  * actually uses: CODE POINTS (`"chars"`, this library's native unit —
  * Spark `substring`/`length`, [[MatchSpans]],
  * [[TextFunctions.redactSpans]]), UTF-8 BYTES (`"bytes"` — Dolma
  * attribute files, WARC/HTML extraction offsets, Rust/Go tooling
  * indexing `&str`/`[]byte`), and UTF-16 UNITS (`"utf16"` — JavaScript
  * `String.prototype.indexOf`/`match`, Java `Matcher.start()`, .NET:
  * every browser-side or JVM-regex tagger that didn't convert). Without
  * converters, a foreign-unit sidecar applied to non-ASCII text silently
  * shifts every rewrite; with them, the "tag once, mix many" handoff
  * works across toolchains.
  *
  * All directions are a single forward walk over the string shared by ALL
  * of a row's span boundaries: boundaries are sorted (spans arrive from
  * external files in any order), walked once with code-point/byte/UTF-16
  * cursors advancing together, and written back to their original slots —
  * O(chars + k log k) per row for k spans, not O(chars × k).
  *
  * Out-of-range offsets clamp ([0, length] in the source unit), matching
  * `redactSpans`' clamping so convert-then-redact equals redact on the
  * pre-clamped spans. A source offset landing INSIDE a multi-unit
  * sequence (a byte mid-UTF-8-sequence, a UTF-16 index between surrogate
  * halves — malformed external data) rounds DOWN to the enclosing code
  * point's start — deterministic, and a degenerate span that collapses to
  * s == e is dropped by `redactSpans`' well-formedness filter downstream.
  * Null span ELEMENTS and null s/e fields pass through unchanged (the
  * same malformed-tagger tolerance `redactSpans` has); a null text or
  * null spans column yields null.
  *
  * Why a custom Expression (SURVEY §7.2 preference order): the walk needs
  * one shared pass per row across an array of values — `transform` would
  * re-walk the prefix per span (O(chars × k)), and no built-in exposes
  * UTF-8 byte or UTF-16 offsets of a character index at all. Codegen'd
  * via one call into the shared walk, fused into whole-stage codegen.
  *
  * Reference behavior anchor: the reference engine has no span model;
  * offsets-as-data is part of this repo's LLM-pipeline extension surface
  * (see [[MatchSpans]]).
  */
case class SpanUnits(left: Expression, right: Expression, from: String, to: String)
    extends BinaryExpression {

  override def prettyName: String = s"spans_${from}_to_$to"
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = right.dataType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(st: StructType, _))
        if st.length == 2 && st.forall(_.dataType == IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (string, array<struct<s:int,e:int>>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  private def len8(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4
  private def len16(cp: Int): Int = if (cp < 0x10000) 1 else 2
  private def unitLen(unit: String, cp: Int): Int = unit match {
    case "chars" => 1
    case "bytes" => len8(cp)
    case "utf16" => len16(cp)
  }

  /** Shared by eval and generated code (via addReferenceObj), so the two
    * paths cannot drift.
    */
  def convert(u: UTF8String, arr: ArrayData): ArrayData = {
    val s = u.toString
    val n = arr.numElements()
    // flatten boundaries, remembering which are null (pass-through)
    val bound = new Array[Int](2 * n)
    val isNull = new Array[Boolean](2 * n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { isNull(2 * i) = true; isNull(2 * i + 1) = true }
      else {
        val row = arr.getStruct(i, 2)
        if (row.isNullAt(0)) isNull(2 * i) = true else bound(2 * i) = row.getInt(0)
        if (row.isNullAt(1)) isNull(2 * i + 1) = true else bound(2 * i + 1) = row.getInt(1)
      }
      i += 1
    }
    val order = bound.indices.filterNot(isNull).sortBy(bound).toArray
    val out = new Array[Int](2 * n)
    var si = 0   // UTF-16 index into s (the iteration cursor)
    var cp = 0   // code points consumed
    var bo = 0   // UTF-8 bytes consumed
    var u16 = 0  // UTF-16 units consumed
    def srcPos: Int = from match {
      case "chars" => cp; case "bytes" => bo; case "utf16" => u16
    }
    def tgtPos: Int = to match {
      case "chars" => cp; case "bytes" => bo; case "utf16" => u16
    }
    var k = 0
    while (k < order.length) {
      val oi = order(k)
      val target = math.max(0, bound(oi))
      // advance whole code points while they END at or before target —
      // a target inside a multi-unit sequence leaves the cursor at the
      // enclosing code point's start (for a "chars" source every code
      // point is one unit, so this is exactly `while srcPos < target`)
      while (si < s.length && srcPos + unitLen(from, s.codePointAt(si)) <= target) {
        val c = s.codePointAt(si)
        si += Character.charCount(c); cp += 1; bo += len8(c); u16 += len16(c)
      }
      out(oi) = tgtPos
      k += 1
    }
    val res = new Array[Any](n)
    i = 0
    while (i < n) {
      if (arr.isNullAt(i)) res(i) = null
      else {
        val row = arr.getStruct(i, 2)
        res(i) = InternalRow(
          if (isNull(2 * i)) null else out(2 * i),
          if (isNull(2 * i + 1)) null else out(2 * i + 1))
      }
      i += 1
    }
    new GenericArrayData(res)
  }

  override protected def nullSafeEval(t: Any, sp: Any): Any =
    convert(t.asInstanceOf[UTF8String], sp.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanUnits", this, classOf[SpanUnits].getName)
    nullSafeCodeGen(ctx, ev, (t, sp) => s"${ev.value} = $ref.convert($t, $sp);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanUnits =
    copy(left = newLeft, right = newRight)
}

object SpanUnits {
  val Units: Set[String] = Set("chars", "bytes", "utf16")

  /** Column API; units are validated eagerly (a bad unit fails at plan
    * construction, not per task). `from == to` is the identity and is
    * rejected — callers should not pay a walk for a no-op.
    */
  def apply(text: Column, spans: Column, from: String, to: String): Column = {
    require(Units(from) && Units(to), s"span units must be in $Units, got ($from, $to)")
    require(from != to, s"span unit conversion needs from != to, got $from")
    GraftShims.toColumn(SpanUnits(
      GraftShims.toExpression(text), GraftShims.toExpression(spans), from, to))
  }
}
