package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `SpanUnits(text, spans, toBytes)` — rewrites every [s, e) span offset
  * of `spans` between the two units the span-attribute ecosystem actually
  * uses: CODE POINTS (this library's native unit — Spark `substring`/
  * `length`, [[MatchSpans]], [[TextFunctions.redactSpans]]) and UTF-8
  * BYTES (the unit external taggers commonly emit — Dolma attribute
  * files, WARC/HTML extraction offsets, Rust/Go tooling that indexes
  * `&str`/`[]byte` directly). Without a converter, a byte-offset sidecar
  * applied to non-ASCII text silently shifts every rewrite; with one, the
  * "tag once, mix many" handoff works across toolchains.
  *
  * Direction: `toBytes = true` maps code-point offsets → byte offsets;
  * `false` maps byte offsets → code-point offsets. Both directions are a
  * single forward walk over the string shared by ALL of a row's span
  * boundaries: boundaries are sorted (spans arrive from external files in
  * any order), walked once, and written back to their original slots —
  * O(chars + k log k) per row for k spans, not O(chars × k).
  *
  * Out-of-range offsets clamp ([0, length] in the source unit), matching
  * `redactSpans`' clamping so convert-then-redact equals redact on the
  * pre-clamped spans. A byte offset landing INSIDE a multi-byte sequence
  * (malformed external data) rounds DOWN to the enclosing code point's
  * start — deterministic, and a degenerate span that collapses to s == e
  * is dropped by `redactSpans`' well-formedness filter downstream. Null
  * span ELEMENTS and null s/e fields pass through unchanged (the same
  * malformed-tagger tolerance `redactSpans` has); a null text or null
  * spans column yields null.
  *
  * Why a custom Expression (SURVEY §7.2 preference order): the walk needs
  * one shared pass per row across an array of values — `transform` would
  * re-walk the prefix per span (O(chars × k)), and no built-in exposes
  * UTF-8 byte offsets of a character index at all (`encode` + `length`
  * per boundary re-encodes the prefix per span). Codegen'd via one call
  * into the shared walk, fused into whole-stage codegen.
  *
  * Reference behavior anchor: the reference engine has no span model;
  * offsets-as-data is part of this repo's LLM-pipeline extension surface
  * (see [[MatchSpans]]).
  */
case class SpanUnits(left: Expression, right: Expression, toBytes: Boolean)
    extends BinaryExpression {

  override def prettyName: String = if (toBytes) "spans_to_bytes" else "spans_to_chars"
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

  private def utf8Len(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4

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
    var si = 0  // UTF-16 index into s
    var cp = 0  // code points consumed
    var bo = 0  // UTF-8 bytes consumed
    var k = 0
    while (k < order.length) {
      val oi = order(k)
      val target = math.max(0, bound(oi))
      if (toBytes) {
        while (cp < target && si < s.length) {
          val c = s.codePointAt(si)
          si += Character.charCount(c); cp += 1; bo += utf8Len(c)
        }
        out(oi) = bo
      } else {
        // advance whole code points while they END at or before target —
        // a target inside a sequence leaves cp at the enclosing start
        var cLen = if (si < s.length) utf8Len(s.codePointAt(si)) else 0
        while (si < s.length && bo + cLen <= target) {
          si += Character.charCount(s.codePointAt(si)); cp += 1; bo += cLen
          cLen = if (si < s.length) utf8Len(s.codePointAt(si)) else 0
        }
        out(oi) = cp
      }
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
  def apply(text: Column, spans: Column, toBytes: Boolean): Column =
    GraftShims.toColumn(SpanUnits(
      GraftShims.toExpression(text), GraftShims.toExpression(spans), toBytes))
}
