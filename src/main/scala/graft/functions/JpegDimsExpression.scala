package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `JpegDims(payload)` — JPEG pixel dimensions from the header bytes, as
  * `width * 65536 + height` (both are 16-bit in the SOF segment, so the
  * pack is lossless; unpack with `shiftright(x, 16)` / `x & 65535`), or
  * null when the payload has no readable frame header.
  *
  * Unlike PNG/GIF/BMP (fixed-offset plucks in
  * [[graft.llm.Multimodal.payloadDims]]), JPEG stores dimensions in an
  * SOF segment at a VARIABLE offset behind a chain of length-prefixed
  * marker segments (APPn/EXIF, ICC, DQT, DHT, comments...), so the sniff
  * is a bounded segment walk, not a pluck. The walk only ever touches the
  * pre-scan header region: every SOF necessarily precedes the first SOS
  * (the frame header governs the scans), so entropy-coded data is never
  * scanned — cost is O(header segments), independent of payload size.
  *
  * Why a custom Expression (SURVEY §7.2 preference order): the per-step
  * offset is data-dependent, so a column-algebra unroll would nest each
  * step's `when` inside the last and blow the Catalyst tree up
  * exponentially; a UDF would pay boxing per row on a full-corpus filter
  * scan. Here `doGenCode` emits one call into the byte walk, fused into
  * whole-stage codegen.
  *
  * Null (never garbage) for: a non-JPEG payload, a truncated header, a
  * corrupt segment chain, SOS/EOI reached before any SOF, and the legal
  * DNL case (SOF height 0, resolved by a post-scan DNL marker) — callers
  * route null-dims payloads through the real decoder, exactly as they do
  * for unknown formats.
  *
  * All SOF markers carry the same dimension layout: C0–C3, C5–C7, C9–CB,
  * CD–CF (C4=DHT, C8=JPG extension, CC=DAC are NOT frame headers).
  * Reference behavior anchor: the reference treats media payloads as
  * opaque bytes (baker filter/metadata.go keeps records untouched); the
  * resolution sniff is part of this repo's multimodal extension surface.
  */
case class JpegDims(child: Expression) extends UnaryExpression {

  override def prettyName: String = "jpeg_dims"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // null on walk failure even for a non-null input (see ArrayDot's note on
  // the not-null-inferred codegen pitfall)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary payload, got ${dt.catalogString}")
  }

  /** -1 when no dims are readable; else `w << 16 | h`. Shared by eval and
    * generated code (via addReferenceObj), so the two paths cannot drift.
    */
  def walk(b: Array[Byte]): Long = {
    @inline def u(i: Int): Int = b(i) & 0xFF
    if (b.length < 4 || u(0) != 0xFF || u(1) != 0xD8) return -1L
    var i = 2
    // each step advances i by ≥ 1, so the loop is bounded by the header
    // length it touches — no step cap needed
    while (i + 2 <= b.length) {
      if (u(i) != 0xFF) return -1L
      val m = u(i + 1)
      if (m == 0xFF) i += 1 // fill byte before a marker
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
      else if (m == 0xD9 || m == 0xDA) return -1L // EOI/SOS before any SOF
      else {
        if (i + 4 > b.length) return -1L
        val segLen = (u(i + 2) << 8) | u(i + 3)
        if (segLen < 2) return -1L
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          // marker(2) len(2) precision(1) height(2) width(2)
          if (i + 9 > b.length || segLen < 7) return -1L
          val h = (u(i + 5) << 8) | u(i + 6)
          val w = (u(i + 7) << 8) | u(i + 8)
          // h == 0 is legal (height deferred to a DNL marker after the
          // first scan) — null, not a 0-height dimension
          return if (w == 0 || h == 0) -1L else (w.toLong << 16) | h.toLong
        }
        i += 2 + segLen
      }
    }
    -1L
  }

  override protected def nullSafeEval(a: Any): Any = {
    val r = walk(a.asInstanceOf[Array[Byte]])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jpegDims", this, classOf[JpegDims].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |long $r = $ref.walk($a);
         |if ($r < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

object JpegDims {
  /** Column API: `width * 65536 + height` of a JPEG payload, null when no
    * frame header is readable.
    */
  def apply(payload: Column): Column =
    GraftShims.toColumn(JpegDims(GraftShims.toExpression(payload)))
}
