package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** [[graft.functions.SpanUnits]] — code-point ↔ UTF-8 byte span offset
  * conversion: the interop seam between this library's native unit and
  * external byte-indexing taggers. Pinned: exact byte arithmetic across
  * 1/2/3/4-byte sequences, the round-trip law, clamping, mid-sequence
  * round-down, null pass-through, and the `Units = "bytes"` path of the
  * RedactSpans TOML filter end to end.
  */
class SpanUnitsSpec extends SparkSpec {

  //   ¡   d  é   j  à   ⌘    🙂    x
  // cp 0   1  2   3  4  5    6     7
  // by 0-2 2  3-5 5  6-8 8-11 11-15 15-16
  private val T = "¡déjà⌘🙂x" // ¡déjà⌘🙂x

  private def conv(text: String, spans: Seq[(Int, Int)], toBytes: Boolean): Seq[(Int, Int)] = {
    import spark.implicits._
    val spanCol = array(spans.map { case (s, e) =>
      struct(lit(s).as("s"), lit(e).as("e")) }: _*)
    val c = if (toBytes) TF.spansToBytes(col("t"), spanCol)
            else TF.spansToChars(col("t"), spanCol)
    Seq(text).toDF("t").select(explode(c).as("sp"))
      .select(col("sp.s"), col("sp.e"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
  }

  test("chars -> bytes walks 1/2/3/4-byte sequences exactly, in any span order") {
    // unordered spans: the walk must sort boundaries, not assume order
    assert(conv(T, Seq((5, 7), (0, 2), (2, 5)), toBytes = true) ==
      Seq((8, 15), (0, 3), (3, 8)))
    assert(conv(T, Seq((7, 8)), toBytes = true) == Seq((15, 16)))
  }

  test("bytes -> chars inverts, and mid-sequence byte offsets round DOWN " +
      "to the enclosing code point") {
    assert(conv(T, Seq((0, 3), (3, 8), (8, 15)), toBytes = false) ==
      Seq((0, 2), (2, 5), (5, 7)))
    // byte 12 is inside the emoji [11,15): rounds down to cp 6; byte 1 is
    // inside ¡ [0,2): rounds down to cp 0
    assert(conv(T, Seq((1, 12)), toBytes = false) == Seq((0, 6)))
  }

  test("round trip: toChars(toBytes(spans)) == spans on boundary offsets") {
    val spans = Seq((0, 1), (1, 4), (4, 8), (2, 6))
    import spark.implicits._
    val spanCol = array(spans.map { case (s, e) =>
      struct(lit(s).as("s"), lit(e).as("e")) }: _*)
    val back = Seq(T).toDF("t")
      .select(explode(TF.spansToChars(col("t"),
        TF.spansToBytes(col("t"), spanCol))).as("sp"))
      .select(col("sp.s"), col("sp.e"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(back == spans)
  }

  test("out-of-range offsets clamp; null text/spans yield null; null " +
      "elements and null bounds pass through") {
    assert(conv(T, Seq((-3, 99)), toBytes = true) == Seq((0, 16)))
    assert(conv(T, Seq((-3, 99)), toBytes = false) == Seq((0, 8)))
    import spark.implicits._
    val spansWithNulls = array(
      struct(lit(1).as("s"), lit(null).cast("int").as("e")),
      lit(null).cast("struct<s:int,e:int>"))
    val r = Seq((1, Option(T)), (2, None)).toDF("id", "t")
      .select(col("id"), TF.spansToBytes(col("t"), spansWithNulls).as("b"))
      .orderBy("id").collect()
    val row0 = r(0).getSeq[org.apache.spark.sql.Row](1)
    assert(row0(0).getInt(0) == 2 && row0(0).isNullAt(1))
    assert(row0(1) == null)
    assert(r(1).isNullAt(1), "null text must yield null")
  }

  private def conv16(text: String, spans: Seq[(Int, Int)], to16: Boolean): Seq[(Int, Int)] = {
    import spark.implicits._
    val spanCol = array(spans.map { case (s, e) =>
      struct(lit(s).as("s"), lit(e).as("e")) }: _*)
    val c = if (to16) TF.spansToUtf16(col("t"), spanCol)
            else TF.spansFromUtf16(col("t"), spanCol)
    Seq(text).toDF("t").select(explode(c).as("sp"))
      .select(col("sp.s"), col("sp.e"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
  }

  test("chars -> utf16: astral code points count 2; mid-surrogate utf16 " +
      "offsets round down coming back") {
    // T: cp6 is the emoji (utf16 len 2): utf16 offsets = cp offsets until
    // cp 6, then +1
    assert(conv16(T, Seq((0, 6), (6, 7), (7, 8)), to16 = true) ==
      Seq((0, 6), (6, 8), (8, 9)))
    assert(conv16(T, Seq((0, 6), (6, 8), (8, 9)), to16 = false) ==
      Seq((0, 6), (6, 7), (7, 8)))
    // utf16 offset 7 falls between the emoji's surrogate halves
    assert(conv16(T, Seq((7, 9)), to16 = false) == Seq((6, 8)))
  }

  test("convertSpans composes any unit pair: bytes -> utf16 through chars") {
    import spark.implicits._
    // bytes [8,15) is ⌘🙂 = chars [5,7) = utf16 [5,8)
    val spanCol = array(struct(lit(8).as("s"), lit(15).as("e")))
    val r = Seq(T).toDF("t")
      .select(explode(TF.convertSpans(col("t"), spanCol, "bytes", "utf16")).as("sp"))
      .select(col("sp.s"), col("sp.e")).collect()
      .map(x => (x.getInt(0), x.getInt(1))).toSeq
    assert(r == Seq((5, 8)))
    val e = intercept[IllegalArgumentException](
      TF.convertSpans(col("t"), spanCol, "bytes", "ebcdic"))
    assert(e.getMessage.contains("span units"))
  }

  test("ConvertSpans TOML filter rewrites a sidecar spans field between " +
      "units; garbage spans pass through unchanged") {
    val toml =
      """[fields]
        |names = ["id", "text", "spans"]
        |[input]
        |name = "LogLines"
        |  [input.config]
        |  Lines = ["1,¡a@b.cc!,[[2;8]]", "2,¡a@b.cc!,garbage"]
        |[[filter]]
        |name = "SqlExpr"
        |  [filter.config]
        |  Expr = "replace(spans, ';', ',')"
        |  DstField = "spans"
        |[[filter]]
        |name = "ConvertSpans"
        |  [filter.config]
        |  Field = "text"
        |  SpansField = "spans"
        |  From = "bytes"
        |  To = "chars"
        |[output]
        |name = "Nop"
        |fields = ["id", "text", "spans"]
        |""".stripMargin
    val out = graft.topology.Topology.compileToml(spark, toml)
      .projected.orderBy("id").collect()
    // bytes [2,8) over "¡a@b.cc!" (¡ is 2 bytes) = chars [1,7)
    assert(out(0).getString(2) == "[[1,7]]", out(0).getString(2))
    assert(out(1).getString(2) == "garbage", "unparseable passes through")
  }

  test("composition: convert-then-redact on byte offsets equals direct " +
      "char-offset redaction on the corpus") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, "testdata not available")
    val docs = graft.core.Graft.table(spark, sf, "documents")
    val synth = concat(lit("é⌘ m a"), col("doc_id").cast("string"),
      lit("@x.io 😀 ip 10.2.3.4 done "), col("text"))
    val charSpans = TF.piiSpans(synth)
    val viaBytes = TF.redactSpans(synth,
      TF.spansToChars(synth, TF.spansToBytes(synth, charSpans)), "<PII>")
    val direct = TF.redactSpans(synth, charSpans, "<PII>")
    val mismatches = docs
      .select(viaBytes.as("a"), direct.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0L)
  }

  test("RedactSpans TOML filter with Units = 'bytes' consumes a " +
      "byte-offset sidecar field on non-ASCII text") {
    // "¡a@b.cc!" — the email a@b.cc is chars [1,7) but bytes [2,8)
    val toml =
      """[fields]
        |names = ["id", "text", "spans"]
        |[input]
        |name = "LogLines"
        |  [input.config]
        |  Lines = ["1,¡a@b.cc!"]
        |[[filter]]
        |name = "DetectSpans"
        |  [filter.config]
        |  Field = "text"
        |  SpansField = "spans"
        |  Units = "bytes"
        |[[filter]]
        |name = "RedactSpans"
        |  [filter.config]
        |  Field = "text"
        |  SpansField = "spans"
        |  Token = "<PII>"
        |  Units = "bytes"
        |[output]
        |name = "Nop"
        |fields = ["id", "text", "spans"]
        |""".stripMargin
    val out = graft.topology.Topology.compileToml(spark, toml)
      .projected.orderBy("id").collect()
    assert(out(0).getString(2) == "[[2,8]]", out(0).getString(2))
    assert(out(0).getString(1) == "¡<PII>!", out(0).getString(1))
  }
}
