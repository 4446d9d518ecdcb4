package graft

import org.apache.spark.sql.functions._

import graft.functions.{MatchSpans, TextFunctions => TF}

/** [[MatchSpans]] — the tagger half of the span-attribute model: offsets
  * in code-point units (the unit of `substring`/`length` and therefore of
  * [[TF.redactSpans]]), zero-length matches dropped, and the composition
  * law that makes the offsets externally checkable:
  * `redactSpans(t, matchSpans(t, p), tok)` must equal
  * `regexp_replace(t, p, tok)` — both walk the same non-overlapping
  * leftmost match sequence, so any offset error corrupts the rewrite.
  */
class MatchSpansSpec extends SparkSpec {

  private def spansOf(text: String, pattern: String): Seq[(Int, Int)] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(explode(TF.matchSpans(col("t"), pattern)).as("sp"))
      .select(col("sp.s"), col("sp.e"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
  }

  test("offsets are 0-based [s, e) in match order") {
    assert(spansOf("ab 12 cd 34", "\\d+") == Seq((3, 5), (9, 11)))
    assert(spansOf("xxx", "\\d+") == Seq.empty)
    assert(spansOf("7", "\\d+") == Seq((0, 1)))
  }

  test("offsets are CODE POINTS, not UTF-16 units: spans after an emoji " +
      "still address the right characters") {
    // 😀 is one code point but two UTF-16 chars; a UTF-16 index would
    // report the digits at (3,5) and substring would slice one char late
    assert(spansOf("😀a12b", "\\d+") == Seq((2, 4)))
    import spark.implicits._
    val r = Seq("😀a12b").toDF("t")
      .select(TF.redactSpans(col("t"), TF.matchSpans(col("t"), "\\d+"), "#")
        .as("red"))
      .collect().head.getString(0)
    assert(r == "😀a#b", s"got '$r'")
  }

  test("zero-length matches are dropped; null text -> null; empty -> empty") {
    assert(spansOf("abc", "x*") == Seq.empty)
    import spark.implicits._
    val rows = Seq((1, Option("a1b")), (2, None), (3, Option("")))
      .toDF("id", "t")
      .select(col("id"), TF.matchSpans(col("t"), "\\d").as("sp"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Any](1).nonEmpty)
    assert(rows(1).isNullAt(1), "null text must yield null, not empty")
    assert(rows(2).getSeq[Any](1).isEmpty)
  }

  test("a bad pattern fails at plan time, not per task") {
    val e = intercept[java.util.regex.PatternSyntaxException](
      MatchSpans(col("t"), "(unclosed"))
    assert(e.getMessage.contains("Unclosed"), e.getMessage)
  }

  test("composition law on the corpus: redactSpans over piiSpans equals " +
      "regexp_replace with the same pattern") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, "testdata not available")
    val docs = graft.core.Graft.table(spark, sf, "documents")
    // plant PII deterministically so every row discriminates
    val synth = concat(col("text").substr(1, 30), lit(" u"),
      col("doc_id").cast("string"), lit("@ex.com and 10.1."),
      (col("doc_id") % 256).cast("string"), lit(".9 tel +1 555 2368 ok"))
    val mismatches = docs.select(
        TF.redactSpans(synth, TF.piiSpans(synth), "<PII>").as("via_spans"),
        regexp_replace(synth, TF.PiiPattern, "<PII>").as("via_replace"))
      .filter(col("via_spans") =!= col("via_replace"))
      .count()
    assert(mismatches == 0L)
  }

  test("DetectSpans -> RedactSpans through a TOML topology: tag then " +
      "scrub from config alone") {
    val toml =
      """[fields]
        |names = ["id", "text", "spans"]
        |[input]
        |name = "LogLines"
        |  [input.config]
        |  Lines = ["1,mail a@b.cc now", "2,no pii here"]
        |[[filter]]
        |name = "DetectSpans"
        |  [filter.config]
        |  Field = "text"
        |  SpansField = "spans"
        |[[filter]]
        |name = "RedactSpans"
        |  [filter.config]
        |  Field = "text"
        |  SpansField = "spans"
        |  Token = "<PII>"
        |[output]
        |name = "Nop"
        |fields = ["id", "text", "spans"]
        |""".stripMargin
    val out = graft.topology.Topology.compileToml(spark, toml)
      .projected.orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("mail <PII> now", "no pii here"))
    assert(out(0).getString(2) == "[[5,11]]", out(0).getString(2))
    assert(out(1).getString(2) == "[]")
  }
}
