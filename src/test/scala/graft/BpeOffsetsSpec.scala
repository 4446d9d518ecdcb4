package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.llm.Bpe

/** [[Bpe.encodeWithOffsets]] + [[TF.spanOverlapMask]] — the bridge from
  * character-space span attributes to token-space loss masks. Pinned: the
  * substring law on raw multi-space text (each token's [s, e) slice of
  * the ORIGINAL text is the token), per-word tiling, code-point offsets
  * across emoji, mask projection semantics incl. the null-tolerance
  * rules, and alignment with [[Bpe.encodeText]]'s tokenization.
  */
class BpeOffsetsSpec extends SparkSpec {

  private val merges = Seq("t" -> "h", "th" -> "e", "a" -> "b")

  private def toks(text: String): Seq[(String, Int, Int)] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(explode(Bpe.encodeWithOffsets(col("t"), merges)).as("tk"))
      .select(col("tk.tok"), col("tk.s"), col("tk.e"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
  }

  test("substring law on raw text: slicing [s, e) reproduces every token, " +
      "through leading/multi/trailing whitespace") {
    val text = "  the  theab   x "
    val ts = toks(text)
    assert(ts.nonEmpty)
    ts.foreach { case (tok, s, e) =>
      assert(text.substring(s, e) == tok, s"($tok, $s, $e)")
    }
    // 'the' is one merged symbol; 'theab' merges to 'the'+'ab'
    assert(ts == Seq(("the", 2, 5), ("the", 7, 10), ("ab", 10, 12),
      ("x", 15, 16)))
  }

  test("per-word tiling: symbols cover each word contiguously with no " +
      "gaps or overlaps") {
    val text = "abthe zzz the"
    val words = Seq((0, 5), (6, 9), (10, 13))
    val ts = toks(text)
    var wi = 0
    var pos = words.head._1
    ts.foreach { case (_, s, e) =>
      if (s != pos) { wi += 1; pos = words(wi)._1 }
      assert(s == pos, s"gap before $s"); pos = e
    }
    assert(pos == words.last._2)
  }

  test("offsets are code points: tokens after an emoji slice correctly") {
    val text = "🙂🙂 the ab"
    val ts = toks(text)
    // no merge rule touches the emoji, so each stays its own symbol — at
    // code-point offsets 0 and 1 (UTF-16 would say 0/2 and shift 'the')
    assert(ts.map(t => (t._1, t._2, t._3)) ==
      Seq(("🙂", 0, 1), ("🙂", 1, 2), ("the", 3, 6), ("ab", 7, 9)))
    ts.foreach { case (tok, s, e) =>
      // substring by code point, not UTF-16
      val cps = text.codePoints().toArray
      assert(new String(cps, s, e - s) == tok)
    }
  }

  test("normalized offsets index the single-space-joined text exactly") {
    import spark.implicits._
    val messy = "  the  theab   x "
    val normed = "the theab x"
    val both = Seq((1, messy), (2, normed)).toDF("id", "t")
      .select(col("id"), explode(Bpe.encodeWithOffsets(col("t"), merges)).as("tk"))
      .select(col("id"), col("tk.tok"), col("tk.norm_s"), col("tk.norm_e"))
      .collect().groupBy(_.getInt(0))
    // norm offsets of the messy text == raw offsets of the normalized one
    val a = both(1).map(r => (r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    val b = both(2).map(r => (r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    assert(a == b)
    a.foreach { case (tok, s, e) => assert(normed.substring(s, e) == tok) }
  }

  test("null -> empty token list; empty/blank -> empty") {
    import spark.implicits._
    val rows = Seq((1, Option("a b")), (2, None), (3, Option("   ")))
      .toDF("id", "t")
      .select(col("id"), Bpe.encodeWithOffsets(col("t"), merges).as("tk"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Any](1).size == 2)
    assert(rows(1).getSeq[Any](1).isEmpty)
    assert(rows(2).getSeq[Any](1).isEmpty)
  }

  test("tokenization agrees with encodeText: same symbols in the same order") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, "testdata not available")
    val docs = graft.core.Graft.table(spark, sf, "documents")
    val mismatches = docs.select(
        array_join(transform(
          Bpe.encodeWithOffsets(col("text"), merges),
          tk => tk.getField("tok")), "|").as("a"),
        // Close+Open (a symbol boundary) → "|", then strip the outer
        // delimiters: symbols joined by "|" with the word joiner also "|"
        regexp_replace(replace(Bpe.encodeText(col("text"), merges),
          lit(Bpe.Close + Bpe.Open), lit("|")),
          s"[${Bpe.Open}${Bpe.Close}]", "").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0L)
  }

  test("spanOverlapMask: half-open overlap, empty/null attr spans mask " +
      "nothing, null bounds mask nothing") {
    import spark.implicits._
    val tk = Bpe.encodeWithOffsets(col("t"), merges)
    def maskOf(attr: org.apache.spark.sql.Column): Seq[Boolean] =
      Seq("ab the x").toDF("t")
        .select(explode(TF.spanOverlapMask(tk, attr)).as("m"))
        .collect().map(_.getBoolean(0)).toSeq
    // tokens: ab [0,2), the [3,6), x [7,8)
    assert(maskOf(array(struct(lit(2).as("s"), lit(3).as("e")))) ==
      Seq(false, false, false), "touching boundaries do not overlap")
    assert(maskOf(array(struct(lit(1).as("s"), lit(4).as("e")))) ==
      Seq(true, true, false))
    assert(maskOf(lit(null).cast("array<struct<s:int,e:int>>")) ==
      Seq(false, false, false), "null attr spans mask nothing")
    assert(maskOf(array(struct(lit(null).cast("int").as("s"),
      lit(5).as("e")))) == Seq(false, false, false),
      "a null bound must never widen to full extent")
  }
}
