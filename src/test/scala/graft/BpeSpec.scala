package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.llm.Bpe

class BpeSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head().get(0)

  /** Delimited form of a symbol sequence: d("t","h") = ⟨t⟩⟨h⟩. */
  private def d(syms: String*): String =
    syms.map(s => Bpe.Open + s + Bpe.Close).mkString

  test("wrapChars wraps every char; empty word has zero symbols") {
    assert(one(Bpe.wrapChars(lit("that"))) == d("t", "h", "a", "t"))
    assert(one(Bpe.wrapChars(lit("a"))) == d("a"))
    assert(one(Bpe.wrapChars(lit(""))) == Bpe.Open + Bpe.Close)
  }

  test("merge replacement is exact-boundary: symbols never match inside neighbors") {
    // ⟨at⟩⟨ha⟩ contains the chars t,h adjacently but NOT the pair ⟨t⟩⟨h⟩
    val enc = lit(d("at", "ha"))
    assert(one(Bpe.applyMerges(enc, Seq("t" -> "h"))) == d("at", "ha"))
  }

  test("merge handles adjacent repeats left-to-right non-overlapping") {
    // canonical single-pass: ⟨t⟩⟨h⟩⟨t⟩⟨h⟩ → ⟨th⟩⟨th⟩; ⟨a⟩⟨a⟩⟨a⟩ → ⟨aa⟩⟨a⟩
    assert(one(Bpe.applyMerges(lit(d("t", "h", "t", "h")), Seq("t" -> "h")))
      == d("th", "th"))
    assert(one(Bpe.applyMerges(lit(d("a", "a", "a")), Seq("a" -> "a")))
      == d("aa", "a"))
  }

  test("sequential rank-order application builds multi-char symbols") {
    val merges = Seq("t" -> "h", "th" -> "e", "t" -> "a", "l" -> "e",
      "ta" -> "b", "tab" -> "le")
    assert(one(Bpe.encodeWord(lit("table"), merges)) == d("table"))
    assert(one(Bpe.encodeWord(lit("the"), merges)) == d("the"))
    assert(one(Bpe.encodeWord(lit("tables"), merges)) == d("table", "s"))
  }

  test("symbols / symbolPairs / symbolCount round-trip the delimited form") {
    assert(one(Bpe.symbols(lit(d("th", "e")))) == Seq("th", "e"))
    assert(one(Bpe.symbols(lit(Bpe.Open + Bpe.Close))) == Seq())
    assert(one(Bpe.symbolPairs(lit(d("t", "h", "e")))) == Seq("t h", "h e"))
    assert(one(Bpe.symbolPairs(lit(d("the")))) == Seq())
    assert(one(Bpe.symbolCount(lit(d("th", "e") + "|" + d("a")))) == 3L)
    assert(one(Bpe.symbolCount(lit(""))) == 0L)
  }

  test("delimiters are reserved: parens and pipes in text are ordinary symbols") {
    // the old paren representation's failure shape: a rule whose right side
    // is ')' must not let a later rule merge ACROSS a symbol ending in ')'
    val merges = Seq("b" -> ")", "a" -> "b")
    assert(one(Bpe.encodeWord(lit("ab)"), merges)) == d("a", "b)"))
    assert(one(Bpe.symbols(Bpe.encodeWord(lit("ab)"), merges))) == Seq("a", "b)"))
    // '(' and '|' are ordinary one-char symbols; counts stay exact
    assert(one(Bpe.symbolCount(Bpe.encodeText(lit("(( |"), Nil))) == 3L)
    // the reserved control chars themselves are stripped from input
    assert(one(Bpe.wrapChars(lit("a\u0001b\u0002c"))) == d("a", "b", "c"))
  }

  test("pairCounts counts occurrences across words and documents") {
    import spark.implicits._
    val df = Seq("the then", "the").toDF("text")
    val counts = Bpe.pairCounts(df, col("text")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "the" x2 + "then": t-h 3, h-e 3, e-n 1
    assert(counts("t h") == 3L && counts("h e") == 3L && counts("e n") == 1L)
  }

  test("train learns the expected merges on a constructed corpus") {
    import spark.implicits._
    // "low" x4, "lower" x2: (l,o) and (o,w) tie at 6; tie-break on the pair
    // string picks "l o" first, then (lo,w) dominates; at step 3 "e r" and
    // "low e" tie at 2 and "e r" wins the tie-break
    val df = Seq("low low low low", "lower lower").toDF("text")
    val (merges, hist) = Bpe.train(df, col("text"), steps = 3)
    assert(merges == Seq("l" -> "o", "lo" -> "w", "e" -> "r"))
    assert(hist.map(_._3) == Seq(6L, 6L, 2L))
    // encoding under the learned table reflects the merges
    assert(one(Bpe.encodeWord(lit("lower"), merges)) == d("low", "er"))
  }

  test("train stops early when no pairs remain") {
    import spark.implicits._
    val df = Seq("a b c").toDF("text")
    val (merges, hist) = Bpe.train(df, col("text"), steps = 5)
    assert(merges.isEmpty && hist.isEmpty)
  }

  test("trainWordpiece maximizes likelihood gain, not raw count") {
    import spark.implicits._
    // (e,r) is the most FREQUENT pair (6) but e and r are common
    // (e: 9, r: 7 → gain 6/63); (q,u) occurs only 3 times but q appears
    // ONLY before u (q: 3, u: 4 → gain 3/12 = 1/4) — the gain rule picks
    // "q u" first where raw-count BPE would pick "e r"
    val df = Seq("er er er er er er", "qu qu qu ue", "e e e r").toDF("text")
    val (wm, wh) = Bpe.trainWordpiece(df, col("text"), steps = 1)
    assert(wm == Seq("q" -> "u"), wm.toString)
    assert(wh == Seq((1, "q u", 3L)))
    val (bm, _) = Bpe.train(df, col("text"), steps = 1)
    assert(bm == Seq("e" -> "r"), bm.toString)
  }

  test("trainWordpiece cross-multiplied ties break on the pair string") {
    import spark.implicits._
    // "ab" and "cd": both pairs occur twice, all four symbols occur
    // twice — identical gain 2/4; the tie-break picks "a b"
    val df = Seq("ab cd", "ab cd").toDF("text")
    val (m, h) = Bpe.trainWordpiece(df, col("text"), steps = 2)
    assert(m.head == ("a" -> "b"), m.toString)
    assert(h.head == ((1, "a b", 2L)))
    // after merging, "c d" is the sole remaining pair
    assert(m(1) == ("c" -> "d"))
  }

  test("c4KeepLine enforces punct, min words, javascript, and brace rules") {
    def keep(s: String): Boolean =
      one(TF.c4KeepLine(lit(s))).asInstanceOf[Boolean]
    assert(keep("this line has plenty of words and ends well."))
    assert(keep("does this line end with a question mark?"))
    assert(!keep("this line has plenty of words but no terminal punct"))
    assert(!keep("tiny line."))
    assert(!keep("enable javascript to view this fine content please."))
    assert(!keep("function f() { return a plus b to the caller; }."))
  }

  test("C4Clean + BpeEncode TOML components") {
    val dir = java.nio.file.Files.createTempDirectory("graft-c4bpe").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "in.csv").toPath,
      "1|this good line has plenty of words here.\n" +
        "2|tiny line.\n" +
        "3|that the\n")
    val toml =
      s"""[fields]
         |names = ["id", "text", "bpe", "n_bpe"]
         |[csv]
         |field_separator = "|"
         |[[filter]]
         |name = "BpeEncode"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "bpe"
         |  CountField = "n_bpe"
         |  Merges = ["t h", "th e", "th a", "tha t"]
         |[[filter]]
         |name = "C4Clean"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "text"
         |  MinKept = 1
         |  Gate = true
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$dir/in.csv"]
         |[output]
         |name = "Recorder"
         |fields = ["id", "text", "bpe", "n_bpe"]
         |""".stripMargin
    graft.topology.Topology.compileToml(spark, toml, env = Map.empty).run()
    // record 2 fails the line rules (2 words) and record 3 has no terminal
    // punctuation: with Gate=true only record 1 survives; its BPE encoding
    // (computed BEFORE the gate) reflects the merge chain
    val rows = graft.topology.BuiltinComponents.Recorder.last
    assert(rows.size == 1)
    val r = rows.head
    assert(r.getString(0) == "1")
    assert(r.getString(1) == "this good line has plenty of words here.")
    assert(r.getString(2).startsWith(
      d("th", "i", "s") + "|" + d("g", "o", "o", "d") + "|"))
    assert(r.getString(3).toLong ==
      r.getString(2).count(_.toString == Bpe.Open).toLong)
  }

  test("c4KeptLines + c4Passes gate pages on kept lines and lorem ipsum") {
    val good = (1 to 3).map(i => s"good line number $i with enough words here.")
    val page = (good :+ "bad line").mkString("\n")
    assert(one(TF.c4KeptLines(lit(page))) == good)
    assert(one(TF.c4Passes(lit(page))).asInstanceOf[Boolean])
    // one fewer kept line → fails the >=3 gate
    assert(!one(TF.c4Passes(lit(good.take(2).mkString("\n"))))
      .asInstanceOf[Boolean])
    // lorem ipsum anywhere kills the page even with enough kept lines
    assert(!one(TF.c4Passes(lit((good :+ "lorem ipsum dolor sit amet.")
      .mkString("\n")))).asInstanceOf[Boolean])
  }
}
