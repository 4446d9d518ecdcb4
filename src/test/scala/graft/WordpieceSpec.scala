package graft

import org.apache.spark.sql.functions._

import graft.llm.Wordpiece

class WordpieceSpec extends SparkSpec {

  private val vocab = Seq("un", "##aff", "##able", "##ffa", "aff", "able",
    "a", "##a", "b", "##b", "##le")

  private def enc(words: String*): Seq[String] = {
    import spark.implicits._
    Seq(Tuple1(words)).toDF("ws")
      .select(Wordpiece.encodeWordsCol(col("ws"), vocab).as("e"))
      .collect()(0).getSeq[String](0)
  }

  test("greedy longest-match-first with ## continuations") {
    // "unaffable" → un + ##aff + ##able (BERT's canonical example shape).
    // Greedy: at cursor 0 the longest start piece is "un" (not "u": absent);
    // then "##aff" (4 surface chars) beats "##a"; then "##able".
    assert(enc("unaffable") == Seq("un ##aff ##able"))
    // whole-word piece wins over a split when longest
    assert(enc("able") == Seq("able"))
    // greedy is NOT optimal: "affable" → aff + ##able
    assert(enc("affable") == Seq("aff ##able"))
  }

  test("unmatchable words collapse to [UNK] whole, not partially") {
    // "z" has no piece; "az" starts fine (a) then dies on ##z
    assert(enc("z", "az", "ab") == Seq("[UNK]", "[UNK]", "a ##b"))
  }

  test("maxWordLen guard and empty word") {
    import spark.implicits._
    val long = "a" * 40
    val got = Seq(Tuple1(Seq(long, ""))).toDF("ws")
      .select(Wordpiece.encodeWordsCol(col("ws"), vocab, maxWordLen = 32).as("e"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("[UNK]", ""))
    // within the limit the same word encodes
    val ok = Seq(Tuple1(Seq("a" * 32))).toDF("ws")
      .select(Wordpiece.encodeWordsCol(col("ws"), vocab, maxWordLen = 32).as("e"))
      .collect()(0).getSeq[String](0)
    assert(ok == Seq(("a" +: Seq.fill(31)("##a")).mkString(" ")))
  }

  test("interpreted and codegen paths agree; encode() emits the flat stream") {
    import spark.implicits._
    val df = Seq((1L, "unaffable able affable"), (2L, "  "), (3L, "b a"))
      .toDF("doc_id", "text")
    def run() = Wordpiece.encode(df, "doc_id", "text", vocab)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expect = Seq(
      1L -> "un ##aff ##able able aff ##able",
      3L -> "b a") // blank doc 2 drops
    assert(run() == expect)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(run() == expect)
    }
  }

  private val segVocab = Seq(
    "ab" -> 10, "abc" -> 25, "c" -> 8, "bc" -> 12, "a" -> 20, "b" -> 20)

  private def segStats(texts: (Long, String)*) = {
    import spark.implicits._
    graft.llm.UnigramSegment.segmentStats(
        texts.toDF("doc_id", "text"), "doc_id", "text", segVocab, unkCost = 1000)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  test("unigram Viterbi picks the global optimum, not the greedy path") {
    // "abc": greedy-longest would take "abc" (25); optimal is ab+c = 18.
    // Lexicographic tie-break: "abc" also = a+bc (32), b? no: min is 18/2.
    assert(segStats(1L -> "abc") == Seq((1L, 1L, 18L, 2L, 0L)))
    // tie on cost prefers fewer pieces: "abcc": ab+c+c = 26/3 vs abc+c = 33/2
    // → cost wins first (26). Craft a real tie: "cc" = c+c only. Use
    // "ab" (10/1) vs a+b (40/2): whole piece wins.
    assert(segStats(2L -> "ab") == Seq((2L, 1L, 10L, 1L, 0L)))
  }

  test("unigram unreachable words charge unkCost once; stats sum per doc") {
    // "zz" unreachable → unk (1000, 1 piece, flagged); "abc c" = 18+8
    assert(segStats(3L -> "abc c zz") == Seq((3L, 3L, 1026L, 4L, 1L)))
    // blank docs drop
    assert(segStats(4L -> "  ").isEmpty)
  }

  test("unigram interpreted and codegen paths agree") {
    def run() = segStats(1L -> "abc ab c zz abcc")
    val expect = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(run() == expect)
    }
    // abcc: ab+c+c = 26/3; abc+c = 33/2 → 26 wins
    assert(expect == Seq((1L, 5L, 18L + 10L + 8L + 1000L + 26L, 2 + 1 + 1 + 1 + 3L, 1L)))
  }

  test("null word element stays null; plan is map-only inside codegen") {
    import spark.implicits._
    val got = Seq(Tuple1(Seq("able", null))).toDF("ws")
      .select(Wordpiece.encodeWordsCol(col("ws"), vocab).as("e"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("able", null))
    val df = Seq((1L, "able")).toDF("doc_id", "text")
    val plan = Wordpiece.encode(df, "doc_id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"wordpiece must be map-only:\n$plan")
  }

  test("unigram cost model rejects negative costs at construction") {
    import org.apache.spark.sql.GraftShims
    // the (cost*64 + pieces) packing only round-trips through
    // shiftright/&63 for non-negative costs
    val child = GraftShims.toEagerExpression(
      graft.functions.TextFunctions.tokens(col("text")))
    intercept[IllegalArgumentException](
      graft.functions.UnigramSegmentCost(child, Seq("a" -> -1)))
    intercept[IllegalArgumentException](
      graft.functions.UnigramSegmentCost(child, Seq("a" -> 1), unkCost = -5))
  }
}
