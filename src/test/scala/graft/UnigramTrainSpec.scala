package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShims

import graft.functions.UnigramViterbiPieces
import graft.llm.UnigramTrain

class UnigramTrainSpec extends SparkSpec {

  private def pieces(vocab: Seq[(String, Int)], maxWordLen: Int = 10)
      (words: String*): Seq[String] = {
    import spark.implicits._
    Seq(Tuple1(words)).toDF("ws")
      .select(GraftShims.toColumn(UnigramViterbiPieces(
        GraftShims.toExpression(col("ws")), vocab, maxWordLen)).as("p"))
      .collect()(0).getSeq[String](0)
  }

  test("argmin pieces match the min-cost segmentation") {
    val v = Seq("ab" -> 10, "abc" -> 25, "c" -> 8, "bc" -> 12,
      "a" -> 20, "b" -> 20)
    // "abc": whole piece costs 25+; ab+c = 10+8 = 18 (2 pieces) wins;
    // a+bc = 20+12 = 32; a+b+c = 48
    assert(pieces(v)("abc") == Seq("ab", "c"))
    // "abcabc" composes the per-boundary optimum
    assert(pieces(v)("abcabc") == Seq("ab", "c", "ab", "c"))
  }

  test("tie-break: smallest piece length at each backtrace position") {
    // two equal-cost segmentations of "aa": (a)(a) = 5+5, (aa) = 10 —
    // packed objective 10*64+2 vs 10*64+1: FEWER pieces wins (aa)
    assert(pieces(Seq("a" -> 5, "aa" -> 10))("aa") == Seq("aa"))
    // exact tie in BOTH cost and piece count: "ab"+"c" vs "a"+"bc",
    // both cost 10, both 2 pieces. Backtrace from the END picks the
    // SMALLEST final piece length: "c" — so (ab)(c), never (a)(bc)
    val tie = Seq("ab" -> 5, "c" -> 5, "a" -> 5, "bc" -> 5)
    assert(pieces(tie)("abc") == Seq("ab", "c"))
  }

  test("overlong, empty, and unreachable words contribute nothing") {
    val v = Seq("a" -> 1)
    assert(pieces(v, maxWordLen = 3)("aaaa", "", "zz", "aa") == Seq("a", "a"))
  }

  test("interpreted and codegen paths agree") {
    val v = Seq("ab" -> 10, "abc" -> 25, "c" -> 8, "a" -> 20, "b" -> 20)
    def run() = pieces(v)("abcabc", "ba")
    val expect = Seq("ab", "c", "ab", "c", "b", "a")
    assert(run() == expect)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(run() == expect)
    }
  }

  test("costsOf is the quantized add-one -log2, bit-length exact") {
    // T = (7 + 1) + 2 = 10; fl2(10) = 3
    // cnt 7 -> (3 - fl2(8))*2 + 2 = (3-3)*2+2 = 2
    // cnt 1 -> (3 - fl2(2))*2 + 2 = (3-1)*2+2 = 6
    assert(UnigramTrain.costsOf(Seq("x" -> 7L, "y" -> 1L), scale = 2) ==
      Seq("x" -> 2, "y" -> 6))
  }

  test("train keeps every single character and bounds the multi vocab") {
    import spark.implicits._
    val df = Seq.tabulate(40)(i => (i.toLong,
      if (i % 2 == 0) "alpha beta alpha" else "beta gamma")).toDF("id", "text")
    val out = UnigramTrain.train(df, "text", rounds = 2, maxPieceLen = 3,
      seedTopN = 15, pruneTopK = 5).collect()
    val ps = out.map(_.getString(0)).toSeq
    // all corpus characters survive both prunes
    val chars = "alphbetgm".map(_.toString).distinct
    assert(chars.forall(ps.contains), s"missing singles in $ps")
    // multi-char vocab bounded by pruneTopK
    assert(ps.count(_.length > 1) <= 5)
    // counts are Viterbi use counts: every kept multi piece that is used
    // has cnt > 0, and the total piece mass covers the corpus words
    val cnt = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cnt.values.sum > 0)
    // deterministic: a second run is bit-identical
    val again = UnigramTrain.train(df, "text", rounds = 2, maxPieceLen = 3,
      seedTopN = 15, pruneTopK = 5).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
