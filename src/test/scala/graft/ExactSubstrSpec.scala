package graft

import org.apache.spark.sql.functions._

import graft.llm.ExactSubstr

class ExactSubstrSpec extends SparkSpec {

  // doc 1: "a b c d e f" — the source of the repeat
  // doc 2: "x a b c d y" — embeds the 4-run "a b c d" at pos 1 (shifted
  //         alignment: fixed 4-chunks [x a b c][d y] would MISS it)
  // doc 3: "a b c d e f" — an exact copy of doc 1
  // doc 4: "q r s"       — shorter than k, emits nothing
  private def corpus = {
    import spark.implicits._
    Seq((1L, "a b c d e f"), (2L, "x a b c d y"), (3L, "a b c d e f"),
      (4L, "q r s")).toDF("doc_id", "text")
  }

  test("flags every duplicated window at any alignment, keeps first occurrences") {
    val flagged = ExactSubstr.flaggedWindows(corpus, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // windows k=4: doc1 {abcd@0, bcde@1, cdef@2} all first occurrences;
    // doc2 {xabc@0 unique, abcd@1 dup of doc1@0, bcdy@2 unique};
    // doc3 duplicates all three of doc1's windows; doc4 none
    assert(flagged == Set((2L, 1), (3L, 0), (3L, 1), (3L, 2)))
  }

  test("stats: interval union clips overlapping windows; zero rows survive") {
    val got = ExactSubstr.dedupStats(corpus, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc3's three flagged windows at 0,1,2 overlap: union [0,6) = 6
    // tokens, not 12; doc2 loses exactly its 4-token embedded run
    assert(got == Map(
      1L -> ((3L, 0L, 0L)),
      2L -> ((3L, 1L, 4L)),
      3L -> ((3L, 3L, 6L)),
      4L -> ((0L, 0L, 0L))))
  }

  test("removal excises flagged runs, keeps the first copy verbatim") {
    val got = ExactSubstr.removeDuplicateWindows(corpus, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "a b c d e f",   // keeper: untouched
      2L -> "x y",           // the embedded "a b c d" run removed
      3L -> "",              // exact copy: fully removed
      4L -> "q r s"))        // too short to window: untouched
  }

  test("xxhash64 and md5 window keys flag identical sets (real corpus)") {
    val docs = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val a = ExactSubstr.dedupStats(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = ExactSubstr.dedupStats(docs, "doc_id", "text", 8, md5(_))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
    // and the corpus actually exercises the operator (planted duplicates)
    assert(a.exists(_._3 > 0L), "test corpus has no duplicated windows")
  }

  test("single flagged window and adjacent non-overlapping runs count exactly") {
    import spark.implicits._
    // doc 11 repeats doc 10's "a b" at two DISJOINT positions (0 and 3):
    // union = 2 + 2 = 4; also guards the sequence(1, n-1) n=1 edge case
    // via doc 12's single flagged window
    val df = Seq((10L, "a b z a b"), (11L, "a b w a b"), (12L, "c d"),
      (13L, "c d")).toDF("doc_id", "text")
    val got = ExactSubstr.dedupStats(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // doc10: "a b"@3 duplicates its OWN pos 0 → within-doc dedup works
    assert(got(10L) == ((1L, 2L)))
    assert(got(11L) == ((2L, 4L)))
    assert(got(12L) == ((0L, 0L)))
    assert(got(13L) == ((1L, 2L)))
  }
}
