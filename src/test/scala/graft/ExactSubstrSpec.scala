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

  test("identity window keys (hash = c => c) give collision-FREE exact " +
      "removal and agree with the hashed runs on a real corpus") {
    val docs = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val hashed = ExactSubstr.removeDuplicateWindows(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the exact-string key: no 64-bit collision can ever flag a
    // non-duplicated window (the suffix-array-fidelity stance for a
    // final/audit pass; the hash is the production scale key)
    val exact = ExactSubstr.removeDuplicateWindows(docs, "doc_id", "text", 8,
        hash = c => c)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(hashed == exact)
  }

  // --- suffix grouping: per-repeat exact boundaries ---

  test("suffix grouping recovers the exact extent of a shifted repeat") {
    import spark.implicits._
    // doc 1 embeds doc 0's "a b c d" (4 tokens) at pos 2; k=3 — the
    // anchor groups are "a b c" (ext LCP 1) and "b c d" (ext LCP 0), so
    // the occurrence at pos 2 reports extent 4 and pos 3's extent-3 row
    // is non-maximal (its right end ties)
    val df = Seq((0L, "a b c d e"), (1L, "x y a b c d z")).toDF("doc_id", "text")
    val reps = ExactSubstr.maximalRepeats(df, "doc_id", "text", k = 3, extBudget = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(reps == Set((1L, 2, 4)))
    val occ = ExactSubstr.suffixOccurrences(df, "doc_id", "text", k = 3, extBudget = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3))).toSet
    assert(occ == Set(
      (0L, 0, 4, true), (1L, 2, 4, false),   // "a b c" group, extent 4
      (0L, 1, 3, true), (1L, 3, 3, false)))  // "b c d" group, extent 3
  }

  test("adjacent DISTINCT repeats: two maximal rows where the window " +
      "union reports one interval — the boundary case the window pass fails") {
    import spark.implicits._
    val df = Seq((0L, "p1 p2 p3"), (1L, "q1 q2 q3"),
      (2L, "z1 z2 p1 p2 p3 q1 q2 q3")).toDF("doc_id", "text")
    val reps = ExactSubstr.maximalRepeats(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // P copied from doc 0, Q from doc 1, ADJACENT in doc 2: two repeats
    // with exact boundaries [2,5) and [5,8)
    assert(reps == Set((2L, 2, 3), (2L, 5, 3)))
    val stats = ExactSubstr.suffixDedupStats(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // doc 2: 2 dup occurrences, 2 maximal repeats, max extent 3, nothing
    // capped, but the window-style cover merges them into ONE interval
    // of 6 tokens
    assert(stats(2L) == ((2L, 2L, 3L, 0L, 1L, 6L)))
    assert(stats(0L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(stats(1L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("keeper rule matches flaggedWindows; removed-token counts agree " +
      "with the window pass on a real corpus") {
    val docs = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val win = ExactSubstr.dedupStats(docs, "doc_id", "text", 8)
      .select(col("doc_id"), col("n_tokens_removed"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val suf = ExactSubstr.suffixDedupStats(docs, "doc_id", "text", 8)
      .select(col("doc_id"), col("n_tokens_removed"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(win == suf)
    assert(suf.values.exists(_ > 0L), "test corpus has no duplicated windows")
  }

  test("extBudget caps REPORTED extents; repeats are still flagged whole") {
    import spark.implicits._
    // a 7-token exact copy with k=3, extBudget=2: extents cap at 5, and
    // the capped extents stop shrinking along the run, so maximality
    // quantizes into ceil((L-k)/ext)-ish rows — removal stays exact
    val df = Seq((0L, "a b c d e f g"), (1L, "a b c d e f g")).toDF("doc_id", "text")
    val occ = ExactSubstr.suffixOccurrences(df, "doc_id", "text", k = 3, extBudget = 2)
      .filter(!col("is_keeper"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(occ == Set((0, 5), (1, 5), (2, 5), (3, 4), (4, 3)))
    val stats = ExactSubstr.suffixDedupStats(df, "doc_id", "text", k = 3,
        extBudget = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(stats(1L) == 7L) // the full copy still removes completely
  }

  test("hot-anchor fuse: a planted corpus-wide boilerplate anchor skips " +
      "the extension sort (extent quantizes to k) but still flags every " +
      "occurrence under the exact keeper rule; the cap surfaces in stats") {
    import spark.implicits._
    // 50 docs share an identical 6-token boilerplate tail → its 4
    // interior k=3 anchors have 50 occurrences each, over the cap of 8;
    // docs 1 and 2 additionally share an organic 5-token run whose
    // anchors (group size 2) must stay boundary-exact
    val bp = "bp1 bp2 bp3 bp4 bp5 bp6"
    val df = (0L until 50L).map { i =>
      val organic = if (i == 1L || i == 2L) " o1 o2 o3 o4 o5" else ""
      (i, s"u${i}a u${i}b$organic $bp")
    }.toDF("doc_id", "text")
    val occ = ExactSubstr.suffixOccurrences(df, "doc_id", "text", k = 3,
      extBudget = 4, maxAnchorOccurrences = 8).persist()
    try {
      val capped = occ.filter(col("capped"))
      // every occurrence of the 4 hot anchors is present (50 docs × 4),
      // extent quantized to k, and the keeper is still the GLOBAL
      // (id, pos)-first — doc 0's four interior positions
      assert(capped.count() == 200L)
      assert(capped.filter(col("rep_len") =!= 3).count() == 0L)
      val keepers = capped.filter(col("is_keeper"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(keepers == Set((0L, 2), (0L, 3), (0L, 4), (0L, 5)))
      // the organic group stayed under the cap: doc 2's copy of doc 1's
      // run reports its exact extent (3 + 4-token extension LCP)
      val organic = occ.filter(col("doc_id") === 2 && col("pos") === 2)
        .collect().map(r => (r.getInt(2), r.getBoolean(3), r.getBoolean(4)))
      assert(organic.toSeq == Seq((7, false, false)))
    } finally occ.unpersist()
    val stats = ExactSubstr.suffixDedupStats(df, "doc_id", "text", k = 3,
        extBudget = 4, maxAnchorOccurrences = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(4), r.getLong(6)))).toMap
    // a plain doc: 4 flagged occurrences, all capped, the whole 6-token
    // boilerplate removed; doc 0 is the keeper everywhere → zeros
    assert(stats(5L) == ((4L, 4L, 6L)))
    assert(stats(0L) == ((0L, 0L, 0L)))
    // doc 2 carries the 4 capped boilerplate flags on top of its exact
    // organic ones
    assert(stats(2L)._2 == 4L)
  }

  test("hot-anchor fuse OFF (0): extents stay exact regardless of group " +
      "size, matching the capped pass everywhere the cap did not fire") {
    import spark.implicits._
    val df = (0L until 20L).map(i => (i, s"u$i hot1 hot2 hot3 hot4 tail$i"))
      .toDF("doc_id", "text")
    val off = ExactSubstr.suffixOccurrences(df, "doc_id", "text", k = 3,
      extBudget = 4, maxAnchorOccurrences = 0)
    // "hot1 hot2 hot3" / "hot2 hot3 hot4" have 20 occurrences; uncapped,
    // their extension LCP is exact (extensions diverge at tail$i / at u$i)
    assert(off.filter(col("capped")).count() == 0L)
    val big = ExactSubstr.suffixOccurrences(df, "doc_id", "text", k = 3,
      extBudget = 4, maxAnchorOccurrences = 1000)
    assert(off.collect().toSet == big.collect().toSet)
  }

  test("one-slot occurrence cache: repeated suffix calls reclaim the " +
      "previous frame (at most one cached RDD), releaseCache frees the " +
      "last one, and results stay correct throughout") {
    import spark.implicits._
    val df = (0L until 8L).map(i => (i, s"a b c d$i common tail e f g"))
      .toDF("doc_id", "text")
    def cachedCount: Int =
      spark.sparkContext.getPersistentRDDs.size
    ExactSubstr.releaseCache() // clean slate (other suites may have cached)
    val base = cachedCount
    val r1 = ExactSubstr.suffixDedupStats(df, "doc_id", "text", k = 3,
      maxAnchorOccurrences = 2).collect().toSet
    val after1 = cachedCount
    // three more calls: the registry reclaims each predecessor, so the
    // cached-RDD count never grows past the first call's
    for (_ <- 0 until 3)
      ExactSubstr.suffixDedupStats(df, "doc_id", "text", k = 3,
        maxAnchorOccurrences = 2).collect()
    assert(cachedCount <= after1, s"cache grew: $base -> $after1 -> $cachedCount")
    ExactSubstr.releaseCache()
    assert(cachedCount <= base + (after1 - base - 1).max(0))
    // correctness survives the reclaim churn
    assert(ExactSubstr.suffixDedupStats(df, "doc_id", "text", k = 3,
      maxAnchorOccurrences = 2).collect().toSet == r1)
    ExactSubstr.releaseCache() // leave no blocks for later suites
  }
}
