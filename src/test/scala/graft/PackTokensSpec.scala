package graft

import org.apache.spark.sql.functions._

import graft.llm.Pack

/** [[Pack.packTokens]] — materialized GPT-style packing: exact cut
  * positions (agreeing with [[Pack.concatChunk]]'s layout), padding only
  * on each shard's final sequence, per-sequence segment ordinals,
  * loss-mask carry-through, the mask-length loud fail, and the
  * single-exchange plan.
  */
class PackTokensSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def pack(df: DataFrame, budget: Int): DataFrame =
    Pack.packTokens(df, col("doc_id"), col("toks"), col("msk"), budget,
      lit(0), padId = -9)

  private def docs(rows: (Long, Seq[Int], Seq[Boolean])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "toks", "msk")
  }

  test("documents split across cuts exactly where concatChunk says; " +
      "segments reset per sequence; only the last sequence pads") {
    // doc1: 3 toks, doc2: 4 toks (spans seqs 0→1), doc3: 2 toks
    val df = docs(
      (1L, Seq(10, 11, 12), Seq(true, false, true)),
      (2L, Seq(20, 21, 22, 23), Seq(false, false, true, true)),
      (3L, Seq(30, 31), Seq(true, true)))
    val out = pack(df, 5).orderBy("seq_id").collect()
    assert(out.length == 2)
    // seq 0: [10 11 12 | 20 21], segments [0 0 0 1 1], full
    assert(out(0).getSeq[Int](2) == Seq(10, 11, 12, 20, 21))
    assert(out(0).getSeq[Int](3) == Seq(0, 0, 0, 1, 1))
    assert(out(0).getSeq[Boolean](4) == Seq(true, false, true, false, false))
    assert(out(0).getInt(5) == 5)
    // seq 1: [22 23 | 30 31] + pad, doc2's tail is segment 0 HERE
    assert(out(1).getSeq[Int](2) == Seq(22, 23, 30, 31, -9))
    assert(out(1).getSeq[Int](3) == Seq(0, 0, 1, 1, -1))
    assert(out(1).getSeq[Boolean](4) == Seq(true, true, true, true, false))
    assert(out(1).getInt(5) == 4)
  }

  test("eosId/bosId: per-document terminators flow through the cut " +
      "arithmetic; EOS is trained on, BOS is not; empty docs get neither") {
    // doc1: 3 toks + BOS/EOS = 5 units exactly; doc2: 2 toks + BOS/EOS
    // spans the cut (its EOS lands first in seq 1); doc3 empty
    val df = docs(
      (1L, Seq(10, 11, 12), Seq(true, false, true)),
      (2L, Seq(20, 21), Seq(true, true)),
      (3L, Seq.empty, Seq.empty))
    val out = Pack.packTokens(df, col("doc_id"), col("toks"), col("msk"),
        5, lit(0), padId = -9, eosId = Some(0), bosId = Some(-3))
      .orderBy("seq_id").collect()
    assert(out.length == 2)
    // seq 0: [-3 10 11 12 0], segments all doc-0, BOS masked out, EOS in
    assert(out(0).getSeq[Int](2) == Seq(-3, 10, 11, 12, 0))
    assert(out(0).getSeq[Int](3) == Seq(0, 0, 0, 0, 0))
    assert(out(0).getSeq[Boolean](4) == Seq(false, true, false, true, true))
    assert(out(0).getInt(5) == 5)
    // seq 1: [-3 20 21 0] + pad — doc2 whole with its specials
    assert(out(1).getSeq[Int](2) == Seq(-3, 20, 21, 0, -9))
    assert(out(1).getSeq[Int](3) == Seq(0, 0, 0, 0, -1))
    assert(out(1).getSeq[Boolean](4) == Seq(false, true, true, true, false))
    assert(out(1).getInt(5) == 4)
    // EOS alone: terminator appended, nothing prepended
    val eosOnly = Pack.packTokens(df, col("doc_id"), col("toks"), col("msk"),
        4, lit(0), padId = -9, eosId = Some(0))
      .orderBy("seq_id").collect()
    assert(eosOnly(0).getSeq[Int](2) == Seq(10, 11, 12, 0))
    assert(eosOnly(1).getSeq[Int](2) == Seq(20, 21, 0, -9))
  }

  test("a document longer than the budget tiles whole sequences") {
    val df = docs((1L, (0 until 12).toList, Seq.fill(12)(true)))
    val out = pack(df, 5).orderBy("seq_id").collect()
    assert(out.length == 3)
    assert(out.map(_.getInt(5)).toSeq == Seq(5, 5, 2))
    assert(out(1).getSeq[Int](2) == Seq(5, 6, 7, 8, 9))
    assert(out(2).getSeq[Int](2) == Seq(10, 11, -9, -9, -9))
  }

  test("empty/null token arrays contribute nothing; shards pack " +
      "independently") {
    import spark.implicits._
    val df = Seq(
      (1L, 0, Seq(1, 2, 3), Seq(true, true, true)),
      (2L, 0, Seq.empty[Int], Seq.empty[Boolean]),
      (3L, 1, Seq(7, 8), Seq(false, false)))
      .toDF("doc_id", "sh", "toks", "msk")
    val out = Pack.packTokens(df, col("doc_id"), col("toks"), col("msk"),
        4, col("sh")).orderBy("shard", "seq_id").collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Int](2) == Seq(1, 2, 3, 0))
    assert(out(1).getSeq[Int](2) == Seq(7, 8, 0, 0))
  }

  test("layout agrees with concatChunk: each doc's first token lands at " +
      "(seq_id, seq_offset)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1L to 40L).map(i =>
      (i, i % 3, Seq.fill(1 + rnd.nextInt(9))(i.toInt)))
      .toSeq.toDF("doc_id", "sh", "toks")
      .withColumn("msk", transform(col("toks"), _ => lit(true)))
    val assigned = Pack.concatChunk(df, col("doc_id"), size(col("toks")),
      7L, col("sh")).select(col("doc_id"), col("sh"), col("toks"),
      col("seq_id"), col("seq_offset")).collect()
    val packed = Pack.packTokens(df, col("doc_id"), col("toks"), col("msk"),
        7, col("sh")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Int](2)).toMap
    assigned.foreach { r =>
      val (id, sh, toks) = (r.getLong(0), r.getLong(1), r.getSeq[Int](2))
      val seq = packed((sh, r.getLong(3)))
      assert(seq(r.getLong(4).toInt) == toks.head,
        s"doc $id first token misplaced")
    }
  }

  test("mask/tokens length mismatch fails loudly") {
    val df = docs((1L, Seq(1, 2, 3), Seq(true)))
    val e = intercept[Exception](pack(df, 4).collect())
    assert(e.getMessage != null)
  }

  test("mask LONGER than tokens fails loudly too (slice bounds derive " +
      "from the token length, so the surplus would silently drop)") {
    val df = docs((1L, Seq(1, 2, 3), Seq(true, false, true, true, false)))
    val e = intercept[Exception](pack(df, 4).collect())
    assert(e.getMessage != null)
  }

  test("end to end: piiSpans -> encodeWithOffsets -> spanOverlapMask -> " +
      "packTokens: packed loss mask flags exactly the PII tokens") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val df = Seq(
      (1L, "write to a@b.cc about the offer"),
      (2L, "clean text with no addresses here"),
      (3L, "two hits a@b.cc and c@d.ee inside"))
      .toDF("doc_id", "text")
    val merges = Seq("t" -> "h", "th" -> "e")
    val toks = graft.llm.Bpe.encodeWithOffsets(col("text"), merges)
    val mask = TF.spanOverlapMask(toks, TF.piiSpans(col("text")))
    val packed = graft.llm.Pack.packTokens(
      df.withColumn("tk", transform(toks, t => crc32(t.getField("tok")
          .cast("binary")).cast("int")))
        .withColumn("mk", mask),
      col("doc_id"), col("tk"), col("mk"), 16, lit(0))
    // reconstruct: flag positions across sequences in seq order must
    // equal the per-doc mask flags in doc order
    val packedFlags = packed.orderBy("seq_id")
      .select(explode(col("loss_mask"))).collect().map(_.getBoolean(0))
    val docFlags = df.orderBy("doc_id")
      .select(explode(mask)).collect().map(_.getBoolean(0))
    assert(packedFlags.take(docFlags.length).toSeq == docFlags.toSeq)
    assert(packedFlags.drop(docFlags.length).forall(!_), "pad must be false")
    // and the flagged symbols, concatenated per doc, spell out exactly
    // the PII matches (the demo merges leave the emails as char symbols)
    val flaggedPerDoc = df.orderBy("doc_id").select(
        array_join(transform(filter(zip_with(toks, mask,
          (t, m) => struct(t.getField("tok").as("tok"), m.as("m"))),
          x => x.getField("m")), x => x.getField("tok")), "").as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(flaggedPerDoc == Seq("a@b.cc", "", "a@b.ccc@d.ee"))
  }

  test("plan shape: ONE exchange — the window's shard partitioning " +
      "serves the (shard, seq_id) aggregation") {
    val df = docs((1L, Seq(1, 2), Seq(true, true)))
    val plan = pack(df, 4).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  // --- packTokensGreedy (the materialized no-split / SFT layout) ---

  private def packG(df: DataFrame, budget: Int): DataFrame =
    Pack.packTokensGreedy(df, col("doc_id"), col("toks"), col("msk"), budget,
      lit(0), padId = -9)

  test("greedy rows: documents stay whole, a sequence opens exactly on " +
      "would-overflow, layout agrees with packGreedy's assignment") {
    // doc1: 3, doc2: 4 (would overflow seq 0 at budget 5 -> opens seq 1),
    // doc3: 1 (fits after doc2)
    val df = docs(
      (1L, Seq(10, 11, 12), Seq(true, false, true)),
      (2L, Seq(20, 21, 22, 23), Seq(false, false, true, true)),
      (3L, Seq(30), Seq(true)))
    val out = packG(df, 5).orderBy("seq_id").collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Int](2) == Seq(10, 11, 12, -9, -9))
    assert(out(0).getSeq[Int](3) == Seq(0, 0, 0, -1, -1))
    assert(out(0).getSeq[Boolean](4) == Seq(true, false, true, false, false))
    assert(out(0).getInt(5) == 3)
    assert(out(1).getSeq[Int](2) == Seq(20, 21, 22, 23, 30))
    assert(out(1).getSeq[Int](3) == Seq(0, 0, 0, 0, 1))
    assert(out(1).getSeq[Boolean](4) == Seq(false, false, true, true, true))
    assert(out(1).getInt(5) == 5)
    // the assignment-only form agrees on every (seq_id, seq_offset)
    val assigned = Pack.packGreedy(df, col("doc_id"), size(col("toks")),
        5L, lit(0)).select("doc_id", "seq_id", "seq_offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(assigned == Map(1L -> ((0L, 0L)), 2L -> ((1L, 0L)), 3L -> ((1L, 4L))))
  }

  test("greedy rows: empty docs contribute nothing; shards pack and " +
      "number sequences independently") {
    import spark.implicits._
    val df = Seq(
      (1L, 0, Seq(1, 2, 3), Seq(true, true, true)),
      (2L, 0, Seq.empty[Int], Seq.empty[Boolean]),
      (3L, 0, Seq(4, 5), Seq(false, false)),
      (4L, 1, Seq(7, 8), Seq(false, true)))
      .toDF("doc_id", "sh", "toks", "msk")
    val out = Pack.packTokensGreedy(df, col("doc_id"), col("toks"), col("msk"),
        4, col("sh")).orderBy("shard", "seq_id").collect()
    assert(out.length == 3)
    assert(out(0).getSeq[Int](2) == Seq(1, 2, 3, 0)) // doc3 (2) won't fit
    assert(out(1).getSeq[Int](2) == Seq(4, 5, 0, 0))
    assert(out(1).getLong(1) == 1L)
    assert(out(2).getSeq[Int](2) == Seq(7, 8, 0, 0)) // shard 1 restarts at 0
    assert(out(2).getLong(1) == 0L)
  }

  test("greedy rows: sepId writes BETWEEN turns (preceding segment, no " +
      "loss), costs a budget slot in the fits-test, never trails") {
    val df = docs(
      (1L, Seq(10, 11), Seq(true, true)),
      (2L, Seq(20, 21), Seq(true, false)),
      (3L, Seq(30, 31), Seq(false, true)))
    // budget 5 with sep: doc1(2) + sep(1) + doc2(2) = 5 full; doc3 opens
    // seq 1 with NO leading sep
    val out = Pack.packTokensGreedy(df, col("doc_id"), col("toks"),
        col("msk"), 5, lit(0), padId = -9, sepId = Some(99))
      .orderBy("seq_id").collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Int](2) == Seq(10, 11, 99, 20, 21))
    assert(out(0).getSeq[Int](3) == Seq(0, 0, 0, 1, 1)) // sep = turn 0's
    assert(out(0).getSeq[Boolean](4) == Seq(true, true, false, true, false))
    assert(out(0).getInt(5) == 5)
    assert(out(1).getSeq[Int](2) == Seq(30, 31, -9, -9, -9))
    assert(out(1).getInt(5) == 2)
    // WITHOUT sep the same corpus packs doc1+doc2 into 4 of 5 slots (one
    // spare, but doc3 needs two) — sepId = None stays byte-identical to
    // the pre-separator layout
    val plain = packG(df, 5).orderBy("seq_id").collect()
    assert(plain(0).getSeq[Int](2) == Seq(10, 11, 20, 21, -9))
    assert(plain(1).getSeq[Int](2) == Seq(30, 31, -9, -9, -9))
  }

  test("greedy rows: eosId/bosId extend every non-empty document " +
      "(EOS trained on, BOS masked out), count against the fits-test, " +
      "and compose with sepId") {
    val df = docs(
      (1L, Seq(10, 11), Seq(true, true)),
      (2L, Seq(20), Seq(false)),
      (3L, Seq(30), Seq(true)))
    // budget 6 with bos/eos: doc1 becomes B,10,11,E (4) — doc2's B,20,E
    // (3) would overflow, so seq 1 opens; doc3's (3) fits after doc2
    val out = Pack.packTokensGreedy(df, col("doc_id"), col("toks"),
        col("msk"), 6, lit(0), padId = -9, eosId = Some(0), bosId = Some(-3))
      .orderBy("seq_id").collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Int](2) == Seq(-3, 10, 11, 0, -9, -9))
    assert(out(0).getSeq[Int](3) == Seq(0, 0, 0, 0, -1, -1))
    assert(out(0).getSeq[Boolean](4) ==
      Seq(false, true, true, true, false, false))
    assert(out(0).getInt(5) == 4)
    assert(out(1).getSeq[Int](2) == Seq(-3, 20, 0, -3, 30, 0))
    assert(out(1).getSeq[Int](3) == Seq(0, 0, 0, 1, 1, 1))
    assert(out(1).getSeq[Boolean](4) ==
      Seq(false, false, true, false, true, true))
    assert(out(1).getInt(5) == 6)
    // with sepId too: doc2 then needs B,20,E + leading sep = 4 after
    // doc1's 4 → overflows 7? budget 8: 4 + 1 + 3 = 8 exactly, sep takes
    // turn 0's segment and mask false
    val sft = Pack.packTokensGreedy(df.filter(col("doc_id") < 3),
        col("doc_id"), col("toks"), col("msk"), 8, lit(0), padId = -9,
        sepId = Some(99), eosId = Some(0), bosId = Some(-3))
      .orderBy("seq_id").collect()
    assert(sft.length == 1)
    assert(sft(0).getSeq[Int](2) == Seq(-3, 10, 11, 0, 99, -3, 20, 0))
    assert(sft(0).getSeq[Int](3) == Seq(0, 0, 0, 0, 0, 1, 1, 1))
    assert(sft(0).getSeq[Boolean](4) ==
      Seq(false, true, true, true, false, false, false, true))
    // empty docs still contribute nothing — no lone BOS/EOS rows
    import spark.implicits._
    val withEmpty = Seq((1L, Seq.empty[Int], Seq.empty[Boolean]))
      .toDF("doc_id", "toks", "msk")
    assert(Pack.packTokensGreedy(withEmpty, col("doc_id"), col("toks"),
      col("msk"), 6, lit(0), eosId = Some(0), bosId = Some(-3))
      .count() == 0)
  }

  test("greedy rows: a document larger than the budget fails loudly " +
      "(it can never be materialized whole)") {
    val df = docs((1L, (0 until 12).toList, Seq.fill(12)(true)))
    val e = intercept[Exception](packG(df, 5).collect())
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(chain(e).exists(_.contains("exceeds")), chain(e).mkString(" | "))
  }

  test("greedy rows: mask/tokens mismatch fails loudly") {
    val df = docs((1L, Seq(1, 2, 3), Seq(true)))
    val e = intercept[Exception](packG(df, 4).collect())
    assert(e.getMessage != null)
  }

  test("greedy rows agree with packGreedy's assignment on a randomized " +
      "multi-shard corpus (every token at its assigned offset)") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val df = (1L to 120L).map(i =>
      (i, i % 5, Seq.fill(1 + rnd.nextInt(9))(rnd.nextInt(1000))))
      .toSeq.toDF("doc_id", "sh", "toks")
      .withColumn("msk", transform(col("toks"), x => x % 2 === 0))
    val rows = Pack.packTokensGreedy(df, col("doc_id"), col("toks"), col("msk"),
        12, col("sh"), padId = -1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getSeq[Int](2), r.getSeq[Int](3), r.getSeq[Boolean](4),
          r.getInt(5)))).toMap
    val assigned = Pack.packGreedy(df, col("doc_id"), size(col("toks")),
        12L, col("sh"))
      .select("doc_id", "toks", "shard", "seq_id", "seq_offset").collect()
    // every doc's tokens sit exactly at (seq_id, seq_offset..) of its row
    for (r <- assigned) {
      val toks = r.getSeq[Int](1)
      val (ids, _, mask, _) = rows((r.getLong(2), r.getLong(3)))
      val off = r.getLong(4).toInt
      assert(ids.slice(off, off + toks.length) == toks,
        s"doc ${r.getLong(0)} misplaced")
      assert(mask.slice(off, off + toks.length) ==
        toks.map(_ % 2 == 0).toSeq)
    }
    // totals: padded width everywhere, n_real sums to the token count
    assert(rows.values.forall(_._1.length == 12))
    val totalTokens = assigned.map(_.getSeq[Int](1).length).sum
    assert(rows.values.map(_._4).sum == totalTokens)
  }

  test("packingStats: per-shard sequences/tokens/pads and floor basis " +
      "points over materialized rows (greedy and chunked alike)") {
    val df = docs(
      (1L, Seq(10, 11, 12), Seq(true, true, true)), // seq 0: 3 of 5
      (2L, Seq(20, 21, 22, 23), Seq.fill(4)(true)), // seq 1: 4 of 5
      (3L, Seq(30), Seq(true)))                     // joins seq 1: 5 of 5
    val stats = Pack.packingStats(packG(df, 5), budget = 5).collect()
    assert(stats.length == 1)
    val r = stats(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 8L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 2000L) // 2 pads / 10 slots = 20.00%
    // chunked rows report zero pad everywhere but the tail
    val chunked = Pack.packTokens(df, col("doc_id"), col("toks"), col("msk"),
      5, lit(0), padId = -9)
    val cs = Pack.packingStats(chunked, budget = 5).collect()(0)
    assert(cs.getLong(1) == 2L && cs.getLong(2) == 8L && cs.getLong(3) == 2L)
  }

  test("greedy rows plan shape: ONE exchange, then sort + streaming walk") {
    val df = docs((1L, Seq(1, 2), Seq(true, true)))
    val plan = packG(df, 4).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("greedy rows plan shape holds under the full special-token recipe " +
      "(bos/eos/sep): still exactly ONE exchange, extension is column " +
      "algebra below it") {
    val df = docs((1L, Seq(1, 2), Seq(true, true)))
    val plan = Pack.packTokensGreedy(df, col("doc_id"), col("toks"),
        col("msk"), 8, lit(0), padId = -9, sepId = Some(99),
        eosId = Some(0), bosId = Some(-3))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
