package graft

import org.apache.spark.sql.functions._

import graft.llm.{Pack, Unigram}

class PackUnigramSpec extends SparkSpec {

  test("concatChunk: seq boundaries cut at the budget, offsets carry over") {
    import spark.implicits._
    // one shard, sizes 1000+1000+500 → starts 0,1000,2000 with budget 1500:
    // doc 1 in seq 0 @0, doc 2 in seq 0 @1000, doc 3 in seq 1 @500
    val df = Seq((1L, 1000L), (2L, 1000L), (3L, 500L)).toDF("id", "sz")
    val out = Pack.concatChunk(df, col("id"), col("sz"), 1500, lit(0))
      .select("id", "seq_id", "seq_offset").as[(Long, Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 1000L), (3L, 1L, 500L)))
  }

  test("concatChunk: shards pack independently; result partition-stable") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, 10L + i % 7)).toDF("id", "sz")
    val shard = pmod(col("id"), lit(4))
    val a = Pack.concatChunk(df, col("id"), col("sz"), 128, shard)
      .select("id", "shard", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Pack.concatChunk(df.repartition(11), col("id"), col("sz"), 128, shard)
      .select("id", "shard", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
    // every offset is within the budget and seq ids are dense per shard
    assert(a.forall { case (_, _, _, off) => off >= 0 && off < 128 })
    for (s <- 0L until 4L) {
      val seqs = a.filter(_._2 == s).map(_._3)
      assert((seqs.min to seqs.max).toSet == seqs) // no gaps
    }
    intercept[IllegalArgumentException](
      Pack.concatChunk(df, col("id"), col("sz"), 0, shard))
  }

  test("unigram score: exact sufficient statistics and OOV accounting") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"),   // a:3 total, b:2 total
      (2L, "b c"),     // c:1
      (3L, "a"),
      (4L, ""),        // no tokens → absent from output
    ).toDF("doc_id", "text")
    val out = Unigram.score(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // corpus freqs: a=3, b=2, c=1
    assert(out.toSeq == Seq(
      (1L, 3L, 3L + 3L + 2L, 0L),
      (2L, 2L, 2L + 1L, 0L),
      (3L, 1L, 3L, 0L)))
    // with maxVocab=1 only "a" stays in vocab; b/c become OOV
    val capped = Unigram.score(docs, "doc_id", "text", maxVocab = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(capped.toSeq == Seq(
      (1L, 3L, 6L, 1L), (2L, 2L, 0L, 2L), (3L, 1L, 3L, 0L)))
  }

  test("bigram score: word-2-grams as the unit; short docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b"×2, "b a"×1
      (2L, "a b"),     // "a b"×1 → corpus freq("a b")=3
      (3L, "a"),       // < 2 tokens → no bigrams → absent
      (4L, ""),
    ).toDF("doc_id", "text")
    val out = Unigram.score(docs, "doc_id", "text", ngram = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 3L, 3L + 1L + 3L, 0L), // "a b","b a","a b" → 3+1+3
      (2L, 1L, 3L, 0L)))
  }

  test("keywords: tf desc / term asc ranks, ubiquitous terms blocked") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y common"),
      (2L, "y y z common"),
      (3L, "z common"),
      (4L, "b a a b c common"),
    ).toDF("doc_id", "text")
    // n=4, cutoff 0.5 → only 'common' (df=4) is blocked
    val out = graft.llm.Keywords.topTerms(docs, "doc_id", "text")
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 1, "x", 2L), (1L, 2, "y", 1L),
      (2L, 1, "y", 2L), (2L, 2, "z", 1L),
      (3L, 1, "z", 1L),
      (4L, 1, "a", 2L), (4L, 2, "b", 2L), (4L, 3, "c", 1L)))
  }
}
