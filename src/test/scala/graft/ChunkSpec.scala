package graft

import org.apache.spark.sql.functions._

import graft.llm.Chunk

class ChunkSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(df: org.apache.spark.sql.DataFrame, w: Int, o: Int) =
    Chunk.fixedTokenChunks(df, "doc_id", "text", w, o)
      .orderBy("doc_id", "chunk_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"),
        r.getAs[Int]("start_tok"), r.getAs[Int]("n_tokens"),
        r.getAs[String]("chunk_text")))
      .toSeq

  test("overlapping windows cover the doc; short trailing chunk kept, redundant tail dropped") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    // width 8, overlap 4, stride 4: starts 0, 4; start 8 adds no new token
    // beyond [4,10) ONLY IF 10 <= 8+4 — dropped
    val got = run(docs(1L -> text), 8, 4)
    assert(got == Seq(
      (1L, 0, 0, 8, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 1, 4, 6, (5 to 10).map(i => s"t$i").mkString(" "))))
    // every token appears in at least one chunk
    val covered = got.flatMap(_._5.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("no overlap = exact partition; width larger than doc = one short chunk") {
    val got = run(docs(1L -> "a b c d e"), 2, 0)
    assert(got.map(c => (c._3, c._5)) ==
      Seq((0, "a b"), (2, "c d"), (4, "e")))
    assert(run(docs(2L -> "a b"), 16, 4) == Seq((2L, 0, 0, 2, "a b")))
  }

  test("blank docs produce no chunks; chunk_id is dense start/stride") {
    val got = run(docs(1L -> "  ", 2L -> (1 to 25).map(_.toString).mkString(" ")), 10, 3)
    assert(got.forall(_._1 == 2L))
    // stride 7: starts 0,7,14,21 — start 21: 25 > 21+3 ⇒ kept (adds tokens 25)
    assert(got.map(_._2) == Seq(0, 1, 2, 3))
    assert(got.map(_._3) == Seq(0, 7, 14, 21))
    assert(got.last._4 == 4)
  }

  test("chunkField preserves sibling columns and replaces the text in place") {
    import spark.implicits._
    val df = Seq((1L, "en", "a b c d e"), (2L, "fr", " ")).toDF("id", "lang", "text")
    val got = Chunk.chunkField(df, "text", width = 2, overlap = 0)
      .orderBy("id", "chunk_ix").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("lang"),
        r.getAs[String]("text"), r.getAs[Int]("chunk_ix"))).toSeq
    assert(got == Seq(
      (1L, "en", "a b", 0), (1L, "en", "c d", 1), (1L, "en", "e", 2)))
    assert(Chunk.chunkField(df, "text", 2).columns.toSeq ==
      Seq("id", "lang", "text", "chunk_ix"))
  }

  test("invalid width/overlap rejected") {
    intercept[IllegalArgumentException] {
      Chunk.fixedTokenChunks(docs(1L -> "a"), "doc_id", "text", 4, 4)
    }
    intercept[IllegalArgumentException] {
      Chunk.fixedTokenChunks(docs(1L -> "a"), "doc_id", "text", 0, 0)
    }
  }

  test("chunkField refuses user columns named like its helpers") {
    import spark.implicits._
    // without the guard, withColumn would clobber the user's start_tok and
    // the final select would emit the helper value under the user's name
    for (bad <- Seq("start_tok", "__t", "__n")) {
      val df = Seq((1L, "a b c", "keep me")).toDF("id", "text", bad)
      val ex = intercept[IllegalArgumentException](Chunk.chunkField(df, "text", 2))
      assert(ex.getMessage.contains(bad))
    }
  }
}
