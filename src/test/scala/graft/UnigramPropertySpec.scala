package graft

import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.functions._

import graft.functions.{UnigramSegmentCost, UnigramViterbiPieces}

/** Property laws tying the unigram family's two native expressions
  * together: for ANY word and ANY vocabulary with all single characters
  * present, the argmin-piece expression must RECONSTRUCT the word exactly
  * and reproduce the scoring expression's packed optimum bit-for-bit —
  * the coherence the train→segment→pack compositions
  * (q_unigram_train_segment, q_pack_ids_unigram) rest on. Randomized
  * with fixed seeds, BpePropertySpec-style.
  */
class UnigramPropertySpec extends SparkSpec {
  import spark.implicits._

  private val alphabet = Seq("a", "b", "c")

  private def randomVocab(rnd: scala.util.Random): Seq[(String, Int)] = {
    val singles = alphabet.map(_ -> rnd.nextInt(200))
    val multi = (1 to rnd.nextInt(13)).map { _ =>
      val l = rnd.nextInt(3) + 2
      ((1 to l).map(_ => alphabet(rnd.nextInt(3))).mkString, rnd.nextInt(200))
    }.distinctBy(_._1).filterNot(p => alphabet.contains(p._1))
    singles ++ multi
  }

  private def run(words: Seq[String], vocab: Seq[(String, Int)])
      : (Seq[String], Seq[Long]) = {
    val df = Seq(Tuple1(words)).toDF("ws")
    val pcs = df.select(GraftShims.toColumn(UnigramViterbiPieces(
        GraftShims.toExpression(col("ws")), vocab, maxWordLen = 10)).as("p"))
      .collect()(0).getSeq[String](0)
    val costs = df.select(GraftShims.toColumn(UnigramSegmentCost(
        GraftShims.toExpression(col("ws")), vocab, unkCost = 1000,
        maxWordLen = 10)).as("c"))
      .collect()(0).getSeq[Long](0)
    (pcs, costs)
  }

  test("pieces reconstruct the word and reproduce the packed optimum " +
      "on random vocabularies") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val vocab = randomVocab(rnd)
      val costMap = vocab.toMap
      val words = (1 to 30).map { _ =>
        val len = rnd.nextInt(10) + 1
        (1 to len).map(_ => alphabet(rnd.nextInt(3))).mkString
      }
      val (pcs, combs) = run(words, vocab)
      var rest = pcs.toList
      for ((w, comb) <- words.zip(combs)) {
        var acc = ""
        var packed = 0L
        while (acc.length < w.length) {
          assert(rest.nonEmpty, s"seed=$seed: piece stream exhausted in '$w'")
          val p = rest.head
          rest = rest.tail
          acc += p
          packed += costMap(p).toLong * 64 + 1
        }
        assert(acc == w, s"seed=$seed: pieces spell '$acc', word was '$w'")
        assert(packed == comb,
          s"seed=$seed: pieces pack to $packed, DP optimum $comb for '$w'")
      }
      assert(rest.isEmpty, s"seed=$seed: leftover pieces $rest")
    }
  }

  test("overlong words are skipped by pieces and UNK'd by the scorer") {
    val vocab = Seq("a" -> 1)
    val (pcs, combs) = run(Seq("a" * 11, "aa"), vocab)
    assert(pcs == Seq("a", "a")) // only the short word contributes
    assert(combs == Seq(1000L * 64 + 1, 2 * (1L * 64 + 1)))
  }
}
