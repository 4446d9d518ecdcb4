package graft

import org.apache.spark.sql.functions._

import graft.llm.Bpe

/** Property test: the paren-replace encoder equals canonical BPE — the
  * lowest-rank-present merge loop of the original Sennrich implementation —
  * on randomly generated words under randomly generated WELL-ORDERED merge
  * tables (every rule's inputs are chars or outputs of earlier rules, the
  * invariant real training produces). This is the claim Bpe.scala's
  * sequential-application argument rests on, checked mechanically.
  */
class BpePropertySpec extends SparkSpec {

  /** Canonical BPE: repeatedly merge ALL occurrences of the lowest-ranked
    * adjacent pair present, left-to-right non-overlapping, until none
    * remains.
    */
  private def refEncode(w: String, merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = w.map(_.toString).toList
    var go = true
    while (go) {
      val present = syms.lazyZip(syms.drop(1)).flatMap((a, b) => rank.get((a, b)))
      if (present.isEmpty) go = false
      else {
        val (a, b) = merges(present.min)
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toList
      }
    }
    syms
  }

  /** A random well-ordered merge table over `alphabet`. */
  private def randomMerges(rnd: scala.util.Random, alphabet: Seq[String],
      n: Int): Seq[(String, String)] = {
    var vocab = alphabet.toVector
    var rules = Vector.empty[(String, String)]
    var tries = 0
    while (rules.size < n && tries < 200) {
      val a = vocab(rnd.nextInt(vocab.size))
      val b = vocab(rnd.nextInt(vocab.size))
      val merged = a + b
      if (!vocab.contains(merged) && !rules.contains((a, b))) {
        rules :+= ((a, b))
        vocab :+= merged
      }
      tries += 1
    }
    rules
  }

  test("paren-replace encoding equals canonical lowest-rank BPE on random inputs") {
    import spark.implicits._
    // parens and pipe in the alphabet: they were the old paren-delimiter
    // representation's failure shape, and must behave as ordinary symbols
    val alphabet = Seq("a", "b", "(", ")", "|")
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val merges = randomMerges(rnd, alphabet, rnd.nextInt(6) + 1)
      // adversarial words: tiny alphabet forces repeated/overlapping pairs
      // ("aaaa", "ababab"); sprinkle a char the rules never mention
      val words = (1 to 40).map { _ =>
        val len = rnd.nextInt(10) + 1
        (1 to len).map(_ => if (rnd.nextInt(12) == 0) "x"
          else alphabet(rnd.nextInt(alphabet.size))).mkString
      }.distinct
      val got = words.toDF("w")
        .select(col("w"), Bpe.symbols(Bpe.encodeWord(col("w"), merges)).as("s"))
        .as[(String, Seq[String])].collect().toMap
      for (w <- words) {
        val expected = refEncode(w, merges)
        assert(got(w).toList == expected,
          s"seed=$seed word=$w merges=$merges: got ${got(w)}, want $expected")
        assert(got(w).mkString == w, s"symbols must concatenate back to $w")
      }
    }
  }
}
