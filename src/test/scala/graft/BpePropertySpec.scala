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

  test("native table-driven encoder equals the chained-replace encoder on " +
      "random well-ordered tables") {
    import spark.implicits._
    val alphabet = Seq("a", "b", "c", "(", ")", "|")
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(100 + seed)
      val merges = randomMerges(rnd, alphabet, rnd.nextInt(8) + 1)
      val words = (1 to 40).map { _ =>
        val len = rnd.nextInt(12) + 1
        (1 to len).map(_ => if (rnd.nextInt(12) == 0) "x"
          else alphabet(rnd.nextInt(alphabet.size))).mkString
      }.distinct
      val rows = words.toDF("w").select(array(col("w")).as("ws"))
        .select(
          Bpe.encodeWordsNative(col("ws"), merges).as("native"),
          transform(col("ws"), w => Bpe.encodeWord(w, merges)).as("chained"))
        .as[(Seq[String], Seq[String])].collect()
      for ((native, chained) <- rows)
        assert(native == chained, s"seed=$seed merges=$merges")
    }
  }

  test("a 5000-rule table encodes through the native path without " +
      "analyzer blowup") {
    import spark.implicits._
    val alphabet = ('a' to 'z').map(_.toString)
    val rnd = new scala.util.Random(7)
    // well-ordered by construction: each rule merges two existing vocab
    // entries into a new one
    var vocab = alphabet.toVector
    var rules = Vector.empty[(String, String)]
    while (rules.size < 5000) {
      val a = vocab(rnd.nextInt(vocab.size))
      val b = vocab(rnd.nextInt(vocab.size))
      if (!vocab.contains(a + b)) { rules :+= ((a, b)); vocab :+= (a + b) }
    }
    assert(rules.size >= Bpe.NativeEncodeThreshold)
    val docs = Seq("the quick brown fox", "jumps over the lazy dog",
      "aaaa bbbb abab the end").toDF("text")
    // encodeText routes through the native expression at this table size;
    // with the chained form this plan would be ~5000 nodes deep
    val got = docs.select(Bpe.encodeText(col("text"), rules).as("enc"))
      .as[String].collect()
    // equality against the canonical driver-side loop, word by word
    for ((doc, enc) <- Seq("the quick brown fox", "jumps over the lazy dog",
        "aaaa bbbb abab the end").zip(got)) {
      val expected = doc.split("\\s+").filter(_.nonEmpty).map { w =>
        refEncode(w, rules).mkString(Bpe.Open, Bpe.Close + Bpe.Open, Bpe.Close)
      }.mkString("|")
      assert(enc == expected, s"doc=$doc")
    }
    // the symbol-count contract holds on the native form too
    val counts = docs.select(Bpe.symbolCount(
      Bpe.encodeText(col("text"), rules)).as("c")).as[Long].collect()
    assert(counts.forall(_ > 0))
  }

  test("native symbol-pair emission equals the HOF form; empty-table " +
      "native encode equals the chained char wrap") {
    import spark.implicits._
    val alphabet = Seq("a", "b", "c", "(", ")", "|", "x")
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(300 + seed)
      val merges = randomMerges(rnd, alphabet, rnd.nextInt(6))
      val docs = (1 to 25).map { _ =>
        (1 to rnd.nextInt(6) + 1).map(_ =>
          (1 to rnd.nextInt(8) + 1).map(_ => alphabet(rnd.nextInt(alphabet.size)))
            .mkString).mkString(" ")
      }
      val df = docs.toDF("text")
      // encodeWords routes empty tables natively; the chained form is the
      // semantic reference for both checks
      val chainedWs = transform(graft.functions.TextFunctions.tokens(col("text")),
        w => Bpe.encodeWord(w, merges))
      val rows = df.select(
          Bpe.encodeWords(col("text"), merges).as("routed"),
          chainedWs.as("chained"))
        .as[(Seq[String], Seq[String])].collect()
      for ((routed, chained) <- rows)
        assert(routed == chained, s"seed=$seed merges=$merges")
      // pair emission: native expression vs the HOF chain over the SAME
      // encoded words
      val enc = df.select(chainedWs.as("__ws"))
      val native = enc.select(org.apache.spark.sql.GraftShims.toColumn(
          graft.functions.BpeSymbolPairs(
            org.apache.spark.sql.GraftShims.toExpression(col("__ws")),
            Bpe.Open, Bpe.Close)).as("p"))
        .as[Seq[String]].collect()
      val hof = enc.select(flatten(transform(col("__ws"),
          e => Bpe.symbolPairs(e))).as("p"))
        .as[Seq[String]].collect()
      assert(native.toSeq == hof.toSeq, s"seed=$seed merges=$merges")
    }
  }

  test("batched training equals sequential training when no selected " +
      "pairs conflict") {
    import spark.implicits._
    // two-symbol words: merging one leaves NO new adjacencies, so every
    // round is conflict-free and batched must reproduce the sequential
    // argmax sequence exactly
    val words =
      Seq.fill(100)("ab") ++ Seq.fill(90)("cd") ++ Seq.fill(80)("ef") ++
        Seq.fill(70)("gh")
    val df = new scala.util.Random(3).shuffle(words)
      .grouped(25).map(_.mkString(" ")).toSeq.toDF("text")
    val (seq1, hist1) = Bpe.train(df, col("text"), steps = 4)
    val (bat, hist2) = Bpe.train(df, col("text"), steps = 4, batchSize = 4)
    assert(seq1 == Seq("a" -> "b", "c" -> "d", "e" -> "f", "g" -> "h"))
    assert(bat == seq1)
    assert(hist1 == hist2)
    // a mid-size batch splits the same table across two rounds
    val (bat2, _) = Bpe.train(df, col("text"), steps = 4, batchSize = 2)
    assert(bat2 == seq1)
    // conflict skip: pairs sharing a symbol never co-select in one round.
    // "xy" dominates, and "yx" (sharing both symbols) must wait for the
    // next round's recount rather than ride the same batch
    val words2 = Seq.fill(50)("xy") ++ Seq.fill(40)("yx")
    val df2 = words2.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val (bat3, _) = Bpe.train(df2, col("text"), steps = 2, batchSize = 2)
    val (seq3, _) = Bpe.train(df2, col("text"), steps = 2)
    assert(bat3 == seq3, s"batched $bat3 vs sequential $seq3")
  }
}
