package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

class TextVectorSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head().get(0)

  test("tokens / tokenCount handle empty, null, and extra whitespace") {
    assert(one(TF.tokenCount(lit("a  b\tc"))) == 3)
    assert(one(TF.tokenCount(lit(""))) == 0)
    assert(one(TF.tokenCount(lit("   "))) == 0)
    assert(one(TF.tokenCount(lit(null).cast("string"))) == 0)
  }

  test("sentences: terminal-punctuation boundaries, quotes, empties, null") {
    def sent(s: String): Seq[String] =
      one(TF.sentences(lit(s))).asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sent("One. Two! Three?") == Seq("One.", "Two!", "Three?"))
    assert(sent("He said \"Stop.\" Then left.") == Seq("He said \"Stop.\"", "Then left."))
    assert(sent("Multi?! Bang...  Done") == Seq("Multi?!", "Bang...", "Done"))
    assert(sent("no terminal punctuation") == Seq("no terminal punctuation"))
    // list-free contract: abbreviations split (documented, not a bug)
    assert(sent("Dr. Smith left.") == Seq("Dr.", "Smith left."))
    // a mid-word period does NOT split (no following whitespace)
    assert(sent("v1.2 shipped. done") == Seq("v1.2 shipped.", "done"))
    assert(sent("") == Seq())
    assert(one(TF.sentences(lit(null).cast("string")))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq())
    // forged markers in input are stripped, never boundaries
    assert(sent("a\u001Eb. c") == Seq("ab.", "c"))
    assert(one(TF.sentenceCount(lit("One. Two."))) == 2)
  }

  test("subwordCount ignores tabs/newlines, not just spaces") {
    assert(one(TF.subwordCount(lit("ab\tcd\nef"))) == 3)
    assert(one(TF.subwordCount(lit("\t\n"))) == 0)
  }

  test("subwordCount splits letter runs, digit runs, punctuation; no whitespace") {
    // "don't stop123" → don | ' | t | stop | 123
    assert(one(TF.subwordCount(lit("don't stop123"))) == 5)
    assert(one(TF.subwordCount(lit(""))) == 0)
  }

  test("shingles produce n-k+1 word k-grams; short text → empty") {
    assert(one(TF.shingles(lit("a b c d"), 2)) == Seq("a b", "b c", "c d"))
    assert(one(TF.shingles(lit("a b"), 3)) == Seq())
  }

  test("charNgrams distinct lowercased") {
    assert(one(TF.charNgrams(lit("AbAb"), 2)) == Seq("ab", "ba"))
  }

  test("fingerprint is order-insensitive over distinct tokens") {
    val a = one(TF.fingerprint(lit("b a c a")))
    val b = one(TF.fingerprint(lit("c b a")))
    val c = one(TF.fingerprint(lit("a b x")))
    assert(a == b && a != c)
  }

  test("rollingHash is order-sensitive") {
    assert(one(TF.rollingHash(lit("a b"))) != one(TF.rollingHash(lit("b a"))))
  }

  test("langId picks the language with most stopword hits") {
    assert(one(TF.langId(lit("the cat and the dog of a house"))) == "en")
    assert(one(TF.langId(lit("el perro y la casa de que un"))) == "es")
    assert(one(TF.langId(lit("zzz qqq"))) == "unk")
  }

  test("quality score stays in [0,1] and ranks real text above noise") {
    val good = one(TF.qualityScore(lit(
      "the quick brown fox jumps over the lazy dog and that is a fine day in the park")))
      .asInstanceOf[Double]
    val noise = one(TF.qualityScore(lit("$$$ ### !!! ???"))).asInstanceOf[Double]
    assert(good >= 0 && good <= 1 && noise >= 0 && noise <= 1 && good > noise)
  }

  test("duplicateNgramFraction and gopherPasses (repetition signals)") {
    // "a b a b a" → words: 5 total, 2 distinct → dup 0.6;
    // bigrams: [a b, b a, a b, b a] → 4 total, 2 distinct → dup 0.5
    assert(one(TF.duplicateNgramFraction(lit("a b a b a"), 1)) == 0.6)
    assert(one(TF.duplicateNgramFraction(lit("a b a b a"), 2)) == 0.5)
    assert(one(TF.duplicateNgramFraction(lit("x y z"), 2)) == 0.0)
    assert(one(TF.duplicateNgramFraction(lit(""), 2)) == 0.0)
    // gate: long-enough, sane word length, low bigram repetition
    val good = "the quick brown fox jumps over the lazy dog in the warm sun today"
    assert(one(TF.gopherPasses(lit(good))) == true)
    assert(one(TF.gopherPasses(lit("too short"))) == false)       // < 10 words
    val spam = Seq.fill(40)("buy now").mkString(" ")              // dup bigrams
    assert(one(TF.gopherPasses(lit(spam), maxDupBigram = 0.5)) == false)
  }

  test("fimTransform: PSM pieces reassemble the original; rate 0/1 " +
      "select none/all; deterministic in the key alone") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"doc $i body ${"x" * (i % 17).toInt} end"))
      .toDF("id", "text")
    val out = docs.select(col("id"), col("text"),
        TF.fimTransform(col("text"), col("id"), "s1", rate = 1.0).as("fim"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.forall(_._3.startsWith("<PRE>")), "rate 1.0 must transform all")
    for ((_, orig, fim) <- out) {
      // <PRE>p<SUF>s<MID>m with p+m+s == original
      val pre = fim.stripPrefix("<PRE>")
      val Array(p, rest) = pre.split("<SUF>", 2)
      val Array(s2, m) = rest.split("<MID>", 2)
      assert(p + m + s2 == orig, s"pieces must reassemble: '$fim' vs '$orig'")
    }
    val none = docs.select(TF.fimTransform(col("text"), col("id"), "s1",
        rate = 0.0).as("f"), col("text"))
      .collect()
    assert(none.forall(r => r.getString(0) == r.getString(1)), "rate 0 = identity")
    // key-determinism: same (key, seed) -> same output under any layout
    val a = docs.select(col("id"), TF.fimTransform(col("text"), col("id"), "s1",
      0.5).as("f")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs.repartition(7).select(col("id"),
        TF.fimTransform(col("text"), col("id"), "s1", 0.5).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // ~half selected at rate 0.5 on 50 docs (loose: the hash is uniform)
    val nSel = a.values.count(_.startsWith("<PRE>"))
    assert(nSel > 10 && nSel < 40, s"rate 0.5 selected $nSel of 50")
  }

  test("topNgramCharFraction covers count·chars of the densest n-gram") {
    // "a b a b a" (9 chars): top word 'a' → 3·1/9; top bigram "a b" → 2·3/9;
    // top trigram "a b a" appears twice (overlapping) → 2·5/9 > 1
    def frac(text: String, n: Int): Double =
      one(TF.topNgramCharFraction(lit(text), n)).asInstanceOf[Double]
    assert(math.abs(frac("a b a b a", 1) - 3.0 / 9) < 1e-12)
    assert(math.abs(frac("a b a b a", 2) - 6.0 / 9) < 1e-12)
    assert(math.abs(frac("a b a b a", 3) - 10.0 / 9) < 1e-12)
    assert(frac("x y z", 2) == 3.0 / 5)
    assert(frac("", 2) == 0.0)
    assert(frac("ab", 3) == 0.0) // shorter than n
  }

  test("dot / norm / cosine / l2 on double arrays") {
    val a = typedLit(Seq(1.0, 2.0, 2.0))
    val b = typedLit(Seq(2.0, 4.0, 4.0))
    assert(one(VF.dot(a, b)) == 2.0 + 8.0 + 8.0)
    assert(one(VF.norm(a)) == 3.0)
    assert(math.abs(one(VF.cosine(a, b)).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(one(VF.l2Distance(a, b)).asInstanceOf[Double] - 3.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val a = typedLit(Seq(1.0, 0.0))
    val b = typedLit(Seq(0.0, 1.0))
    assert(math.abs(one(VF.cosine(a, b)).asInstanceOf[Double]) < 1e-12)
  }

  test("hyperplane signature: deterministic, equal for equal vectors, long-packed") {
    val v = typedLit(Seq.tabulate(8)(i => math.sin(i + 1)))
    val s1 = one(VF.hyperplaneSignature(v, 8, 12, 42L))
    val s2 = one(VF.hyperplaneSignature(v, 8, 12, 42L))
    val s3 = one(VF.hyperplaneSignature(v, 8, 12, 99L))
    assert(s1 == s2)
    assert(s1 != s3) // different seed, different planes
    assert(s1.asInstanceOf[Long] >= 0 && s1.asInstanceOf[Long] < (1L << 12))
  }

  test("redactSpans / cutSpans: clamping, overlap union, degenerate spans, " +
      "null text") {
    def spans(ps: (Int, Int)*) =
      array(ps.map { case (s, e) => struct(lit(s).as("s"), lit(e).as("e")) }: _*)
    def red(text: String, token: String, ps: (Int, Int)*): String =
      one(TF.redactSpans(lit(text), spans(ps: _*), token)).asInstanceOf[String]
    // basic replace, 0-based [s, e)
    assert(red("hello world", "<X>", (0, 5)) == "<X> world")
    assert(red("hello world", "<X>", (6, 11)) == "hello <X>")
    // two disjoint spans, out of order
    assert(red("abcdefghij", "_", (6, 8), (1, 3)) == "a_def_ij")
    // overlapping spans merge into one covered region (token per
    // coverage-extending span)
    assert(red("abcdefghij", "_", (2, 5), (4, 7)) == "ab__hij")
    // a span inside covered text emits nothing
    assert(red("abcdefghij", "_", (2, 8), (3, 4)) == "ab_ij")
    // clamped past the end; negative start clamps to 0
    assert(red("abc", "_", (1, 99)) == "a_")
    assert(red("abc", "_", (-5, 2)) == "_c")
    // degenerate (empty / inverted) spans are ignored, losing no text
    assert(red("abcdef", "_", (3, 3), (5, 2)) == "abcdef")
    // cut = redact with empty token
    assert(one(TF.cutSpans(lit("abcdefghij"), spans((2, 5), (7, 10))))
      == "abfg")
    // null text → ""
    assert(one(TF.redactSpans(lit(null).cast("string"), spans((0, 2)), "_")) == "")
    // a NULL spans ARRAY (un-tagged doc after a sidecar left join) leaves
    // the text unchanged — it must not become null
    assert(one(TF.redactSpans(lit("keep me"),
      lit(null).cast("array<struct<s:int,e:int>>"), "_")) == "keep me")
    assert(one(TF.cutSpans(lit("keep me"),
      lit(null).cast("array<struct<s:int,e:int>>"))) == "keep me")
    // spans with a null bound (malformed tagger output) are dropped, NOT
    // clamped to full extent (greatest/least skip nulls — an unguarded
    // null bound would silently cover the whole document)
    val nullBound = array(
      struct(lit(null).cast("int").as("s"), lit(null).cast("int").as("e")),
      struct(lit(3).as("s"), lit(null).cast("int").as("e")),
      struct(lit(1).as("s"), lit(2).as("e")))
    assert(one(TF.redactSpans(lit("abcdef"), nullBound, "_")) == "a_cdef")
  }
}
