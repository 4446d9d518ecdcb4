package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Randomized cross-check of [[graft.functions.SpanUnits]] against an
  * INDEPENDENT reference built from JDK library primitives
  * (`offsetByCodePoints`, `codePointCount`, `String.getBytes(UTF_8)`) —
  * not a re-implementation of the production walk, so a walk bug cannot
  * cancel itself out. Also checks the shared-walk consistency property:
  * converting k spans in one call equals k independent single-span calls.
  */
class SpanUnitsPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260814)
  // 1-, 2-, 3-, and 4-byte UTF-8 / BMP + astral UTF-16 code points
  private val pool = Array(0x61, 0x7A, 0xE9, 0xA1, 0x4E2D, 0x2318, 0x1F642,
    0x1F40D, 0x20, 0x31)

  private def randText(): String = {
    val n = rnd.nextInt(24)
    new String((0 until n).toArray.flatMap(_ =>
      Character.toChars(pool(rnd.nextInt(pool.length)))))
  }

  private def clampCp(s: String, k: Int): Int =
    math.max(0, math.min(k, s.codePointCount(0, s.length)))

  /** chars → utf16 via offsetByCodePoints; chars → bytes via getBytes. */
  private def refFromChars(s: String, k: Int, to: String): Int = {
    val u16 = s.offsetByCodePoints(0, clampCp(s, k))
    to match {
      case "utf16" => u16
      case "bytes" =>
        s.substring(0, u16).getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      case "chars" => clampCp(s, k)
    }
  }

  /** utf16 → chars: align a mid-surrogate index down, then codePointCount. */
  private def refUtf16ToChars(s: String, k0: Int): Int = {
    var k = math.max(0, math.min(k0, s.length))
    if (k > 0 && k < s.length && Character.isLowSurrogate(s.charAt(k))) k -= 1
    s.codePointCount(0, k)
  }

  /** bytes → chars: largest c with byteLen(prefix of c chars) <= k. */
  private def refBytesToChars(s: String, k: Int): Int = {
    val n = s.codePointCount(0, s.length)
    var c = 0
    while (c < n && refFromChars(s, c + 1, "bytes") <= k) c += 1
    c
  }

  /** One DataFrame pass: every (text, bounds) case converted at once;
    * bounds ride as data in degenerate [k, k) spans.
    */
  private def convertAll(cases: Seq[(String, Seq[Int])], from: String,
      to: String): Seq[Seq[Int]] = {
    import spark.implicits._
    val df = cases.zipWithIndex
      .map { case ((t, ks), i) => (i, t, ks.map(k => (k, k))) }
      .toDF("i", "t", "b")
    val spans = transform(col("b"), x =>
      struct(x.getField("_1").as("s"), x.getField("_2").as("e")))
    df.select(col("i"),
        transform(TF.convertSpans(col("t"), spans, from, to),
          sp => sp.getField("s")).as("r"))
      .orderBy("i").collect().map(_.getSeq[Int](1).toSeq).toSeq
  }

  test("500 random texts × random offsets agree with the JDK reference " +
      "in all four directions") {
    val texts = Seq.fill(500)(randText())
    def boundsFor(s: String, extent: Int) =
      Seq.fill(4)(rnd.nextInt(math.max(1, extent + 4)) - 2)
    val cCases = texts.map(s => s -> boundsFor(s, s.codePointCount(0, s.length)))
    val bCases = texts.map(s => s -> boundsFor(s,
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length))
    val uCases = texts.map(s => s -> boundsFor(s, s.length))
    (convertAll(cCases, "chars", "bytes"), cCases).zipped.foreach {
      case (got, (s, ks)) =>
        assert(got == ks.map(refFromChars(s, _, "bytes")), s"c->b '$s' $ks")
    }
    (convertAll(cCases, "chars", "utf16"), cCases).zipped.foreach {
      case (got, (s, ks)) =>
        assert(got == ks.map(refFromChars(s, _, "utf16")), s"c->u '$s' $ks")
    }
    (convertAll(bCases, "bytes", "chars"), bCases).zipped.foreach {
      case (got, (s, ks)) =>
        assert(got == ks.map(refBytesToChars(s, _)), s"b->c '$s' $ks")
    }
    (convertAll(uCases, "utf16", "chars"), uCases).zipped.foreach {
      case (got, (s, ks)) =>
        assert(got == ks.map(refUtf16ToChars(s, _)), s"u->c '$s' $ks")
    }
  }

  test("shared walk ≡ independent single-span conversions (random order, " +
      "duplicates included)") {
    val cases = Seq.fill(60) {
      val s = randText()
      s -> Seq.fill(6)(rnd.nextInt(math.max(1, s.codePointCount(0, s.length) + 2)))
    }
    val batch = convertAll(cases, "chars", "bytes")
    val singleCases = cases.flatMap { case (s, ks) => ks.map(k => s -> Seq(k)) }
    val singly = convertAll(singleCases, "chars", "bytes").map(_.head)
      .grouped(6).toSeq
    (batch, singly).zipped.foreach { case (b, sg) => assert(b == sg) }
  }
}
