package graft

import org.apache.spark.sql.functions._

import graft.functions.ByteLevel
import graft.llm.Bpe

/** Byte-level BPE (the GPT-2 tokenizer family): the byte↔unicode
  * bijection, the regex pretokenizer (lookahead semantics included), and
  * the end-to-end encode against hand-computed tokenizations.
  */
class BpeByteLevelSpec extends SparkSpec {
  import spark.implicits._

  test("byte map is the canonical GPT-2 bijection") {
    assert(ByteLevel.byteToChar('A') == 'A')
    assert(ByteLevel.byteToChar('~') == '~')
    assert(ByteLevel.byteToChar(' ') == 'Ġ')  // Ġ
    assert(ByteLevel.byteToChar('\n') == 'Ċ') // Ċ
    assert(ByteLevel.byteToChar('\t') == 'ĉ') // ĉ
    assert(ByteLevel.byteToChar(0) == 'Ā')    // Ā
    assert(ByteLevel.byteToChar(0x7F) == 'ġ') // DEL is not printable
    assert(ByteLevel.byteToChar(0xAD) == 'Ń') // soft hyphen excluded
    assert(ByteLevel.byteToChar(0xA1) == 0xA1)     // ¡ maps to itself
    // bijection: all 256 distinct, inverse closes
    assert(ByteLevel.byteToChar.distinct.length == 256)
    for (b <- 0 until 256) assert(ByteLevel.charToByte(ByteLevel.byteToChar(b)) == b)
  }

  test("map/unmap round-trips arbitrary byte content; é becomes the famous Ã©") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("café \n déjà-vu\t½")
    assert(ByteLevel.unmap(ByteLevel.map(s)).toString == s.toString)
    assert(ByteLevel.map(UTF8String.fromString("é")).toString == "Ã©")
    assert(ByteLevel.map(UTF8String.fromString(" a")).toString == "Ġa")
  }

  private def pieces(text: String): Seq[String] =
    Seq(text).toDF("t").select(Bpe.byteLevelPieces(col("t"))).as[Seq[String]].head()

  test("GPT-2 pretokenizer: contractions, space-prefixed runs, lookahead whitespace") {
    assert(pieces("he's sure") == Seq("he", "'s", " sure"))
    assert(pieces("abc123 x!") == Seq("abc", "123", " x", "!"))
    // the lookahead: an inner multi-space run keeps its LAST space for
    // the next word; a trailing run is taken whole
    assert(pieces("a  b") == Seq("a", " ", " b"))
    assert(pieces("a   b") == Seq("a", "  ", " b"))
    assert(pieces("ab  ") == Seq("ab", "  "))
    assert(pieces(" lead") == Seq(" lead"))
    // only SPACES attach to the next word (the pattern's literal ' ?');
    // newline runs split off alone
    assert(pieces("x\n\ny") == Seq("x", "\n", "\n", "y"))
    assert(pieces("") == Seq())
  }

  test("byteLevelEncode: hand-computed merges over mapped symbols") {
    // merges in the MAPPED alphabet: Ġ = space
    val merges = Seq(("t", "h"), ("th", "e"), ("Ġ", "the"), ("a", "n"))
    val enc = Seq("the man  the").toDF("t")
      .select(Bpe.byteLevelEncode(col("t"), merges)).as[String].head()
    val o = Bpe.Open; val c = Bpe.Close
    def w(syms: String*) = syms.map(s => s"$o$s$c").mkString
    // pieces: "the", " man", " ", " the" →
    //   [the], [Ġ m an], [Ġ], [Ġthe]
    assert(enc == Seq(
      w("the"), w("Ġ", "m", "an"), w("Ġ"), w("Ġthe")).mkString("|"))
    // symbol count through the shared helper
    val n = Seq("the man  the").toDF("t")
      .select(Bpe.symbolCount(Bpe.byteLevelEncode(col("t"), merges))).as[Long].head()
    assert(n == 6)
  }

  test("byte-level is lossless: delimiters and non-ASCII survive as mapped bytes") {
    val enc = Seq("aé").toDF("t")
      .select(Bpe.byteLevelEncode(col("t"), Nil)).as[String].head()
    val o = Bpe.Open; val c = Bpe.Close
    // pieces: "a" (letters), U+0001 alone (an "other" run — and the
    // reserved Open delimiter, which whitespace BPE would STRIP; here it
    // maps to ā and survives), then "é" (letters, one code point, TWO
    // UTF-8 bytes 0xC3 0xA9 → chars Ã ©)
    assert(enc == s"${o}a$c|${o}ā$c|${o}Ã$c${o}©$c")
  }

  test("docSymbols + tokenIds: cross-word token sequence, unk mapping, '|' symbol safe") {
    val merges = Seq(("t", "h"), ("th", "e"))
    val vocab = Seq("the", "Ġ", "m", "x", "|")
    val ids = Seq("the m | zz").toDF("t")
      .select(Bpe.tokenIds(Bpe.byteLevelEncode(col("t"), merges), vocab, unkId = -1))
      .as[Seq[Int]].head()
    // pieces: "the", " m", " |", " zz" → symbols the | Ġ m | Ġ | | Ġ z z
    assert(ids == Seq(0, 1, 2, 1, 4, 1, -1, -1))
    // whitespace-BPE side uses the same bridge
    val wIds = Seq("the the").toDF("t")
      .select(Bpe.tokenIds(Bpe.encodeText(col("t"), merges), Seq("the"), unkId = 9))
      .as[Seq[Int]].head()
    assert(wIds == Seq(0, 0))
  }

  test("byteLevelDecode round-trips arbitrary content incl. non-ASCII") {
    val merges = Seq(("t", "h"), ("th", "e"))
    // full coverage for THIS text: all its mapped chars + merge outputs
    val text = "the café\nhad\tthé & 日本 text"
    val mapped = Seq(text).toDF("t")
      .select(Bpe.docSymbols(Bpe.byteLevelEncode(col("t"), Nil))).as[Seq[String]].head()
    val vocab = (mapped ++ merges.map { case (a, b) => a + b }).distinct
    val back = Seq(text).toDF("t")
      .select(Bpe.byteLevelDecode(
        Bpe.tokenIds(Bpe.byteLevelEncode(col("t"), merges), vocab, unkId = vocab.size),
        vocab)).as[String].head()
    assert(back == text)
    // a coverage gap fails loudly instead of inventing bytes
    val ex = intercept[Exception] {
      Seq("zzz").toDF("t")
        .select(Bpe.byteLevelDecode(
          Bpe.tokenIds(Bpe.byteLevelEncode(col("t"), Nil), Seq("a"), unkId = 1),
          Seq("a"))).as[String].head()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains("id out of range"))), ex.toString)
  }

  test("roundtrip law on random unicode corpora and arbitrary merge tables (property)") {
    val rnd = new scala.util.Random(4242)
    // CODE POINTS (an astral char is two Java chars - indexing a string
    // by char would forge lone surrogates, which are not valid text);
    // includes the reserved delimiters, CJK, and an astral emoji
    val pool: IndexedSeq[String] =
      ("abc XYZ09.,!?'\n\t\u0001\u0002".map(_.toString) ++
        Seq("\u00e9", "\u4e2d", "\u6587", "\ud83d\ude42")).toIndexedSeq
    for (_ <- 0 until 12) {
      val text = Seq.fill(3 + rnd.nextInt(40))(pool(rnd.nextInt(pool.size))).mkString
      // ANY merge list is roundtrip-safe (merges only regroup symbols):
      // random pairs over the text's mapped chars, some stacked two deep
      val chars = Seq("a", "b", "Ġ", "Ã", "X", ".", "Ċ")
      val merges = Seq.fill(rnd.nextInt(6))((chars(rnd.nextInt(chars.size)),
        chars(rnd.nextInt(chars.size)))) ++
        Seq(("ab", "Ġ"), ("Ġ", "ab")).take(rnd.nextInt(3))
      val df = Seq(text).toDF("t")
      val vocab = df.select(Bpe.docSymbols(Bpe.byteLevelEncode(col("t"), merges)))
        .as[Seq[String]].head().distinct
      val back = df.select(Bpe.byteLevelDecode(
          Bpe.tokenIds(Bpe.byteLevelEncode(col("t"), merges), vocab, unkId = vocab.size),
          vocab)).as[String].head()
      assert(back == text,
        s"roundtrip broke for merges=$merges text=${text.take(40)}…")
    }
  }

  test("null text encodes to empty") {
    val enc = Seq(Option.empty[String]).toDF("t")
      .select(Bpe.byteLevelEncode(col("t"), Nil)).as[String].head()
    assert(enc == "")
  }
}
