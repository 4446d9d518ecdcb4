package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.llm.{HfBpeModel, HfPreTok, HfTokenizer, HfUnigramModel, HfWordPieceModel}
import graft.topology.Topology

/** HuggingFace tokenizer.json interop ([[graft.llm.HfTokenizer]]): the
  * train → export → import → encode round trip matches the native
  * parquet-sidecar path for all three methods, REAL published file shapes
  * import id-for-id — GPT-2 byte-level, Llama-family SentencePiece-BPE
  * (Prepend/Replace ▁-marking, byte_fallback, `<s>` template), BERT
  * WordPiece (BertNormalizer + BertPreTokenizer + [CLS]/[SEP] template),
  * Metaspace unigram — the unigram cost/score bridge is lossless, and
  * anything the engine cannot replicate exactly refuses loudly at load.
  */
class HfTokenizerSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def write(dir: String, name: String, s: String): String = {
    Files.write(java.nio.file.Paths.get(dir, name), s.getBytes("UTF-8"))
    s"$dir/$name"
  }

  private val corpusLines = Seq(
    "1,the cat sat on the mat",
    "2,the mat was flat and the cat was fat",
    "3,that cat and that mat and that hat",
    "4,the fat cat sat flat on that hat")

  private def trainToml(dir: String, method: String): String =
    s"""[fields]
       |names = ["id", "text"]
       |[csv]
       |field_separator = 59
       |[input]
       |name = "LogLines"
       |  [input.config]
       |  Lines = [${corpusLines.map(l => "\"" + l.replace(",", ";") + "\"").mkString(", ")}]
       |[tokenizer]
       |Method = "$method"
       |SrcField = "text"
       |VocabPath = "$dir/vocab"
       |ExportPath = "$dir/tok.json"
       |[output]
       |name = "Nop"
       |""".stripMargin

  private def encodeToml(dir: String, vocabPath: String,
      method: Option[String]): String =
    s"""[fields]
       |names = ["id", "text"]
       |[csv]
       |field_separator = 59
       |[input]
       |name = "LogLines"
       |  [input.config]
       |  Lines = [${corpusLines.map(l => "\"" + l.replace(",", ";") + "\"").mkString(", ")}]
       |[[filter]]
       |name = "TokenizeIds"
       |  [filter.config]
       |  SrcField = "text"
       |  DstField = "ids"
       |  VocabPath = "$vocabPath"
       |${method.map(m => s"  Method = \"$m\"").getOrElse("")}
       |[output]
       |name = "Nop"
       |fields = ["id", "ids"]
       |""".stripMargin

  private def encode(dir: String, vocabPath: String,
      method: Option[String]): Seq[(String, String)] =
    Topology.compileToml(spark, encodeToml(dir, vocabPath, method))
      .projected.orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** One TokenizeIds run over explicit (id, text) lines under a .json
    * vocab, with optional extra config keys.
    */
  private def encodeLines(lines: Seq[(String, String)], vocabPath: String,
      extra: String = ""): Seq[(String, String)] = {
    val toml =
      s"""[fields]
         |names = ["id", "text"]
         |[csv]
         |field_separator = 59
         |[input]
         |name = "LogLines"
         |  [input.config]
         |  Lines = [${lines.map { case (i, t) => "\"" + i + ";" + t + "\"" }.mkString(", ")}]
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$vocabPath"
         |$extra
         |[output]
         |name = "Nop"
         |fields = ["id", "ids"]
         |""".stripMargin
    Topology.compileToml(spark, toml).projected.orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
  }

  for (method <- Seq("unigram", "wordpiece"))
    test(s"$method: train → ExportPath tokenizer.json → re-import encodes " +
        "bit-equal to the parquet sidecar") {
      val dir = tmp(s"hf-$method")
      Topology.compileToml(spark, trainToml(dir, method)).run()
      assert(new java.io.File(s"$dir/tok.json").exists())
      val native = encode(dir, s"$dir/vocab", Some(method))
      val hf = encode(dir, s"$dir/tok.json", None)
      assert(native.exists(_._2.nonEmpty), "fixture must produce some ids")
      assert(hf == native)
      // an explicit Method that contradicts the file is loud
      val wrong = if (method == "unigram") "bpe" else "unigram"
      val e = intercept[Exception](encode(dir, s"$dir/tok.json", Some(wrong)))
      assert(e.getMessage.contains("does not match"))
    }

  test("bpe: train → ExportPath (operand closure) → re-import: surfaces " +
      "keep rule-index ids (sidecar-compatible) and base chars map to " +
      "closure ids where the sidecar path maps unk") {
    val dir = tmp("hf-bpe")
    Topology.compileToml(spark, trainToml(dir, "bpe")).run()
    val loaded = HfTokenizer.load(s"$dir/tok.json")
    val HfBpeModel(vocab, merges, _, _, _) = loaded.model: @unchecked
    // the real tokenizers loading rule: every merge operand and product
    // is a vocab member (this is what closure buys)
    val members = vocab.map(_._1).toSet
    merges.foreach { case (a, b) =>
      assert(members(a) && members(b) && members(a + b),
        s"merge ($a,$b) not closed in the exported vocab")
    }
    // surfaces sit at their rule index (the native sidecar's id space)
    merges.map { case (a, b) => a + b }.distinct.zipWithIndex.foreach {
      case (s, i) => assert(vocab.find(_._1 == s).exists(_._2 == i))
    }
    // independent restatement of the import: native symbols mapped
    // through the FILE's explicit ids (unk −1 only outside the closure)
    val vmap = vocab.toMap
    import spark.implicits._
    val texts = corpusLines.map { l =>
      val Array(i, t) = l.split(",", 2); (i, t)
    }
    val syms = texts.toDF("id", "text")
      .select(col("id"), graft.llm.Bpe.docSymbols(
        graft.llm.Bpe.encodeText(col("text"), merges)).as("s"))
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
    val expected = syms.map { case (i, ss) =>
      (i, ss.map(s => vmap.getOrElse(s, -1)).mkString(","))
    }.toSeq
    val hf = encode(dir, s"$dir/tok.json", None)
    assert(hf == expected)
    // and wherever the SIDECAR path emits a real id, the file path emits
    // the SAME id (the id-compatibility law the closure must not break)
    val native = encode(dir, s"$dir/vocab", Some("bpe"))
    native.zip(hf).foreach { case ((_, n), (_, h)) =>
      n.split(",").zip(h.split(",")).foreach { case (ni, hi) =>
        if (ni != "-1") assert(ni == hi, s"sidecar id $ni vs file id $hi")
      }
    }
  }

  test("a GPT-2-format byte-level tokenizer.json imports id-for-id: " +
      "explicit non-contiguous ids, mixed merge spellings, ByteLevel " +
      "pretokenization detected") {
    val dir = tmp("hf-gpt2")
    // the real file shape: merges as BOTH the 'left right' string
    // spelling (GPT-2) and the [left, right] pair spelling (newer
    // tokenizers), vocab ids deliberately NOT list positions
    val json =
      """{
        |  "version": "1.0",
        |  "pre_tokenizer": {
        |    "type": "Sequence",
        |    "pretokenizers": [{"type": "ByteLevel", "add_prefix_space": false}]
        |  },
        |  "model": {
        |    "type": "BPE",
        |    "vocab": {"Ġ": 50, "t": 2, "h": 4, "e": 6, "a": 30,
        |              "th": 10, "the": 20},
        |    "merges": ["t h", ["th", "e"]]
        |  }
        |}""".stripMargin
    write(dir, "gpt2.json", json)
    val loaded = HfTokenizer.load(s"$dir/gpt2.json")
    assert(loaded.model == HfBpeModel(
      Seq(("Ġ", 50), ("t", 2), ("h", 4), ("e", 6), ("a", 30),
        ("th", 10), ("the", 20)),
      Seq(("t", "h"), ("th", "e")), unkId = None))
    assert(loaded.scheme.pre == HfPreTok.ByteLevel)
    // "the tha": GPT-2 pieces ["the", " tha"] → mapped ["the", "Ġtha"]
    // → merges th, the → symbols [the] and [Ġ, th, a]
    // → file ids [20] and [50, 10, 30]; unk defaults to −1
    // "eh X": pieces ["eh", " X"] → ["eh"=e,h] [ĠX: Ġ, X(unk)]
    val out = encodeLines(Seq(("1", "the tha"), ("2", "eh X")),
      s"$dir/gpt2.json")
    assert(out == Seq(("1", "20,50,10,30"), ("2", "6,4,50,-1")))
  }

  test("a Llama-format tokenizer.json imports id-for-id: Prepend/Replace " +
      "▁-marking with a null pre_tokenizer (whole-text BPE), " +
      "byte_fallback for OOV symbols, <s> from the template") {
    val dir = tmp("hf-llama")
    // the published Llama file shape: normalizer = Sequence[Prepend ▁,
    // Replace " "→▁], NO pre_tokenizer (BPE runs over the whole marked
    // string), byte_fallback=true (the <0xNN> byte vocabulary), and a
    // TemplateProcessing post_processor prepending <s>
    val json =
      """{
        |  "normalizer": {"type": "Sequence", "normalizers": [
        |    {"type": "Prepend", "prepend": "▁"},
        |    {"type": "Replace", "pattern": {"String": " "}, "content": "▁"}]},
        |  "pre_tokenizer": null,
        |  "post_processor": {"type": "TemplateProcessing",
        |    "single": [{"SpecialToken": {"id": "<s>", "type_id": 0}},
        |               {"Sequence": {"id": "A", "type_id": 0}}],
        |    "pair": [],
        |    "special_tokens": {"<s>": {"id": "<s>", "ids": [1],
        |                               "tokens": ["<s>"]}}},
        |  "model": {
        |    "type": "BPE",
        |    "unk_token": "<unk>",
        |    "fuse_unk": true,
        |    "byte_fallback": true,
        |    "vocab": {"<unk>": 0, "<s>": 1, "</s>": 2, "<0x63>": 3,
        |              "▁": 4, "t": 5, "h": 6, "e": 7, "a": 8,
        |              "▁t": 9, "he": 10, "▁the": 11},
        |    "merges": ["▁ t", "h e", "▁t he"]
        |  }
        |}""".stripMargin
    write(dir, "llama.json", json)
    val loaded = HfTokenizer.load(s"$dir/llama.json")
    assert(loaded.scheme.pre == HfPreTok.WholeText)
    assert(loaded.scheme.prefixIds == Seq(1) && loaded.scheme.suffixIds.isEmpty)
    loaded.model match {
      case m: HfBpeModel =>
        assert(m.byteFallback && m.fuseUnk && m.unkId.contains(0))
      case other => fail(s"expected BPE, got $other")
    }
    // "the cat": normalize → "▁the▁cat" → ONE matching domain → merges
    // (▁,t),(h,e),(▁t,he) → symbols [▁the, ▁, c, a, t]; 'c' is OOV →
    // byte_fallback <0x63> (id 3) — with the template: 1 ▁the ▁ c a t
    val out = encodeLines(Seq(("1", "the cat")), s"$dir/llama.json")
    assert(out == Seq(("1", "1,11,4,3,8,5")))
  }

  test("fuse_unk collapses consecutive unk ids (byte_fallback off)") {
    val dir = tmp("hf-fuse")
    val json =
      """{
        |  "pre_tokenizer": {"type": "WhitespaceSplit"},
        |  "model": {
        |    "type": "BPE",
        |    "unk_token": "<unk>",
        |    "fuse_unk": true,
        |    "vocab": {"<unk>": 0, "t": 1, "h": 2, "th": 3},
        |    "merges": ["t h"]
        |  }
        |}""".stripMargin
    write(dir, "fuse.json", json)
    // "thxy th": [th, x, y] → x,y both unk(0) → FUSED to one 0
    val out = encodeLines(Seq(("1", "thxy th")), s"$dir/fuse.json")
    assert(out == Seq(("1", "3,0,3")))
  }

  test("a BERT-format tokenizer.json imports id-for-id: BertNormalizer " +
      "(clean, lowercase, NFD accent strip), BertPreTokenizer " +
      "(punctuation isolation), the file's max_input_chars_per_word, " +
      "[CLS]/[SEP] from the template") {
    val dir = tmp("hf-bert")
    val json =
      """{
        |  "normalizer": {"type": "BertNormalizer", "clean_text": true,
        |    "handle_chinese_chars": true, "strip_accents": null,
        |    "lowercase": true},
        |  "pre_tokenizer": {"type": "BertPreTokenizer"},
        |  "post_processor": {"type": "TemplateProcessing",
        |    "single": [{"SpecialToken": {"id": "[CLS]", "type_id": 0}},
        |               {"Sequence": {"id": "A", "type_id": 0}},
        |               {"SpecialToken": {"id": "[SEP]", "type_id": 0}}],
        |    "special_tokens": {
        |      "[CLS]": {"id": "[CLS]", "ids": [101], "tokens": ["[CLS]"]},
        |      "[SEP]": {"id": "[SEP]", "ids": [102], "tokens": ["[SEP]"]}}},
        |  "model": {
        |    "type": "WordPiece",
        |    "unk_token": "[UNK]",
        |    "continuing_subword_prefix": "##",
        |    "max_input_chars_per_word": 6,
        |    "vocab": {"[UNK]": 100, "[CLS]": 101, "[SEP]": 102,
        |              "the": 5, "caf": 6, "##e": 7, ",": 8,
        |              "th": 9, "##an": 10}
        |  }
        |}""".stripMargin
    write(dir, "bert.json", json)
    val loaded = HfTokenizer.load(s"$dir/bert.json")
    assert(loaded.scheme.pre == HfPreTok.Bert)
    assert(loaded.scheme.prefixIds == Seq(101))
    assert(loaded.scheme.suffixIds == Seq(102))
    loaded.model match {
      case m: HfWordPieceModel => assert(m.maxWordLen.contains(6))
      case other => fail(s"expected WordPiece, got $other")
    }
    // "The Café, than extravagance": lowercase + NFD strip é→e, the
    // comma splits off as its own word; "extravagance" (12 chars) is
    // over the FILE's 6-char bound → whole-word [UNK] at the file's id
    val out = encodeLines(Seq(("1", "The Café, than extravagance")),
      s"$dir/bert.json")
    assert(out == Seq(("1", "101,5,6,7,8,9,10,100,102")))
    // an explicit MaxWordLen key overrides the file's bound: at 12,
    // "extravagance" is attempted (and, unsplittable here, still [UNK]),
    // but "than" under MaxWordLen 3 collapses too
    val tight = encodeLines(Seq(("1", "The Café, than extravagance")),
      s"$dir/bert.json", extra = "  MaxWordLen = 3")
    assert(tight == Seq(("1", "101,5,100,8,100,100,102")))
  }

  test("a Metaspace unigram tokenizer.json (SentencePiece-converted " +
      "shape) imports id-for-id: ▁-marked words, ids = list positions, " +
      "no engine word-length default applied") {
    val dir = tmp("hf-meta")
    val json =
      """{
        |  "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
        |    "prepend_scheme": "always"},
        |  "model": {
        |    "type": "Unigram",
        |    "unk_id": 0,
        |    "vocab": [["<unk>", 0.0], ["▁the", -1.0], ["▁", -2.0],
        |              ["c", -3.0], ["a", -4.0], ["t", -5.0],
        |              ["▁cat", -4.5]]
        |  }
        |}""".stripMargin
    write(dir, "meta.json", json)
    val loaded = HfTokenizer.load(s"$dir/meta.json")
    assert(loaded.scheme.pre == HfPreTok.Metaspace("▁", prependFirst = true))
    assert(loaded.model == HfUnigramModel(
      Seq(("<unk>", 0), ("▁the", 64), ("▁", 128), ("c", 192),
        ("a", 256), ("t", 320), ("▁cat", 288)), unkId = Some(0)))
    // "the cat" → words ▁the, ▁cat → whole-piece Viterbi wins both →
    // positions 1, 6. A word of 11+ chars must NOT vanish under the
    // engine's sidecar default of 10: "▁aaaaaaaaaaaa" (13 chars)
    // segments ▁ + 12·a — the file has no bound and neither does the
    // import (up to the documented 63-code-point Viterbi ceiling)
    val out = encodeLines(
      Seq(("1", "the cat"), ("2", "aaaaaaaaaaaa")), s"$dir/meta.json")
    assert(out == Seq(("1", "1,6"), ("2", "2," + Seq.fill(12)("4").mkString(","))))
  }

  test("unigram cost/score bridge is lossless: export writes " +
      "-cost/64, import recovers the exact integer costs and unk_id") {
    val dir = tmp("hf-uni")
    val pieces = Seq(("a", 1), ("ab", 97), ("b", 643), ("zz", 2147483647))
    HfTokenizer.exportUnigram(s"$dir/u.json", pieces, unkId = Some(3))
    assert(HfTokenizer.load(s"$dir/u.json").model ==
      HfUnigramModel(pieces, unkId = Some(3)))
    // a real SentencePiece-style score quantizes at 1/64-cost resolution
    val json =
      """{"pre_tokenizer": {"type": "WhitespaceSplit"},
        | "model": {"type": "Unigram", "unk_id": 0,
        |  "vocab": [["<unk>", 0.0], ["he", -2.5], ["l", -9.231]]}}"""
        .stripMargin
    write(dir, "sp.json", json)
    assert(HfTokenizer.load(s"$dir/sp.json").model == HfUnigramModel(
      Seq(("<unk>", 0), ("he", 160), ("l", math.round(9.231 * 64).toInt)),
      unkId = Some(0)))
  }

  test("HfBpeIds (native fused tail) equals the composed " +
      "docSymbols+bpeIds form — byte_fallback, fuse_unk, empty/null words") {
    import spark.implicits._
    val O = graft.llm.Bpe.Open
    val C = graft.llm.Bpe.Close
    def w(syms: String*): String = syms.map(s => s"$O$s$C").mkString
    // adversarial encoded-word arrays: OOV symbols (multi-byte UTF-8 for
    // the byte-fallback expansion), consecutive unks, empty words (⟨⟩ —
    // one "" symbol in the composed form), null words (skipped by
    // array_join), the single-empty-word degenerate (total length ≤ 2 →
    // no symbols), and an empty document
    val rows: Seq[Seq[String]] = Seq(
      Seq(w("the"), w("Ġ", "th", "a")),
      Seq(w("é", "x"), w("zz", "zz", "q")),
      Seq(w(""), w("a")), // leading empty word → "" symbol
      Seq(w("a"), null, w("b")),
      Seq(w("")), // degenerate: exactly ⟨⟩, composed form yields []
      Seq.empty[String],
      Seq(w("a", ""), w("", "b")))
    val vocab = Seq(("the", 20), ("Ġ", 50), ("th", 10), ("a", 30),
      ("b", 31), ("<0xC3>", 70), ("<0xA9>", 71), ("x", 72))
    val df = rows.toDF("enc")
    for (byteFb <- Seq(false, true); fuse <- Seq(false, true)) {
      val composed = graft.llm.HfEncode.bpeIds(
        graft.llm.Bpe.docSymbols(array_join(col("enc"), "|")),
        vocab, unk = -1, byteFallback = byteFb, fuseUnk = fuse)
      val fused = graft.llm.HfEncode.bpeIdsOfWords(
        col("enc"), vocab, unk = -1, byteFallback = byteFb, fuseUnk = fuse)
      val diff = df.select(composed.as("a"), fused.as("b"))
        .filter(not(col("a") <=> col("b"))).count()
      assert(diff == 0, s"byteFallback=$byteFb fuseUnk=$fuse diverged")
    }
  }

  test("malformed files fail loudly: missing model, unknown type, bad merge") {
    val dir = tmp("hf-bad")
    val e1 = intercept[Exception](
      HfTokenizer.load(write(dir, "a.json", "{}")))
    assert(e1.getMessage.contains("no 'model'"))
    val e2 = intercept[Exception](HfTokenizer.load(
      write(dir, "b.json", """{"model": {"type": "SentencePieceBPE"}}""")))
    assert(e2.getMessage.contains("unsupported model.type"))
    val e3 = intercept[Exception](HfTokenizer.load(
      write(dir, "c.json",
        """{"model": {"type": "BPE", "vocab": {"a": 0},
          |  "merges": ["a b c"]}}""".stripMargin)))
    assert(e3.getMessage.contains("not 'left right'"))
  }

  test("un-replicable schemes are LOUD at load: NFKC/Precompiled " +
      "normalizers, unknown pre_tokenizers, combined splitting schemes, " +
      "ignore_merges, whole-text unigram — refused, never approximated") {
    val dir = tmp("hf-norepl")
    // an unknown pre_tokenizer (Digits) — refused even nested in a
    // Sequence next to a replicable one
    val e1 = intercept[Exception](HfTokenizer.load(write(dir, "seq.json",
      """{"pre_tokenizer": {"type": "Sequence", "pretokenizers":
        |    [{"type": "ByteLevel"}, {"type": "Digits"}]},
        |  "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""
        .stripMargin)))
    assert(e1.getMessage.contains("Digits") &&
      e1.getMessage.contains("cannot be replicated"))
    // two DISTINCT replicable splitting schemes cannot compose
    val e2 = intercept[Exception](HfTokenizer.load(write(dir, "two.json",
      """{"pre_tokenizer": {"type": "Sequence", "pretokenizers":
        |    [{"type": "Whitespace"}, {"type": "Metaspace"}]},
        |  "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""
        .stripMargin)))
    assert(e2.getMessage.contains("Sequence combining"))
    // a normalizer outside the replicated set (NFKC rewrites text in a
    // way the engine does not implement)
    val e3 = intercept[Exception](HfTokenizer.load(write(dir, "nfkc.json",
      """{"normalizer": {"type": "NFKC"},
        |  "model": {"type": "WordPiece", "unk_token": "[UNK]",
        |    "vocab": {"[UNK]": 0, "a": 1}}}""".stripMargin)))
    assert(e3.getMessage.contains("NFKC") &&
      e3.getMessage.contains("cannot be replicated"))
    // SentencePiece's Precompiled charsmap cannot be replayed
    val e4 = intercept[Exception](HfTokenizer.load(write(dir, "pc.json",
      """{"normalizer": {"type": "Precompiled", "precompiled_charsmap": ""},
        |  "pre_tokenizer": {"type": "Metaspace"},
        |  "model": {"type": "Unigram", "unk_id": 0,
        |    "vocab": [["<unk>", 0.0]]}}""".stripMargin)))
    assert(e4.getMessage.contains("Precompiled"))
    // Llama-3-style vocab-first matching is a different algorithm
    val e5 = intercept[Exception](HfTokenizer.load(write(dir, "im.json",
      """{"pre_tokenizer": {"type": "ByteLevel"},
        |  "model": {"type": "BPE", "ignore_merges": true,
        |    "vocab": {"a": 0}, "merges": []}}""".stripMargin)))
    assert(e5.getMessage.contains("ignore_merges"))
    // whole-text unigram would silently drop long documents (the packed
    // Viterbi ceiling) — refuse
    val e6 = intercept[Exception](HfTokenizer.load(write(dir, "wu.json",
      """{"model": {"type": "Unigram", "unk_id": 0,
        |  "vocab": [["<unk>", 0.0]]}}""".stripMargin)))
    assert(e6.getMessage.contains("no pre_tokenizer"))
    // an unknown post_processor is refused too
    val e7 = intercept[Exception](HfTokenizer.load(write(dir, "pp.json",
      """{"post_processor": {"type": "FancyProcessing"},
        |  "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""
        .stripMargin)))
    assert(e7.getMessage.contains("FancyProcessing"))
    // an explicit null normalizer (what GPT-2 files and the engine's own
    // exports carry) stays accepted
    HfTokenizer.load(write(dir, "ok.json",
      """{"normalizer": null,
        |  "pre_tokenizer": {"type": "Whitespace"},
        |  "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""
        .stripMargin))
  }

  test("HF 'Whitespace' is the \\w+|[^\\w\\s]+ regex, not a whitespace " +
      "split: punctuation runs become their own words") {
    val dir = tmp("hf-ws")
    val json =
      """{
        |  "pre_tokenizer": {"type": "Whitespace"},
        |  "model": {
        |    "type": "BPE",
        |    "vocab": {"a": 1, "b": 2, "!": 3, "?": 4, "!?": 5, "ab": 6},
        |    "merges": ["a b", "! ?"]
        |  }
        |}""".stripMargin
    write(dir, "ws.json", json)
    // "ab!? b": Whitespace splits into [ab, !?, b] — the punctuation RUN
    // is its own word and merges to one symbol; a WhitespaceSplit would
    // have seen [ab!?, b] and emitted unk soup
    val out = encodeLines(Seq(("1", "ab!? b")), s"$dir/ws.json")
    assert(out == Seq(("1", "6,5,2")))
  }

  test("exportBpe refuses a vocab that is not merge-operand closed (the " +
      "real tokenizers loading rule)") {
    val dir = tmp("hf-closed")
    val e = intercept[Exception](HfTokenizer.exportBpe(s"$dir/bad.json",
      vocab = Seq(("th", 0)), merges = Seq(("t", "h")), byteLevel = false))
    assert(e.getMessage.contains("absent from the vocab"))
    // the closure helper produces exactly what the check wants
    HfTokenizer.exportBpe(s"$dir/ok.json",
      vocab = HfTokenizer.operandClosure(Seq(("t", "h"))).zipWithIndex,
      merges = Seq(("t", "h")), byteLevel = false)
    assert(HfTokenizer.operandClosure(Seq(("t", "h"), ("th", "e"))) ==
      Seq("th", "the", "t", "h", "e"))
  }

  test("WordPiece import: an explicit UnkId config key wins over the " +
      "file's unk_token id for whole-word unks (the documented rule)") {
    val dir = tmp("hf-wp-unk")
    val json =
      """{
        |  "pre_tokenizer": {"type": "WhitespaceSplit"},
        |  "model": {
        |    "type": "WordPiece",
        |    "unk_token": "[UNK]",
        |    "continuing_subword_prefix": "##",
        |    "vocab": {"[UNK]": 0, "th": 5, "##an": 7, "the": 9}
        |  }
        |}""".stripMargin
    write(dir, "wp.json", json)
    // xyz is unsplittable: BERT semantics collapse it to the unk SURFACE,
    // but the configured UnkId (-1) must be the emitted id, not the
    // file's id for "[UNK]" (0) — a downstream 'drop docs with id -1'
    // OOV gate must see it
    val out = encodeLines(Seq(("1", "the than xyz")), s"$dir/wp.json",
      extra = "  UnkId = -1")
    assert(out == Seq(("1", "9,5,7,-1")))
    // without the key the file's own unk id applies
    val dflt = encodeLines(Seq(("1", "the than xyz")), s"$dir/wp.json")
    assert(dflt == Seq(("1", "9,5,7,0")))
  }
}
