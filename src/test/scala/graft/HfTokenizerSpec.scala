package graft

import java.nio.file.Files

import graft.llm.{HfBpeModel, HfTokenizer, HfUnigramModel, HfWordPieceModel}
import graft.topology.Topology

/** HuggingFace tokenizer.json interop ([[graft.llm.HfTokenizer]]): the
  * train → export → import → encode round trip is bit-equal to the native
  * parquet-sidecar path for all three methods, a REAL GPT-2-format
  * byte-level file (explicit non-contiguous ids, mixed merge spellings)
  * imports id-for-id, and the unigram cost/score bridge is lossless.
  */
class HfTokenizerSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
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

  for (method <- Seq("bpe", "unigram", "wordpiece"))
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
      val wrong = if (method == "bpe") "unigram" else "bpe"
      val e = intercept[Exception](encode(dir, s"$dir/tok.json", Some(wrong)))
      assert(e.getMessage.contains("does not match"))
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
    Files.write(java.nio.file.Paths.get(dir, "gpt2.json"),
      json.getBytes("UTF-8"))
    val model = HfTokenizer.load(s"$dir/gpt2.json")
    assert(model == HfBpeModel(
      Seq(("Ġ", 50), ("t", 2), ("h", 4), ("e", 6), ("a", 30),
        ("th", 10), ("the", 20)),
      Seq(("t", "h"), ("th", "e")), byteLevel = true, unkId = None))
    // "the tha": GPT-2 pieces ["the", " tha"] → mapped ["the", "Ġtha"]
    // → merges th, the → symbols [the] and [Ġ, th, a]
    // → file ids [20] and [50, 10, 30]; unk defaults to −1
    val toml =
      s"""[fields]
         |names = ["id", "text"]
         |[input]
         |name = "LogLines"
         |  [input.config]
         |  Lines = ["1,the tha", "2,eh X"]
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$dir/gpt2.json"
         |[output]
         |name = "Nop"
         |fields = ["id", "ids"]
         |""".stripMargin
    val out = Topology.compileToml(spark, toml).projected.orderBy("id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // "eh X": pieces ["eh", " X"] → ["eh"=e,h] [ĠX: Ġ, X(unk)]
    assert(out == Seq(("1", "20,50,10,30"), ("2", "6,4,50,-1")))
  }

  test("a BERT-style WordPiece tokenizer.json imports id-for-id: greedy " +
      "longest match, ## continuations, whole-word unk at the file's " +
      "unk_token id") {
    val dir = tmp("hf-wp")
    val json =
      """{
        |  "model": {
        |    "type": "WordPiece",
        |    "unk_token": "[UNK]",
        |    "continuing_subword_prefix": "##",
        |    "vocab": {"[UNK]": 0, "th": 5, "##an": 7, "the": 9}
        |  }
        |}""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "wp.json"), json.getBytes("UTF-8"))
    assert(HfTokenizer.load(s"$dir/wp.json") == HfWordPieceModel(
      Seq(("[UNK]", 0), ("th", 5), ("##an", 7), ("the", 9)),
      unkToken = Some("[UNK]"), unkId = Some(0)))
    val toml =
      s"""[fields]
         |names = ["id", "text"]
         |[input]
         |name = "LogLines"
         |  [input.config]
         |  Lines = ["1,the than xyz"]
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$dir/wp.json"
         |[output]
         |name = "Nop"
         |fields = ["id", "ids"]
         |""".stripMargin
    val out = Topology.compileToml(spark, toml).projected.collect()
      .map(_.getString(1)).toSeq
    // the → [9]; than → th + ##an → [5, 7]; xyz → whole-word [UNK] → 0
    assert(out == Seq("9,5,7,0"))
  }

  test("unigram cost/score bridge is lossless: export writes " +
      "-cost/64, import recovers the exact integer costs and unk_id") {
    val dir = tmp("hf-uni")
    val pieces = Seq(("a", 1), ("ab", 97), ("b", 643), ("zz", 2147483647))
    HfTokenizer.exportUnigram(s"$dir/u.json", pieces, unkId = Some(3))
    assert(HfTokenizer.load(s"$dir/u.json") ==
      HfUnigramModel(pieces, unkId = Some(3)))
    // a real SentencePiece-style score quantizes at 1/64-cost resolution
    val json =
      """{"model": {"type": "Unigram", "unk_id": 0,
        |  "vocab": [["<unk>", 0.0], ["he", -2.5], ["l", -9.231]]}}"""
        .stripMargin
    Files.write(java.nio.file.Paths.get(dir, "sp.json"), json.getBytes("UTF-8"))
    assert(HfTokenizer.load(s"$dir/sp.json") == HfUnigramModel(
      Seq(("<unk>", 0), ("he", 160), ("l", math.round(9.231 * 64).toInt)),
      unkId = Some(0)))
  }

  test("malformed files fail loudly: missing model, unknown type, bad merge") {
    val dir = tmp("hf-bad")
    def write(name: String, s: String): String = {
      Files.write(java.nio.file.Paths.get(dir, name), s.getBytes("UTF-8"))
      s"$dir/$name"
    }
    val e1 = intercept[Exception](
      HfTokenizer.load(write("a.json", "{}")))
    assert(e1.getMessage.contains("no 'model'"))
    val e2 = intercept[Exception](HfTokenizer.load(
      write("b.json", """{"model": {"type": "SentencePieceBPE"}}""")))
    assert(e2.getMessage.contains("unsupported model.type"))
    val e3 = intercept[Exception](HfTokenizer.load(
      write("c.json",
        """{"model": {"type": "BPE", "vocab": {"a": 0},
          |  "merges": ["a b c"]}}""".stripMargin)))
    assert(e3.getMessage.contains("not 'left right'"))
  }

  test("un-replicable pretokenization/normalization is LOUD at load: a " +
      "Metaspace (Llama/SentencePiece-style) BPE file and a normalizer-" +
      "bearing file are refused instead of silently encoding unk soup") {
    val dir = tmp("hf-norepl")
    def write(name: String, s: String): String = {
      Files.write(java.nio.file.Paths.get(dir, name), s.getBytes("UTF-8"))
      s"$dir/$name"
    }
    // Metaspace pretokenizer (the ▁ word-prefix convention): the engine
    // encodes via whitespace/byte-level only, so word-initial pieces
    // would never match — must refuse, not import
    val e1 = intercept[Exception](HfTokenizer.load(write("meta.json",
      """{"pre_tokenizer": {"type": "Metaspace", "replacement": "▁"},
        |  "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""
        .stripMargin)))
    assert(e1.getMessage.contains("Metaspace") &&
      e1.getMessage.contains("cannot be replicated"))
    // nested inside a Sequence it is still found
    val e2 = intercept[Exception](HfTokenizer.load(write("seq.json",
      """{"pre_tokenizer": {"type": "Sequence", "pretokenizers":
        |    [{"type": "ByteLevel"}, {"type": "Digits"}]},
        |  "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""
        .stripMargin)))
    assert(e2.getMessage.contains("Digits"))
    // a text normalizer (BERT-style lowercasing) rewrites the input
    // before tokenization — the engine applies none, so refuse
    val e3 = intercept[Exception](HfTokenizer.load(write("norm.json",
      """{"normalizer": {"type": "Lowercase"},
        |  "model": {"type": "WordPiece", "unk_token": "[UNK]",
        |    "vocab": {"[UNK]": 0, "a": 1}}}""".stripMargin)))
    assert(e3.getMessage.contains("normalizer") &&
      e3.getMessage.contains("Lowercase"))
    // an explicit null normalizer (what GPT-2 files and the engine's own
    // exports carry) stays accepted
    HfTokenizer.load(write("ok.json",
      """{"normalizer": null,
        |  "pre_tokenizer": {"type": "Whitespace"},
        |  "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""
        .stripMargin))
  }

  test("WordPiece import: an explicit UnkId config key wins over the " +
      "file's unk_token id for whole-word unks (the documented rule)") {
    val dir = tmp("hf-wp-unk")
    val json =
      """{
        |  "model": {
        |    "type": "WordPiece",
        |    "unk_token": "[UNK]",
        |    "continuing_subword_prefix": "##",
        |    "vocab": {"[UNK]": 0, "th": 5, "##an": 7, "the": 9}
        |  }
        |}""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "wp.json"), json.getBytes("UTF-8"))
    val toml =
      s"""[fields]
         |names = ["id", "text"]
         |[input]
         |name = "LogLines"
         |  [input.config]
         |  Lines = ["1,the than xyz"]
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$dir/wp.json"
         |  UnkId = -1
         |[output]
         |name = "Nop"
         |fields = ["id", "ids"]
         |""".stripMargin
    val out = Topology.compileToml(spark, toml).projected.collect()
      .map(_.getString(1)).toSeq
    // xyz is unsplittable: BERT semantics collapse it to the unk SURFACE,
    // but the configured UnkId (-1) must be the emitted id, not the
    // file's id for "[UNK]" (0) — a downstream 'drop docs with id -1'
    // OOV gate must see it
    assert(out == Seq("9,5,7,-1"))
  }
}
