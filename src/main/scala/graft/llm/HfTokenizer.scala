package graft.llm

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Interop with the public HuggingFace `tokenizer.json` format — the
  * portability seam for trained vocabularies: a tokenizer trained in this
  * engine EXPORTS to the file a `tokenizers`-based training stack loads,
  * and a published model's tokenizer (GPT-2/Llama-family BPE,
  * SentencePiece-unigram) IMPORTS id-for-id so corpora packed here carry
  * ids an EXISTING model understands (continued pretraining is impossible
  * without that id compatibility).
  *
  * Format (public knowledge — the `tokenizers` library's serialized
  * form): one JSON object with a `model` node; `model.type` selects the
  * algorithm. BPE carries `model.vocab` (piece → id) and `model.merges`
  * (rank-ordered rules, either `"left right"` strings or `[left, right]`
  * pairs — both public spellings are read); byte-level pretokenization is
  * flagged under `pre_tokenizer` (possibly nested in a `Sequence`).
  * Unigram carries `model.vocab` as a `[piece, log-prob score]` list whose
  * ORDER is the id space, plus `model.unk_id`. WordPiece carries
  * `model.vocab` and `continuing_subword_prefix` ("##").
  *
  * Cost/score bridge (unigram): the engine's Viterbi costs are positive
  * integers; HF scores are log-probs (negative doubles). Export writes
  * `score = -cost / 64.0` (exact in binary — /2⁶ loses nothing), import
  * quantizes `cost = round(-score · 64)`, so an engine→file→engine round
  * trip is EXACT and a real SentencePiece file imports at 1/64-bit cost
  * resolution. Everything here is driver-side and vocabulary-bounded;
  * files read/write through the Hadoop FS so `file:`/`hdfs:`/`s3a:` paths
  * all work.
  */
sealed trait HfModel

/** A BPE tokenizer: `vocab` in file order (piece → EXPLICIT id — HF ids
  * need not be list positions), `merges` in rank order, `byteLevel` when
  * the file pretokenizes GPT-2-style (encode through
  * [[Bpe.byteLevelEncode]]; otherwise whitespace [[Bpe.encodeText]]).
  */
final case class HfBpeModel(vocab: Seq[(String, Int)],
    merges: Seq[(String, String)], byteLevel: Boolean,
    unkId: Option[Int]) extends HfModel

/** A unigram-LM tokenizer: `pieces` in file order (the id space) with
  * QUANTIZED Viterbi costs (see the cost/score bridge above).
  */
final case class HfUnigramModel(pieces: Seq[(String, Int)],
    unkId: Option[Int]) extends HfModel

/** A WordPiece tokenizer: `vocab` in file order (piece → explicit id;
  * continuation pieces carry the `##` prefix in the piece string).
  * `unkToken` is the file's unk SURFACE (unsplittable words collapse to
  * it, BERT semantics), `unkId` its vocab id when present.
  */
final case class HfWordPieceModel(vocab: Seq[(String, Int)],
    unkToken: Option[String], unkId: Option[Int]) extends HfModel

object HfTokenizer {

  /** Unigram cost quantization: `cost = round(-score · CostScale)`. A
    * power of two, so the export direction `-cost / CostScale` is exact
    * in binary and the round trip is lossless.
    */
  val CostScale = 64

  private def mapper = new ObjectMapper()

  private def readBytes(path: String, conf: Configuration): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def writeBytes(path: String, bytes: Array[Byte],
      conf: Configuration): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    Option(p.getParent).foreach(fs.mkdirs)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Parse a tokenizer.json into the engine's model view. Loud on an
    * unknown `model.type` or a malformed merges/vocab node — a silently
    * half-read tokenizer would corrupt every downstream id.
    */
  def load(path: String, conf: Configuration = new Configuration())
      : HfModel = {
    val root = mapper.readTree(readBytes(path, conf))
    val model = root.get("model")
    require(model != null && model.isObject,
      s"HfTokenizer: $path has no 'model' object")
    requireReplicable(path, root)
    val mtype = Option(model.get("type")).map(_.asText()).getOrElse("")
    mtype match {
      case "BPE"       => loadBpe(path, root, model)
      case "Unigram"   => loadUnigram(path, model)
      case "WordPiece" => loadWordPiece(path, model)
      case other => throw new IllegalArgumentException(
        s"HfTokenizer: unsupported model.type '$other' in $path " +
          "(BPE | Unigram | WordPiece)")
    }
  }

  /** Every `"type"` marker in a pre_tokenizer/normalizer subtree (the
    * nodes nest under `Sequence`, so walk the whole tree).
    */
  private def typeMarkers(n: JsonNode): Seq[String] =
    if (n == null || n.isNull) Seq.empty
    else if (n.isObject) {
      val own = Option(n.get("type")).filter(_.isTextual).map(_.asText()).toSeq
      val kids = Seq.newBuilder[String]
      val it = n.properties().iterator()
      while (it.hasNext) kids ++= typeMarkers(it.next().getValue)
      own ++ kids.result()
    } else if (n.isArray) {
      val out = Seq.newBuilder[String]
      val it = n.elements()
      while (it.hasNext) out ++= typeMarkers(it.next())
      out.result()
    } else Seq.empty

  /** The pretokenization schemes the engine replicates: GPT-2 byte-level
    * and whitespace splitting — and NO text normalizer. A file whose
    * pre_tokenizer carries anything else (Metaspace, BertPreTokenizer,
    * Split regexes, Digits…) or whose normalizer rewrites text
    * (Lowercase, BertNormalizer, NFKC…) would LOAD cleanly here but
    * encode DIFFERENT ids than the stack that published it — exactly the
    * silent-corruption case this module exists to refuse, so refuse it
    * loudly at load time instead of mapping most tokens to unk at
    * encode time.
    */
  private val replicablePre =
    Set("Sequence", "ByteLevel", "Whitespace", "WhitespaceSplit")

  private def requireReplicable(path: String, root: JsonNode): Unit = {
    val badPre = typeMarkers(root.get("pre_tokenizer"))
      .filterNot(replicablePre).distinct
    require(badPre.isEmpty,
      s"HfTokenizer: $path pre_tokenizer scheme(s) " +
        s"${badPre.mkString("'", "', '", "'")} cannot be replicated by " +
        "this engine (supported: ByteLevel, Whitespace, WhitespaceSplit, " +
        "Sequence of those) - importing would silently encode different " +
        "ids than the stack that published the file")
    val norm = root.get("normalizer")
    require(norm == null || norm.isNull, {
      val t = typeMarkers(norm).distinct
      s"HfTokenizer: $path carries a normalizer" +
        (if (t.nonEmpty) t.mkString(" ('", "', '", "')") else "") +
        " this engine does not apply - importing would silently encode " +
        "different ids than the stack that published the file"
    })
  }

  /** Vocab object (piece → id) in FILE order — HF ids are explicit, so
    * order only matters for determinism of the surfaces list.
    */
  private def vocabPairs(path: String, model: JsonNode): Seq[(String, Int)] = {
    val v = model.get("vocab")
    require(v != null && v.isObject,
      s"HfTokenizer: $path model.vocab must be an object (piece -> id)")
    val it = v.properties().iterator()
    val out = Seq.newBuilder[(String, Int)]
    while (it.hasNext) {
      val e = it.next()
      require(e.getValue.isIntegralNumber,
        s"HfTokenizer: $path vocab id for '${e.getKey}' is not an integer")
      out += ((e.getKey, e.getValue.asInt()))
    }
    out.result()
  }

  private def unkFromToken(model: JsonNode,
      vocab: Seq[(String, Int)]): Option[Int] =
    Option(model.get("unk_token")).filter(!_.isNull).map(_.asText())
      .flatMap(t => vocab.collectFirst { case (p, id) if p == t => id })

  private def loadBpe(path: String, root: JsonNode,
      model: JsonNode): HfBpeModel = {
    val vocab = vocabPairs(path, model)
    val m = model.get("merges")
    require(m != null && m.isArray,
      s"HfTokenizer: $path model.merges must be an array")
    val merges = (0 until m.size()).map { i =>
      m.get(i) match {
        case s if s.isTextual =>
          val parts = s.asText().split(" ", -1)
          require(parts.length == 2 && parts.forall(_.nonEmpty),
            s"HfTokenizer: $path merge '${s.asText()}' is not 'left right'")
          (parts(0), parts(1))
        case a if a.isArray && a.size() == 2 =>
          (a.get(0).asText(), a.get(1).asText())
        case other => throw new IllegalArgumentException(
          s"HfTokenizer: $path merge entry $other is neither a " +
            "'left right' string nor a [left, right] pair")
      }
    }
    // byte-level pretokenization may sit directly under pre_tokenizer or
    // nested inside a Sequence — scan the subtree for the type marker
    val byteLevel = Option(root.get("pre_tokenizer"))
      .exists(_.toString.contains("\"ByteLevel\""))
    HfBpeModel(vocab, merges, byteLevel, unkFromToken(model, vocab))
  }

  private def loadUnigram(path: String, model: JsonNode): HfUnigramModel = {
    val v = model.get("vocab")
    require(v != null && v.isArray,
      s"HfTokenizer: $path Unigram model.vocab must be a [piece, score] list")
    val pieces = (0 until v.size()).map { i =>
      val e = v.get(i)
      require(e.isArray && e.size() == 2,
        s"HfTokenizer: $path Unigram vocab entry $i is not [piece, score]")
      val cost = math.round(-e.get(1).asDouble() * CostScale)
      require(cost >= Int.MinValue.toLong && cost <= Int.MaxValue.toLong,
        s"HfTokenizer: $path Unigram score ${e.get(1).asDouble()} " +
          "quantizes outside int range")
      (e.get(0).asText(), cost.toInt)
    }
    val unk = Option(model.get("unk_id")).filter(_.isIntegralNumber)
      .map(_.asInt())
    HfUnigramModel(pieces, unk)
  }

  private def loadWordPiece(path: String, model: JsonNode): HfWordPieceModel = {
    val vocab = vocabPairs(path, model)
    val unkTok = Option(model.get("unk_token")).filter(!_.isNull)
      .map(_.asText())
    HfWordPieceModel(vocab, unkTok, unkFromToken(model, vocab))
  }

  /** Write a BPE tokenizer.json: vocab in the given order (explicit
    * ids), merges in rank order as `"left right"` strings (the GPT-2
    * spelling), byte-level pretokenizer + decoder nodes when `byteLevel`.
    */
  def exportBpe(path: String, vocab: Seq[(String, Int)],
      merges: Seq[(String, String)], byteLevel: Boolean,
      conf: Configuration = new Configuration()): Unit = {
    val om = mapper
    val root = om.createObjectNode()
    root.put("version", "1.0")
    root.putNull("truncation")
    root.putNull("padding")
    root.putArray("added_tokens")
    root.putNull("normalizer")
    if (byteLevel) {
      val pre = root.putObject("pre_tokenizer")
      pre.put("type", "ByteLevel")
      pre.put("add_prefix_space", false)
      pre.put("trim_offsets", true)
      pre.put("use_regex", true)
      val dec = root.putObject("decoder")
      dec.put("type", "ByteLevel")
      dec.put("add_prefix_space", true)
      dec.put("trim_offsets", true)
      dec.put("use_regex", true)
    } else {
      root.putObject("pre_tokenizer").put("type", "Whitespace")
      root.putNull("decoder")
    }
    root.putNull("post_processor")
    val model = root.putObject("model")
    model.put("type", "BPE")
    model.putNull("dropout")
    model.putNull("unk_token")
    model.putNull("continuing_subword_prefix")
    model.putNull("end_of_word_suffix")
    model.put("fuse_unk", false)
    model.put("byte_fallback", false)
    val v = model.putObject("vocab")
    vocab.foreach { case (p, id) => v.put(p, id) }
    val m: ArrayNode = model.putArray("merges")
    merges.foreach { case (a, b) =>
      require(!a.contains(" ") && !b.contains(" "),
        s"HfTokenizer.exportBpe: merge symbol with a space ('$a','$b') " +
          "cannot serialize in the 'left right' spelling")
      m.add(s"$a $b")
    }
    writeJson(path, root, conf)
  }

  /** Write a Unigram tokenizer.json: pieces in id order with
    * `score = -cost / CostScale` (exact; see the cost/score bridge).
    */
  def exportUnigram(path: String, pieces: Seq[(String, Int)],
      unkId: Option[Int] = None,
      conf: Configuration = new Configuration()): Unit = {
    val om = mapper
    val root = om.createObjectNode()
    root.put("version", "1.0")
    root.putNull("truncation")
    root.putNull("padding")
    root.putArray("added_tokens")
    root.putNull("normalizer")
    root.putObject("pre_tokenizer").put("type", "Whitespace")
    root.putNull("post_processor")
    root.putNull("decoder")
    val model = root.putObject("model")
    model.put("type", "Unigram")
    unkId match {
      case Some(u) => model.put("unk_id", u)
      case None    => model.putNull("unk_id")
    }
    model.put("byte_fallback", false)
    val v = model.putArray("vocab")
    pieces.foreach { case (p, cost) =>
      val e = v.addArray()
      e.add(p)
      e.add(-cost.toDouble / CostScale)
    }
    writeJson(path, root, conf)
  }

  /** Write a WordPiece tokenizer.json: vocab in the given order
    * (continuation pieces already carry the `##` prefix).
    */
  def exportWordPiece(path: String, vocab: Seq[(String, Int)],
      unkToken: String = "[UNK]",
      conf: Configuration = new Configuration()): Unit = {
    val om = mapper
    val root = om.createObjectNode()
    root.put("version", "1.0")
    root.putNull("truncation")
    root.putNull("padding")
    root.putArray("added_tokens")
    root.putNull("normalizer")
    root.putObject("pre_tokenizer").put("type", "Whitespace")
    root.putNull("post_processor")
    root.putNull("decoder")
    val model = root.putObject("model")
    model.put("type", "WordPiece")
    model.put("unk_token", unkToken)
    model.put("continuing_subword_prefix", "##")
    model.put("max_input_chars_per_word", 100)
    val v = model.putObject("vocab")
    vocab.foreach { case (p, id) => v.put(p, id) }
    writeJson(path, root, conf)
  }

  private def writeJson(path: String, root: ObjectNode,
      conf: Configuration): Unit =
    writeBytes(path,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root), conf)
}
