package graft.llm

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.functions.HfNormOp

/** Interop with the public HuggingFace `tokenizer.json` format — the
  * portability seam for trained vocabularies: a tokenizer trained in this
  * engine EXPORTS to the file a `tokenizers`-based training stack loads,
  * and a published model's tokenizer (GPT-2/RoBERTa byte-level BPE,
  * Llama-family SentencePiece-BPE, BERT WordPiece, SentencePiece-unigram)
  * IMPORTS id-for-id so corpora packed here carry ids an EXISTING model
  * understands (continued pretraining is impossible without that id
  * compatibility).
  *
  * Format (public knowledge — the `tokenizers` library's serialized
  * form): one JSON object with a `model` node; `model.type` selects the
  * algorithm. BPE carries `model.vocab` (piece → id) and `model.merges`
  * (rank-ordered rules, either `"left right"` strings or `[left, right]`
  * pairs — both public spellings are read), plus `byte_fallback`
  * (OOV symbols decompose to `<0xNN>` byte pieces — the Llama
  * convention) and `fuse_unk`. Unigram carries `model.vocab` as a
  * `[piece, log-prob score]` list whose ORDER is the id space, plus
  * `model.unk_id`. WordPiece carries `model.vocab`,
  * `continuing_subword_prefix` ("##") and `max_input_chars_per_word`.
  *
  * Text-transform chain: `normalizer` and `pre_tokenizer` nodes describe
  * how raw text becomes the word list the model segments; `post_processor`
  * describes the special tokens wrapped around a sequence. The loader
  * parses each into an [[HfScheme]] of primitives the engine replicates
  * EXACTLY (see [[HfEncode]]) — BERT's normalizer/pre-tokenizer chain,
  * the Metaspace ▁-marking convention of SentencePiece-converted files
  * (both spellings: a `Metaspace` pre_tokenizer, or the Llama
  * `Prepend "▁"` + `Replace " " → "▁"` normalizer pair with a null
  * pre_tokenizer), byte-level, plain whitespace — and REFUSES anything
  * else loudly at load time, because a half-replicated scheme would
  * silently encode different ids than the stack that published the file.
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
  * need not be list positions), `merges` in rank order. `byteFallback`:
  * symbols absent from the vocab decompose into `<0xNN>` UTF-8 byte
  * pieces (the Llama convention — with full byte coverage nothing is
  * out-of-vocabulary). `fuseUnk`: consecutive unk ids collapse to one.
  */
final case class HfBpeModel(vocab: Seq[(String, Int)],
    merges: Seq[(String, String)], unkId: Option[Int],
    byteFallback: Boolean = false, fuseUnk: Boolean = false) extends HfModel

/** A unigram-LM tokenizer: `pieces` in file order (the id space) with
  * QUANTIZED Viterbi costs (see the cost/score bridge above).
  */
final case class HfUnigramModel(pieces: Seq[(String, Int)],
    unkId: Option[Int]) extends HfModel

/** A WordPiece tokenizer: `vocab` in file order (piece → explicit id;
  * continuation pieces carry the `##` prefix in the piece string).
  * `unkToken` is the file's unk SURFACE (unsplittable words collapse to
  * it, BERT semantics), `unkId` its vocab id when present; `maxWordLen`
  * is the file's own `max_input_chars_per_word` bound (words longer than
  * it collapse whole to unk — the import APPLIES the file's bound, not
  * the engine default, so encodings match the publishing stack).
  */
final case class HfWordPieceModel(vocab: Seq[(String, Int)],
    unkToken: Option[String], unkId: Option[Int],
    maxWordLen: Option[Int] = None) extends HfModel

/** The word-splitting scheme of an imported file — what `pre_tokenizer`
  * (plus, for the Llama spelling, the normalizer chain) resolves to.
  */
sealed trait HfPreTok
object HfPreTok {
  /** GPT-2 byte-level: the GPT-2 regex pretokenizer, pieces mapped
    * through the byte→unicode bijection ([[Bpe.byteLevelMapped]]).
    */
  case object ByteLevel extends HfPreTok

  /** HF `WhitespaceSplit`: split on whitespace runs — exactly the
    * engine's native tokenization, and what engine exports declare.
    */
  case object WhitespaceSplit extends HfPreTok

  /** HF `Whitespace`: the `\w+|[^\w\s]+` (Unicode) word/punctuation-run
    * regex — NOT a plain whitespace split; punctuation runs become their
    * own words.
    */
  case object HfWhitespace extends HfPreTok

  /** BERT's pre-tokenizer: whitespace split with every punctuation
    * character isolated as its own word.
    */
  case object Bert extends HfPreTok

  /** SentencePiece's ▁ convention as a pre_tokenizer: every space
    * becomes `replacement`, the text splits BEFORE each marker (markers
    * stay attached to the word they precede); `prependFirst` marks the
    * first word too (prepend_scheme always/first, or legacy
    * add_prefix_space).
    */
  final case class Metaspace(replacement: String, prependFirst: Boolean)
      extends HfPreTok

  /** No pre_tokenizer: the whole normalized text is ONE matching domain
    * (the modern Llama spelling — the normalizer chain does the
    * ▁-marking and BPE runs over the full string).
    */
  case object WholeText extends HfPreTok
}

/** The full text-transform contract of an imported file: the normalizer
  * chain (applied in file order), the word-splitting scheme, and the
  * special-token ids the post_processor wraps around every encoded
  * sequence.
  */
final case class HfScheme(norm: Seq[HfNormOp], pre: HfPreTok,
    prefixIds: Seq[Int] = Nil, suffixIds: Seq[Int] = Nil)

/** A parsed tokenizer.json: the model plus its text-transform scheme. */
final case class HfLoaded(model: HfModel, scheme: HfScheme)

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

  /** Parse a tokenizer.json into the engine's model + scheme view. Loud
    * on an unknown `model.type`, a malformed merges/vocab node, or ANY
    * normalizer/pre_tokenizer/post_processor the engine cannot replicate
    * exactly — a silently half-read tokenizer would corrupt every
    * downstream id.
    */
  def load(path: String, conf: Configuration = new Configuration())
      : HfLoaded = {
    val root = mapper.readTree(readBytes(path, conf))
    val model = root.get("model")
    require(model != null && model.isObject,
      s"HfTokenizer: $path has no 'model' object")
    val scheme = parseScheme(path, root)
    val mtype = Option(model.get("type")).map(_.asText()).getOrElse("")
    val m: HfModel = mtype match {
      case "BPE"       => loadBpe(path, model)
      case "Unigram"   => loadUnigram(path, model)
      case "WordPiece" => loadWordPiece(path, model)
      case other => throw new IllegalArgumentException(
        s"HfTokenizer: unsupported model.type '$other' in $path " +
          "(BPE | Unigram | WordPiece)")
    }
    m match {
      case _: HfUnigramModel =>
        // whole-text unigram would Viterbi entire documents as one
        // "word" — the engine's packed (cost, piece-count) DP bounds
        // words at 63 code points, so the import would silently drop
        // long documents; real unigram files always declare Metaspace
        require(scheme.pre != HfPreTok.WholeText,
          s"HfTokenizer: $path is a Unigram model with no pre_tokenizer " +
            "(whole-text Viterbi) - this engine segments per word; a " +
            "SentencePiece-converted file declares Metaspace")
      case _ =>
    }
    HfLoaded(m, scheme)
  }

  // ---------------------------------------------------------------------
  // scheme parsing: replicate exactly, or refuse loudly
  // ---------------------------------------------------------------------

  private def refuse(path: String, what: String, detail: String): Nothing =
    throw new IllegalArgumentException(
      s"HfTokenizer: $path $what $detail cannot be replicated by this " +
        "engine - importing would silently encode different ids than the " +
        "stack that published the file")

  private def txt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText())

  private def bool(n: JsonNode, field: String, default: Boolean): Boolean =
    Option(n.get(field)).filter(_.isBoolean).map(_.asBoolean())
      .getOrElse(default)

  /** Normalizer chain → ordered [[HfNormOp]] primitives (file order is
    * applied order). Accepted: null, Lowercase, NFD, StripAccents,
    * BertNormalizer (expanded to clean → chinese-chars → NFD+strip →
    * lower per its flags), Prepend, Replace with a literal `String`
    * pattern, and Sequence of those. Anything else (NFKC, Precompiled,
    * regex Replace, …) is refused loudly.
    */
  private def parseNorm(path: String, n: JsonNode): Seq[HfNormOp] =
    if (n == null || n.isNull) Nil
    else {
      txt(n, "type").getOrElse(
        refuse(path, "normalizer", "with no 'type'")) match {
        case "Sequence" =>
          val kids = n.get("normalizers")
          require(kids != null && kids.isArray,
            s"HfTokenizer: $path Sequence normalizer without 'normalizers'")
          (0 until kids.size()).flatMap(i => parseNorm(path, kids.get(i)))
        case "Lowercase"    => Seq(HfNormOp.Lower)
        case "NFD"          => Seq(HfNormOp.Nfd)
        case "StripAccents" => Seq(HfNormOp.StripAccents)
        case "BertNormalizer" =>
          val lower = bool(n, "lowercase", default = true)
          val strip = Option(n.get("strip_accents")).filter(_.isBoolean)
            .map(_.asBoolean()).getOrElse(lower)
          (if (bool(n, "clean_text", default = true))
             Seq(HfNormOp.BertClean) else Nil) ++
          (if (bool(n, "handle_chinese_chars", default = true))
             Seq(HfNormOp.BertChinese) else Nil) ++
          (if (strip) Seq(HfNormOp.Nfd, HfNormOp.StripAccents) else Nil) ++
          (if (lower) Seq(HfNormOp.Lower) else Nil)
        case "Prepend" =>
          Seq(HfNormOp.Prepend(txt(n, "prepend").getOrElse(
            refuse(path, "Prepend normalizer", "without a 'prepend' string"))))
        case "Replace" =>
          val pat = Option(n.get("pattern")).getOrElse(
            refuse(path, "Replace normalizer", "without a 'pattern'"))
          val lit = txt(pat, "String").getOrElse(
            refuse(path, "Replace normalizer",
              "with a non-literal (Regex) pattern"))
          Seq(HfNormOp.Replace(lit, txt(n, "content").getOrElse("")))
        case other => refuse(path, "normalizer", s"'$other'")
      }
    }

  /** pre_tokenizer → [[HfPreTok]]. A `Sequence` must collapse to exactly
    * one scheme (the GPT-2 `Sequence[ByteLevel]` spelling); combining two
    * distinct splitting schemes is refused.
    */
  private def parsePre(path: String, n: JsonNode): HfPreTok =
    if (n == null || n.isNull) HfPreTok.WholeText
    else {
      txt(n, "type").getOrElse(
        refuse(path, "pre_tokenizer", "with no 'type'")) match {
        case "Sequence" =>
          val kids = n.get("pretokenizers")
          require(kids != null && kids.isArray,
            s"HfTokenizer: $path Sequence pre_tokenizer without " +
              "'pretokenizers'")
          val subs = (0 until kids.size()).map(i => parsePre(path, kids.get(i)))
            .filterNot(_ == HfPreTok.WholeText).distinct
          subs match {
            case Seq()    => HfPreTok.WholeText
            case Seq(one) => one
            case many => refuse(path, "pre_tokenizer",
              s"Sequence combining ${many.mkString(" + ")}")
          }
        case "ByteLevel"       => HfPreTok.ByteLevel
        case "Whitespace"      => HfPreTok.HfWhitespace
        case "WhitespaceSplit" => HfPreTok.WhitespaceSplit
        case "BertPreTokenizer" => HfPreTok.Bert
        case "Metaspace" =>
          val repl = txt(n, "replacement").getOrElse("▁")
          val prepend = txt(n, "prepend_scheme") match {
            case Some("always") | Some("first") => true
            case Some("never")                  => false
            case Some(other) => refuse(path, "Metaspace pre_tokenizer",
              s"with prepend_scheme '$other'")
            case None => bool(n, "add_prefix_space", default = true)
          }
          HfPreTok.Metaspace(repl, prepend)
        case other => refuse(path, "pre_tokenizer scheme", s"'$other'")
      }
    }

  /** post_processor → the special-token ids wrapped around every encoded
    * sequence: null and ByteLevel add none; TemplateProcessing's `single`
    * template, BertProcessing and RobertaProcessing resolve to prefix /
    * suffix id lists. Pair (two-sequence) templates are irrelevant to
    * corpus encoding; anything unrecognized is refused.
    */
  private def parsePost(path: String, n: JsonNode): (Seq[Int], Seq[Int]) =
    if (n == null || n.isNull) (Nil, Nil)
    else txt(n, "type").getOrElse(
      refuse(path, "post_processor", "with no 'type'")) match {
      case "ByteLevel" => (Nil, Nil)
      case "Sequence" =>
        val kids = n.get("processors")
        require(kids != null && kids.isArray,
          s"HfTokenizer: $path Sequence post_processor without 'processors'")
        (0 until kids.size()).map(i => parsePost(path, kids.get(i)))
          .foldLeft((Seq.empty[Int], Seq.empty[Int])) {
            case ((p1, s1), (p2, s2)) => (p1 ++ p2, s1 ++ s2)
          }
      case "BertProcessing" | "RobertaProcessing" =>
        // {"sep": ["[SEP]", id], "cls": ["[CLS]", id]} — [CLS] body [SEP]
        def pairId(field: String): Int = {
          val a = Option(n.get(field)).filter(x => x.isArray && x.size() == 2)
            .getOrElse(refuse(path, "post_processor",
              s"without a [token, id] '$field' pair"))
          a.get(1).asInt()
        }
        (Seq(pairId("cls")), Seq(pairId("sep")))
      case "TemplateProcessing" =>
        val single = Option(n.get("single")).filter(_.isArray).getOrElse(
          refuse(path, "TemplateProcessing post_processor",
            "without a 'single' template"))
        val specials = Option(n.get("special_tokens"))
          .filter(_.isObject).map { st =>
            val it = st.properties().iterator()
            val m = Map.newBuilder[String, Seq[Int]]
            while (it.hasNext) {
              val e = it.next()
              val ids = Option(e.getValue.get("ids")).filter(_.isArray)
                .map(a => (0 until a.size()).map(a.get(_).asInt()))
                .getOrElse(Seq.empty)
              m += e.getKey -> ids
            }
            m.result()
          }.getOrElse(Map.empty[String, Seq[Int]])
        var prefix = Vector.empty[Int]
        var suffix = Vector.empty[Int]
        var seenBody = false
        (0 until single.size()).foreach { i =>
          val item = single.get(i)
          if (item.has("Sequence")) {
            require(!seenBody, s"HfTokenizer: $path TemplateProcessing " +
              "single template has more than one Sequence slot")
            seenBody = true
          } else if (item.has("SpecialToken")) {
            val name = txt(item.get("SpecialToken"), "id").getOrElse(
              refuse(path, "TemplateProcessing", "special token without id"))
            val ids = specials.getOrElse(name, refuse(path,
              "TemplateProcessing", s"special token '$name' missing from " +
                "special_tokens"))
            if (seenBody) suffix ++= ids else prefix ++= ids
          } else refuse(path, "TemplateProcessing template item",
            item.toString)
        }
        require(seenBody, s"HfTokenizer: $path TemplateProcessing single " +
          "template has no Sequence slot")
        (prefix, suffix)
      case other => refuse(path, "post_processor", s"'$other'")
    }

  /** The Llama normalizer spelling of Metaspace: a `Prepend(m)` followed
    * by `Replace(" " → m)` with a null pre_tokenizer. Recognized so the
    * prepend/replace pair need not be special-cased downstream — the
    * chain stays in the normalizer ops and the pre resolves to WholeText
    * (BPE over the whole ▁-marked string, exactly what the publishing
    * stack runs).
    */
  private def parseScheme(path: String, root: JsonNode): HfScheme = {
    val norm = parseNorm(path, root.get("normalizer"))
    val pre = parsePre(path, root.get("pre_tokenizer"))
    val (prefix, suffix) = parsePost(path, root.get("post_processor"))
    // a Prepend/Replace (Metaspace-style) normalizer only makes sense
    // ahead of whole-text or Metaspace splitting; with a whitespace-run
    // splitter the markers would glue to word heads the vocab never saw
    val marks = norm.exists {
      case HfNormOp.Prepend(_) | HfNormOp.Replace(_, _) => true
      case _ => false
    }
    if (marks)
      require(pre == HfPreTok.WholeText ||
          pre.isInstanceOf[HfPreTok.Metaspace],
        s"HfTokenizer: $path combines a Prepend/Replace normalizer with " +
          s"pre_tokenizer $pre - only the Llama (null pre_tokenizer) and " +
          "Metaspace spellings are replicated")
    HfScheme(norm, pre, prefix, suffix)
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

  private def loadBpe(path: String, model: JsonNode): HfBpeModel = {
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
    // vocab-first matching (Llama-3-style) skips the merge walk for
    // whole words already in the vocab — a DIFFERENT algorithm, refused
    // rather than approximated
    require(!bool(model, "ignore_merges", default = false),
      s"HfTokenizer: $path BPE sets ignore_merges=true (vocab-first " +
        "whole-word matching) - this engine replays merges only; " +
        "importing would silently encode different ids")
    require(Option(model.get("dropout")).forall(d =>
        d.isNull || d.asDouble() == 0.0),
      s"HfTokenizer: $path BPE declares non-zero dropout - encoding " +
        "would be nondeterministic")
    HfBpeModel(vocab, merges, unkFromToken(model, vocab),
      byteFallback = bool(model, "byte_fallback", default = false),
      fuseUnk = bool(model, "fuse_unk", default = false))
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
    // the file's own word-length bound: words longer than it collapse
    // whole to unk in the publishing stack, so the import must apply the
    // FILE's bound (HF default 100), never the engine default
    val mwl = Option(model.get("max_input_chars_per_word"))
      .filter(_.isIntegralNumber).map(_.asInt())
    HfWordPieceModel(vocab, unkTok, unkFromToken(model, vocab), mwl)
  }

  /** Merged surfaces (rank order, first rule wins on duplicates) followed
    * by every merge OPERAND no rule produces (first-use order) — the
    * smallest vocabulary the real `tokenizers` library will LOAD: its BPE
    * constructor requires every merge's left/right operand and product to
    * be a vocab member. Surfaces keep their rule-index positions, so ids
    * assigned by position stay compatible with the engine's native
    * rule-index ids; base symbols take the positions after them.
    */
  def operandClosure(merges: Seq[(String, String)]): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    merges.foreach { case (a, b) => out += (a + b) }
    merges.foreach { case (a, b) => out += a; out += b }
    out.toSeq
  }

  /** Loud guard shared by the BPE export: the real `tokenizers` BPE
    * refuses files whose merges reference symbols absent from the vocab,
    * and the engine's reserved delimiter chars must never leak into a
    * portable file.
    */
  private def requireExportable(vocab: Seq[(String, Int)],
      merges: Seq[(String, String)]): Unit = {
    val surfaces = vocab.map(_._1).toSet
    merges.foreach { case (a, b) =>
      require(surfaces(a) && surfaces(b) && surfaces(a + b),
        s"HfTokenizer.exportBpe: merge ('$a','$b') references symbols " +
          "absent from the vocab - the tokenizers library refuses such " +
          "files; export the operand closure (HfTokenizer.operandClosure)")
    }
    (vocab.map(_._1) ++ merges.flatMap(m => Seq(m._1, m._2))).foreach { s =>
      require(!s.contains(Bpe.Open) && !s.contains(Bpe.Close),
        "HfTokenizer.exportBpe: a symbol carries the engine's reserved " +
          s"delimiter characters and cannot serialize portably: '$s'")
    }
  }

  /** Write a BPE tokenizer.json: vocab in the given order (explicit
    * ids), merges in rank order as `"left right"` strings (the GPT-2
    * spelling), byte-level pretokenizer + decoder nodes when `byteLevel`
    * (otherwise `WhitespaceSplit` — the whitespace-run split the engine
    * actually encodes with; HF's `Whitespace` is a DIFFERENT regex).
    * The vocab must contain every merge operand and product — the real
    * `tokenizers` loader enforces it, so the export does too.
    */
  def exportBpe(path: String, vocab: Seq[(String, Int)],
      merges: Seq[(String, String)], byteLevel: Boolean,
      conf: Configuration = new Configuration()): Unit = {
    requireExportable(vocab, merges)
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
      root.putObject("pre_tokenizer").put("type", "WhitespaceSplit")
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
    root.putObject("pre_tokenizer").put("type", "WhitespaceSplit")
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
      unkToken: String = "[UNK]", maxWordLen: Int = 100,
      conf: Configuration = new Configuration()): Unit = {
    val om = mapper
    val root = om.createObjectNode()
    root.put("version", "1.0")
    root.putNull("truncation")
    root.putNull("padding")
    root.putArray("added_tokens")
    root.putNull("normalizer")
    root.putObject("pre_tokenizer").put("type", "WhitespaceSplit")
    root.putNull("post_processor")
    root.putNull("decoder")
    val model = root.putObject("model")
    model.put("type", "WordPiece")
    model.put("unk_token", unkToken)
    model.put("continuing_subword_prefix", "##")
    model.put("max_input_chars_per_word", maxWordLen)
    val v = model.putObject("vocab")
    vocab.foreach { case (p, id) => v.put(p, id) }
    writeJson(path, root, conf)
  }

  private def writeJson(path: String, root: ObjectNode,
      conf: Configuration): Unit =
    writeBytes(path,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root), conf)
}
