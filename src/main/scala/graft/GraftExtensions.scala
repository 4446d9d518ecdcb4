package graft

import org.apache.spark.sql.{Column, GraftShims, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{AffineQuantize, HammingDistance, HashExpressions, SignPack, SortedIntersectCount, TextFunctions, VectorFunctions}

/** `--conf spark.sql.extensions=graft.GraftExtensions` — exposes the graft
  * native-expression library to PURE SQL, the idiomatic Spark mechanism
  * for a third-party function surface: every builder constructs the same
  * Catalyst expression trees the Column API builds, so SQL users get the
  * identical codegen'd kernels (no UDF indirection, no extra plan nodes).
  *
  *   spark.sql("SELECT graft_fingerprint(text) FROM docs")
  *
  * Sessions that already exist (the driver's Verify/Bench sessions adopt
  * one) get the same functions at runtime via [[GraftFunctions.register]],
  * which [[graft.core.Graft.tune]] and `Graft.localSession` call — the
  * two paths share one builder table.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

/** The SQL-name → expression-builder table behind [[GraftExtensions]]. */
object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def c(e: Expression): Column = GraftShims.toColumn(e)
  // EAGER conversion: a registry builder's return value goes straight to
  // the analyzer, so lazy ColumnNodeExpression wrappers are not allowed
  private def x(col: Column): Expression = GraftShims.toEagerExpression(col)

  /** Foldable integer argument (band counts, seeds, bit widths). */
  private def intArg(name: String, e: Expression): Int = {
    require(e.foldable, s"$name: argument must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name: expected an integer literal, got $other")
    }
  }

  /** Foldable array<string> argument (tokenizer vocabularies). */
  private def stringArrayArg(name: String, e: Expression): Seq[String] = {
    require(e.foldable, s"$name: argument must be a literal array")
    Cast(e, ArrayType(org.apache.spark.sql.types.StringType)).eval() match {
      case a: ArrayData =>
        (0 until a.numElements()).map { i =>
          require(!a.isNullAt(i), s"$name: vocabulary entries must not be NULL")
          a.getUTF8String(i).toString
        }
      case other => throw new IllegalArgumentException(
        s"$name: expected an array<string> literal, got $other")
    }
  }

  /** Foldable string argument (replacement tokens). */
  private def stringArg(name: String, e: Expression): String = {
    require(e.foldable, s"$name: argument must be a string literal")
    Cast(e, org.apache.spark.sql.types.StringType).eval() match {
      case null => throw new IllegalArgumentException(s"$name: literal is NULL")
      case s => s.toString
    }
  }

  /** Foldable array<double> argument (quantization range tables). */
  private def doubleArrayArg(name: String, e: Expression): Array[Double] = {
    require(e.foldable, s"$name: argument must be a literal array")
    Cast(e, ArrayType(DoubleType)).eval() match {
      case a: ArrayData => a.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"$name: expected an array<double> literal, got $other")
    }
  }

  private def fd(name: String, usage: String, arities: Set[Int])(
      build: Seq[Expression] => Expression): FunctionDescription = {
    val checked = (es: Seq[Expression]) => {
      require(arities.contains(es.length),
        s"$name: expects ${arities.toSeq.sorted.mkString(" or ")} arguments, got ${es.length}")
      build(es)
    }
    // the richer ExpressionInfo constructors validate `group`/`since`
    // against Spark-internal whitelists; the 2-arg form carries the
    // usage-free minimum and never trips them
    val info = new ExpressionInfo("graft.GraftFunctions", name)
    val _ = usage // kept for the source-of-truth table; surfaced in README
    (FunctionIdentifier(name), info, checked)
  }

  val all: Seq[FunctionDescription] = Seq(
    fd("graft_tokens", "graft_tokens(text) - whitespace-run tokens (blank -> [])",
      Set(1))(es => x(TextFunctions.tokens(c(es.head)))),
    fd("graft_token_count", "graft_token_count(text) - token count",
      Set(1))(es => x(TextFunctions.tokenCount(c(es.head)))),
    fd("graft_normalize", "graft_normalize(text) - lowercase, strip punctuation, collapse whitespace",
      Set(1))(es => x(TextFunctions.normalizeText(c(es.head)))),
    fd("graft_fingerprint", "graft_fingerprint(text) - md5 of the sorted distinct token set",
      Set(1))(es => x(TextFunctions.fingerprint(c(es.head)))),
    fd("graft_rolling_hash", "graft_rolling_hash(text) - order-sensitive polynomial token hash mod 2^31-1",
      Set(1))(es => x(TextFunctions.rollingHash(c(es.head)))),
    fd("graft_lang_id", "graft_lang_id(text) - stopword-hit language guess (en/es/fr/de/unk)",
      Set(1))(es => x(TextFunctions.langId(c(es.head)))),
    fd("graft_quality", "graft_quality(text) - composite [0,1] heuristic quality score",
      Set(1))(es => x(TextFunctions.qualityScore(c(es.head)))),
    fd("graft_html_to_text", "graft_html_to_text(html) - visible text (WET extraction)",
      Set(1))(es => x(TextFunctions.htmlToText(c(es.head)))),
    fd("graft_html_title", "graft_html_title(html) - <title> text, '' when absent",
      Set(1))(es => x(TextFunctions.htmlTitle(c(es.head)))),
    fd("graft_sentences",
      "graft_sentences(text) - sentences under the deterministic " +
        "terminal-punctuation boundary rule",
      Set(1))(es => x(graft.functions.TextFunctions.sentences(c(es.head)))),
    fd("graft_url_host",
      "graft_url_host(url) - lowercased host (no scheme/userinfo/port/path)",
      Set(1))(es => x(graft.functions.TextFunctions.urlHost(c(es.head)))),
    fd("graft_domain_blocked",
      "graft_domain_blocked(url, domains) - host equals/is a subdomain of " +
        "any listed domain (whole-label matching)",
      Set(2))(es => x(graft.functions.TextFunctions.domainBlocked(c(es.head),
        stringArrayArg("graft_domain_blocked", es(1))))),
    fd("graft_byte_bpe",
      "graft_byte_bpe(text, merges) - byte-level (GPT-2) BPE encode; merges " +
        "are 'a b' pair strings in the mapped alphabet",
      Set(2)) { es =>
      val merges = stringArrayArg("graft_byte_bpe", es(1)).map { m =>
        m.split(" ", 2) match {
          case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
          case _ => throw new IllegalArgumentException(
            s"graft_byte_bpe: merge rule must be 'a b', got '$m'")
        }
      }
      x(graft.llm.Bpe.byteLevelEncode(c(es.head), merges))
    },
    fd("graft_canonical_url",
      "graft_canonical_url(url) - canonical form for URL-level dedup",
      Set(1))(es => x(TextFunctions.canonicalUrl(c(es.head)))),
    fd("graft_fim",
      "graft_fim(text, key, seed[, rate_bp]) - fill-in-the-middle PSM " +
        "rewrite (PRE+prefix+SUF+suffix+MID+middle) of a hash-selected " +
        "rate_bp/10000 fraction of rows (default 5000)",
      Set(3, 4)) { es =>
      val rate = (if (es.length == 4) intArg("rate_bp", es(3)) else 5000) / 10000.0
      x(TextFunctions.fimTransform(c(es.head), c(es(1)),
        stringArg("graft_fim", es(2)), rate))
    },
    fd("graft_redact_spans",
      "graft_redact_spans(text, spans[, token]) - replace [s,e) char spans " +
        "(array<struct<s,e>>) with token; null/malformed spans ignored",
      Set(2, 3))(es => {
      val token = if (es.length == 3) stringArg("graft_redact_spans", es(2)) else ""
      x(TextFunctions.redactSpans(c(es(0)), c(es(1)), token))
    }),
    fd("graft_cut_spans",
      "graft_cut_spans(text, spans) - cut [s,e) char spans out of text",
      Set(2))(es => x(TextFunctions.cutSpans(c(es(0)), c(es(1))))),
    fd("graft_minhash",
      "graft_minhash(text[, numPerm, shingleK, seed]) - MinHash signature array<long>",
      Set(1, 4)) { es =>
      val (p, k, s) =
        if (es.length == 1) (64, 3, 42L)
        else (intArg("numPerm", es(1)), intArg("shingleK", es(2)),
          intArg("seed", es(3)).toLong)
      x(HashExpressions.minhash(TextFunctions.tokens(c(es.head)), p, k, s))
    },
    fd("graft_simhash", "graft_simhash(text[, nBits]) - SimHash of the token stream",
      Set(1, 2)) { es =>
      val n = if (es.length == 2) intArg("nBits", es(1)) else 32
      x(HashExpressions.simhash(TextFunctions.tokens(c(es.head)), n))
    },
    fd("graft_agree_frac", "graft_agree_frac(sigA, sigB) - fraction of agreeing signature positions",
      Set(2))(es => x(HashExpressions.agreeFrac(c(es(0)), c(es(1))))),
    fd("graft_sorted_intersect_count",
      "graft_sorted_intersect_count(a, b) - |a ∩ b| of two SORTED distinct long arrays",
      Set(2))(es => x(SortedIntersectCount(c(es(0)), c(es(1))))),
    fd("graft_vec_dot", "graft_vec_dot(a, b) - dot product of two numeric arrays",
      Set(2))(es => x(VectorFunctions.dotFast(c(es(0)), c(es(1))))),
    fd("graft_sign_pack", "graft_sign_pack(vec) - 1-bit sign codes packed 64/long",
      Set(1))(es => x(SignPack(c(es.head)))),
    fd("graft_hamming", "graft_hamming(a, b) - Hamming distance of packed sign codes",
      Set(2))(es => x(HammingDistance(c(es(0)), c(es(1))))),
    fd("graft_affine_quantize",
      "graft_affine_quantize(vec, mins, maxs) - int8 codes against literal range tables",
      Set(3))(es => x(AffineQuantize(c(es.head),
        doubleArrayArg("mins", es(1)), doubleArrayArg("maxs", es(2))))),
    fd("graft_wordpiece",
      "graft_wordpiece(words, vocab) - greedy WordPiece pieces per word ('##' continuations)",
      Set(2))(es => graft.functions.WordpieceEncodeWords(es.head,
        stringArrayArg("vocab", es(1)))),
    fd("graft_unigram_cost",
      "graft_unigram_cost(words, pieces, costs) - Viterbi (cost*64+pieces) per word",
      Set(3))(es => {
      val pieces = stringArrayArg("pieces", es(1))
      val rawCosts = doubleArrayArg("costs", es(2))
      // the packing contract is cost*64 + nPieces unpacked with
      // shiftright/&63, which assumes non-negative integral costs — a
      // fractional cost would silently truncate, a negative one corrupts
      // the packed value, so both are rejected loudly here
      rawCosts.foreach(cst => require(
        cst >= 0 && cst == cst.floor && cst <= Int.MaxValue,
        s"graft_unigram_cost: costs must be non-negative 32-bit integers, got $cst"))
      val costs = rawCosts.map(_.toInt)
      require(pieces.length == costs.length,
        s"graft_unigram_cost: pieces (${pieces.length}) and costs (${costs.length}) differ")
      graft.functions.UnigramSegmentCost(es.head, pieces.zip(costs.toSeq))
    }),
  )

  /** Runtime registration for an already-built session (Verify/Bench). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      GraftShims.registerFunction(spark, name, info, builder)
    }
}
