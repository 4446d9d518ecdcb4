package graft

import org.apache.spark.sql.{GraftShims, Row, SparkSessionExtensions}
import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions, SignPack, TextFunctions, VectorFunctions}

/** The pure-SQL surface ([[GraftFunctions]] / [[GraftExtensions]]): every
  * graft_* function must be callable from `spark.sql` and produce exactly
  * what the Column API produces — the builders construct the same
  * expression trees, so any divergence means the table drifted.
  */
class GraftSqlSurfaceSpec extends SparkSpec {

  private def docsView(): Unit = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the old barn"),
      (1L, "el perro duerme en la casa de la granja todos los dias"),
      (2L, ""),
      (3L, "  spaced   out\ttokens \n here  "),
    ).toDF("doc_id", "text").createOrReplaceTempView("sql_docs")
  }

  private def sqlVsColumn(sqlExpr: String, col: org.apache.spark.sql.Column): Unit = {
    docsView()
    val viaSql = spark.sql(s"SELECT doc_id, $sqlExpr AS v FROM sql_docs ORDER BY doc_id")
      .collect().toSeq
    val viaCol = spark.table("sql_docs").select(org.apache.spark.sql.functions.col("doc_id"), col.as("v"))
      .orderBy("doc_id").collect().toSeq
    assert(viaSql == viaCol, s"SQL '$sqlExpr' diverged from the Column API")
  }

  test("text functions match the Column API from SQL") {
    val t = col("text")
    sqlVsColumn("graft_tokens(text)", TextFunctions.tokens(t))
    sqlVsColumn("graft_token_count(text)", TextFunctions.tokenCount(t))
    sqlVsColumn("graft_normalize(text)", TextFunctions.normalizeText(t))
    sqlVsColumn("graft_fingerprint(text)", TextFunctions.fingerprint(t))
    sqlVsColumn("graft_rolling_hash(text)", TextFunctions.rollingHash(t))
    sqlVsColumn("graft_lang_id(text)", TextFunctions.langId(t))
    sqlVsColumn("graft_quality(text)", TextFunctions.qualityScore(t))
    sqlVsColumn("graft_html_to_text(text)", TextFunctions.htmlToText(t))
    sqlVsColumn("graft_html_title(text)", TextFunctions.htmlTitle(t))
    sqlVsColumn("graft_canonical_url(text)", TextFunctions.canonicalUrl(t))
    val spansSql = "array(named_struct('s', 1, 'e', 4))"
    val spansCol = array(struct(lit(1).as("s"), lit(4).as("e")))
    sqlVsColumn(s"graft_redact_spans(text, $spansSql, '<X>')",
      TextFunctions.redactSpans(t, spansCol, "<X>"))
    // 2-arg form: the default token is '' — identical to the cut
    sqlVsColumn(s"graft_redact_spans(text, $spansSql)",
      TextFunctions.cutSpans(t, spansCol))
    sqlVsColumn(s"graft_cut_spans(text, $spansSql)",
      TextFunctions.cutSpans(t, spansCol))
    sqlVsColumn("graft_url_host(text)", TextFunctions.urlHost(t))
    sqlVsColumn("graft_domain_blocked(text, array('tracker.com'))",
      TextFunctions.domainBlocked(t, Seq("tracker.com")))
    sqlVsColumn("graft_byte_bpe(text, array('t h', 'Ġ th'))",
      graft.llm.Bpe.byteLevelEncode(t, Seq(("t", "h"), ("Ġ", "th"))))
    sqlVsColumn("graft_fim(text, doc_id, 's1', 10000)",
      TextFunctions.fimTransform(t, col("doc_id"), "s1", 1.0))
    sqlVsColumn("graft_fim(text, doc_id, 's1')",
      TextFunctions.fimTransform(t, col("doc_id"), "s1", 0.5))
  }

  test("signature functions match the Column API from SQL (incl. literal args)") {
    val toks = TextFunctions.tokens(col("text"))
    sqlVsColumn("graft_minhash(text)", HashExpressions.minhash(toks, 64, 3, 42L))
    sqlVsColumn("graft_minhash(text, 16, 2, 7)", HashExpressions.minhash(toks, 16, 2, 7L))
    sqlVsColumn("graft_simhash(text)", HashExpressions.simhash(toks, 32))
    sqlVsColumn("graft_simhash(text, 64)", HashExpressions.simhash(toks, 64))
    sqlVsColumn("graft_agree_frac(graft_minhash(text), graft_minhash(text))",
      HashExpressions.agreeFrac(HashExpressions.minhash(toks, 64, 3, 42L),
        HashExpressions.minhash(toks, 64, 3, 42L)))
  }

  test("vector functions match the Column API from SQL") {
    docsView()
    sqlVsColumn("graft_vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))",
      VectorFunctions.dotFast(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))))
    sqlVsColumn("graft_sign_pack(array(1.0d, -2.0d, 3.0d))",
      SignPack(array(lit(1.0), lit(-2.0), lit(3.0))))
    sqlVsColumn(
      "graft_hamming(graft_sign_pack(array(1.0d, -2.0d)), graft_sign_pack(array(-1.0d, -2.0d)))",
      graft.functions.HammingDistance(
        SignPack(array(lit(1.0), lit(-2.0))), SignPack(array(lit(-1.0), lit(-2.0)))))
    sqlVsColumn("graft_sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L))",
      graft.functions.SortedIntersectCount(
        array(lit(1L), lit(2L), lit(5L)), array(lit(2L), lit(5L), lit(9L))))
    // int8 quantization against literal range tables
    val r = spark.sql(
      "SELECT graft_affine_quantize(array(0.0d, 10.0d), array(0.0d, 0.0d), array(10.0d, 10.0d)) AS v")
      .collect()(0).getSeq[Int](0)
    assert(r == Seq(-127, 127))
  }

  test("tokenizer functions match the Column API from SQL (literal vocabs)") {
    val toks = TextFunctions.tokens(col("text"))
    sqlVsColumn("graft_wordpiece(graft_tokens(text), array('the', 'qu', '##ick', 'q', '##u'))",
      graft.llm.Wordpiece.encodeWordsCol(toks, Seq("the", "qu", "##ick", "q", "##u")))
    sqlVsColumn(
      "graft_unigram_cost(graft_tokens(text), array('the', 'qu', 'ick'), array(50, 30, 30))",
      org.apache.spark.sql.GraftShims.toColumn(
        graft.functions.UnigramSegmentCost(
          org.apache.spark.sql.GraftShims.toEagerExpression(toks),
          Seq("the" -> 50, "qu" -> 30, "ick" -> 30))))
  }

  test("arity and literal-arg misuse fail loudly") {
    docsView()
    val e1 = intercept[Exception](spark.sql("SELECT graft_fingerprint(text, 3) FROM sql_docs"))
    assert(e1.getMessage.contains("arguments"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_minhash(text, doc_id, 3, 42) FROM sql_docs").collect())
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }

  test("graft_unigram_cost rejects fractional and negative costs") {
    docsView()
    // the cost*64+pieces packing is unpacked with shiftright/&63, which
    // assumes non-negative integral costs — 1.5 would silently truncate to
    // 1 and -2 would corrupt the packed value, so both must fail loudly
    val frac = intercept[Exception](spark.sql(
      "SELECT graft_unigram_cost(graft_tokens(text), array('a', 'b'), array(1.5, 2.0)) FROM sql_docs"))
    assert(frac.getMessage.contains("non-negative"), frac.getMessage)
    val neg = intercept[Exception](spark.sql(
      "SELECT graft_unigram_cost(graft_tokens(text), array('a', 'b'), array(1, -2)) FROM sql_docs"))
    assert(neg.getMessage.contains("non-negative"), neg.getMessage)
    // above Int.MaxValue, Double.toInt would silently saturate — reject
    val huge = intercept[Exception](spark.sql(
      "SELECT graft_unigram_cost(graft_tokens(text), array('a'), array(3000000000)) FROM sql_docs"))
    assert(huge.getMessage.contains("32-bit"), huge.getMessage)
  }

  test("the spark.sql.extensions path injects the same function names") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val names = GraftShims.injectedFunctionNames(ext).toSet
    assert(names == GraftFunctions.all.map(_._1.funcName).toSet)
    assert(names.contains("graft_minhash") && names.contains("graft_affine_quantize"))
  }
}
