package graft

import org.apache.spark.sql.functions._

import graft.topology.{BuiltinComponents, Topology}

/** The tokenizer-training config surface end to end: a [tokenizer] TRAIN
  * job persists the vocabulary sidecar, a second pure-TOML job tokenizes
  * (TokenizeIds) and packs (PackRows) — and the result equals the Scala
  * API path exactly. Plus the bpe sidecar roundtrip and loud errors.
  */
class TokenizeTomlSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def corpusDir(): String = {
    import spark.implicits._
    val dir = tmp("toktoml")
    Seq((0L, "banana bandana anna"), (1L, "banana banana cabana"),
      (2L, "anna banana"), (3L, ""))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/docs")
    dir
  }

  private def trainToml(dir: String): String =
    s"""[fields]
       |names = ["doc_id", "text"]
       |[input]
       |name = "Parquet"
       |  [input.config]
       |  Path = "$dir/docs"
       |[tokenizer]
       |Method = "unigram"
       |SrcField = "text"
       |VocabPath = "$dir/vocab"
       |[output]
       |name = "Nop"
       |""".stripMargin

  test("train job -> sidecar -> TokenizeIds + PackRows equals the API path") {
    val dir = corpusDir()
    Topology.compileToml(spark, trainToml(dir)).run()
    val vocab = spark.read.parquet(s"$dir/vocab").orderBy("id").collect()
      .map(r => (r.getString(1), r.getLong(2).toInt)).toSeq
    assert(vocab.nonEmpty && vocab.map(_._1) == vocab.map(_._1).distinct)

    val packToml =
      s"""[fields]
         |names = ["doc_id", "text"]
         |[input]
         |name = "Parquet"
         |  [input.config]
         |  Path = "$dir/docs"
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$dir/vocab"
         |  CountField = "n_ids"
         |[[filter]]
         |name = "PackRows"
         |  [filter.config]
         |  IdsField = "ids"
         |  OrderField = "doc_id"
         |  Budget = 16
         |  Shards = 2
         |  PadId = -2
         |[output]
         |name = "Nop"
         |fields = ["shard", "seq_id", "input_ids", "loss_mask", "n_real"]
         |""".stripMargin
    val got = Topology.compileToml(spark, packToml).projected
      .orderBy("shard", "seq_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq

    // the Scala API path with the same vocab, budget, shard hash and pad
    val docs = spark.read.parquet(s"$dir/docs")
    val pcs = org.apache.spark.sql.GraftShims.toColumn(
      graft.functions.UnigramViterbiPieces(
        org.apache.spark.sql.GraftShims.toExpression(
          graft.functions.TextFunctions.tokens(col("text"))), vocab, 10))
    val ids = org.apache.spark.sql.GraftShims.toColumn(
      graft.functions.VocabIds(
        org.apache.spark.sql.GraftShims.toExpression(pcs),
        vocab.map(_._1), -1))
    val ord = col("doc_id").cast("long")
    val shard = pmod(pmod(ord, lit(2147483647L)) * lit(2654435761L), lit(2L))
    val api = graft.llm.Pack.packTokensGreedy(
        docs.withColumn("__ids", ids), ord, col("__ids"),
        transform(col("__ids"), _ => lit(true)), 16, shard, padId = -2)
      .select(col("shard").cast("string"), col("seq_id").cast("string"),
        array_join(transform(col("input_ids"), _.cast("string")), ","),
        array_join(transform(col("loss_mask"),
          m => m.cast("int").cast("string")), ","),
        col("n_real").cast("string"))
      .orderBy("shard", "seq_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(got == api)
    assert(got.nonEmpty)
  }

  test("PackRows EosId/BosId/SepId reach packTokensGreedy: the TOML chain " +
      "emits terminator'd trainable rows equal to the API path") {
    val dir = corpusDir()
    Topology.compileToml(spark, trainToml(dir)).run()
    val vocab = spark.read.parquet(s"$dir/vocab").orderBy("id").collect()
      .map(r => (r.getString(1), r.getLong(2).toInt)).toSeq
    val packToml =
      s"""[fields]
         |names = ["doc_id", "text"]
         |[input]
         |name = "Parquet"
         |  [input.config]
         |  Path = "$dir/docs"
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$dir/vocab"
         |[[filter]]
         |name = "PackRows"
         |  [filter.config]
         |  IdsField = "ids"
         |  OrderField = "doc_id"
         |  Budget = 16
         |  Shards = 2
         |  PadId = -2
         |  EosId = -4
         |  BosId = -5
         |  SepId = -6
         |[output]
         |name = "Nop"
         |fields = ["shard", "seq_id", "input_ids", "segment_ids", "loss_mask", "n_real"]
         |""".stripMargin
    val got = Topology.compileToml(spark, packToml).projected
      .orderBy("shard", "seq_id")
      .collect().map(r => (0 to 5).map(r.getString)).toSeq
    assert(got.nonEmpty)
    // every non-pad row segment starts with BOS (masked out) and each
    // document ends with a trained-on EOS; separators sit between turns
    val firstIds = got.head(2).split(",")
    assert(firstIds.head == "-5", s"BOS must lead the first sequence: $got")
    assert(firstIds.contains("-4"), s"EOS must terminate documents: $got")
    val firstMask = got.head(4).split(",")
    assert(firstMask.head == "0", "BOS is input-only")
    // equality with the API path under the same special tokens
    val docs = spark.read.parquet(s"$dir/docs")
    val pcs = org.apache.spark.sql.GraftShims.toColumn(
      graft.functions.UnigramViterbiPieces(
        org.apache.spark.sql.GraftShims.toExpression(
          graft.functions.TextFunctions.tokens(col("text"))), vocab, 10))
    val ids = org.apache.spark.sql.GraftShims.toColumn(
      graft.functions.VocabIds(
        org.apache.spark.sql.GraftShims.toExpression(pcs),
        vocab.map(_._1), -1))
    val ord = col("doc_id").cast("long")
    val shard = pmod(pmod(ord, lit(2147483647L)) * lit(2654435761L), lit(2L))
    val api = graft.llm.Pack.packTokensGreedy(
        docs.withColumn("__ids", ids), ord, col("__ids"),
        transform(col("__ids"), _ => lit(true)), 16, shard, padId = -2,
        sepId = Some(-6), eosId = Some(-4), bosId = Some(-5))
      .select(col("shard").cast("string"), col("seq_id").cast("string"),
        array_join(transform(col("input_ids"), _.cast("string")), ","),
        array_join(transform(col("segment_ids"), _.cast("string")), ","),
        array_join(transform(col("loss_mask"),
          m => m.cast("int").cast("string")), ","),
        col("n_real").cast("string"))
      .orderBy("shard", "seq_id")
      .collect().map(r => (0 to 5).map(r.getString)).toSeq
    assert(got == api)
  }

  test("bpe method roundtrips merges through the sidecar; ids are rule ranks") {
    import spark.implicits._
    val dir = tmp("toktoml-bpe")
    Seq((0L, "aab aab"), (1L, "aab aac")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/docs")
    val toml =
      s"""[fields]
         |names = ["doc_id", "text"]
         |[input]
         |name = "Parquet"
         |  [input.config]
         |  Path = "$dir/docs"
         |[tokenizer]
         |Method = "bpe"
         |SrcField = "text"
         |VocabPath = "$dir/vocab"
         |Steps = 2
         |[output]
         |name = "Nop"
         |""".stripMargin
    Topology.compileToml(spark, toml).run()
    val rules = spark.read.parquet(s"$dir/vocab").orderBy("id").collect()
      .map(_.getString(1)).toSeq
    assert(rules.head == "a a") // the most frequent pair merges first
    assert(rules.size == 2)

    val applyToml =
      s"""[fields]
         |names = ["doc_id", "text"]
         |[input]
         |name = "Parquet"
         |  [input.config]
         |  Path = "$dir/docs"
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$dir/vocab"
         |  Method = "bpe"
         |[output]
         |name = "Nop"
         |fields = ["doc_id", "ids"]
         |""".stripMargin
    val got = Topology.compileToml(spark, applyToml).projected
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // rules: "a a" (id 0 = "aa"), then step 2 over {aa,b,c}; every fully
    // merged symbol maps to its rule rank, unmerged base chars to -1
    val ruleSyms = rules.map(_.replace(" ", ""))
    val expect0 = graft.llm.Bpe.tokenIds(
      graft.llm.Bpe.encodeText(lit("aab aab"), rules.map { m =>
        val p = m.split(" ", 2); (p(0), p(1)) }), ruleSyms, -1)
    val e0 = spark.range(1).select(
      array_join(transform(expect0, _.cast("string")), ",")).head().getString(0)
    assert(got(0.toString) == e0 || got("0") == e0)
  }

  test("[tokenizer] on a streaming input and bad methods fail loudly") {
    val dir = corpusDir()
    val bad = trainToml(dir).replace("\"unigram\"", "\"nope\"")
    val e = intercept[IllegalArgumentException] {
      Topology.compileToml(spark, bad).run()
    }
    assert(e.getMessage.contains("unigram, bpe or wordpiece"))
    val missing = trainToml(dir).replace("SrcField = \"text\"",
      "SrcField = \"absent\"")
    val e2 = intercept[IllegalArgumentException] {
      Topology.compileToml(spark, missing).run()
    }
    assert(e2.getMessage.contains("unknown SrcField"))
  }

  test("Method=wordpiece: a merge-rule sidecar decodes the BERT way — " +
      "greedy longest-match over rule surfaces with ## continuations, " +
      "ids = rule index, unsplittable words -> UnkId") {
    import spark.implicits._
    val dir = tmp("toktoml-wp")
    Seq((0L, "ababab ababx the"), (1L, "ab zz"), (2L, ""))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/docs")
    // a HAND-WRITTEN sidecar in the trainer's wrapped-symbol format:
    // rule 0 merges a+b (surface "ab"), rule 1 merges ab+ab ("abab")
    def wrap(cs: String): String =
      cs.map(c => s"\u0001$c\u0002").mkString
    Seq((0L, s"${wrap("a")} ${wrap("b")}", 5L),
        (1L, s"${wrap("ab")} ${wrap("ab")}", 3L))
      .toDF("id", "piece", "cost")
      .write.mode("overwrite").parquet(s"$dir/vocab")
    val toml =
      s"""[fields]
         |names = ["doc_id", "text"]
         |[input]
         |name = "Parquet"
         |  [input.config]
         |  Path = "$dir/docs"
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$dir/vocab"
         |  Method = "wordpiece"
         |[output]
         |name = "Nop"
         |fields = ["doc_id", "ids"]
         |""".stripMargin
    val got = Topology.compileToml(spark, toml).projected
      .select("doc_id", "ids").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // "ababab": greedy takes "abab" (rule 1) then continuation "##ab"
    // (rule 0); "ababx": the x cursor matches nothing -> WHOLE word UnkId
    // (BERT semantics); "the"/"zz": no piece matches -> UnkId; "ab" alone
    // is rule 0; empty text -> empty ids
    assert(got == Map("0" -> "1,0,-1,-1", "1" -> "0,-1", "2" -> ""))
  }

  test("a [tokenizer] wordpiece TRAIN job's sidecar is consumable by " +
      "Method=wordpiece (config-only path runs end to end, in-range ids)") {
    val dir = corpusDir()
    // enough steps for a frequent word ("banana", count 5) to merge to a
    // FULL-WORD symbol: greedy longest-match can then cover it whole (a
    // tiny merge table without base characters UNKs partially-covered
    // words - BERT semantics, exercised by the hand-written-sidecar test)
    Topology.compileToml(spark,
      trainToml(dir).replace("Method = \"unigram\"",
        "Method = \"wordpiece\"\nSteps = 24")).run()
    val nRules = spark.read.parquet(s"$dir/vocab").count()
    val toml =
      s"""[fields]
         |names = ["doc_id", "text"]
         |[input]
         |name = "Parquet"
         |  [input.config]
         |  Path = "$dir/docs"
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$dir/vocab"
         |  Method = "wordpiece"
         |[output]
         |name = "Nop"
         |fields = ["doc_id", "ids"]
         |""".stripMargin
    val rows = Topology.compileToml(spark, toml).projected
      .select("doc_id", "ids").collect().map(r => r.getString(1))
    assert(rows.length == 4)
    val ids = rows.filter(_.nonEmpty).flatMap(_.split(",")).map(_.toInt)
    assert(ids.nonEmpty)
    assert(ids.forall(i => i == -1 || (i >= 0 && i < nRules)))
    assert(ids.exists(_ >= 0), "no rule surface ever matched the corpus")
  }

  test("TokenizeIds on an empty sidecar fails loudly") {
    import spark.implicits._
    val dir = tmp("toktoml-empty")
    Seq((0L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/docs")
    Seq.empty[(Long, String, Long)].toDF("id", "piece", "cost")
      .write.mode("overwrite").parquet(s"$dir/vocab")
    val toml =
      s"""[fields]
         |names = ["doc_id", "text"]
         |[input]
         |name = "Parquet"
         |  [input.config]
         |  Path = "$dir/docs"
         |[[filter]]
         |name = "TokenizeIds"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "ids"
         |  VocabPath = "$dir/vocab"
         |[output]
         |name = "Nop"
         |""".stripMargin
    val e = intercept[IllegalArgumentException] {
      Topology.compileToml(spark, toml).projected.collect()
    }
    assert(e.getMessage.contains("empty vocabulary sidecar"))
  }
}
