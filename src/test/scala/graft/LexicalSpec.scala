package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.llm.Lexical

class LexicalSpec extends SparkSpec {

  private def refBm25(corpus: Map[Long, String], query: String,
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    def toks(s: String): Seq[String] =
      if (s.trim.isEmpty) Seq.empty else s.trim.split("\\s+").toSeq
    val docs = corpus.view.mapValues(toks).filter(_._2.nonEmpty).toMap
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val qTerms = toks(query).distinct
    val df = qTerms.map(t => t -> docs.count(_._2.contains(t))).toMap
    docs.flatMap { case (id, ts) =>
      val dl = ts.size
      val contribs = qTerms.filter(t => ts.contains(t)).map { term =>
        val tf = ts.count(_ == term).toDouble
        val idf = math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5))
        idf * (tf * (k1 + 1.0)) /
          (tf + k1 * (1.0 - b + b * dl / avgdl))
      }
      if (contribs.isEmpty) None
      else Some(id -> BigDecimal(contribs.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  private val corpus = Map(
    1L -> "spark shuffles data across the cluster",
    2L -> "spark spark spark window agg over data",
    3L -> "the window slid shut",
    4L -> "data data data data data data data data data data data data",
    5L -> "   ", // blank: must drop out of N and avgdl
    6L -> "unrelated words only here")

  private def corpusDf = {
    import spark.implicits._
    corpus.toSeq.toDF("doc_id", "text")
  }

  private def queryDf(qs: (Long, String)*) = {
    import spark.implicits._
    qs.toDF("query_id", "qtext")
  }

  test("bm25TopK matches a scalar reference implementation (scores + order)") {
    val q = "spark window data"
    val got = Lexical.bm25TopK(corpusDf, queryDf(10L -> q), "doc_id", "text",
        "query_id", "qtext", k = 10)
      .orderBy("rank")
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))

    val expected = refBm25(corpus, q).toSeq
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex
      .map { case ((id, s), i) => (i + 1, id, s) }

    assert(got.toSeq == expected)
    // sanity on the fixture itself: every scoring doc surfaced, none extra
    assert(got.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("bm25 matches the scalar reference on random corpora (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (_ <- 1 to 3) {
      val docs = (1L to 40L).map(id =>
        id -> Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
      val qs = (1L to 4L).map(q =>
        q -> Seq.fill(1 + rnd.nextInt(4))(words(rnd.nextInt(words.size))).mkString(" "))
      val got = Lexical.bm25TopK(docs.toDF("doc_id", "text"), qs.toDF("query_id", "qtext"),
          "doc_id", "text", "query_id", "qtext", k = 40)
        .collect()
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq)
        .toMap
      val corpus = docs.toMap
      for ((qid, qtext) <- qs) {
        val expect = refBm25(corpus, qtext).toSeq.sortBy { case (id, s) => (-s, id) }
        assert(got.getOrElse(qid, Seq.empty) == expect,
          s"query $qid '$qtext' mismatch")
      }
    }
  }

  test("query terms absent from the corpus contribute nothing; all-miss query returns no rows") {
    val got = Lexical.bm25TopK(corpusDf,
        queryDf(1L -> "spark zzz_missing", 2L -> "qqq www"),
        "doc_id", "text", "query_id", "qtext", k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))
    assert(got.forall(_._1 == 1L), "all-miss query must be absent entirely")
    assert(got.nonEmpty)
  }

  test("ties rank by ascending doc_id") {
    import spark.implicits._
    // two identical docs ⇒ identical scores ⇒ id decides
    val dup = Seq(7L -> "alpha beta", 8L -> "alpha beta", 9L -> "gamma").toDF("doc_id", "text")
    val got = Lexical.bm25TopK(dup, queryDf(1L -> "alpha"), "doc_id", "text",
        "query_id", "qtext", k = 5)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got == Seq(7L, 8L))
  }

  test("at-rest index round-trips parquet and searches identically") {
    val dir = Files.createTempDirectory("graft-lexical").toFile
    try {
      val idx = Lexical.buildIndex(corpusDf, "doc_id", "text")
      idx.postings.write.mode("overwrite").parquet(s"$dir/postings")
      idx.stats.write.mode("overwrite").parquet(s"$dir/stats")
      val loaded = Lexical.loadIndex(spark, s"$dir/postings", s"$dir/stats")

      val q = queryDf(10L -> "spark window data", 11L -> "unrelated")
      def run(i: Lexical.LexicalIndex) =
        Lexical.bm25Search(i, q, "query_id", "qtext", k = 10)
          .orderBy("query_id", "rank")
          .collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
            r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq

      assert(run(loaded) == run(idx))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("phrase search matches a scalar slice-compare reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = Seq("a", "b", "c")
    val docs = (1L to 30L).map(id =>
      id -> Seq.fill(3 + rnd.nextInt(15))(alphabet(rnd.nextInt(3))).mkString(" "))
    val phrases = (1L to 6L).map(p =>
      p -> Seq.fill(1 + rnd.nextInt(3))(alphabet(rnd.nextInt(3))).mkString(" "))
    val got = graft.llm.Lexical.phraseOccurrences(
        graft.llm.Lexical.positionalPostings(docs.toDF("doc_id", "text"), "doc_id", "text"),
        phrases.toDF("phrase_id", "ptext"), "phrase_id", "ptext")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = (for {
      (pid, p) <- phrases
      pt = p.split(" ").toSeq
      (did, d) <- docs
      dt = d.split(" ").toSeq
      n = (0 to dt.length - pt.length).count(i => dt.slice(i, i + pt.length) == pt)
      if n > 0
    } yield (pid, did) -> n.toLong).toMap
    assert(got == expect)
    assert(expect.nonEmpty, "fixture produced no matches — pick new constants")
  }

  test("phrase search: shifted-position intersect, repeated words, multi-occurrence") {
    import spark.implicits._
    val docs = Seq(1L -> "a b a b a", 2L -> "b a", 3L -> "a a a").toDF("doc_id", "text")
    val pos = graft.llm.Lexical.positionalPostings(docs, "doc_id", "text")
    val phrases = Seq(1L -> "a b", 2L -> "a a", 3L -> "b a", 4L -> "a z")
      .toDF("phrase_id", "ptext")
    val got = graft.llm.Lexical.phraseOccurrences(pos, phrases, "phrase_id", "ptext")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (1L, 1L) -> 2L,               // "a b" at 0 and 2 in doc 1
      (2L, 3L) -> 2L,               // repeated word: "a a" starts 0 and 1
      (3L, 1L) -> 2L, (3L, 2L) -> 1L)) // "b a"; "a z" matches nothing
  }

  test("mergeIndexes over disjoint batches equals indexing the union") {
    import spark.implicits._
    val (batchA, batchB) = corpus.toSeq.partition(_._1 <= 3L)
    val merged = graft.llm.Lexical.appendToIndex(
      graft.llm.Lexical.buildIndex(batchA.toDF("doc_id", "text"), "doc_id", "text"),
      batchB.toDF("doc_id", "text"), "doc_id", "text")
    val direct = graft.llm.Lexical.buildIndex(corpusDf, "doc_id", "text")

    val q = queryDf(10L -> "spark window data", 11L -> "cluster words")
    def run(i: graft.llm.Lexical.LexicalIndex) =
      graft.llm.Lexical.bm25Search(i, q, "query_id", "qtext", k = 10)
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    val (m, d) = (run(merged), run(direct))
    assert(m.map(t => (t._1, t._2, t._3)) == d.map(t => (t._1, t._2, t._3)))
    m.zip(d).foreach { case (a, b) =>
      assert(math.abs(a._4 - b._4) <= 1e-6, s"$a vs $b")
    }
    // stats recombine exactly on counts
    val st = merged.stats.collect()(0)
    assert(st.getAs[Long]("n_docs") == 5L)
  }

  test("jaccardTopK scores distinct-shingle overlap exactly") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d",      // 2-shingles: {a b, b c, c d}
      2L -> "a b a b",      // distinct: {a b, b a}
      3L -> "x y z",
      4L -> "q").toDF("doc_id", "text") // <2 tokens: no shingles, absent
    val got = graft.llm.Lexical.jaccardTopK(docs, queryDf(1L -> "a b c"),
        "doc_id", "text", "query_id", "qtext", k = 10, shingleK = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    // query shingles {a b, b c} (nq=2): doc1 inter=2, union=3 → 2/3;
    // doc2 inter=1 (a b), union=3 → 1/3; doc3/doc4 absent
    assert(got == Seq(
      1L -> BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      2L -> BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("rrfFuse sums reciprocal ranks across rankings and re-ranks") {
    import spark.implicits._
    // two rankings over one query: doc 5 is #1 in A and #3 in B; doc 6 only in A
    val a = Seq((1L, 1, 5L), (1L, 2, 6L)).toDF("query_id", "rank", "doc_id")
    val b = Seq((1L, 1, 7L), (1L, 2, 8L), (1L, 3, 5L)).toDF("query_id", "rank", "doc_id")
    val got = graft.llm.Lexical.rrfFuse(Seq(a, b), k = 10, c = 60)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .toSeq
    def s(rs: Double*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc5: 1/61+1/63 ≈ .032266 — the only doc in both lists wins
    assert(got.head == ((1, 5L, s(1, 3))))
    assert(got.map(_._2) == Seq(5L, 7L, 6L, 8L))
    assert(got.find(_._2 == 7L).get._3 == s(1))
  }

  test("bucketed at-rest index: query terms prune the postings file listing") {
    val dir = Files.createTempDirectory("graft-lexical-bucketed").toFile
    try {
      val idx = graft.llm.Lexical.buildIndex(corpusDf, "doc_id", "text")
      graft.llm.Lexical.writeIndexBucketed(idx, dir.getAbsolutePath, buckets = 8)
      val q = queryDf(10L -> "spark window data")
      val stored = graft.llm.Lexical.bm25SearchStored(spark, dir.getAbsolutePath,
        q, "query_id", "qtext", k = 10, buckets = 8)
      // identical results to the unbucketed search
      val direct = graft.llm.Lexical.bm25Search(idx, q, "query_id", "qtext", k = 10)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("query_id", "rank").collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
            r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
      assert(rows(stored) == rows(direct))
      // and the scan listed ONLY the buckets the query terms hash into
      val plan = stored.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        plan.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("tb")),
        s"term-bucket filter must prune partitions:\n$plan")
      // the pruned fraction is real: rebuild the exact filtered scan
      // bm25SearchStored issues (the full search plan is AQE-wrapped, so
      // probe the leaf directly, like IvfPqSpec's at-rest case)
      val qBuckets = Seq("spark", "window", "data").map(t =>
        spark.range(1).select(pmod(xxhash64(lit(t)), lit(8L)))
          .collect()(0).getLong(0)).distinct
      val probe = spark.read.parquet(s"$dir/postings")
        .filter(col("tb").isin(qBuckets: _*))
      val scan = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(fail("no file scan in the probe plan"))
      val nSelected = scan.selectedPartitions.partitionCount
      val nTotal = new java.io.File(dir, "postings").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("tb="))
      assert(nSelected == qBuckets.size && nSelected < nTotal,
        s"expected exactly the ${qBuckets.size} query buckets of $nTotal: got $nSelected")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("postings carry dl denormalized; stats are one row (n_docs excludes blank docs)") {
    val idx = Lexical.buildIndex(corpusDf, "doc_id", "text")
    assert(idx.postings.columns.sorted.toSeq == Seq("dl", "doc_id", "term", "tf"))
    val stats = idx.stats.collect()
    assert(stats.length == 1)
    assert(stats(0).getAs[Long]("n_docs") == 5L) // doc 5 is blank
    val dl2 = idx.postings.filter(col("doc_id") === 2L).select("dl").distinct().collect()
    assert(dl2.map(_.getLong(0)).toSeq == Seq(7L))
  }
}
