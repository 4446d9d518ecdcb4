package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical (sparse / keyword) retrieval: BM25 top-k search plus the
  * inverted-index "encode once, search many" at-rest form — the sparse
  * sibling of the dense ANN family (`Similarity`/`Pq`/`Ivf`), and the
  * standard first-stage retriever of a RAG / hybrid-search pipeline.
  *
  * Scale contract (the part that matters at 100 TB):
  *  - The corpus participates ONLY through its postings table
  *    `(term, doc_id, tf, dl)` — built with ONE (doc, term)-keyed shuffle
  *    whose map-side partial count collapses repeated terms before the
  *    exchange. Document text never moves after tokenization.
  *  - `dl` is denormalized into each posting so scoring never joins a
  *    corpus-sized doc-length table (that join would re-shuffle the whole
  *    corpus per query batch). The price is one long per posting at rest.
  *  - Search prunes map-side: the distinct query-term set broadcasts, so
  *    only postings whose term some query mentions ever leave the scan.
  *    Candidate volume is O(postings of query terms), not O(corpus).
  *  - Document frequencies are computed over that pruned slice (df of a
  *    term not in any query is dead weight), yielding a tiny table that
  *    broadcasts straight back. Global `n_docs`/`avgdl` are one
  *    pre-aggregated stats row carried by the index.
  *  - Final ranking reuses the bounded CollectTopK aggregate — k rows per
  *    (query, partition) cross the last shuffle, never the candidate set.
  *
  * Tokenization matches `Keywords`/`Unigram`: whitespace split of trimmed
  * text (blank docs drop out). Scoring is Lucene-shaped BM25:
  * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`, contribution
  * `idf · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))`, summed over the
  * DISTINCT terms shared between query and document (query-side tf is
  * ignored, the common retrieval simplification). Scores are rounded to 6
  * decimals BEFORE ranking so the (score desc, doc asc) order is a total
  * order. The per-(query, doc) sum has only as many addends as shared
  * query terms, so cross-engine reassociation noise (~1e-16 relative)
  * sits ~9 orders below the rounding grain — a 6th-decimal boundary flip
  * is possible in principle but vanishingly unlikely, and would surface
  * as a rank swap in the oracle compare, not silent corruption.
  */
object Lexical {

  /** The at-rest index: postings `(term, doc_id, tf, dl)` and a one-row
    * stats table `(n_docs, avgdl)`. Both round-trip parquet unchanged
    * (pinned in LexicalSpec) — build once per corpus snapshot, search any
    * number of query batches without touching document text again.
    */
  final case class LexicalIndex(postings: DataFrame, stats: DataFrame)

  // TextFunctions.tokens, not a local split: one shared tokenizer
  // definition, and its provably-non-nullable output keeps join-key
  // IsNotNull inference from re-evaluating expressions built on it
  private def termsOf(c: Column): Column = graft.functions.TextFunctions.tokens(c)

  /** Tokenize + count: one map-side-combined shuffle to
    * `(term, doc_id, tf, dl)`. `dl` (doc token count) is computed map-only
    * from the split array and rides the groupBy key (it is functionally
    * dependent on doc_id, so it adds no cardinality).
    */
  def postings(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"), termsOf(col(textCol)).as("__t"))
      .withColumn("dl", size(col("__t")).cast("long"))
      .select(col("doc_id"), col("dl"), explode(col("__t")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))

  /** Build the full at-rest index. Stats derive FROM the postings table —
    * `Σ_docs dl = Σ tf` (a doc's length IS the sum of its term counts) and
    * `avgdl = sum(tf) / countDistinct(doc)` divides the same exact integer
    * sum `avg(dl)` would — so the corpus is tokenized exactly ONCE even
    * when it is a derived frame (a chunk→dedup funnel would otherwise
    * recompute end to end for each of the two scans). The price is one
    * distinct-doc-id exchange (~n_docs ids), far below a second 100 TB
    * pass.
    */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String): LexicalIndex = {
    val p = postings(corpus, idCol, textCol)
    LexicalIndex(p, statsOf(p))
  }

  /** THE stats aggregation over a postings table — the single definition
    * [[buildIndex]], [[deleteFromIndex]] and the streaming store's delete
    * all share, so "recomputed stats equal a from-scratch build exactly"
    * is true by construction, not by keeping three copies in sync.
    */
  def statsOf(postings: DataFrame): DataFrame =
    postings.agg(
      countDistinct(col("doc_id")).as("n_docs"),
      (sum(col("tf")).cast("double") / countDistinct(col("doc_id"))).as("avgdl"))

  /** BM25 top-k over a pre-built index. Queries must be small (they
    * broadcast, twice: term set for pruning, then (query, term) pairs for
    * scoring).
    */
  def bm25Search(index: LexicalIndex, queries: DataFrame, qIdCol: String,
      qTextCol: String, k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // distinct (query, term): query-side tf is ignored by design
    val qt = queries
      .filter(trim(col(qTextCol)) =!= "")
      .select(col(qIdCol).as("query_id"),
        explode(array_distinct(termsOf(col(qTextCol)))).as("term"))
    val qTermSet = broadcast(qt.select("term").distinct())

    // map-side prune: only postings of query terms survive the scan stage
    val cand = index.postings.join(qTermSet, "term")

    // df over the pruned slice only — small by construction, broadcast back
    val dfTab = broadcast(cand.groupBy("term").agg(count(lit(1)).as("df")))

    val scored = cand
      .join(dfTab, "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(index.stats))
      .withColumn("__contrib",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id").as("neighbor_id"))
      .agg(round(sum(col("__contrib")), 6).as("cosine"))

    Similarity.topKPerQuery(scored, k)
      .withColumnRenamed("neighbor_id", "doc_id")
      .withColumnRenamed("cosine", "score")
  }

  /** One-shot form: build the index in-plan and search it. Same result as
    * persisting the index first (LexicalSpec pins the round-trip).
    */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, idCol: String, textCol: String,
      qIdCol: String, qTextCol: String, k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    bm25Search(buildIndex(corpus, idCol, textCol), queries, qIdCol, qTextCol, k, k1, b)

  /** Merge two at-rest indexes over DISJOINT doc-id spaces — the
    * incremental-crawl path: index each month's batch once, merge metadata
    * in O(1), and NEVER re-tokenize the accumulated corpus. Postings
    * union (no doc appears on both sides, so no combine is needed); the
    * stats row recombines as the dl-weighted average. The recombined
    * `avgdl` equals the direct computation up to one float rounding
    * (~1e-16 relative) — after bm25Search's round-to-6 the scores match
    * (LexicalSpec pins it).
    */
  def mergeIndexes(a: LexicalIndex, b: LexicalIndex): LexicalIndex = {
    val posts = a.postings.unionByName(b.postings)
    val stats = a.stats.select(col("n_docs"), col("avgdl"))
      .unionByName(b.stats.select(col("n_docs"), col("avgdl")))
      .agg(sum("n_docs").as("n_docs"),
        (sum(col("avgdl") * col("n_docs")) / sum(col("n_docs"))).as("avgdl"))
    LexicalIndex(posts, stats)
  }

  /** Index a new batch and merge it into an existing at-rest index. */
  def appendToIndex(index: LexicalIndex, corpus: DataFrame, idCol: String,
      textCol: String): LexicalIndex =
    mergeIndexes(index, buildIndex(corpus, idCol, textCol))

  /** Remove `docIds` (one-column frame) from an index WITHOUT touching
    * document text: postings anti-join + stats recomputed from the
    * surviving postings with [[buildIndex]]'s exact aggregation, so the
    * result scores identically to a from-scratch build of the surviving
    * corpus. Pure frame algebra — persist the result yourself
    * ([[writeIndexBucketed]]); for in-place deletion from a streaming
    * store use [[graft.streaming.LexicalIndexStream.deleteDocs]].
    */
  def deleteFromIndex(index: LexicalIndex, docIds: DataFrame): LexicalIndex = {
    val doomed = docIds.select(col(docIds.columns.head).as("__doomed_id")).distinct()
    val posts = index.postings
      .join(doomed, index.postings("doc_id") === col("__doomed_id"), "left_anti")
    LexicalIndex(posts, statsOf(posts))
  }

  /** Exact word-shingle Jaccard retrieval: rank docs by
    * `|shingles(q) ∩ shingles(d)| / |shingles(q) ∪ shingles(d)|` over
    * DISTINCT `shingleK`-grams — the set-overlap scorer that catches
    * phrase-level matches BM25's bag-of-words misses. Output shape matches
    * [[bm25Search]]: (query_id, rank, doc_id, score), score rounded to 6
    * decimals before the (score desc, doc asc) ranking.
    *
    * Scale contract: per-doc distinct-shingle sets (and their sizes) are
    * map-only column algebra; the query shingle set broadcasts, so only
    * corpus shingles that actually hit a query shingle reach the bounded
    * (query, doc) intersection aggregate. Docs sharing no shingle with a
    * query never leave the scan stage. `excludeSelf` guards the
    * corpus-as-queries case (ids must share one space to mean anything).
    */
  def jaccardTopK(corpus: DataFrame, queries: DataFrame, idCol: String, textCol: String,
      qIdCol: String, qTextCol: String, k: Int = 10, shingleK: Int = 3,
      excludeSelf: Boolean = false): DataFrame = {
    import graft.functions.TextFunctions
    val qsh = queries
      .select(col(qIdCol).as("query_id"),
        explode(array_distinct(TextFunctions.shingles(col(qTextCol), shingleK)))
          .as("__sh"))
    val qsz = qsh.groupBy("query_id").agg(count(lit(1)).as("__nq"))
    val docSets = corpus
      .select(col(idCol).as("neighbor_id"),
        array_distinct(TextFunctions.shingles(col(textCol), shingleK)).as("__shs"))
      .withColumn("__nd", size(col("__shs")))
      .filter(col("__nd") > 0)
    val scored = docSets
      .select(col("neighbor_id"), col("__nd"), explode(col("__shs")).as("__sh"))
      .join(broadcast(qsh), "__sh")
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .groupBy("query_id", "neighbor_id", "__nd")
      .agg(count(lit(1)).as("__inter"))
      .join(broadcast(qsz), "query_id")
      .withColumn("cosine",
        round(col("__inter").cast("double") /
          (col("__nd") + col("__nq") - col("__inter")).cast("double"), 6))
    Similarity.topKPerQuery(scored.select("query_id", "neighbor_id", "cosine"), k)
      .withColumnRenamed("neighbor_id", "doc_id")
      .withColumnRenamed("cosine", "score")
  }

  /** Reciprocal-rank fusion of several retrieval rankings (the standard
    * hybrid-search combiner, Cormack et al.): each input carries
    * (query_id, rank, doc_id); the fused score of a doc is
    * `Σ_rankings 1/(c + rank)`, summed over the rankings that surfaced it.
    * Rank-based, so BM25's unbounded scores and cosine's [−1,1] need no
    * normalization to mix. Inputs are ALREADY bounded (k rows per query
    * each), so fusion is an aggregate over O(|queries| · Σk) rows — free at
    * any corpus size; scores rounded to 6 before the final (score desc,
    * doc asc) CollectTopK.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    val normed = rankings.map(_.select(col("query_id"),
      col("doc_id").as("neighbor_id"), col("rank")))
    val all = normed.reduce(_.unionByName(_))
    val scored = all
      .groupBy("query_id", "neighbor_id")
      .agg(round(sum(lit(1.0) / (lit(c.toDouble) + col("rank"))), 6).as("cosine"))
    Similarity.topKPerQuery(scored, k)
      .withColumnRenamed("neighbor_id", "doc_id")
      .withColumnRenamed("cosine", "score")
  }

  /** Load a persisted index (the write side is just
    * `index.postings.write.parquet(...)` / `index.stats.write.parquet(...)`
    * — at 100 TB, partition postings by a term-hash bucket so one query
    * batch touches only its terms' files; see [[writeIndexBucketed]]).
    */
  def loadIndex(spark: SparkSession, postingsPath: String, statsPath: String): LexicalIndex =
    LexicalIndex(spark.read.parquet(postingsPath), spark.read.parquet(statsPath))

  /** Positional postings `(term, doc_id, positions)` — the phrase-query
    * tier of the index: one (doc, term)-keyed shuffle (same contract as
    * [[postings]]), positions sorted ascending per posting. 0-based token
    * offsets.
    */
  def positionalPostings(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"), termsOf(col(textCol)).as("__t"))
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Exact phrase occurrences over a positional index: for each (phrase,
    * doc), the number of token offsets where the phrase's words appear
    * CONSECUTIVELY. The standard intersect-of-shifted-position-lists
    * algorithm: term i's positions shift left by i, and the intersection
    * across all phrase terms is exactly the set of phrase start offsets —
    * a repeated word in the phrase contributes one shifted list per slot,
    * so "the the" works unchanged.
    *
    * Scale contract: the phrase set broadcasts (term pruning happens
    * map-side in the scan, like BM25's query terms); only postings of
    * phrase words reach the bounded (phrase, doc) aggregate, whose group
    * size is ≤ the phrase length; the intersection is per-row array
    * algebra. Docs missing ANY phrase word drop via the completeness
    * check. Output: (phrase_id, doc_id, n_occurrences > 0).
    */
  def phraseOccurrences(positional: DataFrame, phrases: DataFrame,
      phIdCol: String, phTextCol: String): DataFrame = {
    val pt = broadcast(phrases
      .filter(trim(col(phTextCol)) =!= "")
      .select(col(phIdCol).as("phrase_id"),
        size(termsOf(col(phTextCol))).as("__k"),
        posexplode(termsOf(col(phTextCol))).as(Seq("__i", "term"))))
    val cand = positional.join(pt, "term")
      .select(col("phrase_id"), col("__k"), col("doc_id"),
        col("__i"), transform(col("positions"), p => p - col("__i")).as("__sh"))
    cand
      .groupBy("phrase_id", "doc_id", "__k")
      .agg(count(lit(1)).as("__hits"),
        sort_array(collect_list(struct(col("__i"), col("__sh")))).as("__ls"))
      // every phrase slot must be present (a doc missing one word of the
      // phrase has fewer than k rows), then intersect the shifted lists
      .filter(col("__hits") === col("__k"))
      .withColumn("__inter",
        aggregate(slice(col("__ls"), 2, 10000),
          element_at(col("__ls"), 1).getField("__sh"),
          (acc, e) => array_intersect(acc, e.getField("__sh"))))
      .withColumn("n_occurrences", size(col("__inter")).cast("long"))
      .filter(col("n_occurrences") > 0)
      .select("phrase_id", "doc_id", "n_occurrences")
  }

  private def termBucket(term: Column, buckets: Int): Column =
    pmod(xxhash64(term), lit(buckets.toLong))

  /** Persist the index with postings PARTITIONED by a term-hash bucket —
    * the 100 TB layout: a query batch's terms map to a handful of buckets,
    * and [[bm25SearchStored]] pushes that bucket set as a STATIC partition
    * filter, so unmentioned buckets are never even listed, let alone read
    * (the IvfPq cell-partitioning pattern applied to the sparse index;
    * LexicalSpec asserts the pruned file listing).
    */
  def writeIndexBucketed(index: LexicalIndex, dir: String, buckets: Int = 256): Unit = {
    index.postings
      .withColumn("tb", termBucket(col("term"), buckets))
      .write.partitionBy("tb").mode("overwrite").parquet(s"$dir/postings")
    index.stats.write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Search a [[writeIndexBucketed]] layout: the query batch's distinct
    * terms (small by contract — they broadcast anyway) resolve to their
    * bucket set on the driver, which becomes a partition-pruning `isin`
    * filter on the scan. Everything downstream is [[bm25Search]].
    */
  def bm25SearchStored(spark: SparkSession, dir: String, queries: DataFrame,
      qIdCol: String, qTextCol: String, k: Int = 10, buckets: Int = 256,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qBuckets = queries
      .filter(trim(col(qTextCol)) =!= "")
      .select(explode(array_distinct(termsOf(col(qTextCol)))).as("term"))
      .select(termBucket(col("term"), buckets).as("tb"))
      .distinct()
      .collect().map(_.getLong(0)) // bounded by the (broadcastable) query batch
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("tb").isin(qBuckets.toIndexedSeq: _*))
      .drop("tb")
    val stats = spark.read.parquet(s"$dir/stats")
    bm25Search(LexicalIndex(postings, stats), queries, qIdCol, qTextCol, k, k1, b)
  }
}
