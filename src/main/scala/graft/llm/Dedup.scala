package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication strategies for large text corpora. The scale contract:
  * every method is a constant number of shuffles keyed so AQE can coalesce
  * and skew-split — no driver-side state, no collect, no per-row Scala.
  *
  *  - exact: hash-groupBy on content key (1 shuffle)
  *  - MinHash+LSH: shingle → signature (map-only) → band-bucket self-join
  *    (shuffle on band key) → similarity filter → anti-join survivors
  *  - SimHash: token hashes → 32-bit signature (1 groupBy) → banded hamming join
  *  - n-gram Jaccard: exact set similarity for candidate verification
  *  - embedding cosine near-dup: hyperplane-LSH bucket join + exact verify
  */
object Dedup {

  /** Exact dedup on a content key, keeping the smallest id per group.
    * Returns the surviving rows of `df`.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // --- MinHash ---

  /** Mersenne prime 2^31-1: (a*h+b) mod p stays in Long for a,h < p. */
  private val P: Long = 2147483647L

  /** Deterministic per-permutation coefficients (splitmix64 of the seed). */
  private def coeff(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    math.floorMod(z ^ (z >>> 31), P - 1) + 1
  }

  /** MinHash signature of a text column as `array<long>` of length
    * `numPerm`: min over shingle hashes of (a_i*h + b_i) mod p.
    *
    * The permutation coefficients are a LITERAL array driven through
    * nested `transform`s — data, not expression nodes — so the expression
    * tree is tiny and stays inside whole-stage codegen regardless of
    * `numPerm`. (A naive `array(perm0, perm1, ..., perm63)` of 64 parallel
    * transforms blows janino's 64KB method limit, silently falls back to
    * interpreted eval, and runs ~100× slower.) Map-only: zero shuffles.
    */
  def minhashSignature(text: Column, numPerm: Int = 64, shingleK: Int = 3,
      seed: Long = 42L): Column = {
    val coeffs = typedLit((0 until numPerm).map(i => (coeff(seed, 2L * i), coeff(seed, 2L * i + 1))))
    // hash the shingles ONCE per row; referencing the hash expression from
    // inside the per-permutation lambda would re-shingle + re-hash the text
    // numPerm times (TextFunctions.bindOnce)
    TextFunctions.bindOnce(
      transform(TextFunctions.shingles(text, shingleK), s => pmod(xxhash64(s), lit(P)))) {
      hashes =>
        when(size(hashes) === 0, typedLit(Seq.fill(numPerm)(P)))
          .otherwise(transform(coeffs,
            c => array_min(transform(hashes, h => pmod(h * c("_1") + c("_2"), lit(P))))))
    }
  }

  /** MinHash signatures via the codegen path: explode shingles → one
    * groupBy(id) with `numPerm` map-side-combined `min` aggregates.
    *
    * Why not [[minhashSignature]] (the pure-Column version)? Spark's
    * higher-order functions (`transform`/`aggregate`) evaluate their
    * lambdas interpreted — 64 perms × shingles per doc measured ~200s for
    * 66k docs at sf0.1. Hash+min over exploded rows stays inside
    * whole-stage codegen and partial aggregation collapses each partition
    * to one row per doc before the (uniform, id-keyed) shuffle: same job
    * at <10s, and the shape that survives 100 TB.
    * Output: (__id, __sig array<long> of length numPerm).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, numPerm: Int = 64,
      shingleK: Int = 3, seed: Long = 42L): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      explode(TextFunctions.shingles(col(textCol), shingleK)).as("__s"))
      .select(col("__id"), pmod(xxhash64(col("__s")), lit(P)).as("__h"))
    val mins = (0 until numPerm).map { i =>
      min(pmod(col("__h") * coeff(seed, 2L * i) + coeff(seed, 2L * i + 1), lit(P))).as(s"__m$i")
    }
    sh.groupBy(col("__id")).agg(mins.head, mins.tail: _*)
      .select(col("__id"), array((0 until numPerm).map(i => col(s"__m$i")): _*).as("__sig"))
  }

  /** Candidate near-dup pairs via banded LSH over the MinHash signature.
    * `bands` bands of `numPerm/bands` rows; two docs collide when any band
    * agrees. Output: (idA, idB, est_jaccard) with idA < idB, where
    * est_jaccard is the fraction of agreeing signature positions.
    *
    * Plan shape: explode-shingle signature agg (1 uniform shuffle) →
    * explode to (doc × bands) rows → self-equi-join on (band, bandHash) →
    * distinct pairs. The join key is a 64-bit hash, so partitioning is
    * uniform except for true duplicate clusters, which AQE skew-split
    * handles; the two join sides share one ReusedExchange.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String, numPerm: Int = 64,
      bands: Int = 16, shingleK: Int = 3, seed: Long = 42L): DataFrame = {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    val r = numPerm / bands
    val sigd = minhashSignatures(df, idCol, textCol, numPerm, shingleK, seed)
    val banded = sigd.select(col("__id"), col("__sig"),
      // single reference to __sig (vs an N-way array() that would inline the
      // signature expression N times under projection collapse)
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), xxhash64(slice(col("__sig"), b * r + 1, lit(r))).as("bh"))))
        .as("bk"))
    // distinct join key name on the right: a("bk")===b("bk") on two frames
    // cut from the same plan resolves to the ambiguous self-join attribute
    val a = banded.select(col("bk"), col("__id").as("idA"), col("__sig").as("sigA"))
    val b = banded.select(col("bk").as("bk2"), col("__id").as("idB"), col("__sig").as("sigB"))
    // dedup band collisions FIRST (a near-identical pair collides in up to
    // `bands` bands), then score each distinct pair once: the zip_with
    // lambda is interpreted, so it must not run per-collision
    a.join(b, col("bk") === col("bk2") && col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(first("sigA").as("sigA"), first("sigB").as("sigB"))
      .select(col("idA"), col("idB"),
        (size(filter(zip_with(col("sigA"), col("sigB"), (x, y) => x === y), b => b))
          .cast("double") / numPerm).as("est_jaccard"))
  }

  /** MinHash-LSH dedup: drop every doc that near-matches (est jaccard ≥
    * threshold) a doc with a smaller id. Single-pass transitive
    * approximation (standard for LSH dedup: each doc only needs ONE smaller
    * neighbor to die; full connected components would need iteration).
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String, threshold: Double = 0.7,
      numPerm: Int = 64, bands: Int = 16, shingleK: Int = 3): DataFrame = {
    val doomed = minhashPairs(df, idCol, textCol, numPerm, bands, shingleK)
      .filter(col("est_jaccard") >= threshold)
      .select(col("idB").as("__doomed")).distinct()
    df.join(doomed, col(idCol) === col("__doomed"), "left_anti")
  }

  // --- SimHash ---

  /** 32-bit SimHash of the token stream: bit j of the result is the sign of
    * Σ_tokens (bit j of xxhash64(token) ? +1 : -1). Computed via explode +
    * one groupBy(id) with 32 map-side-combined sums — one shuffle keyed by
    * the (unique) id, uniform by construction.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, nBits: Int = 32): DataFrame = {
    val tok = df.select(col(idCol), explode_outer(TextFunctions.tokens(col(textCol))).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val bitSums = (0 until nBits).map { j =>
      sum(when(col("__h").isNull, 0)
        .when(col("__h").bitwiseAND(1L << j) =!= 0, 1).otherwise(-1)).as(s"__b$j")
    }
    tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until nBits).map { j =>
          when(col(s"__b$j") > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs: docs whose signatures are within `maxHamming`
    * bits. Banding: split the signature into `maxHamming+1` chunks — any
    * pair within the radius must agree on at least one full chunk
    * (pigeonhole), so an equi-join per chunk finds all candidates; verify
    * with bit_count(xor).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, nBits: Int = 32,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    require(chunks <= nBits, s"maxHamming+1=$chunks exceeds signature width $nBits")
    // chunk widths cover ALL nBits: the first (nBits % chunks) chunks take an
    // extra bit, so no high bits escape the pigeonhole argument for any
    // (nBits, maxHamming) combination
    val base = nBits / chunks
    val widths = (0 until chunks).map(c => base + (if (c < nBits % chunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val sig = simhash(df, idCol, textCol, nBits).select(col(idCol).as("__id"), col("simhash"))
    val banded = sig.select(col("__id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), offsets(c)).bitwiseAND((1L << widths(c)) - 1).as("ck")).as("k")
      }: _*)).as("bk"))
    val a = banded.select(col("bk"), col("__id").as("idA"), col("simhash").as("shA"))
    val b = banded.select(col("bk").as("bk2"), col("__id").as("idB"), col("simhash").as("shB"))
    a.join(b, col("bk") === col("bk2") && col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("shA").bitwiseXOR(col("shB"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("idA", "idB").agg(first("hamming").as("hamming"))
  }

  // --- exact n-gram Jaccard ---

  /** Exact Jaccard similarity between two token-set columns. */
  def jaccard(tokensA: Column, tokensB: Column): Column = {
    val (da, db) = (array_distinct(tokensA), array_distinct(tokensB))
    val inter = size(array_intersect(da, db)).cast("double")
    val union = (size(da) + size(db)).cast("double") - inter
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Exact word-ngram Jaccard for a set of candidate id pairs: joins the
    * texts back and computes set similarity — the verification stage after
    * LSH candidate generation.
    */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("__vid"),
      array_distinct(TextFunctions.shingles(col(textCol), ngram)).as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__vid", "idA").withColumnRenamed("__sh", "__shA"), Seq("idA"))
      .join(sh.withColumnRenamed("__vid", "idB").withColumnRenamed("__sh", "__shB"), Seq("idB"))
      .withColumn("jaccard", jaccard(col("__shA"), col("__shB")))
      .drop("__shA", "__shB")
  }

  // --- embedding near-dup ---

  /** Embedding-cosine near-dup pairs: hyperplane-LSH bucket join (equal
    * `nBits`-bit signature ⇒ candidate) then exact cosine verify. Recall
    * improves with fewer bits / multiple seeds; precision is exact (cosine
    * recomputed). Returns (idA, idB, cosine ≥ threshold).
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, nBits: Int = 12, seeds: Seq[Long] = Seq(42L, 1042L))
      : DataFrame = {
    val sigs = seeds.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("s"),
        VectorFunctions.hyperplaneSignature(col(vecCol), dim, nBits, s).as("sig"))
    }
    val bucketed = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      explode(array(sigs: _*)).as("bk"))
    val a = bucketed.select(col("bk"), col("__id").as("idA"), col("__v").as("vA"))
    val b = bucketed.select(col("bk").as("bk2"), col("__id").as("idB"), col("__v").as("vB"))
    a.join(b, col("bk") === col("bk2") && col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(first("vA").as("vA"), first("vB").as("vB"))
      .withColumn("cosine", VectorFunctions.cosineFast(col("vA"), col("vB")))
      .filter(col("cosine") >= threshold)
      .select("idA", "idB", "cosine")
  }
}
