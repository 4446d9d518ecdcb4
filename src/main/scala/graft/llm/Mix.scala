package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and weighted mixing — how a training-data
  * pipeline blends sources ("20% crawl, 30% books, 50% code") so the same
  * input rows are selected on every run, on any cluster layout.
  *
  * Selection hashes a caller-supplied deterministic expression (an id, a
  * content digest) into [0, 1e6) and keeps rows under `rate · 1e6` — a
  * map-only filter that pushes toward the scan, needs no shuffle, no RNG
  * state, and composes with partition pruning. Unlike `df.sample`, results
  * are independent of partitioning and stable across retries — at 100 TB,
  * speculative re-execution of a task MUST resample identically.
  */
object Mix {

  private val Buckets = 1000000L

  /** Keep a deterministic `rate` fraction of rows, selected by `hash`. */
  def sampleDeterministic(df: DataFrame, rate: Double, hash: Column): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.filter(pmod(hash, lit(Buckets)) < (rate * Buckets).toLong)
  }

  /** Weighted union of sources: each (frame, rate, hash) is independently
    * down-sampled then unioned by name. Schemas must align.
    */
  def weighted(sources: Seq[(DataFrame, Double, Column)]): DataFrame = {
    require(sources.nonEmpty, "mix: at least one source")
    sources.map { case (df, r, h) => sampleDeterministic(df, r, h) }
      .reduce(_ unionByName _)
  }

  /** Epoch (repeat-factor) expansion — the other half of a data mixture
    * schedule: rates < 1 down-sample ([[stratified]]), factors > 1 REPEAT
    * a source ("1.7 epochs of books"). Each row expands to
    * `floor(f)` copies plus one more for the deterministic `frac(f)`
    * fraction of rows selected by `hash` — so expected copies = f exactly,
    * every copy count is reproducible row-by-row (no per-row randoms, no
    * retry instability), and the fractional epoch is an unbiased
    * hash-selected subset rather than a truncation. Strata not in
    * `factors` keep `defaultFactor` (1.0 = pass through).
    *
    * Output adds an `epoch` column (0-based copy index) — downstream
    * shuffles ([[deterministicShuffle]] keyed on (id, epoch)) spread the
    * copies so repeats never cluster inside one training window.
    *
    * Scale shape: one map-only scan with a per-row `explode(sequence)` —
    * output rows ≤ ⌈max factor⌉ × input, no shuffle, no groupBy; the CASE
    * threshold trick keeps it skew-insensitive like [[stratified]].
    */
  def epochExpand(df: DataFrame, strata: Column, factors: Map[String, Double],
      hash: Column, defaultFactor: Double = 1.0): DataFrame = {
    (defaultFactor +: factors.values.toSeq).foreach(f =>
      require(f >= 0, s"epoch factor must be >= 0: $f"))
    def whole(f: Double): Long = math.floor(f).toLong
    def fracThreshold(f: Double): Long = ((f - math.floor(f)) * Buckets).toLong
    val wholeCol = factors.foldLeft(lit(whole(defaultFactor))) {
      case (acc, (s, f)) => when(strata === s, lit(whole(f))).otherwise(acc)
    }
    val fracCol = factors.foldLeft(lit(fracThreshold(defaultFactor))) {
      case (acc, (s, f)) => when(strata === s, lit(fracThreshold(f))).otherwise(acc)
    }
    val copies = wholeCol + when(pmod(hash, lit(Buckets)) < fracCol, 1L).otherwise(0L)
    // plain explode drops the copies == 0 rows (null sequence) outright
    df.withColumn("epoch",
      explode(when(copies > 0, sequence(lit(0L), copies - 1))))
  }

  /** Token-budget mixture solver with an epoch cap — the step between
    * "target weights" and the `factors` map [[epochExpand]] consumes:
    * given per-source token inventories, target mixture weights (basis
    * points summing to 10000), a total token budget, and a repetition
    * cap (`maxEpochsBp`, e.g. 20000 = at most 2 epochs of any source),
    * allocate `tokens(s) = min(cap(s), λ·w(s))` with λ set so the
    * allocations sum to the budget — WATER-FILLING: a source too small
    * to supply its proportional share caps at `maxEpochs` epochs and its
    * shortfall redistributes to the uncapped sources by weight
    * (iterating, since redistribution can cap further sources). When
    * even the fully-capped total can't reach the budget, every source
    * caps and the result is the maximum obtainable corpus.
    *
    * EXACT integer arithmetic throughout (BigInt cross-multiplication
    * for the cap tests, floor division for shares, the ≤ n−1 floor
    * remainder handed one token each to the largest-weight uncapped
    * sources — each has ≥ 1 token of slack below its cap by the strict
    * uncapped inequality), so an external engine replays the whole
    * solve, and Σ tokens == min(budget, Σ caps) EXACTLY. Driver-side
    * pure arithmetic — sources are languages/domains/corpora, a small
    * set by nature; the per-source inventory aggregation is the only
    * Spark job a caller runs.
    *
    * Returns (source, available, tokensOut, capped) sorted by source;
    * epoch factors for [[epochExpand]] are `tokensOut / available`.
    */
  def solveMixture(available: Map[String, Long], weightBp: Map[String, Int],
      budget: Long, maxEpochsBp: Int): Seq[(String, Long, Long, Boolean)] = {
    require(available.keySet == weightBp.keySet,
      s"solveMixture: sources differ: ${available.keySet} vs ${weightBp.keySet}")
    require(available.nonEmpty, "solveMixture: no sources")
    require(weightBp.values.sum == 10000,
      s"solveMixture: weights must sum to 10000 bp: ${weightBp.values.sum}")
    require(weightBp.values.forall(_ >= 0) && available.values.forall(_ >= 0),
      "solveMixture: negative weight or inventory")
    require(budget >= 0 && maxEpochsBp > 0,
      s"solveMixture: bad budget=$budget maxEpochsBp=$maxEpochsBp")
    val caps: Map[String, Long] =
      available.map { case (s, a) => s -> (BigInt(a) * maxEpochsBp / 10000).toLong }
    var capped = Set.empty[String]
    var changed = true
    while (changed) {
      changed = false
      val rem = budget - capped.toSeq.map(caps).sum
      val wUnc = weightBp.collect { case (s, w) if !capped(s) => w.toLong }.sum
      if (wUnc > 0) {
        for ((s, w) <- weightBp if !capped(s)) {
          if (BigInt(rem) * w >= BigInt(caps(s)) * wUnc) {
            capped += s
            changed = true
          }
        }
      }
    }
    val rem = budget - capped.toSeq.map(caps).sum
    val wUnc = weightBp.collect { case (s, w) if !capped(s) => w.toLong }.sum
    // wUnc == 0 with uncapped sources is the all-weight-mass-capped
    // corner (the uncapped survivors all weigh 0): they get nothing
    val base: Map[String, Long] = weightBp.map { case (s, w) =>
      s -> (if (capped(s)) caps(s)
            else if (wUnc == 0) 0L
            else (BigInt(rem) * w / wUnc).toLong)
    }
    val leftover =
      if (wUnc == 0) 0L
      else rem - base.collect { case (s, t) if !capped(s) => t }.sum
    val bonus = weightBp.keys.toSeq.filterNot(capped)
      .sortBy(s => (-weightBp(s), s)).take(leftover.toInt).toSet
    available.keys.toSeq.sorted.map { s =>
      (s, available(s), base(s) + (if (bonus(s)) 1L else 0L), capped(s))
    }
  }

  /** Stratified deterministic sample: keep a per-stratum fraction of rows
    * ("50% of en, 10% of zh, …"), selected by `hash` as in
    * [[sampleDeterministic]]. Strata not in `rates` keep `defaultRate`.
    *
    * Still a map-only filter — the per-stratum threshold is a CASE
    * expression over the stratum column, so there is no groupBy, no
    * per-stratum pass, and no skew sensitivity: a 90%-English corpus costs
    * the same scan as a uniform one. (The alternative,
    * `df.stat.sampleBy`, draws per-row randoms — unstable across retries
    * and not pushdown-friendly.)
    */
  def stratified(df: DataFrame, strata: Column, rates: Map[String, Double],
      hash: Column, defaultRate: Double = 0.0): DataFrame = {
    (defaultRate +: rates.values.toSeq).foreach(r =>
      require(r >= 0 && r <= 1, s"rate must be in [0,1]: $r"))
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toLong)) {
      case (acc, (k, r)) => when(strata === k, lit((r * Buckets).toLong)).otherwise(acc)
    }
    df.filter(pmod(hash, lit(Buckets)) < threshold)
  }

  /** UniMax/α-style temperature rates: stratum `i` with `n_i` rows gets
    * weight `n_i^alpha`; a total `budget` of rows is allotted
    * proportionally and converted to a per-stratum keep rate
    * `min(1, budget·(w_i/W)/n_i)` — `alpha < 1` upweights tail strata
    * (the multilingual-balancing step of every large pretraining mix).
    *
    * Determinism contract: the weight sum runs left-to-right over strata
    * SORTED BY NAME, and `alpha = 0.5` uses `sqrt` — correctly rounded in
    * every IEEE engine, so an external oracle re-derives the exact
    * thresholds. Other alphas go through `pow`, which engines only
    * guarantee to ~1 ulp; rates remain deterministic WITHIN Spark either
    * way.
    */
  def temperatureRates(sizes: Seq[(String, Long)], budget: Long,
      alpha: Double = 0.5): Map[String, Double] = {
    require(sizes.nonEmpty, "temperatureRates: no strata")
    require(sizes.forall(_._2 > 0), "temperatureRates: empty stratum")
    val sorted = sizes.sortBy(_._1)
    val ws = sorted.map { case (_, n) =>
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    }
    val wSum = ws.foldLeft(0.0)(_ + _)
    sorted.zip(ws).map { case ((k, n), w) =>
      k -> math.min(1.0, budget.toDouble * (w / wSum) / n.toDouble)
    }.toMap
  }

  /** Temperature-balanced deterministic sample: ONE bounded aggregation
    * derives the per-stratum sizes (driver state = one row per stratum —
    * languages, not documents), [[temperatureRates]] turns them into keep
    * rates, and the selection itself is the same map-only hash-threshold
    * filter as [[stratified]]. Two corpus scans total (count + filter), no
    * shuffle beyond the bounded count agg, retry-stable like every sampler
    * here.
    */
  def temperatureSample(df: DataFrame, strata: Column, budget: Long,
      hash: Column, alpha: Double = 0.5): DataFrame = {
    // null strata are excluded from the size derivation AND from selection
    // (stratified's defaultRate 0 never keeps them) — and the stratum is
    // cast to string so non-string columns get rates keyed consistently
    // with stratified's string CASE match
    val sizes = df.filter(strata.isNotNull)
      .groupBy(strata.cast("string").as("__s")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getAs[String]("__s") -> r.getAs[Long]("__n")).toSeq
    stratified(df, strata.cast("string"), temperatureRates(sizes, budget, alpha),
      hash)
  }

  /** Deterministic global corpus shuffle — the pre-training step that
    * orders documents pseudo-randomly but REPRODUCIBLY before packing into
    * sequences: every run, on any cluster layout, assigns each row the same
    * `shuffle_pos` (1-based dense position in md5(seed‖tie) order; md5 so
    * a SQL oracle can restate the order, `tie` breaking the ~impossible
    * digest collision).
    *
    * Scale shape — global order WITHOUT a global window: the range bucket
    * is derived DETERMINISTICALLY from the key's leading 32 bits (md5 is
    * uniform, so buckets balance without sampling — unlike
    * `repartitionByRange`, whose RDD-id-seeded sampling can assign
    * boundary rows differently between the two jobs below); per-bucket
    * ranks come from a window PARTITIONED by the bucket (parallel groups,
    * never one partition holding the corpus); the only driver state is one
    * (bucket, count) row per bucket, whose running offsets broadcast-join
    * back. The same two-phase trick as budgetSelect's boundary fill.
    */
  def deterministicShuffle(df: DataFrame, tie: Column, seed: String,
      numPartitions: Int = 0): DataFrame = {
    val out = df.columns
    for (c <- Seq("__key", "__pid", "__pid2", "__rank", "__off"))
      require(!out.contains(c),
        s"deterministicShuffle: input column '$c' collides with an internal name")
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // a null tie would null the key and bucket and surface as an opaque
    // driver NPE — fail row-side with a clear message instead
    val tieStr = tie.cast("string")
    val key = md5(concat(lit(seed), lit("|"),
      when(tieStr.isNotNull, tieStr).otherwise(raise_error(lit(
        "deterministicShuffle: tie expression is null for some row — " +
          "supply a non-null tie column (e.g. a document id)")))))
    // bucket = floor(first32bits(key) · n / 2³²): monotone in the key, so
    // bucket order + in-bucket key order IS the global key order
    val bucket = (conv(substring(col("__key"), 1, 8), 16, 10).cast("long")
      * n / (1L << 32)).cast("int")
    val keyed = df.withColumn("__key", key).withColumn("__pid", bucket)
    // job 1, bounded driver state: one count per bucket → running offsets
    val counts = keyed.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(
      counts.scanLeft(0L) { case (acc, (_, c)) => acc + c })
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("__pid2", "__off")
    // job 2: per-bucket dense ranks (parallel window groups) + offset
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col("__key"), tie)
    keyed.withColumn("__rank", row_number().over(w))
      .join(broadcast(offsetDf), col("__pid") === col("__pid2"))
      .withColumn("shuffle_pos", col("__off") + col("__rank"))
      .select(out.map(col) :+ col("shuffle_pos"): _*)
  }

  /** Keep the best-scoring rows until a size budget fills — the corpus
    * curation step "take the highest-quality documents up to N tokens".
    *
    * Semantically identical to ranking the corpus by (`score` DESC, `tie`
    * ASC), running a cumulative sum of `size`, and keeping the prefix with
    * `cum ≤ budget` — which is how the SQL oracle states it. A literal
    * global-window implementation would funnel the corpus through ONE
    * partition, so the plan is two-phase instead:
    *
    *   1. total size per DISTINCT score — one map-side-combined aggregation
    *      whose output is bounded by the score key space, not corpus rows
    *      (callers quantize the score, e.g. `round(q, 4)`, exactly to keep
    *      this bounded; the collect is codebook-sized driver state);
    *   2. the driver walks the per-score totals in descending order to the
    *      first overflow: every higher score is kept ENTIRELY by a map-only
    *      filter, and only the single boundary-score tie group — not the
    *      corpus — passes through a window to fill the remainder in `tie`
    *      order.
    *
    * Rows with null score are never selected. `tie` must be unique within
    * the boundary score for a deterministic result (an id, a digest).
    */
  def budgetSelect(df: DataFrame, score: Column, size: Column, budget: Long,
      tie: Column, maxDistinctScores: Long = 1L << 17): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val out = df.columns
    for (c <- Seq("__score", "__size", "__cum"))
      require(!out.contains(c),
        s"budgetSelect: input column '$c' collides with an internal name")
    // no eager `isNotNull` filter on the score: Catalyst would substitute
    // the score expression into a pushed-down FilterExec and compute it
    // TWICE per row (measured 2.2×). Null scores instead fall into their
    // own totals group, skipped by the driver walk, and the `> t` / `=== t`
    // selection predicates exclude them for free.
    val scored = df.withColumn("__score", score.cast("double"))
      .withColumn("__size", size.cast("long"))
    // the quantization contract enforced, not just documented: an
    // unquantized double score would turn the codebook collect into a
    // corpus-sized driver OOM. orderBy+limit compiles to
    // TakeOrderedAndProject, so the driver never holds more than
    // maxDistinctScores+1 rows even on a pathological input — overflow
    // fails fast instead of collecting the corpus. The default cap stays
    // ≤ ~2^17: TakeOrdered's per-partition bounded priority queues are
    // sized by k, and a measured k=2^20 adds ~0.5s to every call while
    // k≤2^17 is free (round(q,4)-style quantization needs ~10^4).
    val totals = scored.groupBy("__score").agg(sum("__size").as("__tot"))
      .orderBy(desc("__score")).limit((maxDistinctScores + 1).toInt).collect()
    require(totals.length <= maxDistinctScores,
      s"budgetSelect: more than $maxDistinctScores distinct scores — quantize " +
        "the score expression (e.g. round(q, 4)) so the per-score codebook " +
        "stays bounded driver state")
    val totalsClean = totals.filterNot(_.isNullAt(0))
    var cum = 0L
    var boundary = Option.empty[(Double, Long)] // (boundary score, remaining)
    for (r <- totalsClean if boundary.isEmpty) {
      // a group whose sizes are ALL null sums to null — contributes nothing
      val tot = if (r.isNullAt(1)) 0L else r.getLong(1)
      if (cum + tot > budget) boundary = Some((r.getDouble(0), budget - cum))
      else cum += tot
    }
    boundary match {
      case None => // everything (with a non-null score) fits
        scored.filter(col("__score").isNotNull).select(out.map(col): _*)
      case Some((t, remaining)) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__score").orderBy(tie)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val high = scored.filter(col("__score") > t)
        val fill = scored.filter(col("__score") === t)
          .withColumn("__cum", sum(col("__size")).over(w))
          .filter(col("__cum") <= remaining)
        high.select(out.map(col): _*).unionByName(fill.select(out.map(col): _*))
    }
  }

  /** Deterministic train/valid/test assignment: label every row with a
    * split name, chosen by hashing `key` — the standard corpus split step,
    * with the same stability contract as [[sampleDeterministic]]: map-only,
    * independent of partitioning, reproducible across retries and engines.
    *
    * The bucket is the first 8 hex chars of `md5(seed + "|" + key)`
    * compared lexicographically against cumulative weight thresholds
    * (fixed-width lowercase hex compares as the number it spells) — the
    * whole assignment is a CASE expression an external SQL engine states
    * verbatim. Weights must sum to 1 (±1e-9); the last split absorbs the
    * rounding remainder by construction.
    */
  def assignSplits(df: DataFrame, key: Column, seed: String,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplits: no splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"assignSplits: duplicate split names in ${splits.map(_._1)}")
    require(splits.forall(_._2 >= 0), s"assignSplits: negative weight in $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"assignSplits: weights must sum to 1: ${splits.map(_._2).sum}")
    // a null key would null the md5, fail every `<` comparison, and fall
    // silently into the LAST split — fail loud instead (a split
    // assignment over rows with missing keys is a data bug upstream)
    val rawBucket = substring(md5(concat(lit(seed), lit("|"), key.cast("string"))), 1, 8)
    val bucket = when(key.isNull,
      raise_error(lit("assignSplits: null split key")).cast("string"))
      .otherwise(rawBucket)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    // threshold for cumulative weight w: floor(w · 2^32) as 8-digit hex
    def hex(w: Double): String = f"${math.floor(w * 4294967296.0).toLong.min(4294967295L)}%08x"
    val labeled = splits.init.zip(cums.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cum)) =>
        val cond = bucket < lit(hex(cum))
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }
    val expr = labeled.fold(lit(splits.last._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn(outCol, expr)
  }

  /** The split thresholds as (name, exclusive-upper 8-hex-digit bound) —
    * exposed so an oracle/SQL restatement interpolates the IDENTICAL
    * constants [[assignSplits]] compares against.
    */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[(String, String)] = {
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.zip(cums).map { case ((n, _), c) =>
      n -> f"${math.floor(c * 4294967296.0).toLong.min(4294967295L)}%08x"
    }
  }

  /** Deterministic k-per-key sample: the balanced per-class/per-source
    * pick ("200 eval docs per language") — [[capPerKey]] ranked by the
    * md5 of (seed | id), so selection is pseudo-random yet stable across
    * runs, partitionings, and retries, and restatable in any engine with
    * md5. Same bounded CollectTopK shuffle contract as capPerKey.
    */
  def sampleKPerKey(df: DataFrame, key: Column, idCol: String, k: Int,
      seed: String): DataFrame =
    capPerKey(df, key,
      struct(md5(concat(lit(seed), lit("|"), col(idCol).cast("string"))).as("h"),
        col(idCol).as("i")),
      idCol, k)

  /** EXACTLY `n` rows (or all, if fewer), deterministically chosen by
    * md5(seed‖key) order — "give me a 100k-document sample" with the same
    * documents on every run and any partitioning, where a RATE-based
    * sample ([[sampleDeterministic]]) can only hit a count in expectation.
    * One bounded CollectTopK aggregation ([[capPerKey]] with a constant
    * key): map-side partials keep ≤ n rows per partition, so driver and
    * shuffle state are O(n), never corpus-sized. `key` must be non-null
    * and unique (ties beyond the digest are broken by id).
    */
  def sampleN(df: DataFrame, key: Column, idCol: String, n: Int,
      seed: String = "sampleN"): DataFrame =
    capPerKey(df, lit(1), md5(concat(lit(seed), lit("|"), key.cast("string"))),
      idCol, n)

  /** Keep at most `n` rows per key, ranked by `order` ASCENDING (wrap a
    * struct for composite ranks, negate for descending) — the per-domain /
    * per-source cap of a crawl-curation pipeline ("≤ N pages per host, best
    * quality first"), where one mega-host must not dominate the corpus.
    *
    * Scale contract: ranking is the bounded CollectTopK aggregate — its
    * map-side partial keeps only `n` (order, id) pairs per (key, partition),
    * so a host with 10^9 pages contributes n rows per partition to the
    * shuffle, never its page count (a `row_number` window would shuffle and
    * sort EVERY row of the hot host into one partition). The kept-id set
    * (≤ n·|keys|) then semi-joins back to recover full rows; `idCol` must
    * be unique.
    */
  def capPerKey(df: DataFrame, key: Column, order: Column, idCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"capPerKey: n must be positive: $n")
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
    // a null order value (or null id) must never occupy a cap slot: the
    // ascending struct sort places NULL FIRST, so null-ranked rows would
    // crowd out real best rows — and a null id can never match the
    // left_semi recovery join, silently shrinking the output below n. For
    // the documented composite pattern (`order` = a struct of rank
    // fields), the struct itself is non-null even when a FIELD is, and
    // null fields sort first all the same — so every top-level field must
    // be non-null too.
    val base = df.select(key.as("__k"), order.as("__o"), col(idCol).as("__id"))
    val orderNotNull = base.schema("__o").dataType match {
      case st: org.apache.spark.sql.types.StructType =>
        st.fieldNames.foldLeft(col("__o").isNotNull)(
          (acc, f) => acc && col("__o").getField(f).isNotNull)
      case _ => col("__o").isNotNull
    }
    val ranked = base.filter(orderNotNull && col("__id").isNotNull)
    val topk = GraftShims.toColumn(
      new CollectTopK(
        GraftShims.toExpression(struct(col("__o"), col("__id"))), n, true)
        .toAggregateExpression())
    val keep = ranked.groupBy("__k").agg(topk.as("__t"))
      .select(explode(col("__t")).as("__e"))
      .select(col("__e.__id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Per-stratum score-quantile thresholds — the FineWeb-style "drop the
    * bottom `drop` fraction by quality per language/domain" gate with a
    * DATA-DERIVED cut instead of a hand-tuned constant. Returns one
    * `(stratum, threshold)` row per stratum; [[quantileFilter]] applies
    * them.
    *
    * All-integer discrete definition (no interpolation, no float rank
    * math — deterministic and exactly restatable by an external SQL
    * engine): with n rows in a stratum, the threshold is the smallest
    * score value v whose cumulative count reaches `k = ceil(drop·n)`,
    * stated cross-multiplied (`cum · 10⁶ ≥ ⌈drop·10⁶⌉ · n`, exact long
    * arithmetic — `drop` rounds UP to micro-units; safe to n ≤ 10¹²).
    * [[quantileFilter]] keeps rows with score STRICTLY ABOVE v, so at
    * least the `drop` fraction leaves, and ties at the cut drop together
    * (deterministic, conservative).
    *
    * `scoreInt` must be an integral score (scale a float score to fixed
    * micro-units first — e.g. `round(quality * 10000)`): the CDF is
    * computed over per-(stratum, value) COUNTS, so the only shuffled
    * payload is the distinct (stratum, score) histogram — bounded by the
    * score's value range, never the corpus — and the window below runs
    * over that histogram, not over rows.
    */
  def quantileThresholds(df: DataFrame, strata: Column, scoreInt: Column,
      drop: Double): DataFrame = {
    require(drop > 0 && drop < 1, s"drop fraction must be in (0,1): $drop")
    val dropMicro = math.ceil(drop * 1e6).toLong
    // null scores (e.g. an unparseable string field cast to double under
    // the TOML filter) are EXCLUDED from the distribution — left in, they
    // would sort below every real value, inflate both cum and n, and
    // silently shift the cut DOWNWARD (every null absorbs part of the
    // drop budget, so FEWER real rows drop than the fraction demands);
    // they never pass the final `score > threshold` test anyway, so
    // exclusion makes the threshold reflect the scored rows only
    val hist = df.select(strata.as("stratum"), scoreInt.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("stratum", "__v").agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum").orderBy("__v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("stratum")
    hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .filter(col("__cum") * lit(1000000L) >= lit(dropMicro) * col("__n"))
      .groupBy("stratum").agg(min(col("__v")).as("threshold"))
  }

  /** Per-stratum PERCENTILE of an integer score (`cume_dist` semantics:
    * the fraction of the stratum's scored rows with value ≤ this row's) —
    * the calibration step that makes raw quality scores comparable across
    * languages/sources before a global cut or a curriculum order.
    *
    * Scale shape, same family as [[quantileThresholds]]: the window runs
    * over the (stratum, score) HISTOGRAM only, never the corpus; the
    * corpus then key-joins the ranked histogram back (broadcast when it
    * fits — the usual case for micro-unit scores — AQE decides
    * otherwise). The percentile is a division of exact integers, so both
    * engines produce the identical double. Null scores — and rows whose
    * STRATUM is null — get a null percentile and never enter the
    * distribution (a null stratum can't equi-join the histogram back, so
    * counting it in would shape a distribution nobody reads).
    */
  def percentileRank(df: DataFrame, strata: Column, scoreInt: Column,
      dstCol: String = "percentile"): DataFrame = {
    for (c <- Seq("__pr_s", "__pr_v", "__pr_p", "__pr_c"))
      require(!df.columns.contains(c),
        s"percentileRank: input column '$c' collides with an internal name")
    val hist = df.select(strata.as("__pr_s"), scoreInt.cast("long").as("__pr_v"))
      .filter(col("__pr_v").isNotNull && col("__pr_s").isNotNull)
      .groupBy("__pr_s", "__pr_v").agg(count(lit(1)).as("__pr_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pr_s").orderBy("__pr_v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("__pr_s")
    val ranked = hist.withColumn("__pr_p",
        sum(col("__pr_c")).over(w).cast("double") / sum(col("__pr_c")).over(wAll))
      .select("__pr_s", "__pr_v", "__pr_p")
    df.join(ranked,
        strata === col("__pr_s") && scoreInt.cast("long") === col("__pr_v"), "left")
      .withColumn(dstCol, col("__pr_p"))
      .drop("__pr_s", "__pr_v", "__pr_p")
  }

  /** Apply [[quantileThresholds]]: keep rows whose `scoreInt` is strictly
    * above their stratum's threshold. Thresholds broadcast (one row per
    * stratum); the corpus never shuffles. A stratum absent from the
    * threshold frame (possible only if it was absent from the frame the
    * thresholds were computed over) keeps nothing — by the inner join —
    * which is the conservative reading.
    *
    * Cost note: the corpus scans TWICE (histogram, then filter) and
    * `scoreInt` is evaluated in both scans. For an expensive score
    * (model-derived quality), tag it ONCE into an attribute sidecar
    * ([[graft.llm.Attributes]]) and gate on the stored column — the
    * sidecar model exists precisely so heavyweight signals never
    * recompute per experiment.
    */
  def quantileFilter(df: DataFrame, strata: Column, scoreInt: Column,
      drop: Double): DataFrame = {
    // reserved __-prefixed names on the join side: a user frame with a
    // 'stratum' or 'threshold' column (the TOML filter runs over
    // arbitrary record schemas) must not become an ambiguous reference
    val thr = quantileThresholds(df, strata, scoreInt, drop)
      .select(col("stratum").as("__qf_stratum"), col("threshold").as("__qf_thr"))
    df.join(broadcast(thr), strata === col("__qf_stratum"))
      .filter(scoreInt.cast("long") > col("__qf_thr"))
      .drop("__qf_stratum", "__qf_thr")
  }
}
