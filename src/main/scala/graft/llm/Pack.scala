package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: place documents into fixed-size training sequences the
  * way a pretraining pipeline does — concatenate documents in a
  * deterministic order, then cut every `budget` units; a document belongs
  * to the sequence its first unit lands in (concat-then-chunk, the
  * GPT-style packing scheme).
  *
  * Scale contract: packing is per-SHARD, not global. A global running total
  * would serialize the corpus through one partition; instead the caller
  * supplies a uniform `shard` expression (hash of the id), each shard packs
  * independently with a window cumsum, and the plan is exactly one shuffle
  * (the window partition) + one per-partition sort. Real pipelines pack per
  * output shard anyway — sequences never span shard files.
  */
object Pack {

  /** At-rest carry state for cross-batch packing
    * ([[packTokensGreedyCarry]]): each batch writes its tail documents
    * to `dir/batch=<rotation>` (idempotent — a replayed micro-batch
    * overwrites its own partition), and batch N reads the NEWEST
    * partition with rotation < N, so a replay of batch N still sees
    * batch N−1's tail, never its own torn write. Schema:
    * `(__ord long, __tok array<int>, __msk array<boolean>)`.
    */
  object Carry {
    private def partitions(fs: org.apache.hadoop.fs.FileSystem,
        root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch="))
          n.stripPrefix("batch=").toLongOption.map(_ -> st.getPath)
        else None
      }

    /** The carry frame's schema, stated explicitly: a batch whose every
      * shard closed exactly at budget writes an EMPTY partition (zero
      * tail documents, possibly zero part files), and the next batch
      * must read that as "no carry" — schema INFERENCE would throw on
      * the file-less dir, and skipping to an older partition would
      * replay tails an intermediate batch already consumed.
      */
    val schema: org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__ord",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__tok",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType)),
        org.apache.spark.sql.types.StructField("__msk",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.BooleanType))))

    /** The newest carry partition strictly BEFORE `rotation`, if any. */
    def read(spark: org.apache.spark.sql.SparkSession, dir: String,
        rotation: Long): Option[DataFrame] = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      partitions(fs, root).filter(_._1 < rotation).sortBy(_._1).lastOption
        .map { case (_, p) => spark.read.schema(schema).parquet(p.toString) }
    }

    /** Write batch `rotation`'s tail documents (overwrite = idempotent). */
    def write(carry: DataFrame, dir: String, rotation: Long): Unit =
      carry.write.mode("overwrite").parquet(s"$dir/batch=$rotation")
  }

  /** Assign each row a (shard, seq_id, seq_offset): `seq_id` is the
    * `budget`-sized chunk where the row's content starts when rows are
    * concatenated within `shard` in `orderCol` order; `seq_offset` its
    * start position inside that chunk. `sizeCol` is the row's size in
    * whatever unit the budget is in (tokens, chars, bytes).
    *
    * `orderCol` MUST be unique within a shard (a doc id, a content digest):
    * packing concatenates in a total order, so ties would make the layout
    * undefined. The window uses an explicit ROWS frame, so even with ties
    * each row gets a distinct running position rather than the peer-group
    * sum — but which tied row comes first is partition-order-dependent, so
    * uniqueness is still the caller's contract.
    */
  def concatChunk(df: DataFrame, orderCol: Column, sizeCol: Column, budget: Long,
      shard: Column): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy("__shard").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__shard", shard)
      .withColumn("__start", sum(sizeCol).over(w) - sizeCol)
      .withColumn("shard", col("__shard"))
      .withColumn("seq_id", floor(col("__start") / budget))
      .withColumn("seq_offset", col("__start") % budget)
      .drop("__shard", "__start")
  }

  /** Packing-efficiency report over MATERIALIZED training rows (the
    * [[packTokens]] / [[packTokensGreedy]] output contract): per shard —
    * sequences, real tokens, pad tokens, and the pad fraction in integer
    * BASIS POINTS (floor; integer sufficient statistics stay exact
    * cross-engine — the q_simhash_recall lesson). This is the number a
    * pipeline checks BEFORE a training run: pad waste is paid in
    * accelerator hours, and a bad shard hash or a budget mismatched to
    * the document length distribution shows up here first.
    *
    * One map-side-combined aggregate on the packed rows — never touches
    * the token arrays (`n_real` already carries the fill).
    */
  def packingStats(packed: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    packed.groupBy("shard")
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("n_real").cast("long")).as("n_tokens"))
      .select(col("shard"), col("n_seqs"),
        col("n_tokens"),
        (col("n_seqs") * budget - col("n_tokens")).as("n_pad"),
        // INTEGER division (Spark's `div` = IntegralDivide), not
        // floor(double/double): past ~2⁴⁰ slots a non-integer double
        // quotient can round UP across the floor boundary and diverge by
        // 1 bp from an integer-arithmetic restatement — integer
        // sufficient statistics stay exact at any scale
        call_function("div",
          (col("n_seqs") * budget - col("n_tokens")) * 10000L,
          col("n_seqs") * budget).as("pad_frac_bp"))
  }

  /** NO-SPLIT packing (SFT-style): documents are never cut. In `orderCol`
    * order within each shard, a document joins the current sequence when
    * it fits (`fill + size <= budget`) and otherwise OPENS a new one; a
    * document larger than the budget gets a sequence of its own (callers
    * that can't tolerate overflow filter or truncate first — silently
    * dropping data is not this function's call to make). Output adds
    * (`shard`, `seq_id`, `seq_offset`) like [[concatChunk]]; sequences
    * number consecutively from 0 per shard.
    *
    * Why `mapPartitions` (the §7.2 last resort, justified here): the
    * greedy fill is a sequential recurrence whose RESET depends on the
    * running value — `seq` opens exactly when the accumulated fill would
    * overflow — which no window algebra expresses (a window cumsum has no
    * data-dependent reset). The plan is still scale-correct: one exchange
    * (hash by shard), an in-partition sort, then a STREAMING single-pass
    * walk with O(1) state per shard — the same shape every per-shard
    * window query compiles to, minus the window buffer.
    *
    * Same uniqueness contract on `orderCol` as [[concatChunk]].
    */
  def packGreedy(df: DataFrame, orderCol: Column, sizeCol: Column,
      budget: Long, shard: Column): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val tagged = df.withColumn("__shard", shard)
      .withColumn("__size", sizeCol.cast("long"))
    val parted = tagged.repartition(col("__shard"))
      .sortWithinPartitions(col("__shard"), orderCol)
    val schema = parted.schema
    val shardIdx = schema.fieldIndex("__shard")
    val sizeIdx = schema.fieldIndex("__size")
    val outSchema = org.apache.spark.sql.types.StructType(schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("seq_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("seq_offset",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val packed = parted.mapPartitions { it =>
      // partitions hold whole shards (hash partitioning), sorted by
      // (shard, order): reset the running state at each shard boundary
      var cur: Any = null
      var fill = 0L
      var seq = -1L
      it.map { r =>
        val sh = r.get(shardIdx)
        val sz = r.getLong(sizeIdx)
        if (sh != cur) { cur = sh; fill = 0L; seq = -1L }
        if (seq < 0 || fill + sz > budget) { seq += 1; fill = 0L }
        val off = fill
        fill += sz
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(seq, off))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    packed.withColumnRenamed("__shard", "shard").drop("__size")
  }

  /** MATERIALIZE the packed training sequences: concatenate each shard's
    * per-document token arrays in `orderCol` order, cut every `budget`
    * tokens (documents split across cuts — GPT-style concat-then-chunk,
    * the same layout [[concatChunk]] assigns), and emit one row per
    * sequence:
    *
    *   - `input_ids`  — exactly `budget` ints, the tail of the shard's
    *     last sequence padded with `padId`
    *   - `segment_ids` — per position, the 0-based ordinal of the
    *     document within THIS sequence (resets each sequence — exactly
    *     what an attention mask needs to stop cross-document attention);
    *     pad positions get −1
    *   - `loss_mask`  — per position, the document's aligned `maskCol`
    *     boolean carried through the cut (e.g.
    *     [[graft.functions.TextFunctions.spanOverlapMask]] over PII spans,
    *     negated by the caller if overlap means "exclude"); pad positions
    *     get false
    *   - `n_real`     — how many positions are content, = `budget`
    *     everywhere but each shard's final sequence
    *   - `doc_start`  — whether the sequence's FIRST token begins a
    *     document (false when the sequence continues a document the cut
    *     split): the bit [[graft.sources.PackedCorpus.write]] needs to
    *     emit a REAL Megatron document index, so trainer-side
    *     document-level shuffling groups sequences without splitting one
    *
    * Scale contract: ONE exchange. The start-position window partitions
    * by `shard`, and the per-sequence assembly groups by
    * (`shard`, `seq_id`) — a superset of the window's partitioning, so
    * Catalyst reuses the exchange (hash-partitioning on `shard` already
    * co-locates every (shard, seq_id) group; PlanShapeSpec pins the
    * single-exchange plan). Documents explode into at most
    * ⌈len/budget⌉ + 1 per-sequence pieces, so no row ever exceeds
    * ~2 × budget tokens and the assembled sequence is exactly budget —
    * executor memory is bounded regardless of document length.
    *
    * `orderCol` MUST be unique within a shard (same contract and reason
    * as [[concatChunk]]). Empty/null token arrays contribute nothing.
    * `maskCol` must be the same length as `tokensCol` per row (a
    * mismatched tagger output fails loudly at assembly).
    *
    * Special tokens — without them a packed corpus cannot teach a model
    * where documents END, so every GPT-style pipeline inserts them before
    * concat-chunk:
    *  - `eosId`: appended to each non-empty document's tokens, TRAINED ON
    *    (`loss_mask` = true — predicting end-of-document is the point);
    *  - `bosId`: prepended, input-only (`loss_mask` = false — a sequence-
    *    start marker is never a useful target).
    * Both carry the document's `segment_ids` ordinal and flow through the
    * cut arithmetic like content (an EOS can land first in the next
    * sequence — correct: the layout is a pure function of the extended
    * arrays). Empty/null documents get NO special tokens (they contribute
    * nothing, same as before).
    */
  def packTokens(df: DataFrame, orderCol: Column, tokensCol: Column,
      maskCol: Column, budget: Int, shard: Column, padId: Int = 0,
      eosId: Option[Int] = None, bosId: Option[Int] = None): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy("__shard").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the window's shard exchange, taken EARLY and explicitly: for a real
    // tokenizer the token column is the expensive part, and every
    // reference the optimizer can reach re-evaluates it — an empty-doc
    // FILTER here pushed `size(<tokenizer chain>) > 0` all the way into
    // the parquet scan's data filters, and the mask column carried a
    // second inlined copy (measured: the native BPE chain appeared at 3
    // evaluation sites, q_pack_ids 3.8 s at sf0.1 → 1.5 s after this
    // restructure). An exchange is a MATERIALIZATION point: tokens are
    // computed once below it; the mask and length derive from exchanged
    // DATA above it; the empty-doc drop becomes an explode-empty guard
    // (nothing for a predicate to push); and the window reuses this very
    // partitioning, so the plan still holds exactly ONE exchange.
    // special-token extension: applied to the RAW (guarded) arrays below
    // the exchange, so EOS/BOS flow through the cut arithmetic as content
    def extendToks(t: Column): Column = {
      val withEos = eosId.map(e =>
        concat(t, array(lit(e)))).getOrElse(t)
      bosId.map(b => concat(array(lit(b)), withEos)).getOrElse(withEos)
    }
    def extendMask(m: Column): Column = {
      val withEos = eosId.map(_ =>
        concat(m, array(lit(true)))).getOrElse(m)
      bosId.map(_ => concat(array(lit(false)), withEos)).getOrElse(withEos)
    }
    val base = df
      .withColumn("__shard", shard)
      .withColumn("__rawtok", tokensCol)
      .repartition(col("__shard"))
      .withColumn("__rawlen", size(col("__rawtok")).cast("long"))
      // loud PER-ROW alignment guard, below the exchange (so the
      // tokenizer chain still evaluates at exactly one site): the
      // assembly-time check further down only catches masks SHORTER than
      // the tokens — slice bounds derive from __len, so a LONGER mask
      // slices into pieces of exactly the token piece lengths and the
      // surplus entries would silently drop. Null tokens (empty docs)
      // pass; a null mask against real tokens is a violation too.
      .withColumn("__rawmsk", when(col("__rawlen").isNull ||
          size(maskCol) === col("__rawlen"), maskCol)
        .otherwise(raise_error(concat(
          lit("packTokens: mask/tokens length mismatch ("),
          size(maskCol).cast("string"), lit(" vs "),
          col("__rawlen").cast("string"), lit(")")))))
      // EOS/BOS attach only to non-empty documents (empty rows contribute
      // nothing, special tokens included)
      .withColumn("__tok", when(col("__rawlen") > 0,
        extendToks(col("__rawtok"))).otherwise(col("__rawtok")))
      .withColumn("__msk", when(col("__rawlen") > 0,
        extendMask(col("__rawmsk"))).otherwise(col("__rawmsk")))
      .withColumn("__len", size(col("__tok")).cast("long"))
      .withColumn("__start", sum(col("__len")).over(w) - col("__len"))
    // each doc → one piece per sequence it touches; all slicing is local
    // arithmetic on the row, nothing global
    val b = lit(budget.toLong)
    val pieces = base.select(col("__shard").as("shard"),
        col("__start"), col("__tok"), col("__msk"), col("__len"),
        // empty documents explode to zero pieces (sequence(x, x-1) would
        // throw); they already contributed 0 to every cumulative start
        explode(when(col("__len") > 0, sequence(floor(col("__start") / b),
            floor((col("__start") + col("__len") - 1) / b)))
          .otherwise(array().cast("array<long>"))).as("seq_id"))
      .withColumn("__from", greatest(col("seq_id") * b - col("__start"), lit(0L)))
      .withColumn("__to",
        least((col("seq_id") + 1) * b - col("__start"), col("__len")))
      .withColumn("__off", greatest(col("__start") - col("seq_id") * b, lit(0L)))
      .select(col("shard"), col("seq_id"), col("__off"),
        slice(col("__tok"), (col("__from") + 1).cast("int"),
          (col("__to") - col("__from")).cast("int")).as("ptok"),
        slice(col("__msk"), (col("__from") + 1).cast("int"),
          (col("__to") - col("__from")).cast("int")).as("pmsk"),
        // the piece that includes its document's FIRST token — on the
        // off=0 piece this is the sequence-level doc_start flag
        (col("__from") === 0).as("pstart"))
    // assemble: pieces of a sequence sorted by offset tile it exactly
    val assembled = pieces.groupBy("shard", "seq_id")
      .agg(sort_array(collect_list(struct(col("__off"), col("ptok"),
        col("pmsk"), col("pstart")))).as("ps"))
    val ids = flatten(transform(col("ps"), p => p.getField("ptok")))
    val msk = flatten(transform(col("ps"), p => {
      val t = p.getField("ptok")
      val m = p.getField("pmsk")
      // loud alignment check: a tagger that emitted a mask of the wrong
      // length would silently shift every downstream position otherwise
      when(size(m) === size(t), m).otherwise(raise_error(concat(
        lit("packTokens: mask/tokens length mismatch in sequence "),
        col("seq_id").cast("string"))))
    }))
    val seg = flatten(transform(col("ps"),
      (p, i) => array_repeat(i.cast("int"), size(p.getField("ptok")))))
    val nReal = size(ids)
    val nPad = (lit(budget) - nReal).cast("int")
    assembled.select(col("shard"), col("seq_id"),
      concat(ids, array_repeat(lit(padId), nPad)).as("input_ids"),
      concat(seg, array_repeat(lit(-1), nPad)).as("segment_ids"),
      concat(msk, array_repeat(lit(false), nPad)).as("loss_mask"),
      nReal.cast("int").as("n_real"),
      // does the sequence's FIRST token begin a document? (the off=0
      // piece carries its doc's first token) — the bit the trainer-shard
      // document index needs: sequences between doc_start marks tile
      // whole documents, so document-level shuffling never splits one
      element_at(col("ps"), 1).getField("pstart").as("doc_start"))
  }

  /** MATERIALIZE the no-split greedy layout ([[packGreedy]]'s assignment,
    * [[packTokens]]'s output): fixed-length `input_ids` / `segment_ids` /
    * `loss_mask` rows where documents are NEVER cut — the SFT-style
    * packing (each example must stay whole for its prompt/response
    * structure to survive), completing the raw-text→training-rows story
    * for instruction-tuning pipelines the concat-then-chunk form covers
    * for pretraining. Column semantics match [[packTokens]] exactly
    * (`segment_ids` = 0-based doc ordinal within the sequence, pad = −1;
    * `loss_mask` pad = false; `n_real` ≤ `budget`).
    *
    * A document longer than `budget` CANNOT be materialized whole into a
    * `budget`-length row, so it fails loudly — filter or truncate first
    * (the assignment-only [[packGreedy]] gives such a document an
    * overflow sequence of its own instead, for callers that only need the
    * layout). Empty/null token arrays contribute nothing, like
    * [[packTokens]]; a null or misaligned mask against real tokens fails
    * loudly, same contract as [[packTokens]]'s per-row guard.
    *
    * Scale shape (the same one-exchange contract as [[packTokens]], minus
    * even the window buffer): ONE hash exchange on `shard`, an
    * in-partition sort by (`shard`, `orderCol`), then a single STREAMING
    * pass assembling each sequence with O(`budget`) task state — the
    * greedy fill is a sequential recurrence with a data-dependent reset
    * (a sequence opens exactly when the accumulated fill would overflow),
    * which no window algebra expresses, so this is the §7.2-justified
    * `mapPartitions` next to [[packGreedy]]'s. Tokens and masks are
    * materialized by the exchange, so the tokenizer chain evaluates at
    * exactly one site (the q_pack_ids evaluation-sites lesson).
    *
    * `sepId` (SFT turn separator): written BETWEEN consecutive documents
    * of a sequence — never before the first or after the last — costing
    * one budget slot per boundary, which the fits-test accounts for. The
    * separator terminates the turn it follows: it carries the PRECEDING
    * document's `segment_ids` ordinal and `loss_mask` = false (template
    * glue, not a training target — callers whose recipe trains on the
    * separator flip the mask downstream with `input_ids`'s positions).
    *
    * `eosId`/`bosId` carry [[packTokens]]'s exact semantics onto the
    * no-split path: EOS appends to each non-empty document and is
    * TRAINED ON (`loss_mask` = true), BOS prepends input-only
    * (`loss_mask` = false); both take the document's `segment_ids`
    * ordinal and count against the budget in the fits-test (they extend
    * the token arrays BEFORE packing). Empty/null documents get no
    * special tokens — they contribute nothing, as before.
    */
  /** [[packTokensGreedy]] with an EXPLICIT tail: instead of emitting each
    * shard's final (underfilled, still-open) sequence, the documents that
    * would have formed it come back as CARRY rows — the cross-batch
    * packing state a daemon checkpoints, so per-micro-batch pad waste
    * stops depending on trigger sizing entirely (only CLOSED sequences
    * ship; the open tail rides to the next batch).
    *
    * Output is a UNION frame discriminated by `kind`:
    *  - `"seq"` rows: exactly [[packTokensGreedy]]'s closed sequences
    *    (`shard, seq_id, input_ids, segment_ids, loss_mask, n_real,
    *    doc_start`); `ord` is null;
    *  - `"carry"` rows: one per tail document, carrying its RAW
    *    (pre-BOS/EOS) tokens in `input_ids`, its raw mask in
    *    `loss_mask`, and its order value in `ord` (LONG — the carry
    *    surface requires a numeric order); `seq_id` −1, `segment_ids`
    *    null. Re-packing `carry ∪ next-batch` continues the greedy walk:
    *    when order values ascend across batches, the closed sequences
    *    across all batches plus one final tail EQUAL the one-shot
    *    [[packTokensGreedy]] layout (PackCarrySpec pins the law).
    *
    * Same contracts as [[packTokensGreedy]] (orderCol unique per shard;
    * oversized documents loud; empty documents contribute nothing; one
    * exchange + in-partition sort + streaming walk). BOS/EOS extension
    * happens INSIDE the walk so carried documents stash raw tokens and
    * are never double-extended on re-entry.
    */
  def packTokensGreedyCarry(df: DataFrame, orderCol: Column,
      tokensCol: Column, maskCol: Column, budget: Int, shard: Column,
      padId: Int = 0, sepId: Option[Int] = None, eosId: Option[Int] = None,
      bosId: Option[Int] = None): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.types._
    val tagged = df.select(shard.as("__shard"),
      orderCol.cast("long").as("__ord"),
      tokensCol.cast("array<int>").as("__tok"),
      maskCol.cast("array<boolean>").as("__msk"))
    val parted = tagged.repartition(col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__ord"))
    val outSchema = StructType(Seq(
      parted.schema("__shard").copy(name = "shard"),
      StructField("kind", StringType, nullable = false),
      StructField("seq_id", LongType, nullable = false),
      StructField("input_ids", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("segment_ids", ArrayType(IntegerType, containsNull = false),
        nullable = true),
      StructField("loss_mask", ArrayType(BooleanType, containsNull = false),
        nullable = false),
      StructField("n_real", IntegerType, nullable = false),
      StructField("doc_start", BooleanType, nullable = false),
      StructField("ord", LongType, nullable = true)))
    val extCost = bosId.size + eosId.size
    parted.mapPartitions { raw =>
      val it = raw.filter(r => !r.isNullAt(2) && r.getSeq[Int](2).nonEmpty)
        .buffered
      new scala.collection.AbstractIterator[org.apache.spark.sql.Row] {
        private val out = scala.collection.mutable.Queue
          .empty[org.apache.spark.sql.Row]
        private var curShard: Any = null
        private var started = false
        private var seqId = -1L
        // the OPEN sequence's documents: (ord, raw tokens, raw mask)
        private val buf = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Seq[Int], Seq[Boolean])]
        private var fill = 0

        private def flushSeq(): Unit = {
          seqId += 1
          val ids = Array.fill(budget)(padId)
          val segs = Array.fill(budget)(-1)
          val mask = new Array[Boolean](budget)
          var f = 0
          var docIx = 0
          for ((_, toks, msk) <- buf) {
            if (sepId.isDefined && docIx > 0) {
              ids(f) = sepId.get; segs(f) = docIx - 1; mask(f) = false
              f += 1
            }
            for (b <- bosId) {
              ids(f) = b; segs(f) = docIx; mask(f) = false; f += 1
            }
            var i = 0
            while (i < toks.length) {
              ids(f + i) = toks(i); segs(f + i) = docIx; mask(f + i) = msk(i)
              i += 1
            }
            f += toks.length
            for (e <- eosId) {
              ids(f) = e; segs(f) = docIx; mask(f) = true; f += 1
            }
            docIx += 1
          }
          out += org.apache.spark.sql.Row(curShard, "seq", seqId,
            ids.toSeq, segs.toSeq, mask.toSeq, f, true, null)
          buf.clear(); fill = 0
        }

        private def flushCarry(): Unit = {
          for ((ord, toks, msk) <- buf)
            out += org.apache.spark.sql.Row(curShard, "carry", -1L,
              toks, null, msk, toks.length, true, ord)
          buf.clear(); fill = 0
        }

        private def advance(): Unit = {
          while (out.isEmpty && it.hasNext) {
            val r = it.head
            val sh = r.get(0)
            if (!started) { started = true; curShard = sh }
            if (sh != curShard) {
              // shard boundary: its open tail carries, never pads
              flushCarry(); curShard = sh; seqId = -1L
            } else {
              val toks = r.getSeq[Int](2)
              if (toks.length + extCost > budget)
                throw new IllegalArgumentException(
                  s"packTokensGreedyCarry: document of ${toks.length} tokens " +
                    s"(+$extCost special) exceeds the $budget budget and can " +
                    "never be packed whole - filter or truncate first")
              val sepCost = if (sepId.isDefined && buf.nonEmpty) 1 else 0
              if (fill + sepCost + toks.length + extCost > budget) flushSeq()
              else {
                val msk = if (r.isNullAt(3)) null else r.getSeq[Boolean](3)
                require(msk != null && msk.length == toks.length,
                  s"packTokensGreedyCarry: mask/tokens length mismatch (" +
                    s"${if (msk == null) "null" else msk.length} vs " +
                    s"${toks.length})")
                buf += ((r.getLong(1), toks, msk))
                fill += sepCost + toks.length + extCost
                it.next()
              }
            }
          }
          if (out.isEmpty && !it.hasNext && buf.nonEmpty) flushCarry()
        }

        override def hasNext: Boolean = { advance(); out.nonEmpty }
        override def next(): org.apache.spark.sql.Row = {
          advance(); out.dequeue()
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  def packTokensGreedy(df: DataFrame, orderCol: Column, tokensCol: Column,
      maskCol: Column, budget: Int, shard: Column, padId: Int = 0,
      sepId: Option[Int] = None, eosId: Option[Int] = None,
      bosId: Option[Int] = None): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.types._
    val rawTok = tokensCol.cast("array<int>")
    val rawMsk = maskCol.cast("array<boolean>")
    def extT(t: Column): Column = {
      val withEos = eosId.map(e => concat(t, array(lit(e)))).getOrElse(t)
      bosId.map(b => concat(array(lit(b)), withEos)).getOrElse(withEos)
    }
    def extM(m: Column): Column = {
      val withEos = eosId.map(_ => concat(m, array(lit(true)))).getOrElse(m)
      bosId.map(_ => concat(array(lit(false)), withEos)).getOrElse(withEos)
    }
    // extension only on non-empty docs; a null/misaligned mask stays
    // null/misaligned (concat propagates null), so the per-row guard in
    // the packing walk still fires exactly as without special tokens
    val tagged = df.select(shard.as("__shard"), orderCol.as("__ord"),
      when(size(rawTok) > 0, extT(rawTok)).otherwise(rawTok).as("__tok"),
      when(size(rawTok) > 0, extM(rawMsk)).otherwise(rawMsk).as("__msk"))
    val parted = tagged.repartition(col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__ord"))
    val outSchema = StructType(Seq(
      parted.schema("__shard").copy(name = "shard"),
      StructField("seq_id", LongType, nullable = false),
      StructField("input_ids", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("segment_ids", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("loss_mask", ArrayType(BooleanType, containsNull = false),
        nullable = false),
      StructField("n_real", IntegerType, nullable = false),
      // no-split packing never cuts a document: every sequence starts one
      StructField("doc_start", BooleanType, nullable = false)))
    parted.mapPartitions { raw =>
      // skip empty docs IN-FLIGHT (a plan-level filter would hand the
      // optimizer a predicate to push below the exchange and duplicate
      // the tokenizer evaluation — the packTokens trap)
      val it = raw.filter(r => !r.isNullAt(2) && r.getSeq[Int](2).nonEmpty).buffered
      new scala.collection.AbstractIterator[org.apache.spark.sql.Row] {
        private var curShard: Any = null
        private var started = false
        private var seqId = -1L
        override def hasNext: Boolean = it.hasNext
        override def next(): org.apache.spark.sql.Row = {
          val sh = it.head.get(0)
          if (!started || sh != curShard) { curShard = sh; started = true; seqId = -1L }
          seqId += 1
          val ids = Array.fill(budget)(padId)
          val segs = Array.fill(budget)(-1)
          val mask = new Array[Boolean](budget)
          var fill = 0
          var docIx = 0
          var open = true
          while (open && it.hasNext && it.head.get(0) == curShard) {
            val r = it.head
            val toks = r.getSeq[Int](2)
            if (toks.length > budget) throw new IllegalArgumentException(
              s"packTokensGreedy: document of ${toks.length} tokens exceeds " +
                s"the $budget budget and can never be packed whole - filter " +
                "or truncate first (or use packGreedy for assignment only)")
            // a follow-up document also pays for its turn separator
            val sepCost = if (sepId.isDefined && docIx > 0) 1 else 0
            if (fill + sepCost + toks.length > budget) open = false
            else {
              val msk = if (r.isNullAt(3)) null else r.getSeq[Boolean](3)
              require(msk != null && msk.length == toks.length,
                s"packTokensGreedy: mask/tokens length mismatch (" +
                  s"${if (msk == null) "null" else msk.length} vs ${toks.length})")
              if (sepCost == 1) {
                // terminates the PRECEDING turn: its segment, no loss
                ids(fill) = sepId.get
                segs(fill) = docIx - 1
                mask(fill) = false
                fill += 1
              }
              var i = 0
              while (i < toks.length) {
                ids(fill + i) = toks(i)
                segs(fill + i) = docIx
                mask(fill + i) = msk(i)
                i += 1
              }
              fill += toks.length
              docIx += 1
              it.next()
            }
          }
          org.apache.spark.sql.Row(curShard, seqId, ids.toSeq, segs.toSeq,
            mask.toSeq, fill, true)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
