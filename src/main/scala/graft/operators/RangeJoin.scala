package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — `left.ts ∈ [right.start, right.end)`
  * with equi keys — without the cartesian blowup Spark's optimizer
  * produces for raw inequality joins.
  *
  * Bucketize: each right interval explodes into the fixed-width time
  * buckets it overlaps, each left point maps to exactly one bucket, and
  * the join becomes an equi-join on (key, bucket) plus an exact residual
  * filter. Join output per bucket is |left∩bucket| × |right∩bucket| — the
  * quadratic term is bounded by the bucket width, chosen to match the
  * typical interval length (a right interval spanning B buckets costs B
  * exploded rows, so width ≈ median interval keeps the factor ~2). The
  * only shuffle is the (key, bucket) hash exchange, uniform by
  * construction and AQE-splittable; at 100 TB neither side ever
  * broadcasts or expands by more than the overlap factor.
  */
object RangeJoin {

  /** @param left        point side (any columns + `tsCol`)
    * @param right       interval side ([startCol, endCol) + payload)
    * @param keyCols     equi-key column names present in both
    * @param tsCol       left's point column (timestamp or numeric)
    * @param startCol    right's inclusive lower bound (same type)
    * @param endCol      right's exclusive upper bound (same type)
    * @param bucketWidthMicros bucket width in microseconds for timestamp
    *                    columns (or raw units for numerics)
    */
  private def toUnits(c: Column, df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case _: org.apache.spark.sql.types.TimestampType => unix_micros(c)
      // TIMESTAMP_NTZ (what parquet timestamp[us] without a timezone
      // reads as) can't cast to long directly; route through TIMESTAMP.
      // The session-tz reinterpretation is applied identically to the
      // point and both interval bounds, and the residual filter compares
      // the ORIGINAL columns, so bucket assignment stays consistent.
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
      case _ => c.cast("long")
    }

  // exact integral floor division — `floor(col / w)` (and `/` itself)
  // evaluates through DOUBLE and misassigns buckets beyond 2^53 (e.g.
  // epoch nanoseconds), silently losing matches at bucket boundaries.
  // Subtract pmod first (x − pmod(x, w) is an exact multiple of w, and
  // pmod keeps the floor semantics for negative x), then integral `div`
  private def fdivW(w: Long)(x: Column): Column =
    call_function("div", x - pmod(x, lit(w)), lit(w))

  def pointInInterval(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      bucketWidthMicros: Long = 86400000000L): DataFrame = {
    val w = bucketWidthMicros
    def fdiv(x: Column): Column = fdivW(w)(x)
    val lb = left.withColumn("__bkt", fdiv(toUnits(col(tsCol), left, tsCol)))
    // right interval [s, e): buckets fdiv(s)..fdiv(e) — through fdiv(e),
    // not fdiv(e−1): one spurious residual-rejected bucket for integral
    // units, but fractional numeric bounds truncate through cast('long')
    // and the tail fraction may cross a bucket boundary the truncated
    // end−1 coverage would miss (the residual compares ORIGINAL columns,
    // so coverage is the only place truncation could lose a match). Also
    // keeps an empty interval (e == s) from exploding a descending
    // sequence.
    val rs = toUnits(col(startCol), right, startCol)
    val re = toUnits(col(endCol), right, endCol)
    val rb = right.withColumn("__bkt",
      explode(sequence(fdiv(rs), fdiv(re))))
    lb.join(rb, keyCols.map(k => lb(k) === rb(k))
        .reduce(_ && _) && lb("__bkt") === rb("__bkt") &&
        lb(tsCol) >= rb(startCol) && lb(tsCol) < rb(endCol))
      .select(lb("*") +: right.columns.toIndexedSeq.filterNot(keyCols.contains).map(rb(_)): _*)
      .drop("__bkt")
  }

  /** Interval-OVERLAP join: every (left, right) pair sharing the equi keys
    * whose half-open intervals intersect (`lStart < rEnd && rStart < lEnd`)
    * — session-vs-session, campaign-vs-outage, any two interval sets.
    *
    * Same bucketization as [[pointInInterval]], applied to BOTH sides: each
    * interval explodes into its overlapped fixed-width buckets and the join
    * equi-matches on (key, bucket). A pair of long intervals shares MANY
    * buckets; it is emitted exactly once because only the FIRST shared
    * bucket — the one containing `max(lStart, rStart)`, which any
    * overlapping pair is guaranteed to co-occupy — accepts the pair. No
    * post-join `distinct` is ever needed, so the output stays a streamed
    * join, not an extra exchange.
    *
    * Empty intervals (end ≤ start) match nothing and are dropped up front
    * (they would otherwise explode a DESCENDING bucket sequence). Non-key
    * column names must be disjoint across the two inputs.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      lStartCol: String, lEndCol: String, rStartCol: String, rEndCol: String,
      bucketWidthMicros: Long = 86400000000L): DataFrame = {
    val dup = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    require(dup.isEmpty, s"intervalOverlap: non-key columns collide: $dup")
    val w = bucketWidthMicros
    def fdiv(x: Column): Column = fdivW(w)(x)
    // bucket coverage runs through fdiv(end), not fdiv(end − 1): for
    // integral units that adds one spurious bucket per interval (the
    // residual rejects it), but for FRACTIONAL numeric bounds — which
    // cast('long') truncates — the tail fraction may cross into the next
    // bucket, and the truncated end-1 coverage would silently miss pairs
    // overlapping only there. The residual itself compares the ORIGINAL
    // columns (same contract as pointInInterval), so truncation can only
    // cost an extra candidate row, never a match.
    val lb = left
      .filter(col(lEndCol) > col(lStartCol))
      .withColumn("__ls", toUnits(col(lStartCol), left, lStartCol))
      .withColumn("__le", toUnits(col(lEndCol), left, lEndCol))
      .withColumn("__bkt", explode(sequence(fdiv(col("__ls")), fdiv(col("__le")))))
    val rb = right
      .filter(col(rEndCol) > col(rStartCol))
      .withColumn("__rs", toUnits(col(rStartCol), right, rStartCol))
      .withColumn("__re", toUnits(col(rEndCol), right, rEndCol))
      .withColumn("__bkt", explode(sequence(fdiv(col("__rs")), fdiv(col("__re")))))
    lb.join(rb, keyCols.map(k => lb(k) === rb(k)).reduce(_ && _) &&
        lb("__bkt") === rb("__bkt") &&
        lb(lStartCol) < rb(rEndCol) && rb(rStartCol) < lb(lEndCol) &&
        fdiv(greatest(lb("__ls"), rb("__rs"))) === lb("__bkt"))
      .select(left.columns.toIndexedSeq.map(lb(_)) ++
        right.columns.toIndexedSeq.filterNot(keyCols.contains).map(rb(_)): _*)
  }
}
