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
  def pointInInterval(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      bucketWidthMicros: Long = 86400000000L): DataFrame = {
    def toUnits(c: Column, df: DataFrame, name: String): Column =
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
    val w = bucketWidthMicros
    // exact integral floor division — `floor(col / w)` (and `/` itself)
    // evaluates through DOUBLE and misassigns buckets beyond 2^53 (e.g.
    // epoch nanoseconds), silently losing matches at bucket boundaries.
    // Subtract pmod first (x − pmod(x, w) is an exact multiple of w, and
    // pmod keeps the floor semantics for negative x), then integral `div`
    def fdiv(x: Column): Column =
      call_function("div", x - pmod(x, lit(w)), lit(w))
    val lb = left.withColumn("__bkt", fdiv(toUnits(col(tsCol), left, tsCol)))
    // right interval [s, e): overlapped buckets fdiv(s)..fdiv(e-1)
    val rs = toUnits(col(startCol), right, startCol)
    val re = toUnits(col(endCol), right, endCol)
    val rb = right.withColumn("__bkt",
      explode(sequence(fdiv(rs), fdiv(re - 1))))
    lb.join(rb, keyCols.map(k => lb(k) === rb(k))
        .reduce(_ && _) && lb("__bkt") === rb("__bkt") &&
        lb(tsCol) >= rb(startCol) && lb(tsCol) < rb(endCol))
      .select(lb("*") +: right.columns.toIndexedSeq.filterNot(keyCols.contains).map(rb(_)): _*)
      .drop("__bkt")
  }
}
