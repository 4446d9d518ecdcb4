package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.AffineQuantize

/** Scalar (per-dimension affine) int8 embedding quantization — the simple
  * 4× compression next to [[Pq]]'s 32×: each dimension maps linearly from
  * its corpus [min, max] range onto [−127, 127]. Dot products and cosines
  * over the codes approximate the originals well enough for candidate
  * generation, and reconstruction error is bounded by half a step per
  * dimension.
  *
  * Scale shape (the 100 TB contract):
  *  - the range scan is ONE aggregate of `2·dim` min/max expressions —
  *    map-side combined, a single driver row regardless of corpus size
  *    (no explode: a posexplode+groupBy would shuffle |corpus|·dim rows
  *    to produce the same 128 numbers);
  *  - encode is one map-only codegen'd scan ([[AffineQuantize]] — the
  *    range tables ride in the generated code);
  *  - driver state: the `2·dim` range doubles.
  */
object Quantize {

  /** Per-dimension (min, max) over vectors of exactly `dim` elements. */
  def int8Stats(df: DataFrame, vecCol: String, dim: Int): (Array[Double], Array[Double]) = {
    val v = df.select(col(vecCol).cast("array<double>").as("__v"))
      .filter(size(col("__v")) === dim)
    val aggs = (0 until dim).flatMap(i => Seq(
      min(element_at(col("__v"), i + 1)).as(s"mn$i"),
      max(element_at(col("__v"), i + 1)).as(s"mx$i")))
    val r = v.agg(aggs.head, aggs.tail: _*).collect()(0)
    // min/max over zero rows aggregate to null — fail loud instead of an
    // opaque NPE three frames deeper
    require(!r.isNullAt(0),
      s"int8Stats: empty corpus — no non-null vectors of dim $dim in '$vecCol'")
    val mins = Array.tabulate(dim)(i => r.getDouble(2 * i))
    val maxs = Array.tabulate(dim)(i => r.getDouble(2 * i + 1))
    (mins, maxs)
  }

  /** The compressed corpus: (idCol, int8_codes array<int>). Map-only. */
  def int8Encode(df: DataFrame, idCol: String, vecCol: String,
      mins: Array[Double], maxs: Array[Double]): DataFrame =
    df.select(col(idCol), AffineQuantize(col(vecCol), mins, maxs).as("int8_codes"))

  /** Dequantized approximation of a code array (Column-level, for error
    * analysis and approximate scoring): `x̂_i = min_i + (code_i + 127) ·
    * (max_i − min_i) / 254`.
    */
  def int8Reconstruct(codes: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val minsLit = array(mins.map(lit): _*)
    val stepsLit = array(mins.indices.map(i => lit((maxs(i) - mins(i)) / 254.0)): _*)
    zip_with(codes, sequence(lit(0), lit(mins.length - 1)),
      (c, i) => element_at(minsLit, i + 1) +
        (c.cast("double") + 127.0) * element_at(stepsLit, i + 1))
  }
}
