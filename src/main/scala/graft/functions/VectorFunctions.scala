package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>`/`array<double>` columns.
  *
  * Two tiers:
  *  - pure Column expressions (`dot`/`norm`/`cosine`/`l2Distance`) built on
  *    zip_with/aggregate — portable, but Spark evaluates higher-order-
  *    function lambdas INTERPRETED (never codegen), measured ~1µs per
  *    element op;
  *  - `dotFast`/`cosineFast` — the native [[ArrayDot]] Catalyst expression
  *    (doGenCode primitive loop, fused into whole-stage codegen) — and
  *    `hyperplaneSignature`, a tight-loop JVM UDF carrying its plane matrix
  *    in the closure. Both are orders faster per row than the HOF tier.
  *    (A statically-unrolled element_at expression tree was tried and is
  *    WORSE than either: 512-node trees fall out of whole-stage codegen
  *    and stall the optimizer.)
  *
  * All math is promoted to double with left-to-right summation, so both
  * tiers produce bit-identical results.
  */
object VectorFunctions {

  private def d(v: Column): Column = transform(v, x => x.cast("double"))
  private def dArr(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Codegen'd dot product — the native [[ArrayDot]] Catalyst expression
    * (doGenCode while-loop over ArrayData: no boxing, no Seq conversion,
    * fused into whole-stage codegen). Null input → null.
    */
  def dotFast(a: Column, b: Column): Column = ArrayDot(a, b)

  /** Codegen'd cosine similarity; bit-identical to [[cosine]]. */
  def cosineFast(a: Column, b: Column): Column =
    ArrayDot(a, b) / (sqrt(ArrayDot(a, a)) * sqrt(ArrayDot(b, b)))

  /** Random-hyperplane (SimHash) LSH signatures of a vector, one per seed:
    * `nBits` sign bits packed into a long each, returned as `array<long>`.
    * Native [[HyperplaneSigs]] Catalyst expression — one codegen'd pass
    * over the vector computes every seed's signature; hyperplanes are
    * pseudo-random but fully deterministic (splitmix64 of the seed),
    * identical on every executor with no broadcast state needed.
    */
  def hyperplaneSignatures(v: Column, dim: Int, nBits: Int, seeds: Seq[Long]): Column =
    HyperplaneSigs(v, dim, nBits, seeds)

  /** Single-seed convenience over [[hyperplaneSignatures]]. */
  def hyperplaneSignature(v: Column, dim: Int, nBits: Int = 16, seed: Long = 42L): Column =
    element_at(hyperplaneSignatures(v, dim, nBits, Seq(seed)), 1)
}
