package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>`/`array<double>` columns as pure
  * Column expressions (zip_with/aggregate — codegen'd, no UDF). All math is
  * promoted to double so results are bit-stable regardless of input width.
  */
object VectorFunctions {

  private def d(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane (SimHash) LSH signature of a vector: `nBits` sign
    * bits packed into a long. Hyperplanes are pseudo-random but fully
    * deterministic, derived per (bit, dimension) from a splitmix64-style
    * integer mix of the seed — identical on every executor with no
    * broadcast state needed.
    *
    * The planes are one LITERAL nested array (data, not expression nodes):
    * the expression tree stays O(1) in `nBits`×`dim`, so whole-stage
    * codegen always compiles it.
    */
  def hyperplaneSignature(v: Column, dim: Int, nBits: Int = 16, seed: Long = 42L): Column = {
    def mix(z0: Long): Double = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // map to [-1, 1)
      (z.toDouble / Long.MaxValue.toDouble)
    }
    // plane b packaged with its bit weight 2^b
    val planes: Seq[(Seq[Double], Long)] = (0 until nBits).map { b =>
      ((0 until dim).map(i => mix(seed + b * 131071L + i)), 1L << b)
    }
    val bitVals = transform(typedLit(planes), p => {
      val proj = aggregate(zip_with(p("_1"), d(v), (a, x) => a * x), lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, p("_2")).otherwise(lit(0L))
    })
    aggregate(bitVals, lit(0L), (acc, x) => acc + x)
  }
}
