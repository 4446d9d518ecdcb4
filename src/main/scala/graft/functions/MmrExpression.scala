package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** `MmrRerank(candidates, k, lambda)` — Maximal Marginal Relevance
  * (Carbonell & Goldstein 1998) diversity re-ranking of one query's
  * candidate set, as ONE native expression evaluated per query row.
  *
  * Input: `array<struct<id: long, rel: double, vec: array<double>>>` —
  * the query's retrieval candidates (bounded, they came from a top-k)
  * with their relevance scores and embedding vectors. Output:
  * `array<struct<rank: int, id: long, mmr: double>>` of the `k` greedy
  * selections: step 1 takes the highest-relevance candidate (mmr = rel);
  * each later step maximizes `λ·rel − (1−λ)·max_{s∈selected} sim(d, s)`
  * where `sim` is cosine rounded half-up to 4 decimals (the same
  * rounding the retrieval scores carry, so every comparison is over
  * bit-identical doubles an external engine reproduces). Ties break on
  * ascending id, making the greedy order — and therefore the whole
  * output — deterministic and independent of the input array's order.
  *
  * The candidate set is bounded by the upstream top-k, so the O(k·n·dim)
  * greedy loop is per-row work inside the scan stage — no shuffle, no
  * pairwise join materialization.
  */
case class MmrRerank(child: Expression, k: Int, lambda: Double)
    extends UnaryExpression {
  require(k > 0, s"k must be positive: $k")
  require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1]: $lambda")

  override def prettyName: String = "mmr_rerank"

  private val outStruct = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false)))
  override def dataType: DataType = ArrayType(outStruct, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, DoubleType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<long, double, array<double>>>, got $other")
  }

  /** Half-up rounding to 4 decimals via BigDecimal — bit-identical to
    * Spark's `round(col, 4)`, the same bridge every existing oracle uses
    * to meet DuckDB's round().
    */
  private def r4(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  def rerank(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = input.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rel(i) = row.getDouble(1)
      vecs(i) = row.getArray(2).toDoubleArray()
      var s = 0.0
      var d = 0
      while (d < vecs(i).length) { s += vecs(i)(d) * vecs(i)(d); d += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    def sim(a: Int, b: Int): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      val len = math.min(va.length, vb.length)
      var s = 0.0
      var d = 0
      while (d < len) { s += va(d) * vb(d); d += 1 }
      val denom = norms(a) * norms(b)
      if (denom == 0) 0.0 else r4(s / denom)
    }
    val taken = new Array[Boolean](n)
    val maxSim = new Array[Double](n) // max sim to the selected set so far
    java.util.Arrays.fill(maxSim, Double.NegativeInfinity)
    val outN = math.min(k, n)
    val out = new java.util.ArrayList[Any](outN)
    var step = 0
    var exhausted = false
    while (step < outN && !exhausted) {
      var best = -1
      var bestVal = Double.NegativeInfinity
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          val v = if (step == 0) rel(c)
                  else lambda * rel(c) - (1 - lambda) * maxSim(c)
          // NaN values (a zero-norm vector upstream makes cosine NaN) are
          // never selectable: NaN comparisons are all false, so without
          // the explicit guard an all-NaN tail would leave best = -1
          if (!v.isNaN &&
              (v > bestVal || (v == bestVal && (best < 0 || ids(c) < ids(best))))) {
            bestVal = v; best = c
          }
        }
        c += 1
      }
      if (best < 0) exhausted = true // only NaN-valued candidates remain
      else {
        taken(best) = true
        out.add(InternalRow(step + 1, ids(best), bestVal))
        var u = 0
        while (u < n) {
          if (!taken(u)) {
            val s = sim(u, best)
            if (s > maxSim(u)) maxSim(u) = s
          }
          u += 1
        }
        step += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    rerank(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mmr", this, classOf[MmrRerank].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.rerank($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
