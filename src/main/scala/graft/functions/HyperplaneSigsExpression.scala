package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `HyperplaneSigs(vec, dim, nBits, seeds)` — random-hyperplane LSH
  * signatures for ALL `seeds` in one pass over the vector, as a native
  * Catalyst expression with whole-stage codegen. Returns `array<long>` of
  * length `seeds.size`; bit `b` of element `s` is the sign of the
  * projection of the vector onto pseudo-random hyperplane `(s, b)`.
  *
  * Why a custom Expression (SURVEY §7.2 preference order): the previous
  * formulation was a Scala UDF invoked once PER SEED — each call boxed the
  * whole embedding into `Seq[Double]` and broke whole-stage codegen around
  * the LSH bucketing scan. Here the plane matrix is attached as a codegen
  * reference object and the generated code is a primitive triple loop
  * (seed × bit × dim) straight over the `ArrayData` — no allocation beyond
  * the result array, fused into the surrounding generated code. On the
  * 100 TB path this is the full-corpus scan of [[graft.llm.Similarity]] /
  * [[graft.llm.Dedup.embeddingPairs]], so it must stay codegen'd.
  *
  * Hyperplane components are derived per (bit, dimension) from a
  * splitmix64-style mix of the seed — deterministic, identical on every
  * executor, and bit-identical to the UDF tier it replaces.
  *
  * Accepts `array<float>` and `array<double>`. Null input or null element
  * → null (mirrors [[ArrayDot]]).
  */
case class HyperplaneSigs(child: Expression, dim: Int, nBits: Int, seeds: Seq[Long])
    extends UnaryExpression {

  require(dim > 0 && nBits > 0 && nBits <= 64 && seeds.nonEmpty,
    s"bad HyperplaneSigs config: dim=$dim nBits=$nBits seeds=$seeds")

  override def prettyName: String = "hyperplane_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @inline private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  // a null ELEMENT nulls the result even when the array itself is
  // non-nullable (see NearestCells for the codegen trap this avoids)
  override def nullable: Boolean = child.nullable || elemNullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array<float|double> operand, got ${dt.catalogString}")
  }

  @inline private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Flat plane matrix, `[seed][bit][dim]` row-major. Same derivation as the
    * original UDF closure: splitmix64(seed + bit·131071 + dim) → [-1, 1).
    */
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](seeds.length * nBits * dim)
    var p = 0
    for (seed <- seeds; b <- 0 until nBits; i <- 0 until dim) {
      out(p) = HyperplaneSigs.mix(seed + b * 131071L + i)
      p += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val n = math.min(x.numElements(), dim)
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val sigs = new Array[Long](seeds.length)
    var s = 0
    while (s < seeds.length) {
      var sig = 0L
      var b = 0
      while (b < nBits) {
        val off = (s * nBits + b) * dim
        var proj = 0.0
        var j = 0
        while (j < n) {
          proj += planes(off + j) * (if (isFloat) x.getFloat(j).toDouble else x.getDouble(j))
          j += 1
        }
        if (proj >= 0) sig |= (1L << b)
        b += 1
      }
      sigs(s) = sig
      s += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val proj = ctx.freshName("proj")
      val sig = ctx.freshName("sig")
      val sigs = ctx.freshName("sigs")
      // the element scan both assigns and reads ev.isNull — only legal (and
      // only needed) when elements can actually be null
      val elemScan =
        if (elemNullable)
          s"""for (int $i = 0; $i < $n; $i++) {
             |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}
             |if (!${ev.isNull}) {""".stripMargin
        else "{"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |$elemScan
         |  long[] $sigs = new long[${seeds.length}];
         |  for (int $s = 0; $s < ${seeds.length}; $s++) {
         |    long $sig = 0L;
         |    for (int $b = 0; $b < $nBits; $b++) {
         |      int $off = ($s * $nBits + $b) * $dim;
         |      double $proj = 0.0;
         |      for (int $j = 0; $j < $n; $j++) {
         |        $proj += $planesRef[$off + $j] * (double) $a.$get($j);
         |      }
         |      if ($proj >= 0) $sig |= (1L << $b);
         |    }
         |    $sigs[$s] = $sig;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

object HyperplaneSigs {
  /** splitmix64 finalizer mapped to [-1, 1); shared by eval and the plane
    * precomputation so the matrix matches the original UDF bit-for-bit.
    */
  def mix(z0: Long): Double = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Column API: all-seed hyperplane signatures as `array<long>`. */
  def apply(v: Column, dim: Int, nBits: Int, seeds: Seq[Long]): Column =
    GraftShims.toColumn(HyperplaneSigs(GraftShims.toExpression(v), dim, nBits, seeds))
}
