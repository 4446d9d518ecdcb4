package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `AffineQuantize(vec)` — per-dimension affine int8 quantization of an
  * embedding against corpus [min, max] ranges:
  * `code_i = floor((x_i − min_i) · 254 / (max_i − min_i) + 0.5) − 127`,
  * clamped to [−127, 127] (a degenerate dimension with max = min encodes
  * 0). The clamp matters for values OUTSIDE the corpus range the stats
  * were taken on — e.g. query vectors unseen at stats time — which must
  * still land on a valid int8 code (the saturating behavior of every
  * int8 quantization scheme), not escape the type's contract. The clamp
  * compares in double space before the int cast, so an extreme outlier
  * can't overflow the cast and wrap sign. `floor(y + 0.5)` is written
  * out instead of `round` so an external SQL engine states the identical
  * IEEE op sequence — no half-even/half-up ambiguity between engines.
  *
  * The range arrays ride as codegen reference objects (the
  * [[NearestCells]] pattern), so the 100 TB compression scan is map-only
  * primitive loops inside whole-stage codegen — a 4× size cut (float32 →
  * int8) before embeddings ever hit a shuffle or a sink. Vectors shorter
  * than the range tables emit codes for the dims they have; null input or
  * element → null.
  */
case class AffineQuantize(child: Expression, mins: Array[Double], maxs: Array[Double])
    extends UnaryExpression {

  require(mins.length == maxs.length && mins.nonEmpty,
    s"range tables disagree: ${mins.length} mins vs ${maxs.length} maxs")

  override def prettyName: String = "affine_quantize"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @inline private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elemNullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float|double> operand, got ${dt.catalogString}")
  }

  @inline private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val n = math.min(x.numElements(), mins.length)
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) =
        if (maxs(i) == mins(i)) 0
        else {
          val y = math.floor((v - mins(i)) * 254.0 / (maxs(i) - mins(i)) + 0.5) - 127.0
          if (y < -127.0) -127 else if (y > 127.0) 127 else y.toInt
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val maxsRef = ctx.addReferenceObj("maxs", maxs, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val y = ctx.freshName("y")
      val out = ctx.freshName("out")
      val elemScan =
        if (elemNullable)
          s"""for (int $i = 0; $i < $n; $i++) {
             |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}
             |if (!${ev.isNull}) {""".stripMargin
        else "{"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), ${mins.length});
         |$elemScan
         |  int[] $out = new int[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = (double) $a.$get($i);
         |    double $y = java.lang.Math.floor(
         |        ($v - $minsRef[$i]) * 254.0 / ($maxsRef[$i] - $minsRef[$i]) + 0.5) - 127.0;
         |    $out[$i] = ($maxsRef[$i] == $minsRef[$i]) ? 0
         |      : ($y < -127.0 ? -127 : ($y > 127.0 ? 127 : (int) $y));
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AffineQuantize =
    copy(child = newChild)
}

object AffineQuantize {
  def apply(v: Column, mins: Array[Double], maxs: Array[Double]): Column =
    GraftShims.toColumn(AffineQuantize(GraftShims.toExpression(v), mins, maxs))
}
