package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `RotateVector(vec)` — dense matrix–vector product `r_i = Σ_j R[i][j]·x_j`
  * as `array<double>`: the rotation step of OPQ (Ge et al. 2013,
  * "Optimized Product Quantization for Approximate Nearest Neighbor
  * Search", CVPR — rotate so the product quantizer's independent
  * subspaces each receive a balanced share of the variance).
  *
  * The matrix rides as a codegen reference object (the [[NearestCells]] /
  * [[PqEncode]] pattern, flattened row-major `[i][j] → i·dim + j`), so
  * rotation fuses with the downstream PQ encode into ONE map-only
  * whole-stage-codegen'd corpus scan — no matrix join, no shuffle.
  * A vector shorter than `dim` treats missing elements as 0.0 (the
  * [[PqEncode]] stance); output length is always `dim`. Null input or
  * element → null.
  */
case class RotateVector(child: Expression, matrix: Array[Double], dim: Int)
    extends UnaryExpression {

  require(dim > 0 && matrix.length == dim * dim,
    s"rotation matrix has ${matrix.length} values, expected dim²=${dim * dim}")

  override def prettyName: String = "rotate_vector"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
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
    val n = math.min(x.numElements(), dim)
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val out = new Array[Double](dim)
    i = 0
    while (i < dim) {
      var s = 0.0
      var j = 0
      while (j < n) {
        s += matrix(i * dim + j) * (if (isFloat) x.getFloat(j).toDouble else x.getDouble(j))
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matrix", matrix, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
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
         |  double[] $out = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += $mRef[$i * $dim + $j] * (double) $a.$get($j);
         |    }
         |    $out[$i] = $s;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RotateVector =
    copy(child = newChild)
}

object RotateVector {
  /** Column API over a row-major `[dim][dim]` matrix. */
  def apply(v: Column, matrix: Array[Array[Double]]): Column = {
    val dim = matrix.length
    GraftShims.toColumn(RotateVector(GraftShims.toExpression(v), matrix.flatten, dim))
  }
}
