package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `CellResidual(vec, cell)` — the vector minus its coarse cell's
  * centroid: `r_i = x_i − centroid[cell]_i`, as `array<double>`. The
  * residual-encoding step of IVF-PQ (Jégou et al. 2011 §V: quantize the
  * residual after coarse assignment, not the raw vector — residuals
  * concentrate near 0, so the same product codebook spends its centroids
  * on a much smaller volume).
  *
  * The centroid matrix rides as a codegen reference object (the
  * [[NearestCells]] pattern, flattened row-major `[cell][i]`), so the
  * 100 TB corpus pass computes assignment + residual + PQ codes in one
  * map-only whole-stage-codegen'd scan — no centroid join. A vector
  * shorter than `dim` emits residuals for the dims it has (the
  * [[AffineQuantize]] stance); a cell id outside `[0, ncell)` is an
  * error by construction ([[NearestCells]] only emits valid cells) and
  * yields the vector unchanged (zero centroid) rather than crashing.
  * Null array, null element, or null cell → null.
  */
case class CellResidual(left: Expression, right: Expression, centroids: Array[Double],
    ncell: Int, dim: Int) extends BinaryExpression {

  require(ncell > 0 && dim > 0, s"bad CellResidual config: ncell=$ncell dim=$dim")
  require(centroids.length == ncell * dim,
    s"centroid matrix has ${centroids.length} values, expected ncell*dim=${ncell * dim}")

  override def prettyName: String = "cell_residual"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @inline private def elemNullable: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = left.nullable || right.nullable || elemNullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<float|double> vec, int cell), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  @inline private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(vecAny: Any, cellAny: Any): Any = {
    val x = vecAny.asInstanceOf[ArrayData]
    val cell = cellAny.asInstanceOf[Int]
    val isFloat = elemIsFloat
    val n = math.min(x.numElements(), dim)
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val valid = cell >= 0 && cell < ncell
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = if (valid) v - centroids(cell * dim + i) else v
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, cell) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val valid = ctx.freshName("valid")
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
         |  boolean $valid = $cell >= 0 && $cell < $ncell;
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (double) $a.$get($i) - ($valid ? $centsRef[$cell * $dim + $i] : 0.0);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : CellResidual = copy(left = newLeft, right = newRight)
}

object CellResidual {
  /** Column API over a `[cell][dim]` centroid matrix (flattened row-major). */
  def apply(v: Column, cell: Column, centroids: Array[Array[Double]]): Column = {
    val ncell = centroids.length
    val dim = centroids.head.length
    GraftShims.toColumn(CellResidual(GraftShims.toExpression(v), GraftShims.toExpression(cell),
      centroids.flatten, ncell, dim))
  }
}
