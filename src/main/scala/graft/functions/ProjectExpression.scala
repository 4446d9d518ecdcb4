package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `AffineProject(vec)` — centered rectangular projection
  * `out_i = Σ_j M[i][j]·(x_j − mean_j)` for a `rows × dim` matrix: the PCA
  * / whitening / dimensionality-reduction step of an embedding pipeline,
  * generalizing [[RotateVector]] (square, uncentered) to affine maps that
  * CHANGE dimension.
  *
  * Matrix and mean ride as one codegen reference object (flattened
  * row-major), so centering + projection fuse into the surrounding
  * map-only whole-stage-codegen'd scan — no matrix join, no shuffle, and
  * a 100 TB corpus reduces from `dim` to `rows` floats per vector in the
  * same pass that reads it. Shorter vectors treat missing elements as
  * 0.0 (the [[RotateVector]]/[[PqEncode]] stance); null input or element
  * → null.
  */
case class AffineProject(child: Expression, mean: Array[Double],
    matrix: Array[Double], rows: Int, dim: Int) extends UnaryExpression {

  require(rows > 0 && dim > 0 && matrix.length == rows * dim,
    s"projection matrix has ${matrix.length} values, expected rows·dim=${rows * dim}")
  require(mean.length == dim, s"mean has ${mean.length} values, expected dim=$dim")

  override def prettyName: String = "affine_project"
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

  def project(input: ArrayData): Any = {
    val x = input
    val isFloat = elemIsFloat
    val n = math.min(x.numElements(), dim)
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    // centered input (absent tail elements are 0.0 MINUS the mean there)
    val cx = new Array[Double](dim)
    i = 0
    while (i < dim) {
      val raw = if (i < n) { if (isFloat) x.getFloat(i).toDouble else x.getDouble(i) }
                else 0.0
      cx(i) = raw - mean(i)
      i += 1
    }
    val out = new Array[Double](rows)
    i = 0
    while (i < rows) {
      var s = 0.0
      val base = i * dim
      var j = 0
      while (j < dim) { s += matrix(base + j) * cx(j); j += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    project(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("affineProject", this, classOf[AffineProject].getName)
    val tmp = ctx.freshName("proj")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $tmp = $ref.project($c);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
