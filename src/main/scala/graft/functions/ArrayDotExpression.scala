package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `ArrayDot(a, b)` — dot product of two numeric array columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY §7.2 preference order): the HOF
  * formulation (`aggregate(zip_with(...))`) is evaluated interpreted —
  * Spark never compiles lambda functions — and a Scala UDF pays a
  * Seq conversion + boxing per row. `doGenCode` here emits a primitive
  * `while` loop straight over the two `ArrayData`, which JITs to the same
  * straight-line multiply-adds as hand-written Java: no allocation, no
  * boxing, fused into the surrounding generated code.
  *
  * Accepts `array<float>` and `array<double>` operands (mixed allowed);
  * always sums in double, left-to-right, so results are bit-identical to
  * the HOF and UDF formulations. Null, null element, or length-mismatched
  * operands → null (zip_with pads the shorter side with null, so the HOF
  * sum is null too — a truncated embedding must drop out of ranking, not
  * score a silently partial dot).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "array_dot"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // null on length mismatch (and null elements) even when both inputs are
  // non-nullable — without this override, a not-null-inferred context hands
  // codegen a false-literal isNull slot and the `ev.isNull = true`
  // assignments below reference an undeclared variable (Janino "not an
  // rvalue"), silently dropping the whole stage to interpreted mode
  override def nullable: Boolean = true

  @inline private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> operands, " +
          s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  @inline private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      // null element → null result (mirrors codegen's early exit)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, isFloat: Boolean): String =
      if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // skip the per-element null probe when the schema proves elements
      // can't be null — it's inside the hottest loop we generate
      val elemCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemCheck
         |    $s += ${get(a, i, elemIsFloat(left))} * ${get(b, i, elemIsFloat(right))};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column API: dot product of two array<float|double> columns. */
  def apply(a: Column, b: Column): Column =
    GraftShims.toColumn(ArrayDot(GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
