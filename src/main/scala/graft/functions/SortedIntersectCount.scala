package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `SortedIntersectCount(a, b)` — |a ∩ b| of two ASCENDING-sorted
  * `array<long>` columns as a native codegen'd merge walk.
  *
  * Why a custom Expression (SURVEY §7.2 preference order):
  * `size(array_intersect(a, b))` builds an OpenHashSet + result array PER
  * ROW — on a candidate-verification join evaluating millions of pairs of
  * small arrays, allocation dominates the actual comparisons. The merge
  * walk is allocation-free straight-line code, fused into the surrounding
  * whole-stage codegen. Sorting happens once per document on the build
  * side (`array_sort`), not once per pair.
  *
  * Both inputs MUST be sorted ascending with distinct elements (the
  * caller's contract — violating it undercounts silently, like merging
  * unsorted streams). Null array → null; null elements are not expected
  * (hash outputs) and are skipped defensively by the eval path.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<long> operands, " +
          s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column API: intersection size of two sorted-distinct array<long> columns. */
  def apply(a: Column, b: Column): Column =
    GraftShims.toColumn(
      SortedIntersectCount(GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
