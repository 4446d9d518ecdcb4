package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `SignPack(vec)` — 1-bit sign quantization of an embedding: bit `i` of
  * word `i / 64` is set iff `x_i > 0`, packed into `array<long>` of
  * `ceil(n / 64)` words. The 32× compression tier below
  * [[AffineQuantize]]'s 4×: at 100 TB the binary codes of a 1024-dim
  * float corpus fit where 3% of the originals would, so the
  * candidate-generation scan ([[HammingDistance]] + top-k) runs at memory
  * bandwidth over 128 bytes/vector.
  *
  * Zero is quantized to 0 (strictly-positive test) so the boundary is
  * externally restatable as `x > 0` with no epsilon ambiguity. Why a
  * custom Expression (SURVEY §7.2 preference order): the HOF formulation
  * (aggregate over zip_with with shifts) evaluates interpreted; here the
  * generated code is a primitive loop over the `ArrayData`, fused into
  * whole-stage codegen — this is a full-corpus compression scan. Null
  * input or element → null (mirrors [[ArrayDot]]).
  */
case class SignPack(child: Expression) extends UnaryExpression {

  override def prettyName: String = "sign_pack"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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
    val n = x.numElements()
    val out = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      if (v > 0.0) out(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val elemCheck =
        if (elemNullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[($n + 63) / 64];
         |for (int $i = 0; $i < $n; $i++) {
         |  $elemCheck
         |  if (((double) $a.$get($i)) > 0.0) $out[$i >> 6] |= 1L << ($i & 63);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

object SignPack {
  def apply(v: Column): Column = GraftShims.toColumn(SignPack(GraftShims.toExpression(v)))
}

/** `HammingDistance(a, b)` — popcount of the XOR of two [[SignPack]] code
  * arrays, i.e. the number of dimensions whose signs disagree. Native
  * codegen (`Long.bitCount` JITs to a single POPCNT per word), so the
  * stage-1 ANN scan is one instruction per 64 dimensions. Word-length
  * mismatch → null, like [[ArrayDot]]: a truncated code must drop out of
  * ranking, not score a silently partial distance — and because 64
  * packing truncates length information, callers gate `size(vec) = dim`
  * BEFORE packing (see `Quantize.hammingTopK`).
  */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "hamming_distance"
  override def dataType: DataType = IntegerType

  // null on length mismatch even when both inputs are non-nullable — see
  // ArrayDot for the Janino trap the override avoids
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint> operands, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  @inline private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val elemCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |int $s = 0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemCheck
         |    $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  def apply(a: Column, b: Column): Column =
    GraftShims.toColumn(HammingDistance(GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
