package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search", IEEE TPAMI 33(1)) as native Catalyst
  * expressions — the map-only hot path of [[graft.llm.Pq]].
  *
  * A PQ model splits a `dim`-vector into `m` subvectors of `dsub` dims and
  * quantizes each against its own `ksub`-centroid codebook, so a corpus
  * vector compresses to `m` small ints (codes) and an asymmetric distance
  * (query vs codes) is `m` table lookups. The codebook matrix rides along
  * as a codegen reference object (the [[NearestCells]] /
  * [[HyperplaneSigs]] pattern), flattened row-major `[j][c][i] →
  * (j*ksub + c)*dsub + i`, so every kernel is a primitive double loop
  * fused into whole-stage codegen: no joins, no UDF boxing, no
  * interpreted higher-order functions on the 100 TB scan.
  *
  * Why a custom Expression (SURVEY §7.2 preference order): encode runs
  * once per corpus row on the compression scan, and ADC runs once per
  * (query, corpus row) candidate — both are the innermost loops of the
  * operator. All three kernels accept `array<float>`/`array<double>`
  * vectors; null input or null element → null.
  */
private[graft] trait PqKernel { self: Expression =>
  def codebooks: Array[Double]
  def m: Int
  def ksub: Int
  def dsub: Int

  require(m > 0 && ksub > 0 && dsub > 0, s"bad PQ config: m=$m ksub=$ksub dsub=$dsub")
  require(codebooks.length == m * ksub * dsub,
    s"codebook matrix has ${codebooks.length} values, expected m*ksub*dsub=${m * ksub * dsub}")
}

/** `PqEncode(vec)` — the `m` codebook codes of a vector: per subspace `j`,
  * the centroid index with the smallest squared L2 distance to the
  * subvector (ties → lower index), as `array<int>`. Dimensions beyond the
  * vector's actual length contribute the centroid's own squared weight
  * (i.e. the missing element is treated as 0.0), so short vectors encode
  * deterministically instead of erroring.
  */
case class PqEncode(child: Expression, codebooks: Array[Double], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with PqKernel {

  override def prettyName: String = "pq_encode"
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
    val n = x.numElements()
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val gi = j * dsub + d
          val v = if (gi < n) (if (isFloat) x.getFloat(gi).toDouble else x.getDouble(gi)) else 0.0
          val diff = v - codebooks(off + d)
          s += diff * diff
          d += 1
        }
        if (s < bestDist) { best = c; bestDist = s }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val gi = ctx.freshName("gi")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val out = ctx.freshName("out")
      val elemScan =
        if (elemNullable)
          s"""for (int $i = 0; $i < $n; $i++) {
             |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}
             |if (!${ev.isNull}) {""".stripMargin
        else "{"
      s"""
         |int $n = $a.numElements();
         |$elemScan
         |  int[] $out = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $best = 0;
         |    double $bestDist = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $off = ($j * $ksub + $c) * $dsub;
         |      double $s = 0.0;
         |      for (int $d = 0; $d < $dsub; $d++) {
         |        int $gi = $j * $dsub + $d;
         |        double $v = ($gi < $n) ? (double) $a.$get($gi) : 0.0;
         |        double $diff = $v - $cbRef[$off + $d];
         |        $s += $diff * $diff;
         |      }
         |      if ($s < $bestDist) { $best = $c; $bestDist = $s; }
         |    }
         |    $out[$j] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `PqLut(qvec)` — the query's asymmetric-distance lookup table: squared
  * L2 distance between the query's subvector `j` and centroid `c`, for
  * every (j, c), as a flattened `array<double>` of `m*ksub` values
  * (`j*ksub + c`). Computed ONCE per query on the (broadcast) small side,
  * so each corpus candidate costs only `m` adds in [[PqAdc]].
  */
case class PqLut(child: Expression, codebooks: Array[Double], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with PqKernel {

  override def prettyName: String = "pq_lut"
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
    val n = x.numElements()
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val gi = j * dsub + d
          val v = if (gi < n) (if (isFloat) x.getFloat(gi).toDouble else x.getDouble(gi)) else 0.0
          val diff = v - codebooks(off + d)
          s += diff * diff
          d += 1
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val gi = ctx.freshName("gi")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val diff = ctx.freshName("diff")
      val out = ctx.freshName("out")
      val elemScan =
        if (elemNullable)
          s"""for (int $i = 0; $i < $n; $i++) {
             |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}
             |if (!${ev.isNull}) {""".stripMargin
        else "{"
      s"""
         |int $n = $a.numElements();
         |$elemScan
         |  double[] $out = new double[${m * ksub}];
         |  for (int $j = 0; $j < $m; $j++) {
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $off = ($j * $ksub + $c) * $dsub;
         |      double $s = 0.0;
         |      for (int $d = 0; $d < $dsub; $d++) {
         |        int $gi = $j * $dsub + $d;
         |        double $v = ($gi < $n) ? (double) $a.$get($gi) : 0.0;
         |        double $diff = $v - $cbRef[$off + $d];
         |        $s += $diff * $diff;
         |      }
         |      $out[$j * $ksub + $c] = $s;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** `PqAdc(codes, lut)` — the asymmetric distance: `Σ_j lut[j*ksub +
  * codes[j]]`, the PQ approximation of the query↔candidate squared L2
  * distance. `m` array reads per candidate — the whole point of the
  * encode/LUT split. Null array or element → null; a code outside
  * `[0, ksub)` is an error by construction ([[PqEncode]] only emits valid
  * codes) and contributes 0 rather than crashing codegen — guarded PER
  * SUBSPACE SEGMENT, not just against the overall LUT bounds, so a
  * corrupt code in `[ksub, …)` can't silently read the NEXT subspace's
  * LUT entries and return a plausible-but-wrong distance.
  */
case class PqAdc(left: Expression, right: Expression, ksub: Int) extends BinaryExpression {

  require(ksub > 0, s"bad PQ config: ksub=$ksub")

  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @inline private def anyElemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })
  override def nullable: Boolean = left.nullable || right.nullable || anyElemNullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<int> codes, array<double> lut), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val nl = lut.numElements()
    var i = 0
    while (i < m) { if (codes.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < nl) { if (lut.isNullAt(i)) return null; i += 1 }
    var s = 0.0
    var j = 0
    while (j < m) {
      val code = codes.getInt(j)
      if (code >= 0 && code < ksub) {
        val idx = j * ksub + code
        if (idx < nl) s += lut.getDouble(idx)
      }
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val nl = ctx.freshName("nl")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val code = ctx.freshName("code")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      val elemScan =
        if (anyElemNullable)
          s"""for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
             |  if ($codes.isNullAt($i)) ${ev.isNull} = true;
             |}
             |for (int $i = 0; $i < $nl && !${ev.isNull}; $i++) {
             |  if ($lut.isNullAt($i)) ${ev.isNull} = true;
             |}
             |if (!${ev.isNull}) {""".stripMargin
        else "{"
      s"""
         |int $m = $codes.numElements();
         |int $nl = $lut.numElements();
         |$elemScan
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $code = $codes.getInt($j);
         |    if ($code >= 0 && $code < $ksub) {
         |      int $idx = $j * $ksub + $code;
         |      if ($idx < $nl) $s += $lut.getDouble($idx);
         |    }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : PqAdc = copy(left = newLeft, right = newRight)
}

object PqExpressions {
  /** Column API over a `[m][ksub][dsub]` codebook tensor (flattened
    * row-major). All three kernels share one flattening so a model trained
    * by [[graft.llm.Pq.train]] plugs into any of them.
    */
  def encode(v: Column, codebooks: Array[Double], m: Int, ksub: Int, dsub: Int): Column =
    GraftShims.toColumn(PqEncode(GraftShims.toExpression(v), codebooks, m, ksub, dsub))

  def lut(v: Column, codebooks: Array[Double], m: Int, ksub: Int, dsub: Int): Column =
    GraftShims.toColumn(PqLut(GraftShims.toExpression(v), codebooks, m, ksub, dsub))

  def adc(codes: Column, lut: Column, ksub: Int): Column =
    GraftShims.toColumn(PqAdc(GraftShims.toExpression(codes), GraftShims.toExpression(lut), ksub))
}
