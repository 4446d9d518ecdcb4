package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `NearestCells(vec, centroids, nprobe)` — the `nprobe` IVF cells whose
  * centroids score highest against the vector, as `array<int>` of cell
  * ids in descending-score order (ties → lower cell id). The score is
  * `dot(vec, centroid_c) + bias_c`: with zero bias and unit-norm
  * centroids the dot ranking equals the cosine ranking (the row's own
  * norm is a positive constant factor that never changes the argmax);
  * with `bias_c = −‖centroid_c‖²/2` the ranking equals ascending
  * squared-L2 distance (‖v−c‖² = ‖v‖² − 2(v·c − ‖c‖²/2)) — the plain
  * k-means assignment a residual quantizer needs, without giving up the
  * one-dot-product-per-cell scan.
  *
  * Why a custom Expression (SURVEY §7.2 preference order): cell
  * assignment is evaluated once per corpus row on the 100 TB scan of
  * [[graft.llm.Ivf]] — a `transform`/`aggregate` HOF formulation runs
  * interpreted per element, and a join against a centroid table would
  * turn a map-only assignment into |corpus|×nlist scored join rows. The
  * centroid matrix rides along as a codegen reference object (exactly
  * like [[HyperplaneSigs]]' plane matrix) and the generated code is a
  * primitive double loop fused into whole-stage codegen.
  *
  * Accepts `array<float>` and `array<double>`. Null input or null
  * element → null.
  */
case class NearestCells(child: Expression, centroids: Array[Double], ncell: Int, dim: Int,
    nprobe: Int, bias: Array[Double]) extends UnaryExpression {

  require(ncell > 0 && dim > 0 && nprobe > 0 && nprobe <= ncell,
    s"bad NearestCells config: ncell=$ncell dim=$dim nprobe=$nprobe")
  require(centroids.length == ncell * dim,
    s"centroid matrix has ${centroids.length} values, expected ncell*dim=${ncell * dim}")
  require(bias.length == ncell,
    s"bias vector has ${bias.length} values, expected ncell=$ncell")

  override def prettyName: String = "nearest_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @inline private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  // a null ELEMENT nulls the result even when the array itself is
  // non-nullable; reporting non-nullable there would hand codegen a
  // false-literal isNull slot while the template assigns to it (Janino
  // "not an rvalue" → silent interpreted fallback)
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

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val n = math.min(x.numElements(), dim)
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val scores = new Array[Double](ncell)
    var c = 0
    while (c < ncell) {
      val off = c * dim
      var s = 0.0
      var j = 0
      while (j < n) {
        s += centroids(off + j) * (if (isFloat) x.getFloat(j).toDouble else x.getDouble(j))
        j += 1
      }
      scores(c) = s + bias(c)
      c += 1
    }
    val taken = new Array[Boolean](ncell)
    val out = new Array[Int](nprobe)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestScore = 0.0
      var k = 0
      while (k < ncell) {
        if (!taken(k) && (best < 0 || scores(k) > bestScore)) {
          best = k; bestScore = scores(k)
        }
        k += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    val biasRef = ctx.addReferenceObj("bias", bias, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val scores = ctx.freshName("scores")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
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
         |  double[] $scores = new double[$ncell];
         |  for (int $c = 0; $c < $ncell; $c++) {
         |    int $off = $c * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += $centsRef[$off + $j] * (double) $a.$get($j);
         |    }
         |    $scores[$c] = $s + $biasRef[$c];
         |  }
         |  boolean[] $taken = new boolean[$ncell];
         |  int[] $out = new int[$nprobe];
         |  for (int $p = 0; $p < $nprobe; $p++) {
         |    int $best = -1;
         |    double $bestScore = 0.0;
         |    for (int $k = 0; $k < $ncell; $k++) {
         |      if (!$taken[$k] && ($best < 0 || $scores[$k] > $bestScore)) {
         |        $best = $k; $bestScore = $scores[$k];
         |      }
         |    }
         |    $taken[$best] = true;
         |    $out[$p] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  /** Column API over a `[cell][dim]` centroid matrix (flattened row-major):
    * max-dot ranking (the cosine/unit-centroid configuration, zero bias).
    */
  def apply(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val ncell = centroids.length
    val dim = centroids.head.length
    GraftShims.toColumn(NearestCells(GraftShims.toExpression(v), centroids.flatten,
      ncell, dim, nprobe, new Array[Double](ncell)))
  }

  /** Ascending squared-L2 ranking over arbitrary (non-unit) centroids —
    * the plain k-means assignment, via `bias_c = −‖centroid_c‖²/2`.
    */
  def l2(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val ncell = centroids.length
    val dim = centroids.head.length
    val bias = centroids.map(c => -c.map(x => x * x).sum / 2.0)
    GraftShims.toColumn(NearestCells(GraftShims.toExpression(v), centroids.flatten,
      ncell, dim, nprobe, bias))
  }
}
