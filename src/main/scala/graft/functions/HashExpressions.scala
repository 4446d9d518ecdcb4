package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native signature expressions for the dedup operators.
  *
  * Both replace an explode → groupBy(id) → N-aggregate pipeline with a
  * single map-side expression: the whole signature is computed per row in
  * one codegen'd pass over the token/shingle array, so signature generation
  * SHUFFLES NOTHING — at cluster scale that deletes a full exchange of the
  * corpus (the previous shape shuffled one row per document even after
  * partial aggregation). Hashing uses the same XXH64 (seed 42) as Spark's
  * `xxhash64`, so signatures are unchanged.
  */
object HashExpressions {

  /** Mersenne prime 2^31-1; (a*h+b) stays in Long for a,h < p. */
  val P: Long = 2147483647L

  /** Deterministic per-permutation coefficients (splitmix64 of the seed). */
  def coeff(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    math.floorMod(z ^ (z >>> 31), P - 1) + 1
  }

  def minhash(tokens: Column, numPerm: Int = 64, shingleK: Int = 3,
      seed: Long = 42L): Column =
    GraftShims.toColumn(MinHashSig(GraftShims.toExpression(tokens), numPerm, shingleK, seed))

  def simhash(tokens: Column, nBits: Int = 32): Column =
    GraftShims.toColumn(SimHash64(GraftShims.toExpression(tokens), nBits))

  /** Fraction of positions where two long arrays agree (MinHash jaccard
    * estimate). Codegen'd, so candidate pairs can be scored BEFORE
    * dedup — the pair-dedup aggregation then carries one double instead of
    * two signatures, staying a streaming HashAggregate rather than a
    * SortAggregate over arrays.
    */
  def agreeFrac(a: Column, b: Column): Column =
    GraftShims.toColumn(ArrayAgreeFrac(GraftShims.toExpression(a), GraftShims.toExpression(b)))

  private[functions] def checkStringArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$name needs array<string>, got ${dt.catalogString}")
    }

  private[functions] def xxh64(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
}

/** MinHash signature of a TOKEN array as `array<long>` of length `numPerm`.
  *
  * Shingling happens inside the expression: each token is XXH64-hashed
  * once, the hash of word-shingle i is the FNV-style polynomial combine of
  * its k token hashes, and each permutation takes min((a_p·h + b_p) mod P)
  * over the shingles. No shingle string is ever materialized — the
  * dominant cost of the previous formulation was `transform`+`array_join`
  * building every k-gram string interpreted. Fewer than k tokens → all-P
  * sentinel (callers filter it; a sentinel must not band-match).
  */
case class MinHashSig(child: Expression, numPerm: Int, shingleK: Int, seed: Long)
    extends UnaryExpression {
  require(shingleK >= 1, s"shingleK must be >= 1, got $shingleK")

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  private lazy val coeffA: Array[Long] =
    Array.tabulate(numPerm)(i => HashExpressions.coeff(seed, 2L * i))
  private lazy val coeffB: Array[Long] =
    Array.tabulate(numPerm)(i => HashExpressions.coeff(seed, 2L * i + 1))

  /** FNV-1a prime for combining token hashes into a shingle hash. */
  private val C: Long = 0x100000001b3L

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerm)(HashExpressions.P)
    if (n >= shingleK) {
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        hs(i) = if (arr.isNullAt(i)) 0L else HashExpressions.xxh64(arr.getUTF8String(i))
        i += 1
      }
      i = 0
      while (i <= n - shingleK) {
        var sh = 0L
        var j = 0
        while (j < shingleK) { sh = sh * C + hs(i + j); j += 1 }
        val h0 = math.floorMod(sh, HashExpressions.P)
        var p = 0
        while (p < numPerm) {
          val v = math.floorMod(h0 * coeffA(p) + coeffB(p), HashExpressions.P)
          if (v < mins(p)) mins(p) = v
          p += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coeffB, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val p = ctx.freshName("p")
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val hs = ctx.freshName("hs"); val s = ctx.freshName("s")
      val sh = ctx.freshName("sh"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, ${HashExpressions.P}L);
         |if ($n >= $shingleK) {
         |  long[] $hs = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arr.isNullAt($i)) { $hs[$i] = 0L; continue; }
         |    UTF8String $s = $arr.getUTF8String($i);
         |    $hs[$i] = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |  for (int $i = 0; $i <= $n - $shingleK; $i++) {
         |    long $sh = 0L;
         |    for (int $j = 0; $j < $shingleK; $j++) { $sh = $sh * ${C}L + $hs[$i + $j]; }
         |    long $h = java.lang.Math.floorMod($sh, ${HashExpressions.P}L);
         |    for (int $p = 0; $p < $numPerm; $p++) {
         |      long $v = java.lang.Math.floorMod(
         |        $h * $aRef[$p] + $bRef[$p], ${HashExpressions.P}L);
         |      if ($v < $mins[$p]) $mins[$p] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Fraction of positions where two `array<long>` columns hold equal values,
  * over the shorter length; empty → 0.0. See
  * [[HashExpressions.agreeFrac]].
  */
case class ArrayAgreeFrac(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "array_agree_frac"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
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

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = ($n == 0) ? 0.0 : ((double) $eq) / $n;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAgreeFrac =
    copy(left = newLeft, right = newRight)
}

/** SimHash of a string array packed into the low `nBits` of a long: bit j is
  * the sign of Σ_tokens (bit j of xxhash64(token) ? +1 : -1). Empty array →
  * 0. One codegen'd pass; equals the explode/groupBy formulation
  * bit-for-bit.
  */
case class SimHash64(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1,64], got $nBits")

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Int](nBits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashExpressions.xxh64(arr.getUTF8String(i))
        var j = 0
        while (j < nBits) {
          sums(j) += (if (((h >>> j) & 1L) != 0L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) { if (sums(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val sums = ctx.freshName("sums")
      val s = ctx.freshName("s"); val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |int[] $sums = new int[$nBits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  UTF8String $s = $arr.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    $sums[$j] += ((($h >>> $j) & 1L) != 0L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  if ($sums[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** [[SimHash64]]'s md5-basis sibling: bit j of the signature is the
  * majority sign of bit j across `conv(substring(md5(token), 1, 8), 16,
  * 10)` — the top 32 bits of each token's md5, the hash an external SQL
  * oracle can restate verbatim (XXH64 is not available there). Equals the
  * bindOnce + 32-interpreted-`aggregate` Column formulation bit-for-bit
  * (a null token element counts −1 on every bit, the `when(null === 1)`
  * fall-through of the composed form); that form measured ~2 s single-task
  * per sf0.1 pass on q_simhash_recall — 32 interpreted lambda walks plus
  * one interpreted md5 transform per row, all replaced by this one
  * codegen-fused walk.
  */
case class SimHashMd5(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 32, s"nBits must be in [1,32], got $nBits")

  override def prettyName: String = "simhash_md5"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    HashExpressions.checkStringArray(child, prettyName)

  def sigOf(input: Any): Long = {
    val arr = input.asInstanceOf[ArrayData]
    val md = SimHashMd5.digest.get()
    val n = arr.numElements()
    val sums = new Array[Int](nBits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < nBits) { sums(j) -= 1; j += 1 }
      } else {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 8 hex chars = top 4 digest bytes, read as an unsigned int
        val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        var j = 0
        while (j < nBits) {
          sums(j) += (if (((h >>> j) & 1L) != 0L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) { if (sums(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def nullSafeEval(input: Any): Any = sigOf(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashMd5", this, classOf[SimHashMd5].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sigOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
