package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** `VecMomentsAgg(vec, dim)` — the first and second moments of a vector
  * column in ONE aggregation buffer: `[n, Σx_0..Σx_{dim-1},
  * upper-triangle Σx_i·x_j]`, i.e. everything mean + covariance (and so
  * PCA / OPQ rotation training) need from the corpus.
  *
  * Why a TypedImperativeAggregate: the column-algebra formulation — one
  * `sum(x_i·x_j)` AggregateExpression per covariance cell — creates
  * dim·(dim+1)/2 + dim separate aggregate expressions (2 144 at dim 64);
  * Catalyst evaluates each per row and the generated update method blows
  * far past JIT-friendly size (measured 9.0 s at sf0.1 for what is ~10⁷
  * fused multiply-adds). Here the whole update is ONE tight JVM loop over
  * one flat double buffer: O(dim²) work per row with zero expression
  * overhead, map-side partial aggregation and an element-wise-add merge
  * exactly like Spark's own sketch aggregates — the state reaching the
  * driver is still a single O(dim²) row however large the corpus.
  *
  * Rows are counted only when the vector has EXACTLY `dim` non-null
  * elements (the [[graft.llm.Opq.covariance]] gate, enforced here so the
  * aggregate is safe standalone).
  */
case class VecMomentsAgg(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0, s"vec_moments: dim must be positive: $dim")

  private val bufLen = 1 + dim + dim * (dim + 1) / 2

  override def prettyName: String = "vec_moments"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float|double> operand, got ${dt.catalogString}")
  }

  @inline private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], row: InternalRow): Array[Double] = {
    val v = child.eval(row)
    if (v == null) return buf
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return buf
    val isFloat = elemIsFloat
    val d = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return buf
      d(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    buf(0) += 1.0
    i = 0
    var off = 1 + dim
    while (i < dim) {
      buf(1 + i) += d(i)
      val di = d(i)
      var j = i
      while (j < dim) { buf(off) += di * d(j); j += 1; off += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    var i = 0
    while (i < bufLen) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMomentsAgg =
    copy(child = newChildren.head)
}
