package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native cross-covariance accumulator: one pass over (x, y) vector-pair
  * rows producing the flattened dim×dim matrix M = Σᵢ xᵢ·yᵢᵀ — the
  * orthogonal-Procrustes statistic a full-corpus OPQ rotation update
  * needs (M's SVD gives the optimal rotation; see Similarity.opqIndexFull).
  *
  * Why a custom Catalyst aggregate: the DataFrame alternative explodes
  * dim² product terms per row (a 4096× fan-out at dim=64) through a hash
  * aggregate. This TypedImperativeAggregate keeps ONE primitive double[]
  * buffer per partition inside ObjectHashAggregate with map-side partial
  * aggregation — the shuffle carries #partitions × dim² doubles,
  * independent of corpus size, which is what makes corpus-scale OPQ
  * training viable at 100 TB.
  */
case class OuterProductSumAgg(
    left: Expression,
    right: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "outer_product_sum"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall {
      _.dataType match {
        case ArrayType(DoubleType, _) => true
        case _                        => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> columns, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}"
      )
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim * dim)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val xv = left.eval(input)
    val yv = right.eval(input)
    if (xv != null && yv != null) {
      val x = xv.asInstanceOf[ArrayData].toDoubleArray()
      val y = yv.asInstanceOf[ArrayData].toDoubleArray()
      require(x.length == dim && y.length == dim, s"$prettyName: expected dim $dim, got ${x.length}/${y.length}")
      var a = 0
      while (a < dim) {
        val xa = x(a)
        val rowOff = a * dim
        var b = 0
        while (b < dim) { buffer(rowOff + b) += xa * y(b); b += 1 }
        a += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object OuterProductSumAgg {

  /** Aggregate column: flattened row-major Σ x·yᵀ (array<double> of
    * length dim²) over the group's (x, y) vector pairs.
    */
  def outerProductSum(x: Column, y: Column, dim: Int): Column =
    ColumnBridge.aggColumn(OuterProductSumAgg(ColumnBridge.expression(x), ColumnBridge.expression(y), dim))
}
