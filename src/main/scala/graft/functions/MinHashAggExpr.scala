package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash aggregate: one pass over (id, shingle) rows, producing
  * the `numPerms`-wide minimum-hash signature per group.
  *
  * Why a custom Catalyst aggregate instead of 128 separate `min(hash(...))`
  * aggregates: 128 aggregate expressions blow past the whole-stage-codegen
  * method-size limits and fall back to interpreted evaluation (measured
  * ~15s for 5k docs); this TypedImperativeAggregate keeps one primitive
  * int[] buffer per group, runs inside ObjectHashAggregate with map-side
  * partial aggregation, and digests each shingle ONCE in a tight JVM loop.
  *
  * Permutation p is the affine family over an md5-derived base
  * ([[OracleHash]]): base = md5Int60(shingle) mod P, h_p = (a_p·base +
  * b_p) mod P — every value recomputable in DuckDB SQL, which is what
  * makes the whole MinHash pipeline (signatures → bands → candidates →
  * verified pairs) fully oracle-checkable (r16; the murmur3-seeded form
  * it replaces was rows-only). Also cheaper: one digest per shingle
  * instead of numPerms murmur3 passes over the bytes.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  // Analysis-time type check: without it a SQL call like
  // minhash_agg(int_col, 128) passes analysis and dies at runtime on the
  // UTF8String cast.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string shingle column, got ${child.dataType.catalogString}"
      )

  override def createAggregationBuffer(): Array[Int] = Array.fill(numPerms)(Int.MaxValue)

  // permutation coefficients, hoisted out of the per-row loop
  @transient private lazy val pa: Array[Long] = Array.tabulate(numPerms)(OracleHash.permA)
  @transient private lazy val pb: Array[Long] = Array.tabulate(numPerms)(OracleHash.permB)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val base = OracleHash.md5ModP(s.getBytes)
      var p = 0
      while (p < numPerms) {
        // (a·base + b) mod P < 2^31-1: fits the int buffer exactly
        val h = ((pa(p) * base + pb(p)) % OracleHash.P).toInt
        if (h < buffer(p)) buffer(p) = h
        p += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var p = 0
    while (p < numPerms) {
      if (b2(p) < b1(p)) b1(p) = b2(p)
      p += 1
    }
    b1
  }

  override def eval(buffer: Array[Int]): Any =
    new GenericArrayData(buffer)

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numPerms * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {

  /** Aggregate column: minhash signature (array<int> of length numPerms)
    * over a group's string shingles.
    */
  def minhash(shingle: Column, numPerms: Int): Column =
    ColumnBridge.aggColumn(MinHashAgg(ColumnBridge.expression(shingle), numPerms))
}
