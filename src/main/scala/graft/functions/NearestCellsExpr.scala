package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native codegen'd nearest-centroid assignment: the `nAssign` centroid
  * indices nearest (squared-L2) to an `array<float>` vector, distance
  * ascending with ties broken by lower index — exactly the ordering the
  * IVF assignment UDF produced via `sorted.take(n)` over `(dist, idx)`
  * tuples.
  *
  * Why an `Expression` and not a UDF: centroid assignment is O(n ×
  * nLists × dim) and nLists itself scales with the corpus
  * ([[graft.operators.Similarity.semanticAutoLists]]), so this loop is
  * the dominant flop count of every IVF build/refine/assign at scale.
  * The boxed `Seq[Float]` UDF paid ~10× in element access alone, and —
  * worse — Catalyst collapses deterministic projections into `Generate`,
  * so a UDF feeding a `posexplode` re-ran per EXPLODED row (a silent
  * dim-× amplification measured at 40 s for a 20 k × 157-cell Lloyd
  * refine). Here the kernel reads the `ArrayData` buffer primitively and
  * the centroid matrix rides the plan once as a flat `float[]` reference
  * object (~dim·nLists·4 B — broadcast-class index metadata, the same
  * object the driver already holds).
  *
  * Accumulation is the same strict ascending-dimension double loop as
  * the UDF (`(v_j − c_j)²` in double), so cell assignments are
  * bit-identical to the old path.
  *
  * Null semantics: null vector → null (callers map to cell −1 / empty).
  */
case class NearestCells(child: Expression, centroids: Array[Float], dim: Int, nAssign: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"nearest_cells needs an array<float> vector, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    NearestCells.compute(input.asInstanceOf[ArrayData], centroids, dim, nAssign)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[]")
    nullSafeCodeGen(
      ctx,
      ev,
      v => s"${ev.value} = graft.functions.NearestCells.compute($v, $cents, $dim, $nAssign);"
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCells {

  /** Top-`k` nearest centroid indices by squared L2, distance asc then
    * index asc. `cents` is row-major `nLists × dim`. Dimensions beyond
    * the vector's length are ignored (the UDF's `min(lengths)` rule).
    */
  def compute(v: ArrayData, cents: Array[Float], dim: Int, k: Int): ArrayData = {
    val nLists = cents.length / dim
    val kk = math.min(k, nLists)
    if (kk <= 0) return new GenericArrayData(Array.emptyIntArray)
    val bd = new Array[Double](kk)
    val bi = new Array[Int](kk)
    java.util.Arrays.fill(bd, Double.MaxValue)
    val vd = math.min(dim, v.numElements())
    var i = 0
    while (i < nLists) {
      val off = i * dim
      var d = 0.0
      var j = 0
      while (j < vd) {
        val t = v.getFloat(j).toDouble - cents(off + j).toDouble
        d += t * t
        j += 1
      }
      if (d < bd(kk - 1)) {
        var p = kk - 1
        while (p > 0 && bd(p - 1) > d) {
          bd(p) = bd(p - 1)
          bi(p) = bi(p - 1)
          p -= 1
        }
        bd(p) = d
        bi(p) = i
      }
      i += 1
    }
    new GenericArrayData(bi)
  }
}
