package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared base for the native vector kernels ([[DotProduct]], [[L2Sq]]) —
  * the [[CosineSim]] pattern generalized: both sides are `array<float>`
  * or `array<double>` in any combination, read primitively from the
  * `ArrayData` buffers inside the consuming whole-stage-codegen loop
  * (no Seq boxing, no cast-to-array<double> copy per row; float→double
  * widening per element is exact). Accumulation is strict sequential
  * left-to-right double — bitwise-identical to the retired UDF kernels
  * and to DuckDB's list functions, so oracle hash compares stay exact
  * (SqlFunctionsSpec pins the parity).
  *
  * Null semantics: null if either side is null (NullIntolerant).
  */
abstract class VectorBinaryExpr extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}"
      )

  protected def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Java statements accumulating over elements `x` (left) and `y`
    * (right); must assign the result to `ev.value`.
    */
  protected def loopBody(x: String, y: String, acc: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val getA = if (isFloat(left.dataType)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val getB = if (isFloat(right.dataType)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = $getA;
           |  double $y = $getB;
           |  ${loopBody(x, y, acc)}
           |}
           |${ev.value} = $acc;
         """.stripMargin
      }
    )
}

/** Sequential-fold dot product in double precision (native twin of the
  * retired `dot_product` UDF kernel).
  */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "dot_product"

  override protected def loopBody(x: String, y: String, acc: String): String =
    s"$acc += $x * $y;"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xd = a.asInstanceOf[ArrayData]
    val yd = b.asInstanceOf[ArrayData]
    val xf = isFloat(left.dataType)
    val yf = isFloat(right.dataType)
    val n = math.min(xd.numElements(), yd.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (xf) xd.getFloat(i).toDouble else xd.getDouble(i)
      val y = if (yf) yd.getFloat(i).toDouble else yd.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance (monotone in L2 — fine for ranking, cheaper);
  * native twin of the retired `l2_sq` UDF kernel.
  */
case class L2Sq(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "l2_sq"

  override protected def loopBody(x: String, y: String, acc: String): String =
    s"double d_$acc = $x - $y; $acc += d_$acc * d_$acc;"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xd = a.asInstanceOf[ArrayData]
    val yd = b.asInstanceOf[ArrayData]
    val xf = isFloat(left.dataType)
    val yf = isFloat(right.dataType)
    val n = math.min(xd.numElements(), yd.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (xf) xd.getFloat(i).toDouble else xd.getDouble(i)
      val y = if (yf) yd.getFloat(i).toDouble else yd.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
