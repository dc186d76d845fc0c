package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 0-based positions of any of `terms` in a token array, as one
  * compiled eval (r18) — the span-query position primitive. Replaces
  * the interpreted two-pass HOF
  * `filter(transform(toks, (t,i) -> IF(t IN terms, i, -1)), x -> x>=0)`
  * bit-for-bit: same positions in the same order, NULL array → NULL,
  * NULL tokens never match (the `===` null → else(-1) branch).
  */
case class TokenPositions(child: Expression, terms: Seq[String], prefixMode: Boolean = false)
    extends Expression {

  require(terms.nonEmpty, "tokenPositions needs at least one term")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_positions"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<string>, got ${other.catalogString}")
    }

  @transient private lazy val termArr: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    TokenPositions.compute(v.asInstanceOf[ArrayData], termArr, prefixMode)
  }

  // Full codegen (r19, was CodegenFallback): the term array rides the
  // generated class as a reference object and the scan loop is one
  // static call inside the whole-stage span — the fallback boxed an
  // InternalRow and re-entered interpreted eval per document row.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val termsRef = ctx.addReferenceObj("terms", termArr, "org.apache.spark.unsafe.types.UTF8String[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.TokenPositions.compute(${c.value}, $termsRef, $prefixMode);
      }
    """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object TokenPositions {

  /** The scan loop shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, termArr: Array[UTF8String], prefixMode: Boolean): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Int](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        var hit = false
        while (!hit && j < termArr.length) {
          hit = if (prefixMode) t.startsWith(termArr(j)) else termArr(j).equals(t)
          j += 1
        }
        if (hit) { out(k) = i; k += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  def positionsOf(toks: Column, terms: String*): Column =
    ColumnBridge.column(TokenPositions(ColumnBridge.expression(toks), terms))

  /** Positions of tokens with any of `prefixes` as a prefix — the
    * `t LIKE 'p%'` span_multi matcher (startsWith == LIKE with one
    * trailing %, and a NULL token matches neither way).
    */
  def positionsOfPrefix(toks: Column, prefixes: String*): Column =
    ColumnBridge.column(TokenPositions(ColumnBridge.expression(toks), prefixes, prefixMode = true))
}
