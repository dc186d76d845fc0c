package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token n-gram shingles as ONE native codegen expression — the r19 swap
  * for the boxed `udf((toks: Seq[String]) => toks.sliding(n).map(
  * _.mkString(" ")))` that every gram pipeline (dupSpanStats,
  * exciseDupSpans, containmentPairs, ngramJaccardPairs, wordNgrams)
  * evaluated per row: the UDF paid an ArrayData→Seq[String] conversion in
  * and a Seq→ArrayData conversion out per document (the same boxing class
  * the r18 Jaccard kernels removed), where this expression windows the
  * UTF8String elements directly.
  *
  * Value contract (bit-identical to the UDF, pinned by NgramsSpec):
  * null or shorter-than-n input → EMPTY array (never null, so the
  * expression is non-nullable exactly like the UDF column); gram i =
  * tokens[i..i+n-1] joined by a single space. A null element renders as
  * the literal "null", matching Seq.mkString (split() output never
  * contains nulls, so this branch is dead on every call site).
  */
case class NgramsFromTokensExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be positive: $n")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams_from_tokens"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"ngrams_from_tokens needs array<string>, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) NgramsFromTokensExpr.empty()
    else NgramsFromTokensExpr.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (${childGen.isNull}) {
          ${ev.value} = graft.functions.NgramsFromTokensExpr.empty();
        } else {
          ${ev.value} = graft.functions.NgramsFromTokensExpr.compute(${childGen.value}, $n);
        }
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramsFromTokensExpr {

  private val EMPTY = new GenericArrayData(Array.empty[Any])
  private val NULL_TOKEN = UTF8String.fromString("null")
  private val SEP = UTF8String.fromString(" ")

  /** The shared empty-array instance (codegen null branch). */
  def empty(): ArrayData = EMPTY

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return EMPTY
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) NULL_TOKEN else t
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= len - n) {
      System.arraycopy(toks, i, window, 0, n)
      out(i) = UTF8String.concatWs(SEP, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column form, the [[graft.functions.TextFns.ngramsFromTokens]] swap. */
  def ngrams(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NgramsFromTokensExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c), n)
    )
}
