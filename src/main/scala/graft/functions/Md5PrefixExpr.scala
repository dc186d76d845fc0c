package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `conv(substring(md5(s), 1, nHex), 16, 10)` as ONE native codegen
  * expression: the first `nHex` hex chars of md5(s) parsed as an unsigned
  * integer — i.e. the top 4·nHex bits of the digest, big-endian. The SQL
  * chain pays a 32-char hex ENCODE, a substring copy, a radix-16 string
  * PARSE, and (at the call sites) a string→bigint cast per row; this
  * expression computes the same value straight from the digest bytes
  * (r19 — the verdict-flagged `ann_graph_hier_build` md5-promotion cost).
  *
  * Bit-equality with the SQL spelling is pinned by Md5PrefixSpec for
  * every call-site nHex; the DuckDB oracle spelling
  * `CAST(('0x'||substr(md5(s),1,nHex)) AS BIGINT)` is unchanged — this
  * swaps engine-side evaluation only, never the value.
  *
  * nHex is capped at 15 (60 bits) so the value always fits a signed
  * non-negative Long, exactly like the conv-based chain the sites used.
  */
case class Md5PrefixLong(child: Expression, nHex: Int) extends UnaryExpression {
  require(nHex >= 1 && nHex <= 15, s"nHex must be in [1, 15]: $nHex")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"md5_prefix_long needs a string child, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5PrefixLong.compute(input.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      v => s"${ev.value} = graft.functions.Md5PrefixLong.compute($v, $nHex);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5PrefixLong {

  /** Column form: `md5PrefixLong(c, nHex)` ≡
    * `conv(substring(md5(c), 1, nHex), 16, 10).cast("bigint")`.
    */
  def md5PrefixLong(c: org.apache.spark.sql.Column, nHex: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      Md5PrefixLong(org.apache.spark.sql.graft.ColumnBridge.expression(c), nHex)
    )

  /** Top 4·nHex bits of md5(utf8 bytes of `s`), big-endian — the value
    * of `conv(substring(md5(s), 1, nHex), 16, 10)` as a Long.
    */
  def compute(s: UTF8String, nHex: Int): Long = {
    val d = OracleHash.md5Digest(s.getBytes)
    val nBytes = (nHex + 1) / 2
    var v = 0L
    var i = 0
    while (i < nBytes) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    if ((nHex & 1) == 1) v >>> 4 else v
  }
}
