package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native exact-Jaccard verify kernels (r18): the compiled forms of
  * Dedup.jaccardUdf / jaccardAtLeastUdf, operating on UTF8String
  * ArrayData directly. The Scala UDFs paid a full ArrayData →
  * Seq[String] conversion (one java.lang.String per element) per
  * candidate pair — ~3.6 µs/pair measured at sf0.1 (0.7 s of
  * dedup_ngram_jaccard's 4.8 s over 197 k candidates). Arithmetic,
  * duplicate handling, early-abandon bound and the −1 sentinel are
  * replicated operation-for-operation, so emitted scores are
  * bit-identical (JaccardExprSpec pins it; the all-pairs DuckDB oracle
  * re-checks end-to-end).
  */
private[graft] object JaccardKernels {
  /** |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)| — the
    * jaccardUdf contract (both sides deduped via toSet).
    */
  def plain(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String](math.max(8, a.numElements() * 2))
    var i = 0
    val na = a.numElements()
    while (i < na) { if (!a.isNullAt(i)) sa.add(a.getUTF8String(i)); i += 1 }
    val seen = new java.util.HashSet[UTF8String](math.max(8, b.numElements() * 2))
    var inter = 0
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (!b.isNullAt(j)) {
        val x = b.getUTF8String(j)
        if (seen.add(x) && sa.contains(x)) inter += 1
      }
      j += 1
    }
    val union = sa.size + seen.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** jaccardAtLeastUdf contract: sa deduped, b iterated RAW in order
    * (duplicates counted — the shingle arrays are pre-distinct so none
    * occur, but the arithmetic replicates the UDF exactly), early
    * abandon to −1 when the reachable overlap falls below the t-bound.
    */
  def atLeast(a: ArrayData, b: ArrayData, t: Double): Double = {
    val sa = new java.util.HashSet[UTF8String](math.max(8, a.numElements() * 2))
    var i = 0
    val na = a.numElements()
    while (i < na) { if (!a.isNullAt(i)) sa.add(a.getUTF8String(i)); i += 1 }
    val nb = b.numElements()
    val minInter = t / (1 + t) * (sa.size + nb) - 1e-7
    var inter = 0
    var probed = 0
    while (probed < nb) {
      if (!b.isNullAt(probed) && sa.contains(b.getUTF8String(probed))) inter += 1
      probed += 1
      if (inter + (nb - probed) < minInter) return -1.0
    }
    val union = sa.size + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

case class JaccardSim(left: Expression, right: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim_native"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<string> inputs, got ${children.map(_.dataType.catalogString)}")

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else JaccardKernels.plain(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  // Full codegen (r19, was CodegenFallback): children evaluate inside
  // the whole-stage span and the kernel is one static call — the
  // fallback boxed an InternalRow and re-entered interpreted eval per
  // candidate pair (the verdict-flagged WSCG-boundary cost).
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = ${l.isNull} || ${r.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.JaccardKernels.plain(${l.value}, ${r.value});
      }
    """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

case class JaccardAtLeast(left: Expression, right: Expression, threshold: Double)
    extends Expression {
  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_at_least"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<string> inputs, got ${children.map(_.dataType.catalogString)}")

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else JaccardKernels.atLeast(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)
  }

  // Full codegen (r19): see JaccardSim.doGenCode.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = ${l.isNull} || ${r.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.JaccardKernels.atLeast(${l.value}, ${r.value}, $threshold);
      }
    """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object JaccardExprs {
  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def jaccardAtLeast(a: Column, b: Column, t: Double): Column =
    ColumnBridge.column(JaccardAtLeast(ColumnBridge.expression(a), ColumnBridge.expression(b), t))
}
