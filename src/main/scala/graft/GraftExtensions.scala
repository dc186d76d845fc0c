package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension: registers graft's native Catalyst functions for SQL
  * use. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or at
  * runtime via [[GraftFunctions.registerAll]].
  *
  * SQL surface:
  *   `minhash_agg(shingle, numPerms)` — aggregate minhash signature.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("minhash_agg"),
        new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
        (exprs: Seq[Expression]) => GraftFunctions.buildMinhashAgg(exprs)
      )
    )
  }
}

object GraftFunctions {

  def buildMinhashAgg(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "minhash_agg(shingle, numPerms)")
    val numPerms = exprs(1).eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(s"numPerms must be an integer literal, got $other")
    }
    MinHashAgg(exprs.head, numPerms).toAggregateExpression()
  }

  /** Runtime registration of every graft function on an existing session:
    * the scalar kernels (via the public UDF registry) plus the native
    * aggregates (via the session function registry).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.FunctionInstaller.install(spark)
    graft.functions.VectorFns.register(spark)
    graft.operators.Dedup.register(spark)
  }
}
