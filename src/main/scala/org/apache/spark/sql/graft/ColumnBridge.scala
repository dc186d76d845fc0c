package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 moved `Column` to a backend-agnostic representation
  * (`ColumnNode`); wrapping a raw Catalyst expression goes through
  * `classic.ExpressionUtils`, which is `private[sql]` — hence this shim
  * living under `org.apache.spark.sql`. This is the supported pattern for
  * third-party Catalyst extensions (the alternative, registering in the
  * session FunctionRegistry, uses the same access path).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Rebind a logical plan as a DataFrame in (possibly another) session
    * — the `classic.Dataset.ofRows` path, `private[sql]` hence bridged
    * here. Used to give each `_sql` endpoint request its own
    * temp-view-registry scope (`SparkSession.newSession()`).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  ): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session's analyzed plan for a Dataset (classic-only API). */
  def analyzedPlan(df: org.apache.spark.sql.Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Parse a SQL statement to its UNRESOLVED logical plan without
    * executing it — lets callers validate the statement CLASS (query vs
    * command) structurally instead of by string prefix.
    */
  def parsePlan(
      spark: org.apache.spark.sql.SparkSession,
      stmt: String
  ): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.sqlParser.parsePlan(stmt)

  def aggColumn(f: AggregateFunction): Column = ExpressionUtils.column(f.toAggregateExpression())

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The alias a caller put on a Column (`c.as("name")`), if any. Spark 4
    * Columns wrap a backend-agnostic `ColumnNode`, so the alias lives on
    * `internal.Alias`, not on a Catalyst `Alias`.
    */
  def aliasName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.Alias => a.name.headOption
    case _                                      => None
  }

  /** Decompose a sort Column (`col("x").desc` / `col("x").asc` / bare
    * `col("x")`) into (column name, ascending) — the form name-addressed
    * operators like TopKPerKey take.
    */
  def sortSpec(c: Column): (String, Boolean) = {
    import org.apache.spark.sql.internal.{ColumnNode, SortOrder, UnresolvedAttribute}
    def name(n: ColumnNode): String = n match {
      case a: UnresolvedAttribute => a.nameParts.mkString(".")
      case other =>
        throw new IllegalArgumentException(s"sort expression must be a plain column, got: $other")
    }
    c.node match {
      case s: SortOrder => (name(s.child), s.sortDirection == SortOrder.Ascending)
      case other        => (name(other), true)
    }
  }
}

/** Installs graft's native Catalyst functions into an existing session's
  * function registry (the runtime twin of the `spark.sql.extensions`
  * path, which only applies at session construction).
  */
object FunctionInstaller {
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "minhash_agg",
      exprs => graft.GraftFunctions.buildMinhashAgg(exprs),
      "scala_udf"
    )
  }
}
