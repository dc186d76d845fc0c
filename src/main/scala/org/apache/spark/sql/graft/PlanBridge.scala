package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to construct a DataFrame from a custom LogicalPlan (Dataset.ofRows
  * is private[sql]).
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan
    )

  /** An eagerly-materialized, lineage-truncated copy of a DataFrame with a
    * deterministic release handle — what `Dataset.localCheckpoint()` does,
    * except the persisted RDD is returned so iterative algorithms can
    * `unpersist()` round N−1 once round N is materialized instead of
    * leaking every round's blocks until ContextCleaner GC.
    */
  final class Materialized(val df: DataFrame, rdd: org.apache.spark.rdd.RDD[_]) {
    def unpersist(): Unit = rdd.unpersist(blocking = false)
  }

  def materialize(df: DataFrame): Materialized = {
    // toRdd reuses unsafe-row buffers per partition — copy before caching.
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager: one materialization, failures surface here
    val out = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, df.schema)
    new Materialized(out, rdd)
  }
}
