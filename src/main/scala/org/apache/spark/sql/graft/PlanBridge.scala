package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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

  /** Run `action` and capture the `Dataset.observe(metricName, ...)` row
    * from whichever query execution inside it carried the metric — the
    * mechanism that lets a side statistic (rows matched, rows dropped)
    * ride the SAME job as a write instead of costing a second scan.
    * Retry-safe by construction: observed metrics come from completed
    * query executions, not raw task-side accumulators. The listener bus
    * is flushed before reading (accessible here because this object lives
    * under org.apache.spark).
    */
  def withObservedMetric[T](spark: SparkSession, metricName: String)(action: => T): (T, Option[Row]) = {
    val captured = new java.util.concurrent.atomic.AtomicReference[Option[Row]](None)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long
      ): Unit =
        qe.observedMetrics.get(metricName).foreach(r => captured.set(Some(r)))
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception
      ): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val res = action
      spark.sparkContext.listenerBus.waitUntilEmpty()
      (res, captured.get())
    } finally spark.listenerManager.unregister(listener)
  }

  def materialize(df: DataFrame): Materialized = {
    // toRdd reuses unsafe-row buffers per partition — copy before caching.
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Truncate the RDD lineage too, not just the logical plan: without
    // this each round's RDD chains to the previous (soon-unpersisted)
    // round's, so lineage depth grows with iterations and a lost block
    // cascades recomputes back to the source. After truncation a lost
    // block fails loudly instead — local blocks are not fault-tolerant;
    // cluster deployments wanting durability use the parquet
    // checkpointDir mode (see operators.Components).
    rdd.localCheckpoint()
    rdd.count() // eager: one materialization + lineage cut, failures surface here
    val out = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, df.schema)
    new Materialized(out, rdd)
  }
}
