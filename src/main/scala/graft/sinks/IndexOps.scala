package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-management operations over file-backed indices — the OpenSearch
  * management APIs the reference deployment relies on
  * (`_reindex`, `_delete_by_query`, `_update_by_query`,
  * `_cat/indices`-style stats), as idempotent batch rewrites.
  *
  * Every op is read → transform → full overwrite of the target index:
  * deterministic, replayable, and embarrassingly parallel (the same model
  * OpenSearch implements with scroll+bulk under the hood, minus the
  * version-conflict bookkeeping an immutable rewrite makes unnecessary).
  * Documents keep their `_id`; transforms must preserve it.
  */
object IndexOps {

  /** `_reindex` with an optional transform (field mapping / filtering):
    * copy src into dst applying `transform`. Returns dst doc count.
    */
  def reindex(
      spark: SparkSession,
      root: String,
      src: String,
      dst: String,
      transform: DataFrame => DataFrame = identity
  ): Long = {
    val docs = transform(IndexFileSink.readIndex(spark, root, src))
    require(docs.columns.contains("_id"), "reindex transform must preserve _id")
    IndexFileSink.indexBatch(docs, root, dst, "_id")
    IndexFileSink.readIndex(spark, root, dst).count()
  }

  /** `_delete_by_query`: drop matching docs, rewrite the index. Returns
    * the number deleted.
    */
  def deleteByQuery(spark: SparkSession, root: String, index: String, predicate: Column): Long = {
    // localCheckpoint (eager) cuts the lineage back to the index files, so
    // the overwrite below is not "writing a path being read".
    val docs = IndexFileSink.readIndex(spark, root, index).localCheckpoint()
    val keep = docs.filter(!coalesce(predicate, lit(false)))
    val deleted = docs.count() - keep.count()
    IndexFileSink.indexBatch(keep, root, index, "_id")
    deleted
  }

  /** `_update_by_query`: apply column updates to matching docs. Returns
    * the number of matched docs.
    */
  def updateByQuery(
      spark: SparkSession,
      root: String,
      index: String,
      predicate: Column,
      updates: Map[String, Column]
  ): Long = {
    val docs = IndexFileSink.readIndex(spark, root, index).localCheckpoint()
    val updated = updates.foldLeft(docs) { case (d, (name, value)) =>
      d.withColumn(name, when(predicate, value).otherwise(col(name)))
    }
    val matched = docs.filter(predicate).count()
    IndexFileSink.indexBatch(updated, root, index, "_id")
    matched
  }

  /** `_cat/indices`-style stats: per-index doc counts. */
  def catIndices(spark: SparkSession, root: String, indices: Seq[String]): DataFrame = {
    val frames = indices.map { ix =>
      IndexFileSink
        .readIndex(spark, root, ix)
        .agg(count(lit(1)).as("docs_count"))
        .select(lit(ix).as("index"), col("docs_count"))
    }
    frames.reduce(_ unionByName _).orderBy("index")
  }
}
