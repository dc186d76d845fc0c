package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch CDC semantics re-expressed Spark-first.
  *
  * The reference consumer (reference consumer.py:60-105) applies Debezium
  * envelopes to an OpenSearch index: upsert by primary key for op in
  * {r,c,u}, delete by key for op=d. The equivalent *batch* computation over a
  * changelog is a last-write-wins reduction per key.
  *
  * Scale design: we deliberately use `max_by(payload, seq)` under a
  * `groupBy(key)` instead of a `row_number()` window. The aggregate gets
  * map-side partial aggregation (per-partition duplicates collapse before the
  * shuffle) and needs no sort; the window form would shuffle *all* rows and
  * sort every partition — at 100 TB that is the difference between one
  * combine-shuffle of unique keys and a full-data sort.
  */
object CdcBatch {

  /** Latest state per key: for each `key`, the payload row with the highest
    * `seq` (a struct column gives lexicographic ordering, e.g. (ts, id)).
    */
  def latestState(changelog: DataFrame, key: String, seq: Column, payload: Column*): DataFrame = {
    val pay = struct(payload: _*)
    changelog
      .groupBy(col(key))
      .agg(max_by(pay, seq).as("_last"))
      .select(col(key), col("_last.*"))
  }

  /** Full op application: latest state per key, then drop keys whose final
    * op is a delete. `isDelete` is evaluated against the surviving row.
    * Mirrors consumer.py: upserts for c/u/r, removal for d.
    */
  def applyOps(changelog: DataFrame, key: String, seq: Column, isDelete: Column, payload: Column*): DataFrame =
    latestState(changelog, key, seq, (payload :+ isDelete.as("_is_delete")): _*)
      .filter(!col("_is_delete"))
      .drop("_is_delete")

  /** Per-op counters, as the reference consumer's stats block
    * (reference consumer.py:52,107-117): snapshot/create/update/delete.
    */
  def opStats(changelog: DataFrame, op: Column): DataFrame =
    changelog.groupBy(op.as("op")).agg(count(lit(1)).as("cnt"))

  /** SCD type-2 history: every change event becomes a versioned validity
    * interval — `valid_from` = its own timestamp, `valid_to` = the next
    * version's (open/NULL on the current row). The upsert-only reference
    * index keeps just the last write; the history table is what a
    * warehouse materializes from the same changelog when point-in-time
    * queries matter.
    *
    * Scale: one keyed shuffle + per-key sort — the minimum for interval
    * construction, which is inherently an ordered-adjacency computation
    * per key. `lead`/`row_number` stream each key partition once with
    * O(1) state; nothing is global.
    */
  def scd2(changelog: DataFrame, key: String, seq: Column, validFrom: Column, payload: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key)).orderBy(seq)
    changelog.select(
      (Seq(
        col(key),
        row_number().over(w).as("version"),
        validFrom.as("valid_from"),
        lead(validFrom, 1).over(w).as("valid_to"),
        lead(validFrom, 1).over(w).isNull.as("is_current")
      ) ++ payload): _*
    )
  }
}
