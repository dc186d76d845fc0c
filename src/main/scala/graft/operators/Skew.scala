package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's skew-join splitting handles most cases at runtime; these are the
  * explicit forms for when the skew is known and extreme (a handful of keys
  * holding a double-digit share of a 100 TB fact table), which AQE's
  * post-shuffle splitting cannot fix for broadcast-ineligible build sides.
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a smaller-but-not-
    * broadcastable dimension side:
    *
    *   fact:  salt = hash(entire row) % factor   (deterministic, no rand())
    *   dim:   replicated `factor` times, one row per salt value
    *   join on (key, salt)
    *
    * Each hot key's rows spread over `factor` reducers instead of one.
    * Deterministic salting keeps the operation replayable (rand() would
    * break retried-task idempotence).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(hash(fact.columns.map(col): _*), lit(factor)))
    val saltedDim = dim.withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt) first, then merge per key. Spark's hash aggregates already
    * do map-side partials; this adds a REDUCE-side split for keys whose
    * post-shuffle partial states still overload one task (e.g. exact
    * distinct counts per hot key).
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      factor: Int,
      partial: Column => Column,
      merge: Column => Column,
      valueCol: Column
  ): DataFrame =
    df.withColumn("_salt", pmod(hash(valueCol), lit(factor)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(partial(valueCol).as("_partial"))
      .groupBy(col("key"))
      .agg(merge(col("_partial")).as("value"))
}
