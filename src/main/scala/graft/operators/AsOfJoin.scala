package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator Spark lacks natively, central to
  * CDC analytics: enrich each probe row with the build side's latest state
  * as of the probe's timestamp (SCD2 lookups, point-in-time joins,
  * "what did the dimension look like when this event happened").
  *
  * Implementation is the scalable union+window form, not a range join:
  * tag both sides, union, and carry the last non-null build payload
  * forward within each key ordered by (ts, side, seq). One shuffle on the
  * key, sequential scan per key — no per-row range probe, no cross join,
  * and skew behaves like any window (hot keys can be salted upstream).
  *
  * Strictness: build rows sort AFTER probe rows at equal timestamps, so a
  * probe sees only state strictly before its own ts (the CDC-safe choice:
  * an event never observes a state change from its own instant).
  */
object AsOfJoin {

  /** @param probe      left side (each row gets enriched)
    * @param build      right side (the state history)
    * @param key        join key column name (same name both sides)
    * @param probeTs    probe timestamp column
    * @param buildTs    build timestamp column
    * @param buildSeq   unique tie-break within (key, ts) on the build side
    * @param payload    build columns to carry (exposed as prior_<name>)
    */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeTs: String,
      buildTs: String,
      buildSeq: String,
      payload: Seq[String]
  ): DataFrame = {
    val probeCols = probe.columns
    val tagged =
      probe
        .withColumn("_side", lit(0))
        .withColumn("_ts", col(probeTs))
        .withColumn("_seq", lit(Long.MinValue))
        .select(
          Seq(col("_side"), col("_ts"), col("_seq"), col(key)) ++
            probeCols.filterNot(_ == key).map(col) ++
            payload.map(c => lit(null).cast(build.schema(c).dataType).as(s"_b_$c")): _*
        )
    val buildTagged =
      build
        .withColumn("_side", lit(1))
        .withColumn("_ts", col(buildTs))
        .withColumn("_seq", col(buildSeq).cast("long"))
        .select(
          Seq(col("_side"), col("_ts"), col("_seq"), col(key)) ++
            probeCols.filterNot(_ == key).map(c => lit(null).cast(probe.schema(c).dataType).as(c)) ++
            payload.map(c => col(c).as(s"_b_$c")): _*
        )
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").asc, col("_seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = tagged
      .unionByName(buildTagged)
      .select(
        Seq(col("_side"), col(key)) ++
          probeCols.filterNot(_ == key).map(col) ++
          payload.map(c => last(col(s"_b_$c"), ignoreNulls = true).over(w).as(s"prior_$c")): _*
      )
    enriched.filter(col("_side") === 0).drop("_side")
  }
}
