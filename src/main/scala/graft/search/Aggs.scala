package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OpenSearch aggregation semantics (reference DASHBOARD_GUIDE.md
  * visualizations: terms / date_histogram / stats / cardinality /
  * percentiles / filtered counts) as declarative Spark aggregations.
  *
  * All of these are hash aggregations with map-side partial aggregation —
  * one shuffle of (group, partial-state), never a sort of the fact table —
  * which is the plan shape that survives a 100× scale-up.
  */
object Aggs {

  /** `terms` aggregation: top-`size` buckets by doc count (desc), key asc as
    * the deterministic tie-break (OpenSearch's own tie-break).
    */
  def termsAgg(df: DataFrame, field: Column, size: Int): DataFrame =
    df.groupBy(field.as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(size)

  /** `date_histogram` with calendar interval + metric sub-aggregations. */
  def dateHistogram(df: DataFrame, ts: Column, interval: String, metrics: Seq[Column]): DataFrame =
    df.groupBy(date_trunc(interval, ts).as("bucket"))
      .agg(count(lit(1)).as("doc_count"), metrics: _*)
      .orderBy("bucket")

  /** `stats` aggregation: count/min/max/avg/sum of a numeric field. */
  def stats(df: DataFrame, field: Column): DataFrame =
    df.agg(
      count(field).as("cnt"),
      round(min(field), 2).as("min_v"),
      round(max(field), 2).as("max_v"),
      round(avg(field), 2).as("avg_v"),
      round(sum(field), 2).as("sum_v")
    )

  /** `cardinality` aggregation. Exact variant (count distinct) for the
    * oracle; `approxCardinality` is the HLL++ scale path OpenSearch actually
    * uses (one pass, constant memory, no exact-distinct shuffle).
    */
  def cardinality(df: DataFrame, fields: Seq[(String, Column)]): DataFrame =
    df.agg(
      countDistinct(fields.head._2).as(fields.head._1),
      fields.tail.map { case (n, c) => countDistinct(c).as(n) }: _*
    )

  def approxCardinality(df: DataFrame, fields: Seq[(String, Column)]): DataFrame =
    df.agg(
      approx_count_distinct(fields.head._2).as(fields.head._1),
      fields.tail.map { case (n, c) => approx_count_distinct(c).as(n) }: _*
    )

  /** `percentiles` aggregation (linear interpolation, matching both
    * OpenSearch TDigest asymptotically and DuckDB quantile_cont exactly at
    * verification scale). `approxPercentiles` is the sketch-based path for
    * 100 TB (no global sort).
    */
  def percentiles(df: DataFrame, field: Column, ps: Seq[(String, Double)]): DataFrame =
    df.agg(
      round(percentile(field, lit(ps.head._2)), 6).as(ps.head._1),
      ps.tail.map { case (n, p) => round(percentile(field, lit(p)), 6).as(n) }: _*
    )

  def approxPercentiles(df: DataFrame, field: Column, ps: Seq[(String, Double)]): DataFrame =
    df.agg(
      round(approx_percentile(field, lit(ps.head._2), lit(10000)), 2).as(ps.head._1),
      ps.tail.map { case (n, p) => round(approx_percentile(field, lit(p), lit(10000)), 2).as(n) }: _*
    )

  /** Filter-context conditional counts (the "Active vs Pending" metric
    * visualization): one pass, no join of separate filtered scans.
    */
  def filteredCounts(df: DataFrame, conds: Seq[(String, Column)]): DataFrame =
    df.agg(
      count(lit(1)).as("n_total"),
      conds.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }: _*
    )

  /** Top-N sorted "data table" (Recent Transactions): global top-N via
    * per-partition top-N + single reduce — Spark's TakeOrderedAndProject,
    * not a full sort.
    */
  def topN(df: DataFrame, n: Int, ordering: Seq[Column]): DataFrame =
    df.orderBy(ordering: _*).limit(n)
}
