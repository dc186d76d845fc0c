package graft.search

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's sample dashboard (reference DASHBOARD_GUIDE.md §4,
  * visualizations A–F), assembled from the engine's operators — the
  * explicit reference→implementation map:
  *
  *   A. status distribution (pie)      → terms aggregation
  *   B. amount over time (line)        → date_histogram + sum
  *   C. active vs pending (metric)     → filter-context conditional counts
  *   D. type breakdown (bar)           → terms aggregation
  *   E. network distribution (pie)     → terms aggregation
  *   F. recent transactions (table)    → top-N sorted data table
  *
  * `render` runs all panels in one pass over the session (each panel is an
  * independent job; a dashboard refresh is embarrassingly parallel).
  */
object Dashboard {

  def panels(spark: SparkSession, dir: String): Map[String, DataFrame] = Map(
    "a_status_distribution" -> Aggs.termsAgg(Tables.orders(spark, dir), col("o_orderstatus"), 10),
    "b_amount_over_time" -> SparkEntry.queries("search_date_histogram")(spark, dir),
    "c_active_vs_pending" -> SparkEntry.queries("search_filtered_count")(spark, dir),
    "d_type_breakdown" -> Aggs.termsAgg(Tables.events(spark, dir), col("event_type"), 10),
    "e_segment_distribution" -> Aggs.termsAgg(Tables.customer(spark, dir), col("c_mktsegment"), 10),
    "f_recent_transactions" -> SparkEntry.queries("search_top_n")(spark, dir)
  )

  /** Materialize every panel (counts only — the driver of a real dashboard
    * pulls the frames).
    */
  def render(spark: SparkSession, dir: String): Map[String, Long] =
    panels(spark, dir).map { case (name, df) => name -> df.count() }
}
