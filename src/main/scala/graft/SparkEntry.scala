package graft

import graft.cdc.CdcBatch
import graft.functions.{TextFns, VectorFns}
import graft.multimodal.Binary
import graft.operators.{Dedup, MinHashLSH, SimHash, Similarity}
import graft.search.{Aggs, IndexMapping, JsonDsl, SearchDsl}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Driver contract: one `queries` entry per operator in SURVEY.md §2, with
  * a DuckDB-equivalent `oracleSql` wherever the semantics are
  * SQL-expressible. Column names and row ordering match the oracle exactly
  * (the driver hash-compares values under name-sorted columns).
  *
  * The registry itself lives in per-family objects under `graft/entry/`
  * (CdcEntries, SearchEntries, SearchWireEntries, AnalyticsEntries,
  * DedupEntries, AnnEntries, TextEntries, MultimodalEntries) with shared
  * memoized artifacts in EntrySupport; this object aggregates them so the
  * driver-facing surface is unchanged.
  */
object SparkEntry {

  /** Flagship: CDC latest-state materialization (the reference pipeline's
    * core semantic) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_latest_state")(spark, "/root/testdata/sf0.001")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcEntries.queries ++
      SearchEntries.queries ++
      SearchWireEntries.queries ++
      AnalyticsEntries.queries ++
      DedupEntries.queries ++
      AnnEntries.queries ++
      TextEntries.queries ++
      MultimodalEntries.queries

  lazy val oracleSql: Map[String, String] =
    CdcEntries.oracleSql ++
      SearchEntries.oracleSql ++
      SearchWireEntries.oracleSql ++
      AnalyticsEntries.oracleSql ++
      DedupEntries.oracleSql ++
      AnnEntries.oracleSql ++
      TextEntries.oracleSql ++
      MultimodalEntries.oracleSql
}
