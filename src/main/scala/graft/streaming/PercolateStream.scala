package graft.streaming

import graft.search.{IndexMapping, JsonDsl, Percolate}
import org.apache.spark.sql.DataFrame

/** Streaming percolation — the live face of the alerting/monitor story
  * (reference DASHBOARD_GUIDE.md's alert panels watch for documents
  * matching stored conditions as they arrive): the stored-query registry
  * compiles ONCE into [[JsonDsl.percolate]]'s single when-array
  * projection, and every micro-batch of documents flows past it.
  *
  * Scale shape: the operator is STATELESS — a pure codegen'd projection
  * + explode, no join, no state store, no shuffle — so it runs in append
  * mode at source parallelism with zero watermark requirements; a
  * registry update is a query restart with a recompiled projection
  * (exactly the percolator deployment model: queries live compiled in
  * memory, documents flow past). The suppressed variant adds the one
  * piece of state an alerting tier actually wants — fire at most once
  * per (key, stored query) within the watermark horizon — via Spark's
  * own `dropDuplicatesWithinWatermark`, whose state store holds only
  * (key, query_id) pairs inside the horizon, not documents.
  */
object PercolateStream {

  /** Every (document, stored query) match as an alert row — the
    * streaming twin of the batch `search_percolate` entry; stateless,
    * append-mode, plan identical to the batch projection.
    */
  def alerts(
      stream: DataFrame,
      stored: Seq[(Long, String)],
      mapping: IndexMapping = IndexMapping.empty
  ): DataFrame =
    JsonDsl.percolate(stream, stored, mapping)

  /** Alerts suppressed to once per (key, stored query) within the
    * watermark horizon: re-matches of the same key inside the horizon
    * are duplicate pages, not news. `keyCols` is the alert identity
    * (e.g. the user or account the alert pages about).
    */
  def alertsSuppressed(
      stream: DataFrame,
      stored: Seq[(Long, String)],
      tsCol: String,
      watermark: String,
      keyCols: Seq[String],
      mapping: IndexMapping = IndexMapping.empty
  ): DataFrame =
    JsonDsl
      .percolate(stream.withWatermark(tsCol, watermark), stored, mapping)
      .dropDuplicatesWithinWatermark(keyCols :+ "query_id")

  /** The INDEX-tier streaming percolator — alerting at registry sizes
    * the compiled projection cannot reach (10⁵–10⁷ stored rules). Each
    * micro-batch of documents term-joins the registry's posting table
    * ([[Percolate]]): work per batch is candidate-bound (dormant rules
    * whose terms never arrive cost nothing), the registry is a pair of
    * static frames (AQE broadcasts registry-sized postings under the
    * stream), and the operator stays STATELESS — stream-static joins
    * need no watermark and no state store, so this too runs append-mode.
    * A registry update swaps the static frames at the next restart, the
    * same deployment model as the compiled tier.
    */
  def alertsIndexed(
      index: Percolate.PercolateIndex,
      stream: DataFrame,
      idCol: String,
      textCol: String,
      rangeCol: String
  ): DataFrame =
    Percolate.percolate(index, stream, idCol, textCol, rangeCol)

  /** The RICH index tier's streaming face — bool.must-of-clauses rules
    * (multi-field, operator:and, match_phrase) at posting-table scale.
    * Structurally identical to [[alertsIndexed]]: a stream-static join
    * chain, stateless, append-mode, candidate-bound per micro-batch.
    */
  def alertsIndexedRich(
      index: Percolate.RichIndex,
      stream: DataFrame,
      idCol: String,
      textFields: Seq[String],
      rangeCol: String
  ): DataFrame =
    Percolate.percolateRich(index, stream, idCol, textFields, rangeCol)
}
