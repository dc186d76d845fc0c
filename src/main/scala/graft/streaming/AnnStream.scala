package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN index maintenance: a micro-batch stream of (id, vector)
  * upserts folds into a prebuilt IVF index — the streaming face of
  * [[Similarity.addToIvf]] (the faiss add() contract). Each batch pays
  * ONE delta-sized nearest-centroid assignment against the train-time
  * centroids; nothing rescans the base corpus. Centroid drift is the
  * documented trade (cells reflect train-time data; periodic retrain is
  * the remedy), identical to the batch incremental entry.
  *
  * The maintained assignment table is re-rooted per batch
  * (localCheckpoint) so lineage stays O(1) across an unbounded stream —
  * the in-process stand-in for what a deployment does by writing each
  * delta as a parquet segment of the index table. Readers take a
  * consistent snapshot via [[index]]; search = [[Similarity.scoreAgainstIvf]]
  * on that snapshot.
  */
final class StreamingIvf(initial: Similarity.IvfIndex, idCol: String, vecCol: String) {
  @volatile private var current: Similarity.IvfIndex = initial

  /** The index as of the last completed micro-batch. */
  def index: Similarity.IvfIndex = current

  private def fold(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!batch.isEmpty) {
      val grown = Similarity.addToIvf(current, batch, idCol, vecCol)
      current = grown.copy(assigned = grown.assigned.localCheckpoint(eager = true))
    }
  }

  /** Attach to an (id, vector) stream; every micro-batch grows the index. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream.outputMode("append").foreachBatch(fold _).start()
}

/** Streaming BM25 index maintenance: a CDC-shaped document stream
  * (id, op, text — op `d` deletes, anything else upserts) folds into the
  * posting index per micro-batch via [[graft.search.Bm25.applyDelta]] —
  * O(delta) tokenize + one id-keyed anti join against the postings,
  * never a corpus re-index (the streaming face of the batch
  * search_bm25_incremental entry, same equivalence contract). Both index
  * frames re-root per batch (localCheckpoint) so lineage stays O(1)
  * across an unbounded stream.
  */
final class StreamingBm25(initial: graft.search.Bm25.Bm25Index, idCol: String, textCol: String) {
  @volatile private var current: graft.search.Bm25.Bm25Index = initial

  /** The index as of the last completed micro-batch. */
  def index: graft.search.Bm25.Bm25Index = current

  private def fold(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!batch.isEmpty) {
      import org.apache.spark.sql.functions.col
      val cached = batch.localCheckpoint(true)
      val grown = graft.search.Bm25.applyDelta(
        current,
        cached.filter(col("op") =!= "d"),
        cached.filter(col("op") === "d"),
        idCol,
        textCol
      )
      current = grown.copy(
        postings = grown.postings.localCheckpoint(eager = true),
        corpus = grown.corpus.localCheckpoint(eager = true)
      )
    }
  }

  /** Attach to an (id, op, text) stream; every micro-batch folds in. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream.outputMode("append").foreachBatch(fold _).start()
}
