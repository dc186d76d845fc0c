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
