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

/** Streaming near-dup detection: each micro-batch of (id, text) docs
  * dedups against EVERYTHING ingested so far — per batch one O(delta)
  * signature pass, a band join probing the accumulated banded table, and
  * the exact-Jaccard verify on candidates only (the streaming face of
  * MinHashLSH.incrementalPairs; the batch DedupSpec equivalence — full ∪
  * incremental ≡ full-over-union — carries over batch by batch). Found
  * pairs accumulate in [[pairs]]; the artifact re-roots per batch.
  */
final class StreamingMinHash(
    initial: graft.operators.MinHashLSH.MinHashIndex,
    idCol: String,
    textCol: String,
    threshold: Double = 0.5
) {
  import graft.operators.MinHashLSH
  @volatile private var idx = initial
  @volatile private var found: Option[DataFrame] = None

  /** Near-dup pairs (a < b, exact Jaccard) found across all batches so far. */
  def pairs: Option[DataFrame] = found

  def index: MinHashLSH.MinHashIndex = idx

  private def fold(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!batch.isEmpty) {
      val cached = batch.localCheckpoint(true)
      // incrementalPairs re-derives the delta signatures internally; the
      // double O(delta) pass buys reuse of the proven batch API over a
      // hand-rolled join here.
      val newPairs = MinHashLSH
        .incrementalPairs(idx, cached, idCol, textCol, threshold = threshold)
        .localCheckpoint(true)
      found = Some(found.fold(newPairs)(p => p.unionByName(newPairs).localCheckpoint(true)))
      val dIdx = MinHashLSH.index(cached, idCol, textCol)
      val grown = MinHashLSH.appendIndex(idx, dIdx)
      idx = grown.copy(
        banded = grown.banded.localCheckpoint(true),
        shingles = grown.shingles.localCheckpoint(true)
      )
    }
  }

  /** Attach to an (id, text) document stream. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream.outputMode("append").foreachBatch(fold _).start()
}
