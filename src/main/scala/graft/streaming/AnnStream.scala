package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN index maintenance: a micro-batch stream of (id, vector)
  * upserts folds into a prebuilt IVF index — the streaming face of
  * [[Similarity.addToIvf]] (the faiss add() contract). Each batch pays
  * ONE delta-sized nearest-centroid assignment against the train-time
  * centroids; nothing rescans the base corpus for assignment. A re-sent
  * id is a TRUE upsert: the batch's ids are anti-joined out of the
  * standing assignment table before the delta unions in, so a search
  * never returns a superseded embedding and counts don't inflate (the
  * batch [[Similarity.addToIvf]] stays the pure append-only add() —
  * its contract requires fresh ids; the streaming wrapper owns
  * supersession). Centroid drift is the documented trade (cells
  * reflect train-time data; periodic retrain is the remedy), identical
  * to the batch incremental entry.
  *
  * The maintained assignment table is re-rooted per batch
  * (localCheckpoint) so lineage stays O(1) across an unbounded stream —
  * the in-process stand-in for what a deployment does by writing each
  * delta as a parquet segment of the index table (where the anti join
  * is the segment-merge's tombstone pass). Readers take a consistent
  * snapshot via [[index]]; search = [[Similarity.scoreAgainstIvf]]
  * on that snapshot.
  */
final class StreamingIvf(initial: Similarity.IvfIndex, idCol: String, vecCol: String) {
  @volatile private var current: Similarity.IvfIndex = initial

  /** The index as of the last completed micro-batch. */
  def index: Similarity.IvfIndex = current

  private def fold(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!batch.isEmpty) {
      import org.apache.spark.sql.functions.col
      val cached = batch.localCheckpoint(true)
      // Upsert semantics: retire any standing row whose id the batch
      // re-sends, THEN append the fresh assignment. The anti join is
      // id-keyed (delta side broadcast by AQE — batch-sized, bounded).
      val retired = current.copy(
        assigned = current.assigned.join(cached.select(col(idCol)), Seq(idCol), "left_anti")
      )
      val grown = Similarity.addToIvf(retired, cached, idCol, vecCol)
      current = grown.copy(assigned = grown.assigned.localCheckpoint(eager = true))
    }
  }

  /** Attach to an (id, vector) stream; every micro-batch grows the index. */
  def attach(stream: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream.outputMode("append").foreachBatch(fold _)
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }
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
  def attach(stream: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream.outputMode("append").foreachBatch(fold _)
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }
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
  def attach(stream: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream.outputMode("append").foreachBatch(fold _)
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }
}

/** Streaming neighbor-graph maintenance — the last index family to gain
  * a streaming twin (StreamingIvf/Bm25/MinHash precedents): each
  * micro-batch of NEW (id, vector) rows folds into the graph via the
  * NSW insert ([[Similarity.addToGraph]] — delta-sized beam searches
  * over the EXISTING graph, forward+reverse links, re-prune of touched
  * adjacency lists only). The searchable corpus grows alongside the
  * adjacency table so later batches (and reader searches) see every
  * prior insert. Contract is append-only ids, matching the batch
  * `addToGraph`; both maintained frames re-root per batch
  * (localCheckpoint) so lineage stays O(1) across an unbounded stream —
  * at deployment scale each is a parquet segment append on a
  * by-id-bucketed table. StreamingSpec proves the post-stream index
  * equals the batch addToGraph fold over the same deltas.
  */
final class StreamingGraph(
    initial: Similarity.GraphIndex,
    baseVectors: DataFrame,
    idCol: String,
    vecCol: String,
    m: Int = 8,
    beam: Int = 16,
    rounds: Int = 3
) {
  import org.apache.spark.sql.functions.col
  @volatile private var current: Similarity.GraphIndex = initial
  @volatile private var vectors: DataFrame = baseVectors.select(col(idCol), col(vecCol))

  /** The graph as of the last completed micro-batch. */
  def index: Similarity.GraphIndex = current

  /** Base corpus plus every streamed vector — the frame searches score against. */
  def corpus: DataFrame = vectors

  private def fold(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!batch.isEmpty) {
      val cached = batch.select(col(idCol), col(vecCol)).localCheckpoint(true)
      val grown = Similarity.addToGraph(current, vectors, idCol, vecCol, cached, m, beam, rounds)
      current = grown.copy(neighbors = grown.neighbors.localCheckpoint(eager = true))
      vectors = vectors.unionByName(cached).localCheckpoint(eager = true)
    }
  }

  /** Attach to an (id, vector) stream; every micro-batch inserts into the graph. */
  def attach(stream: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream.outputMode("append").foreachBatch(fold _)
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }
}
