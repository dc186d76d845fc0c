package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the nested (array-of-child-structs) layout:
  * a CDC-shaped child stream (op `d` deletes the (parent, ordinal)
  * element group, anything else upserts it) folds into the standing
  * artifact per micro-batch via [[graft.search.Nested.applyDelta]] —
  * one delta-sized aggregation + an id-keyed join; the artifact is
  * never rebuilt (the StreamingBm25 contract, array-of-struct form).
  * The maintained frame re-roots per batch (localCheckpoint) so
  * lineage stays O(1) across an unbounded stream — the in-process
  * stand-in for a deployment rewriting only the touched id-buckets of
  * the parquet artifact. Readers take a consistent snapshot via
  * [[index]]; StreamingSpec proves live-maintained ≡ rebuilt.
  *
  * A micro-batch may carry SEVERAL ops for one (parent, ordinal) —
  * insert then delete is a routine CDC sequence — so streams must
  * name a monotone per-op sequence column (`seqCol`, the Kafka
  * offset / LSN); applyDelta then keeps only the last op per element.
  * Pass None only when the source guarantees one op per element per
  * batch.
  */
final class StreamingNested(
    initial: DataFrame,
    parentKey: String,
    childKey: String,
    path: String,
    fields: Seq[String],
    seqCol: Option[String] = None
) {
  @volatile private var current: DataFrame = initial.localCheckpoint(eager = true)

  /** The artifact as of the last completed micro-batch. */
  def index: DataFrame = current

  private def fold(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!batch.isEmpty) {
      val cached = batch.localCheckpoint(eager = true)
      current = graft.search.Nested
        .applyDelta(current, cached, parentKey, childKey, path, fields, seqCol = seqCol)
        .localCheckpoint(eager = true)
    }
  }

  /** Attach to a (childKey, fields..., op) stream; every micro-batch folds in. */
  def attach(stream: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream.outputMode("append").foreachBatch(fold _)
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }
}
