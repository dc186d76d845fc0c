package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  GroupState,
  GroupStateTimeout,
  OutputMode,
  StatefulProcessor,
  TimeMode,
  TimerValues,
  TTLConfig,
  ValueState
}

/** Structured Streaming CDC: the reference pipeline's streaming half
  * (Debezium envelope stream → keyed latest-state store → sink), as
  * `flatMapGroupsWithState` over a typed envelope.
  *
  * State is one row per key (the current document), exactly what the
  * OpenSearch index holds — so state size tracks table cardinality, not
  * stream length. Emits the post-image changelog (upserts) and tombstones
  * (deletes), which a downstream [[graft.sinks.IndexFileSink.DocWriter]]
  * applies idempotently.
  */
object CdcStream {

  /** Debezium-style envelope (reference consumer.py:55-70: `op`,
    * `before`/`after` payloads, source ts for ordering).
    */
  case class Envelope(key: String, seq: Long, op: String, payload: String)

  /** Output changelog row: current state or tombstone. */
  case class StateChange(key: String, op: String, payload: String, seq: Long)

  // Must be public: the state-store encoder's generated code references the
  // class directly and Janino rejects members of a non-public class.
  case class KeyState(lastSeq: Long, payload: String, deleted: Boolean)

  /** Apply a stream of envelopes; emit one StateChange per input that
    * advances the key's state (out-of-order events below the stored seq are
    * dropped — last-write-wins, the same race rule the reference's
    * upsert-by-id gives).
    */
  def applyChanges(envelopes: Dataset[Envelope]): Dataset[StateChange] = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    envelopes
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Envelope], state: GroupState[KeyState]) =>
          val sorted = it.toSeq.sortBy(e => (e.seq))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[StateChange]
          sorted.foreach { e =>
            if (cur.forall(_.lastSeq < e.seq)) {
              val deleted = e.op == "d"
              cur = Some(KeyState(e.seq, e.payload, deleted))
              out += StateChange(key, if (deleted) "d" else "u", e.payload, e.seq)
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** The same keyed latest-state store on Spark 4's `transformWithState`
    * API (the successor to flatMapGroupsWithState): explicit named state
    * via a StatefulProcessor handle, TTL-capable, RocksDB-backed — the
    * migration path for long-lived 100 TB state stores (changelog
    * checkpointing, no full-state snapshots per batch). Same semantics as
    * [[applyChanges]]; StreamingSpec asserts both paths emit identical
    * changelogs.
    */
  class LatestStateProcessor extends StatefulProcessor[String, Envelope, StateChange] {
    @transient private var state: ValueState[KeyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyState]("cdcLatestState", Encoders.product[KeyState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Envelope],
        timerValues: TimerValues
    ): Iterator[StateChange] = {
      val sorted = rows.toSeq.sortBy(_.seq)
      var cur = if (state.exists()) Option(state.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[StateChange]
      sorted.foreach { e =>
        if (cur.forall(_.lastSeq < e.seq)) {
          val deleted = e.op == "d"
          cur = Some(KeyState(e.seq, e.payload, deleted))
          out += StateChange(key, if (deleted) "d" else "u", e.payload, e.seq)
        }
      }
      cur.foreach(state.update)
      out.iterator
    }
  }

  /** A partial-document envelope: `fields` carries ONLY the changed
    * fields (the OpenSearch `_update` wire shape).
    */
  case class PartialEnvelope(key: String, seq: Long, op: String, fields: Map[String, String])

  /** The merged-document changelog row. */
  case class DocChange(key: String, op: String, doc: Map[String, String], seq: Long)

  // Public for Janino (state-store codegen).
  case class DocState(lastSeq: Long, doc: Map[String, String], deleted: Boolean)

  /** OpenSearch `_update`-style PARTIAL upserts on the keyed store: each
    * envelope merges its changed fields over the stored document (fields
    * accumulate across updates), deletes clear the document, and a
    * post-delete update starts a fresh doc — with the same out-of-order
    * seq fence as [[applyChanges]]. Emits the full merged doc per
    * accepted change (what the sink indexes).
    */
  def applyPartialChanges(envelopes: Dataset[PartialEnvelope]): Dataset[DocChange] = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    envelopes
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[PartialEnvelope], state: GroupState[DocState]) =>
          val sorted = it.toSeq.sortBy(_.seq)
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[DocChange]
          sorted.foreach { e =>
            if (cur.forall(_.lastSeq < e.seq)) {
              if (e.op == "d") {
                cur = Some(DocState(e.seq, Map.empty, deleted = true))
                out += DocChange(key, "d", Map.empty, e.seq)
              } else {
                val basis = cur.filterNot(_.deleted).map(_.doc).getOrElse(Map.empty)
                val merged = basis ++ e.fields
                cur = Some(DocState(e.seq, merged, deleted = false))
                out += DocChange(key, "u", merged, e.seq)
              }
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** One live-leaderboard row: the member's current rank within its key. */
  case class TopKEntry(key: String, id: Long, score: Double, rank: Int)

  /** A scored event feeding [[topKStream]] (score upserts by (key, id)). */
  case class ScoreEvent(key: String, id: Long, score: Double)

  // Public for Janino (state-store codegen); holds at most k entries.
  case class HeapState(entries: Seq[(Long, Double)])

  /** Streaming top-k leaderboard — the streaming twin of the batch
    * TopKPerKey exec: per key, a BOUNDED k-entry heap in the state store
    * (state size is k·#keys forever, independent of stream length — the
    * property that keeps a 100 TB-scale leaderboard viable), refreshed on
    * each batch that touches the key and re-emitted with ranks. Scores
    * upsert by (key, id): a member's improved score replaces its old one
    * rather than duplicating it.
    */
  class TopKProcessor(k: Int) extends StatefulProcessor[String, ScoreEvent, TopKEntry] {
    @transient private var state: ValueState[HeapState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HeapState]("topkHeap", Encoders.product[HeapState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[ScoreEvent],
        timerValues: TimerValues
    ): Iterator[TopKEntry] = {
      val cur = if (state.exists()) state.get().entries else Seq.empty
      val merged = (cur ++ rows.map(e => (e.id, e.score)))
        .groupBy(_._1)
        .map { case (id, xs) => (id, xs.map(_._2).max) }
      val top = merged.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
      state.update(HeapState(top))
      top.zipWithIndex.map { case ((id, s), i) => TopKEntry(key, id, s, i + 1) }.iterator
    }
  }

  /** The streaming leaderboard over a typed score stream. */
  def topKStream(scores: Dataset[ScoreEvent], k: Int): Dataset[TopKEntry] = {
    val spark = scores.sparkSession
    import spark.implicits._
    scores
      .groupByKey(_.key)
      .transformWithState(new TopKProcessor(k), TimeMode.None(), OutputMode.Append(), Encoders.product[TopKEntry])
  }

  /** [[applyChanges]] via transformWithState (requires the RocksDB state
    * store provider, which the TWS operator mandates).
    */
  def applyChangesTws(envelopes: Dataset[Envelope]): Dataset[StateChange] = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    envelopes
      .groupByKey(_.key)
      .transformWithState(new LatestStateProcessor, TimeMode.None(), OutputMode.Append(), Encoders.product[StateChange])
  }

  /** [[LatestStateProcessor]] with a per-key state TTL (processing-time):
    * keys idle longer than the TTL are EVICTED from the store.
    */
  class LatestStateTtlProcessor(ttl: java.time.Duration) extends StatefulProcessor[String, Envelope, StateChange] {
    @transient private var state: ValueState[KeyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyState]("cdcLatestState", Encoders.product[KeyState], TTLConfig(ttl))

    override def handleInputRows(
        key: String,
        rows: Iterator[Envelope],
        timerValues: TimerValues
    ): Iterator[StateChange] = {
      val sorted = rows.toSeq.sortBy(_.seq)
      var cur = if (state.exists()) Option(state.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[StateChange]
      sorted.foreach { e =>
        if (cur.forall(_.lastSeq < e.seq)) {
          val deleted = e.op == "d"
          cur = Some(KeyState(e.seq, e.payload, deleted))
          out += StateChange(key, if (deleted) "d" else "u", e.payload, e.seq)
        }
      }
      cur.foreach(state.update)
      out.iterator
    }
  }

  /** [[applyChangesTws]] with state eviction: keys idle longer than `ttl`
    * leave the store, so state is bounded by the ACTIVE key set instead
    * of the all-time key set — the knob that keeps a 100 TB keyed store
    * viable when the key universe grows without bound (session ids,
    * request ids). The semantic trade at the margin: an update arriving
    * after its key's eviction is treated as new — its out-of-order fence
    * restarts, exactly like any retention-bounded store.
    */
  def applyChangesTtl(envelopes: Dataset[Envelope], ttl: java.time.Duration): Dataset[StateChange] = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    envelopes
      .groupByKey(_.key)
      .transformWithState(
        new LatestStateTtlProcessor(ttl),
        TimeMode.ProcessingTime(),
        OutputMode.Append(),
        Encoders.product[StateChange]
      )
  }

  /** A keyed metric sample (seq orders samples within a key). */
  case class MetricPoint(key: String, seq: Long, value: Double)

  /** An anomaly alert: the offending sample plus the baseline it broke
    * (mean/std over the key's PRIOR samples) and its z-score.
    */
  case class Alert(key: String, seq: Long, value: Double, mean: Double, std: Double, z: Double)

  // Welford running moments: n, mean, and M2 (Σ(x−mean)²) — the
  // numerically stable online form; std = sqrt(M2/(n−1)).
  case class RunningStats(n: Long, mean: Double, m2: Double)

  /** Streaming z-score anomaly detection — the monitor_anomaly_zscore
    * batch query as a live alerting loop (the reference dashboards' "alert
    * when a metric spikes" monitor, evaluated per event instead of per
    * report). Per-key state is THREE doubles (Welford's n/mean/M2), so
    * state size tracks the key universe, never the stream; each sample
    * scores against the history BEFORE it (causal — no peeking at the
    * batch's own spike) and then folds in, so a genuine level shift
    * re-baselines after enough samples instead of alarming forever.
    * Alerts fire once ≥ `minN` samples exist and |z| > `zThreshold`.
    * StreamingSpec proves the emitted baseline equals the exact batch
    * prefix moments regardless of micro-batch slicing.
    */
  class AnomalyProcessor(zThreshold: Double, minN: Long) extends StatefulProcessor[String, MetricPoint, Alert] {
    @transient private var state: ValueState[RunningStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningStats]("anomalyStats", Encoders.product[RunningStats], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[MetricPoint],
        timerValues: TimerValues
    ): Iterator[Alert] = {
      var st = if (state.exists()) state.get() else RunningStats(0L, 0.0, 0.0)
      val out = scala.collection.mutable.ArrayBuffer.empty[Alert]
      rows.toSeq.sortBy(_.seq).foreach { p =>
        if (st.n >= minN) {
          val std = math.sqrt(st.m2 / (st.n - 1))
          if (std > 0 && math.abs(p.value - st.mean) / std > zThreshold)
            out += Alert(key, p.seq, p.value, st.mean, std, (p.value - st.mean) / std)
        }
        val n1 = st.n + 1
        val d = p.value - st.mean
        val mean1 = st.mean + d / n1
        st = RunningStats(n1, mean1, st.m2 + d * (p.value - mean1))
      }
      state.update(st)
      out.iterator
    }
  }

  /** Run [[AnomalyProcessor]] over a keyed metric stream. */
  def anomalyAlerts(points: Dataset[MetricPoint], zThreshold: Double = 3.0, minN: Long = 5L): Dataset[Alert] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.key)
      .transformWithState(
        new AnomalyProcessor(zThreshold, minN),
        TimeMode.None(),
        OutputMode.Append(),
        Encoders.product[Alert]
      )
  }

  /** Event-rate dashboard: windowed counts with a watermark (the Kibana
    * date-histogram, incrementally maintained).
    */
  def eventRate(events: DataFrame, tsCol: String, window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"))

  /** Streaming dedup by content key within a watermark horizon. */
  def streamingDedup(df: DataFrame, keyCols: Seq[String], tsCol: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)

  /** Native session windows: per-key activity sessions closed after `gap`
    * of silence (the streaming twin of the batch sessionize query —
    * incremental state per open session, emitted on watermark close).
    */
  def sessionWindows(df: DataFrame, tsCol: String, keyCol: String, gap: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("w.start").as("session_start"), col("w.end").as("session_end"), col("n_events"))

  /** Stream-static enrichment: join the changelog stream against a
    * dimension table (the "join the CDC stream with reference data" step
    * of every indexing pipeline). The static side is broadcast per
    * micro-batch; no stream-side state.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")

  /** Stream-stream interval join: attribute each `follow` event to the
    * `lead` events of the same key that happened within `within` BEFORE it
    * (click→purchase attribution, request→response pairing). Watermarks on
    * BOTH sides plus the time-bound condition are what make the state
    * bounded: each side buffers only rows younger than watermark + within,
    * so state size tracks the event rate, not the stream's lifetime — the
    * only stream-stream join shape that survives an unbounded stream. The
    * follow-side key is renamed internally so callers can pass two frames
    * with the same key column name.
    */
  def intervalJoin(
      lead: DataFrame,
      follow: DataFrame,
      keyCol: String,
      leadTs: String,
      followTs: String,
      watermark: String,
      within: String
  ): DataFrame = {
    val l = lead.withWatermark(leadTs, watermark)
    val f = follow.withColumnRenamed(keyCol, s"_f_$keyCol").withWatermark(followTs, watermark)
    l.join(
      f,
      col(keyCol) === col(s"_f_$keyCol") &&
        col(followTs) >= col(leadTs) &&
        col(followTs) <= col(leadTs) + expr(s"interval $within")
    ).drop(s"_f_$keyCol")
  }
}
