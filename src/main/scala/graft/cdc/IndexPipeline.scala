package graft.cdc

import graft.sinks.IndexFileSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** End-to-end CDC pipelines: raw Debezium JSON → parsed envelopes →
  * materialized index → sink. The Spark-native equivalent of the whole
  * reference deployment (Kafka topic per table → consumer.py → OpenSearch
  * index per table), minus the brokers: the changelog arrives as files/
  * tables (batch) or a file/socket stream (streaming).
  */
object IndexPipeline {

  /** Batch: snapshot + backlog replay. Reads a directory of JSON-line
    * Debezium envelopes, materializes latest state per (table, key), and
    * writes one index directory per table.
    */
  def runBatch(spark: SparkSession, envelopeDir: String, indexRoot: String, keyField: String = "id"): Unit = {
    val raw = spark.read.text(envelopeDir)
    val state = ChangeEvent.materialize(ChangeEvent.parse(raw, col("value"), keyField))
    state.cache()
    val tables = state.select("table").distinct().collect().map(_.getString(0))
    tables.foreach { t =>
      IndexFileSink.indexBatch(
        state.filter(col("table") === t).select(col("key"), col("doc"), col("ts_ms")),
        indexRoot,
        t,
        "key"
      )
    }
    state.unpersist()
  }

  /** Streaming from a file landing zone — see the transport-parameterized
    * overload; this keeps the original signature.
    */
  def runStream(
      spark: SparkSession,
      envelopeDir: String,
      indexRoot: String,
      indexName: String,
      checkpoint: String,
      keyField: String
  ): StreamingQuery =
    runStream(spark, graft.sources.FileEnvelopeTransport(envelopeDir), indexRoot, indexName, checkpoint, keyField)

  def runStream(
      spark: SparkSession,
      envelopeDir: String,
      indexRoot: String,
      indexName: String,
      checkpoint: String
  ): StreamingQuery =
    runStream(spark, envelopeDir, indexRoot, indexName, checkpoint, "id")

  /** Streaming: consume the envelope changelog from ANY transport (file
    * landing zone, Kafka topics, memory stream — the
    * [[graft.sources.EnvelopeTransport]] seam), maintain keyed state with
    * [[graft.streaming.CdcStream]] semantics, apply idempotent
    * per-document upserts/deletes via [[IndexFileSink.DocWriter]].
    */
  def runStream(
      spark: SparkSession,
      transport: graft.sources.EnvelopeTransport,
      indexRoot: String,
      indexName: String,
      checkpoint: String,
      keyField: String
  ): StreamingQuery = {
    import spark.implicits._
    val raw = transport.stream(spark)
    val parsed = ChangeEvent.parse(raw, col("value"), keyField)
    // Route through the keyed state store: per-key events are applied in
    // seq order and stale/out-of-order versions dropped, so the DocWriter
    // (which processes partition iterators in emission order) always ends
    // on the latest version — a bare foreach over parsed rows would race
    // versions of the same key within a batch.
    val changes = graft.streaming.CdcStream.applyChanges(
      parsed
        .select(
          col("key"),
          col("ts_ms").as("seq"),
          when(col("op") === "d", "d").otherwise("u").as("op"),
          coalesce(to_json(col("after")), lit("{}")).as("payload")
        )
        .as[graft.streaming.CdcStream.Envelope]
    )
    changes
      .select(col("key").as("_id"), col("op").as("_op"), col("payload"), col("seq"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreach(new IndexFileSink.DocWriter(indexRoot, indexName))
      .start()
  }
}
