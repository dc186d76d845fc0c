package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium envelope model + parser (reference consumer.py:55-100 consumes
  * exactly this shape from Kafka: `{"before": {...}|null, "after":
  * {...}|null, "op": "r|c|u|d", "ts_ms": ..., "source": {"table": ...}}`).
  *
  * The payloads are parsed generically as `map<string,string>` — the
  * schema-agnostic form a multi-table CDC consumer needs (the reference
  * indexes whatever fields arrive). `from_json` is a single codegen'd
  * expression per row; no per-table parser code.
  */
object ChangeEvent {

  val Schema: StructType = StructType(
    Seq(
      StructField("before", MapType(StringType, StringType), nullable = true),
      StructField("after", MapType(StringType, StringType), nullable = true),
      StructField("op", StringType, nullable = true),
      StructField("ts_ms", LongType, nullable = true),
      StructField("source", MapType(StringType, StringType), nullable = true)
    )
  )

  /** Parse a column of Debezium JSON envelopes into typed columns:
    * (op, ts_ms, table, key, before, after). The document key comes from
    * `after[keyField]` for upserts and `before[keyField]` for deletes —
    * the same rule the reference applies (consumer.py:63,92).
    */
  def parse(df: DataFrame, jsonCol: Column, keyField: String = "id"): DataFrame =
    df.withColumn("_env", from_json(jsonCol, Schema))
      .select(
        col("_env.op").as("op"),
        col("_env.ts_ms").as("ts_ms"),
        element_at(col("_env.source"), "table").as("table"),
        coalesce(element_at(col("_env.after"), keyField), element_at(col("_env.before"), keyField)).as("key"),
        col("_env.before").as("before"),
        col("_env.after").as("after")
      )

  /** Split parsed envelopes into (valid, dead-letter): the reference
    * consumer wraps every message in try/except and keeps going
    * (consumer.py:100); here malformed JSON or envelopes missing op/key
    * route to a dead-letter frame carrying the raw payload for replay,
    * instead of poisoning the pipeline.
    */
  def parseWithDlq(df: DataFrame, jsonCol: Column, keyField: String = "id"): (DataFrame, DataFrame) = {
    val parsed = df.withColumn("_raw", jsonCol).withColumn("_env", from_json(jsonCol, Schema))
    val shaped = parsed.select(
      col("_raw"),
      col("_env.op").as("op"),
      col("_env.ts_ms").as("ts_ms"),
      element_at(col("_env.source"), "table").as("table"),
      coalesce(element_at(col("_env.after"), keyField), element_at(col("_env.before"), keyField)).as("key"),
      col("_env.before").as("before"),
      col("_env.after").as("after")
    )
    val ok = shaped.filter(col("op").isNotNull && col("key").isNotNull).drop("_raw")
    val dlq = shaped.filter(col("op").isNull || col("key").isNull).select(col("_raw").as("raw"))
    (ok, dlq)
  }

  /** Batch-apply parsed envelopes: the materialized index state per
    * (table, key) — upserts win by (ts_ms), deletes drop the key. This is
    * the batch twin of [[graft.streaming.CdcStream.applyChanges]].
    */
  def materialize(parsed: DataFrame): DataFrame =
    parsed
      .groupBy(col("table"), col("key"))
      .agg(max_by(struct(col("op"), col("after"), col("ts_ms")), struct(col("ts_ms"), col("op"))).as("_last"))
      .filter(col("_last.op") =!= "d")
      .select(col("table"), col("key"), col("_last.after").as("doc"), col("_last.ts_ms").as("ts_ms"))
}
