package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, ForeachWriter, Row}
import org.apache.spark.sql.functions._

/** OpenSearch-like "index" sink: documents keyed by id, idempotent upserts.
  *
  * The reference indexes via `PUT /{index}/_doc/{id}` (reference
  * consumer.py:66-71) — idempotent per-document upsert. Without a search
  * cluster in the loop, the faithful Spark-native equivalent is a keyed,
  * partitioned JSON-docs table: one JSON line per document, directory per
  * index, overwritten atomically per batch. Replaying the same batch
  * produces the same files (exactly-once via idempotence, the same contract
  * Debezium consumers rely on).
  *
  * At scale this is the standard "bulk indexing" shape: writers are
  * per-partition, the number of output files tracks parallelism, and
  * documents are pre-partitioned by id hash so a real `_bulk` HTTP writer
  * would hit each shard coherently.
  */
object IndexFileSink {

  /** Batch index: write `df` as JSON docs under `root/indexName`, keyed by
    * `idCol` (becomes `_id`). Partitioned by id hash for shard coherence.
    */
  def indexBatch(df: DataFrame, root: String, indexName: String, idCol: String, shards: Int = 4): Unit =
    df.withColumn("_id", col(idCol))
      .repartition(shards, col("_id"))
      .write
      .mode("overwrite")
      .json(s"$root/$indexName")

  /** Read an index back (for parity checks, `test.sh`-style). */
  def readIndex(spark: org.apache.spark.sql.SparkSession, root: String, indexName: String): DataFrame =
    spark.read.json(s"$root/$indexName")

  /** Streaming per-document writer with the reference consumer's contract:
    * op=d → delete marker, else upsert. For Structured Streaming
    * `ds.writeStream.foreach(new DocWriter(...))`. Files are one-per-doc
    * (id-named → idempotent overwrite on replay).
    */
  final class DocWriter(root: String, indexName: String) extends ForeachWriter[Row] {
    @transient private var dir: java.nio.file.Path = _

    override def open(partitionId: Long, epochId: Long): Boolean = {
      dir = java.nio.file.Paths.get(root, indexName)
      java.nio.file.Files.createDirectories(dir)
      true
    }

    override def process(row: Row): Unit = {
      val id = row.getAs[Any]("_id").toString
      val op = if (row.schema.fieldNames.contains("_op")) row.getAs[String]("_op") else "u"
      val f = dir.resolve(s"$id.json")
      if (op == "d") java.nio.file.Files.deleteIfExists(f)
      else java.nio.file.Files.writeString(f, row.json)
    }

    override def close(errorOrNull: Throwable): Unit = ()
  }
}
