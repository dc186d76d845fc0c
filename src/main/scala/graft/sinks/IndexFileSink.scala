package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, ForeachWriter, Row}
import org.apache.spark.sql.functions._

/** A document whose index write failed: the id, the serialized doc (so a
  * retry or a human replays it without rescanning the source), the last
  * error, and which attempt last failed. Top-level public case class —
  * encoder + Janino requirements for Dataset use.
  */
final case class FailedDoc(id: String, doc: String, error: String, attempts: Int)

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

  /** Per-document file writer used by the DLQ path when no custom writer
    * is injected: id-named JSON files, idempotent overwrite on replay —
    * the same contract as DocWriter.
    */
  private def fileDocWriter(root: String, indexName: String): (String, String) => Unit = {
    (id, doc) =>
      val dir = java.nio.file.Paths.get(root, indexName)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve(s"$id.json"), doc): Unit
  }

  /** Bulk index with per-document failure capture and bounded retry — the
    * reference indexer's error contract (reference TDD §error-handling:
    * bulk requests route per-doc indexing failures to a DLQ and retry,
    * instead of failing the whole batch).
    *
    * Each partition writes its documents through `writeDoc` (injectable:
    * a real `_bulk` HTTP writer in deployment, the id-named-file writer
    * by default, a failing writer in the spec). A doc whose write throws
    * is captured as a [[FailedDoc]] — the batch keeps going. Failures are
    * re-driven through the same writer up to `maxRetries` more times
    * (transient faults drain; persistent ones survive), and whatever is
    * left is RETURNED as the dead-letter Dataset, carrying the serialized
    * doc so a later replay needs no source rescan.
    *
    * Each attempt is materialized with an eager `localCheckpoint` before
    * the next is planned: the attempt's map is side-effecting, so it must
    * run exactly once — a lazy plan would re-write documents every time
    * the failure frame is re-evaluated. The retry frames shrink to the
    * failure set, so retries cost O(failures), not O(batch).
    */
  def bulkIndexWithRetry(
      df: DataFrame,
      root: String,
      indexName: String,
      idCol: String,
      shards: Int = 4,
      maxRetries: Int = 2,
      writeDoc: ((String, String) => Unit) = null
  ): Dataset[FailedDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    val write = Option(writeDoc).getOrElse(fileDocWriter(root, indexName))
    val docs = df
      .withColumn("_id", col(idCol).cast("string"))
      .select(col("_id"), to_json(struct(df.columns.map(col): _*)).as("_doc"))
      .repartition(shards, col("_id"))
      .as[(String, String)]

    def attempt(batch: Dataset[(String, String)], attemptNo: Int): Dataset[FailedDoc] =
      batch
        .mapPartitions(_.flatMap { case (id, doc) =>
          try { write(id, doc); Iterator.empty }
          catch {
            case e: Throwable =>
              Iterator.single(FailedDoc(id, doc, String.valueOf(e.getMessage), attemptNo))
          }
        })
        .localCheckpoint(true)

    var failed = attempt(docs, 1)
    var attemptNo = 1
    while (attemptNo <= maxRetries && !failed.isEmpty) {
      attemptNo += 1
      failed = attempt(failed.map(f => (f.id, f.doc)), attemptNo)
    }
    failed
  }

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
