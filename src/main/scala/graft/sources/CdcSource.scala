package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-side of the CDC pipeline: the reference ingests from PostgreSQL
  * (Debezium snapshot + logical-replication stream, setup.sh:40-90). In
  * Spark terms:
  *
  *  - snapshot  = a partitioned JDBC read (the initial `op=r` load),
  *  - increment = a watermark-bounded JDBC read (poll-based CDC for stores
  *    without a changelog),
  *  - envelopeStream = the streaming changelog transport. The file-based
  *    form is used in tests and on object storage (Debezium → S3/GCS
  *    landing zone is a standard deployment); a Kafka transport drops in
  *    by swapping the reader format when the connector jar ships with the
  *    cluster.
  */
object CdcSource {

  /** Partitioned snapshot read: numPartitions range-splits on
    * `partitionColumn` so a 100 TB table loads across the cluster instead
    * of through one JDBC cursor. Bounds are min/max of the split column
    * (two cheap pushdown queries).
    */
  private def requireIdentifier(s: String, what: String): Unit =
    require(s.matches("""[A-Za-z_][A-Za-z0-9_.$]*"""), s"$what is not a plain SQL identifier: $s")

  def snapshot(
      spark: SparkSession,
      jdbcUrl: String,
      table: String,
      partitionColumn: String,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()
  ): DataFrame = {
    // The names are interpolated into the bounds query — accept only plain
    // identifiers (schema-qualified ok), never expressions.
    requireIdentifier(table, "table")
    requireIdentifier(partitionColumn, "partitionColumn")
    val bounds = spark.read
      .jdbc(jdbcUrl, s"(SELECT min($partitionColumn) lo, max($partitionColumn) hi FROM $table) b", props)
      .head()
    // Empty source table: min/max are NULL — fall back to a plain
    // (unpartitioned) read of the empty relation instead of NPE-ing.
    if (bounds.isNullAt(0) || bounds.isNullAt(1)) spark.read.jdbc(jdbcUrl, table, props)
    else
      // Bounds are read by POSITION, not alias: engines disagree on the
      // case of unquoted aliases (Postgres folds lower, Derby/Oracle/DB2
      // fold UPPER), and a name lookup breaks on the upper-folding ones
      // — caught by the embedded-Derby integration spec.
      spark.read.jdbc(
        jdbcUrl,
        table,
        partitionColumn,
        bounds.getAs[Number](0).longValue(),
        bounds.getAs[Number](1).longValue(),
        numPartitions,
        props
      )
  }

  /** Incremental poll: rows with `watermarkCol` strictly beyond the last
    * high-water mark. The predicate pushes down to the source database.
    */
  def incremental(
      spark: SparkSession,
      jdbcUrl: String,
      table: String,
      watermarkCol: String,
      lastSeen: java.sql.Timestamp,
      props: java.util.Properties = new java.util.Properties()
  ): DataFrame =
    spark.read
      .jdbc(jdbcUrl, table, props)
      .filter(col(watermarkCol) > lit(lastSeen))

  /** Streaming Debezium-envelope transport from a landing directory
    * (JSON-lines files). Pairs with [[graft.cdc.ChangeEvent.parse]] and
    * [[graft.cdc.IndexPipeline.runStream]].
    */
  def envelopeStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema("value STRING").text(dir)
}
