package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time/entity-partitioned parquet layout for the analytical store.
  *
  * At 100 TB the dominant cost of every dashboard query is the scan;
  * hive-style partition directories turn time-range and entity filters
  * into directory pruning (zero I/O for excluded partitions — visible as
  * PartitionFilters in the scan node), and a derived partition column per
  * calendar month keeps partition counts bounded (~hundreds, not
  * per-key millions).
  */
object PartitionedStore {

  /** Write `df` partitioned by a derived calendar bucket of `tsCol`
    * (`pattern` picks the granularity: "yyyy-MM" for month, "yyyy-MM-dd"
    * for day — choose so partition counts stay in the hundreds).
    */
  def writeByTime(df: DataFrame, tsCol: String, path: String, pattern: String = "yyyy-MM"): Unit =
    df.withColumn("p_bucket", date_format(col(tsCol), pattern))
      .write
      .mode("overwrite")
      .partitionBy("p_bucket")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
