package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage: the co-located-join path for the fact-fact
  * joins (lineitem⋈orders and friends) that otherwise shuffle both sides
  * on every query.
  *
  * Two tables written with the SAME bucket count on the SAME join key
  * are join-co-located: each task reads bucket i of both sides and
  * sort-merge-joins them with ZERO shuffle exchange — the repartition
  * was paid once at write time and amortizes over every subsequent join,
  * exactly like the Bm25/IVF/LSH index builds. At 100 TB this turns the
  * recurring dominant cost of the TPC-H-shaped queries (a full shuffle
  * of the fact tables) into a one-time layout decision; it also survives
  * AQE, which cannot remove a shuffle the plan never contains.
  * Plan shape is asserted in BucketedStoreSpec.
  */
object BucketedStore {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table.
    *
    * A fresh session's catalog does not know tables a previous JVM left
    * in the warehouse directory, and `saveAsTable` refuses to create a
    * managed table over an existing location — so an orphaned directory
    * (catalog-unknown) is cleared before the write. Catalog-known tables
    * are handled by mode("overwrite") as usual.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
      val orphan = new java.io.File(warehouse, table)
      if (orphan.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(orphan)
      }
    }
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Join two same-bucketing tables on their bucket key — shuffle-free
    * by construction; the assertion lives in the spec, not here, so the
    * helper stays a plain join Catalyst can further optimize.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    read(spark, left).join(read(spark, right), key)
}
