package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-evidence dataset generator: unions each SF-scaling table N
  * times with CONSISTENTLY shifted keys (the same key domain shifts by the
  * same stride everywhere, so joins keep their selectivity and per-key
  * group sizes stay constant — growth adds GROUPS, it does not fatten
  * them, which is how a real corpus scales). Fixed-size dims (region,
  * nation) copy through untouched. Usage:
  *
  *   runMain graft.ScaleData <srcDir> <outDir> [copies]
  *
  * The output feeds Bench via SPARK_GRAFT_SF_DIR=<outDir> with
  * SPARK_GRAFT_BENCH_FILTER for subset runs (BENCH_r{N}_sf1.json).
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1ish")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // One stride per KEY DOMAIN (not per table): l_orderkey and o_orderkey
    // must shift identically or the join keys tear apart.
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1

    val orderStride = stride(read("orders"), "o_orderkey")
    val custStride  = stride(read("customer"), "c_custkey")
    val partStride  = stride(read("part"), "p_partkey")
    val suppStride  = stride(read("supplier"), "s_suppkey")
    val eventStride = stride(read("events"), "event_id")
    val userStride  = stride(read("events"), "user_id")
    val docStride   = stride(read("documents"), "doc_id")
    val vecStride   = stride(read("embeddings"), "vec_id")

    def scaled(name: String, shifts: Map[String, Long]): Unit = {
      val base = read(name)
      val parts = (0 until copies).map { i =>
        shifts.foldLeft(base) { case (df, (k, s)) => df.withColumn(k, col(k) + lit(s * i)) }
      }
      parts.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name x$copies -> $out")
    }
    def fixed(name: String): Unit = {
      read(name).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name (dim, copied) -> $out")
    }

    fixed("region")
    fixed("nation")
    scaled("customer", Map("c_custkey" -> custStride))
    scaled("supplier", Map("s_suppkey" -> suppStride))
    scaled("part", Map("p_partkey" -> partStride))
    scaled("orders", Map("o_orderkey" -> orderStride, "o_custkey" -> custStride))
    scaled(
      "lineitem",
      Map("l_orderkey" -> orderStride, "l_partkey" -> partStride, "l_suppkey" -> suppStride)
    )
    scaled("events", Map("event_id" -> eventStride, "user_id" -> userStride))
    scaled("documents", Map("doc_id" -> docStride))
    scaled("embeddings", Map("vec_id" -> vecStride))
    spark.stop()
  }
}
