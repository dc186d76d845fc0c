package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: ad-hoc operator profiling at a given SF dir.
  * Usage: runMain graft.Profile <sfDir> [section]
  */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val section = if (args.length > 1) args(1) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (section == "all" || section == "ngram") {
      val docs = Tables.documents(spark, sfDir)
      import graft.functions.TextFns
      val base = Tables
        .ensureParallelism(docs.select(col("doc_id").as("id"), col("text").as("_text")))
        .select(col("id"), TextFns.tokens(col("_text")).as("_toks"))
        .select(col("id"), array_distinct(TextFns.ngramsFromTokens(col("_toks"), 3)).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("id"), array_sort(transform(col("sh"), s => struct(hash(s).as("h"), s.as("s")))).as("sorted"))
        .select(col("id"), transform(col("sorted"), x => x.getField("s")).as("sh"), size(col("sorted")).as("sz"))
      time("base")(println("base rows " + base.count()))
      val prefix = base.select(
        col("id"),
        col("sz"),
        explode(slice(col("sh"), lit(1), (floor(size(col("sh")) * 0.6) + 1).cast("int"))).as("p")
      )
      time("prefix")(println("prefix rows " + prefix.count()))
      val l = prefix.as("l")
      val r = prefix.as("r")
      val cands = l
        .join(
          r,
          col("l.p") === col("r.p") && col("l.id") < col("r.id") &&
            col("l.sz") >= col("r.sz") * 0.4 && col("r.sz") >= col("l.sz") * 0.4
        )
        .select(col("l.id").as("a"), col("r.id").as("b"))
      time("cands_raw")(println("raw cands " + cands.count()))
      time("cands_distinct")(println("distinct cands " + cands.distinct().count()))
      time("full_op")(println("pairs " + operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.4).count()))
    }

    if (section == "all" || section == "minhash") {
      val docs = Tables.documents(spark, sfDir)
      val sh = operators.MinHashLSH.shingles(docs, "doc_id", "text", 3)
      time("mh_shingles")(sh.count())
      val sigs = operators.MinHashLSH.signatures(docs, "doc_id", "text", 3, 128)
      time("mh_sigs")(sigs.count())
      time("mh_full")(println("pairs " + operators.MinHashLSH.nearDupPairs(docs, "doc_id", "text").count()))
    }
    spark.stop()
  }
}
