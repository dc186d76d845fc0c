package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the n-gram overlap check every LLM training
  * pipeline runs before training: flag training documents that share any
  * long-enough token n-gram with an evaluation/benchmark document, so eval
  * answers don't leak into the training set.
  *
  * Plan shape: benchmark docs → distinct n-grams (small — broadcast);
  * training docs → exploded n-grams; inner join on the n-gram, count
  * distinct shared grams per doc. The training side shuffles (doc id,
  * gram) pairs only, never text; at 100 TB the benchmark side stays a
  * broadcast (eval suites are MBs) and the whole check is one map-side
  * join + one aggregation.
  */
object Contamination {

  /** (id, n_shared) for every training doc sharing ≥1 `n`-gram with any
    * benchmark doc, n_shared = number of DISTINCT shared n-grams.
    */
  def sharedNgrams(
      training: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame = {
    def grams(df: DataFrame) =
      graft.Tables
        .ensureParallelism(df.select(col(idCol).as("id"), col(textCol).as("_text")))
        .select(col("id"), TextFns.tokens(col("_text")).as("_toks"))
        .select(col("id"), explode(array_distinct(TextFns.ngramsFromTokens(col("_toks"), n))).as("gram"))
    val benchGrams = grams(benchmark).select("gram").distinct()
    grams(training)
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
