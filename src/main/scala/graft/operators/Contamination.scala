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

  /** The same check with the benchmark side compressed to a BLOOM FILTER
    * — the shape for when the eval gram table outgrows a comfortable raw
    * broadcast (a 1%-FPR bloom is ~1.2 bytes/gram vs the gram strings).
    * Two phases: (1) the broadcast bloom prunes the exploded training
    * grams map-side — no false negatives, so nothing real is dropped;
    * (2) the few survivors exact-join the true gram table (no broadcast
    * hint — both sides are small post-prune, AQE picks), which removes
    * the bloom's false positives. Output is therefore IDENTICAL to
    * [[sharedNgrams]]: the bloom buys shuffle reduction, not
    * approximation — it shares the exact oracle.
    */
  def sharedNgramsBloom(
      training: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      fpp: Double = 0.01
  ): DataFrame = {
    def grams(df: DataFrame) =
      graft.Tables
        .ensureParallelism(df.select(col(idCol).as("id"), col(textCol).as("_text")))
        .select(col("id"), TextFns.tokens(col("_text")).as("_toks"))
        .select(col("id"), explode(array_distinct(TextFns.ngramsFromTokens(col("_toks"), n))).as("gram"))
    // The benchmark gram table feeds three consumers (the sizing count,
    // the bloom build, the exact confirm join) — persist it once instead
    // of re-running tokenize+explode+distinct per consumer. The caller
    // owns the cache lifecycle (the nearDupPairs convention; the suite
    // clears cached blocks between queries).
    val benchGrams = grams(benchmark)
      .select("gram")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val expected = math.max(benchGrams.count(), 1L)
    val bloom = benchGrams.stat.bloomFilter("gram", expected, fpp)
    val bloomBc = training.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => g != null && bloomBc.value.mightContain(g))
    grams(training)
      .filter(mightContain(col("gram")))
      .join(benchGrams, "gram")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
