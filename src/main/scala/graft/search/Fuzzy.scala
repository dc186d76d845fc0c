package graft.search

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OpenSearch `fuzzy` query: match documents containing a token within
  * edit distance `maxDist` of the query term.
  *
  * The scale design matters here: computing levenshtein against every
  * token OCCURRENCE is O(corpus); computing it against the distinct
  * VOCABULARY is O(|vocab|), and vocabularies are sublinear in corpus size
  * (Heaps' law). So: distinct tokens → levenshtein filter (a scan of the
  * small vocab table) → broadcast the few surviving variants → semi-join
  * the token table. No HOF, no per-row quadratic.
  */
object Fuzzy {

  /** Doc ids with ≥1 token within `maxDist` edits of `term`. */
  def fuzzyMatch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      term: String,
      maxDist: Int
  ): DataFrame = {
    val toks = graft.Tables
      .ensureParallelism(docs.select(col(idCol).as("id"), col(textCol).as("_text")))
      .select(col("id"), explode(array_distinct(TextFns.tokens(col("_text")))).as("tok"))
    // Length pre-filter: |len(t) - len(term)| <= maxDist is a necessary
    // condition, pushed ahead of the O(len^2) distance computation.
    val variants = toks
      .select("tok")
      .distinct()
      .filter(abs(length(col("tok")) - lit(term.length)) <= maxDist)
      .filter(levenshtein(col("tok"), lit(term.toLowerCase)) <= maxDist)
    toks.join(broadcast(variants), "tok").select("id").distinct()
  }

  /** OpenSearch term suggester ("did you mean"): correction candidates for
    * a (possibly misspelled) term, ranked by edit distance then corpus
    * frequency — the same vocabulary-level plan as [[fuzzyMatch]]: one
    * token-frequency aggregation (the suggester's index), then levenshtein
    * over the distinct vocabulary only.
    */
  def suggest(
      docs: DataFrame,
      textCol: String,
      term: String,
      maxDist: Int,
      k: Int
  ): DataFrame = {
    val vocab = graft.Tables
      .ensureParallelism(docs.select(col(textCol).as("_text")))
      .select(explode(TextFns.tokens(col("_text"))).as("suggestion"))
      .groupBy("suggestion")
      .agg(count(lit(1)).as("freq"))
    vocab
      .filter(abs(length(col("suggestion")) - lit(term.length)) <= maxDist)
      .withColumn("dist", levenshtein(col("suggestion"), lit(term.toLowerCase)))
      .filter(col("dist") <= maxDist && col("dist") > 0)
      .orderBy(col("dist").asc, col("freq").desc, col("suggestion"))
      .limit(k)
  }
}
