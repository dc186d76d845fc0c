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

  /** Indexed completion suggester: the (prefix → completion) posting
    * table a deployment materializes ONCE — the corpus aggregates to
    * its vocabulary first (Heaps-sublinear, the only corpus-scale pass),
    * then each distinct token explodes to its edge-ngram prefixes
    * paired with the FULL token. Completing a prefix at query time is
    * then an exact-key EQUALITY lookup on `pref` (pushable; prunes to
    * one posting group — or one bucket when the table is written
    * bucketed by pref), instead of the vocabulary-wide starts_with scan
    * the unindexed suggester runs per keystroke. Expansion is bounded:
    * at most maxGram−minGram+1 prefix rows per vocabulary token.
    */
  def completionIndex(docs: DataFrame, textCol: String, minGram: Int, maxGram: Int): DataFrame =
    graft.Tables
      .ensureParallelism(docs.select(col(textCol).as("_text")))
      .select(explode(TextFns.tokens(col("_text"))).as("suggestion"))
      .groupBy("suggestion")
      .agg(count(lit(1)).as("freq"))
      .select(
        explode(SearchDsl.edgeNgrams(col("suggestion"), minGram, maxGram)).as("pref"),
        col("suggestion"),
        col("freq")
      )

  /** Top-k completions for a typed prefix from a [[completionIndex]]:
    * most frequent first, ties lexicographic — the completion
    * suggester's ranking. The prefix must be within the index's gram
    * range (shorter/longer prefixes have no posting rows by
    * construction).
    */
  def complete(index: DataFrame, prefix: String, k: Int): DataFrame =
    index
      .filter(col("pref") === lit(prefix.toLowerCase))
      .orderBy(col("freq").desc, col("suggestion"))
      .limit(k)
      .select("suggestion", "freq")

  /** OpenSearch phrase suggester ("did you mean" over whole phrases):
    * per-position correction candidates from the vocabulary (edit
    * distance ≤ maxDist — the [[suggest]] plan per term), composed into
    * candidate phrases and ranked by observed corpus bigram frequency
    * with the candidates' unigram frequencies as backoff (the
    * stupid-backoff shape, Brants et al. '07).
    *
    * Scale: candidates are levenshtein-filtered VOCABULARY rows (tiny —
    * Heaps-sublinear vocab, then a distance filter), so the phrase cross
    * product is bounded; the corpus bigram table is semi-joined down to
    * the candidate pairs BEFORE the scoring join, so corpus-sized frames
    * never meet a cross product and the final join broadcasts.
    */
  def suggestPhrase(
      docs: DataFrame,
      textCol: String,
      phrase: Seq[String],
      maxDist: Int,
      k: Int
  ): DataFrame = {
    require(phrase.length == 2, "phrase suggester: two-term phrases")
    val base = graft.Tables
      .ensureParallelism(docs.select(col(textCol).as("_text")))
      .select(TextFns.tokens(col("_text")).as("toks"))
    val vocab = base
      .select(explode(col("toks")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))
    def cand(t: String, i: Int): DataFrame = {
      val q = t.toLowerCase
      vocab
        .filter(abs(length(col("term")) - lit(q.length)) <= maxDist)
        .filter(levenshtein(col("term"), lit(q)) <= maxDist)
        .select(col("term").as(s"w$i"), col("freq").as(s"f$i"), levenshtein(col("term"), lit(q)).as(s"d$i"))
    }
    val pairs = cand(phrase(0), 1).crossJoin(cand(phrase(1), 2))
    val bigrams = base
      .filter(size(col("toks")) >= 2)
      .select(
        explode(
          expr("transform(slice(toks, 1, size(toks) - 1), (t, i) -> struct(t AS w1, toks[i + 1] AS w2))")
        ).as("b")
      )
      .select(col("b.w1"), col("b.w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
    val matched = bigrams.join(broadcast(pairs.select("w1", "w2")), Seq("w1", "w2"))
    pairs
      .join(broadcast(matched), Seq("w1", "w2"), "left")
      .select(
        concat_ws(" ", col("w1"), col("w2")).as("suggestion"),
        (col("d1") + col("d2")).as("dist"),
        coalesce(col("c12"), lit(0L)).as("bigram_count"),
        (col("f1") + col("f2")).as("cand_freq")
      )
      .orderBy(col("bigram_count").desc, col("dist").asc, col("cand_freq").desc, col("suggestion"))
      .limit(k)
  }
}
