package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich ACL'16 — the merge
  * learning behind BPE/GPT-style tokenizers), distributed the way the
  * algorithm's own structure demands: classic BPE iterates over the
  * WORD-FREQUENCY table, not the corpus, so the corpus is scanned ONCE
  * (tokenize → (word, freq) hash agg — the only data-sized shuffle) and
  * every merge round then runs on the vocabulary-scale frame: adjacent
  * symbol pairs weighted by word frequency (one explode + hash agg over
  * vocab rows), argmax pair (1-row driver scalar, deterministic
  * count-desc-then-lexicographic tie rule), merge applied as one
  * codegen'd left-to-right array fold. At 100 TB the per-round cost is
  * independent of corpus size — it rides |vocab|, exactly why real
  * tokenizer training is tractable at all.
  *
  * Tokenization with the learned merges keeps the same shape: words are
  * segmented ONCE on the vocabulary table and documents JOIN their
  * (word, count) pairs against it — the corpus never pays the k-fold
  * merge chain per token occurrence.
  */
object Bpe {

  /** The learned model: `merges` (rank, left, right, pair_count) in
    * learned order, and `vocab` (word, freq, tokens) — every corpus
    * word segmented by the full merge sequence.
    */
  final case class BpeModel(merges: DataFrame, vocab: DataFrame)

  /** One greedy left-to-right merge pass: fold the symbol array,
    * coalescing each adjacent (l, r) occurrence into lr. A freshly
    * merged token participates as the LEFT of the next comparison (the
    * reference algorithm's scan semantics): "aaaa" under (a,a) →
    * [aa, aa], not [aa, a, a].
    */
  private def applyMerge(symbols: Column, l: String, r: String): Column =
    aggregate(
      symbols,
      array().cast("array<string>"),
      (acc, s) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r)))
        ).otherwise(concat(acc, array(s)))
    )

  /** Learn `rounds` merges from the corpus. The driver holds one
    * (pair, count) scalar per round — bounded metadata, the house
    * contract for index builds.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): BpeModel = {
    require(rounds > 0, "rounds must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // The one corpus-sized pass: word frequencies.
    val words = docs
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
    // Symbol arrays start as characters; localCheckpoint pins the
    // vocab-scale frame so each round's fold does not replay the
    // corpus tokenize (and lineage stays O(1) across rounds).
    var vocab = words
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val top = vocab
        .select(col("freq"), explode(expr("transform(slice(syms, 1, size(syms) - 1), (s, i) -> struct(s as l, element_at(syms, i + 2) as r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => exhausted = true // every word is a single token
        case Some((l, r, cnt)) =>
          merges += ((round, l, r, cnt))
          vocab = vocab
            .withColumn("syms", applyMerge(col("syms"), l, r))
            .localCheckpoint(true)
          round += 1
      }
    }
    BpeModel(
      merges.toSeq.toDF("rank", "left", "right", "pair_count"),
      vocab.select(col("word"), col("freq"), col("syms").as("tokens"))
    )
  }

  /** Tokenizer economics under the learned vocabulary: per-`groupCol`
    * bytes/token — documents join their word occurrences against the
    * segmented vocab (tokens-per-word), so the merge chain is never
    * re-run on the corpus.
    */
  def economics(docs: DataFrame, groupCol: String, textCol: String, model: BpeModel): DataFrame = {
    val occ = docs
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("n_occ"))
    occ
      .join(model.vocab.select(col("word"), size(col("tokens")).as("n_tok"), length(col("word")).as("n_bytes")), "word")
      .groupBy(col(groupCol))
      .agg(
        sum(col("n_occ") * col("n_bytes")).as("bytes"),
        sum(col("n_occ") * col("n_tok")).as("tokens")
      )
      .select(
        col(groupCol),
        col("bytes"),
        col("tokens"),
        (col("bytes").cast("double") / col("tokens")).as("bytes_per_token")
      )
  }
}
