package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline: token
  * counting, quality features, language-ID, fingerprinting, n-grams.
  *
  * Everything is built from `org.apache.spark.sql.functions` (codegen'd,
  * whole-stage-compatible) — no UDFs in these hot paths. Each is a pure
  * per-row expression: embarrassingly parallel, no shuffle.
  */
object TextFns {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Sliding-window document chunking — the RAG/provenance chunker
    * (split each document into overlapping `window`-token chunks at
    * `stride` starts), as one codegen'd per-row array expression:
    * chunk k covers tokens [k·stride, k·stride+window), for every
    * start < n. Trailing chunks shorter than `window` are EMITTED
    * (provenance is this operator's job — padding/packing to a fixed
    * budget is [[graft.operators.Sampling]]'s sequence packer).
    * Returns array<struct<chunk_id, toks>>; explode downstream. Pure
    * projection: embarrassingly parallel, chunk provenance (doc_id,
    * chunk_id) rides the row — at 100 TB this is a map-only stage.
    */
  def slidingChunks(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window, s"need 0 < stride <= window: window=$window stride=$stride")
    val toks = tokens(text)
    val n = size(toks)
    transform(
      sequence(lit(0), ((n - lit(1)) / lit(stride)).cast("int")),
      k => struct(k.as("chunk_id"), slice(toks, k * lit(stride) + lit(1), lit(window)).as("toks"))
    )
  }

  /** Sentence-boundary segmentation — the boundary-aware grain for
    * chunking, packing, and decontamination (vs [[slidingChunks]]'
    * fixed-stride windows). One codegen'd per-row expression: sentences
    * are maximal runs of non-terminator characters plus their trailing
    * `.!?` run (`[^.!?]+[.!?]*` — deliberately lookaround-free so the
    * SAME pattern runs under Java regex here and RE2 in the oracle),
    * trimmed, empties dropped. Map-only at any corpus size; sentence
    * provenance (doc_id, sent_idx) rides the row.
    */
  def sentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit("[^.!?]+[.!?]*"), lit(0)), s => trim(s)),
      s => s =!= ""
    )

  /** Shannon entropy (bits) of each document's token distribution — the
    * classic repetitiveness/diversity quality signal (low entropy = a few
    * tokens dominate; boilerplate and generated spam score low).
    *
    * H = log2(n) − Σ c·log2(c) / n over per-document token counts.
    * Two hash aggregations (doc+token counts, then per-doc sums), both with
    * map-side partials; the shuffle carries (id, token, count) triples,
    * never text. An in-array HOF version would avoid the shuffle but
    * recounts tokens O(|doc|²) per row — the exploded aggregate is the plan
    * that survives long documents.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cnt = graft.Tables
      .ensureParallelism(df.select(col(idCol).as("id"), col(textCol).as("_text")))
      .select(col("id"), explode(tokens(col("_text"))).as("t"))
      .groupBy("id", "t")
      .agg(count(lit(1)).as("c"))
    cnt
      .groupBy("id")
      .agg(
        sum("c").as("n"),
        sum(col("c").cast("double") * log2(col("c").cast("double"))).as("s")
      )
      .select(
        col("id"),
        round(log2(col("n").cast("double")) - col("s") / col("n").cast("double"), 6).as("entropy")
      )
  }

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** OpenRefine-style normalization fingerprint: lowercase, dedupe, sort,
    * rejoin, hash. Two documents with the same bag of words collide —
    * the cheap near-dup key.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(tokens(text)))))

  /** Number of tokens of `text` that appear in `words`. */
  def markerCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(_.toLowerCase): _*)))

  /** Ratio of characters matching `charClass` (a regex character class). */
  def charRatio(text: Column, charClass: String): Column =
    length(regexp_replace(text, s"[^$charClass]", "")) / length(text)

  /** Quality features in one pass (cheap-heuristics tier of a data-quality
    * cascade): token count, average token length, stopword ratio,
    * digit ratio. A composite score in [0,1]-ish for filtering.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text)

  def stopwordRatio(text: Column): Column =
    markerCount(text, Stopwords).cast("double") / tokenCount(text)

  /** Language-ID via marker-word scoring: deterministic, oracle-checkable
    * heuristic (count function-word hits per language, argmax with a fixed
    * tie-break order). The real-corpus version swaps in per-language n-gram
    * profiles; the shape (per-row score columns + CASE argmax) is identical.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "los", "que", "y")
  )

  /** (lang, score) columns + predicted language with ties broken by the
    * declaration order of LangMarkers.
    */
  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (l, ws) => l -> markerCount(text, ws) }

  def langPredict(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    scores
      .foldLeft(Option.empty[Column]) { case (acc, (l, s)) =>
        Some(acc.fold(when(s === best, lit(l)))(_.when(s === best, lit(l))))
      }
      .get
      .otherwise(lit("und"))
  }

  /** Word n-grams as an array column (1-based element_at so the DuckDB
    * oracle can mirror the indexing exactly).
    */
  /** N-grams over a token array column, as a compiled JVM sliding-window
    * UDF (the same shape Spark ML's NGram transformer uses).
    *
    * Why not `transform(sequence(...), i -> element_at(t, i+j))`: higher-
    * order functions are interpreted (no codegen) and every `element_at`
    * re-evaluates its argument subtree, which measured ~50x slower than
    * this UDF on the shingling hot path.
    */
  def ngramsFromTokens(t: Column, n: Int): Column =
    // Native codegen expression (r19, was a boxed Seq[String] UDF): same
    // values — null/short input → empty array, space-joined windows —
    // without the per-row ArrayData↔Seq conversions; NgramsSpec pins
    // native ≡ UDF on hostile corpora. The retired UDF form stays below
    // as the spec's reference implementation.
    NgramsFromTokensExpr.ngrams(t, n)

  /** The retired UDF form — kept `private[graft]` as the equivalence
    * spec's reference implementation (NgramsSpec: native ≡ this).
    */
  private[graft] def ngramsFromTokensUdf(t: Column, n: Int): Column = {
    val f = udf((toks: Seq[String]) =>
      if (toks == null || toks.length < n) Seq.empty[String]
      else toks.iterator.sliding(n).map(_.mkString(" ")).toSeq
    )
    f(t)
  }

  /** Convenience form over raw text. */
  def wordNgrams(text: Column, n: Int): Column = ngramsFromTokens(tokens(text), n)

  /** TRUE polynomial rolling hash over the token stream (document
    * shingling fingerprint / content-defined chunking keys): window i's
    * value is Σ_j base(tok_{i+j})·B^{w-1-j} mod P with base(t) =
    * md5Int60(t) mod P ([[graft.functions.OracleHash]]) — ONE digest per
    * TOKEN, then O(1) per slide (the genuinely rolling recurrence
    * h' = (h − b_out·B^{w-1})·B + b_in mod P), where the old chained-
    * murmur3 form re-hashed every window from scratch. r16: every window
    * value is recomputable in DuckDB (md5 + exact signed-64 modular
    * arithmetic), promoting the key from rows-only to full oracle.
    * null-in → null-out; fewer than w tokens → empty array.
    */
  def rollingHashesFromTokens(t: Column, window: Int): Column = {
    val w = window
    val f = udf((toks: Seq[String]) =>
      if (toks == null) null
      else if (toks.length < w) Seq.empty[Long]
      else {
        val P = graft.functions.OracleHash.P
        val B = graft.functions.OracleHash.RollB
        // B^(w-1) mod P, for the roll-out term
        var bw = 1L
        var e = 0
        while (e < w - 1) { bw = (bw * B) % P; e += 1 }
        val bases = toks.iterator
          .map(tok => graft.functions.OracleHash.md5ModP(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          .toArray
        val out = new Array[Long](toks.length - w + 1)
        var h = 0L
        var j = 0
        while (j < w) { h = (h * B + bases(j)) % P; j += 1 }
        out(0) = h
        var i = 1
        while (i < out.length) {
          // subtract the outgoing token's top term, shift, add incoming
          h = (((h - (bases(i - 1) * bw) % P + P) % P) * B + bases(i + w - 1)) % P
          out(i) = h
          i += 1
        }
        out.toSeq
      }
    )
    f(t)
  }

  /** Convenience form over raw text; for hot paths materialize [[tokens]]
    * first (see [[ngramsFromTokens]] for why).
    */
  def rollingHashes(text: Column, window: Int): Column = rollingHashesFromTokens(tokens(text), window)

  /** Highest multiplicity of any word bigram in the token stream — the
    * numerator of the Gopher-style "fraction of characters in the most
    * common 2-gram" repetition filter (Rae et al. 2021 §A1.1). Compiled
    * one-pass count (a HOF/aggregate form would be interpreted and
    * re-evaluate the array per element).
    */
  def maxBigramCount(toks: Column): Column = {
    val f = udf((t: Seq[String]) =>
      if (t == null || t.length < 2) 0
      else {
        val counts = scala.collection.mutable.HashMap.empty[String, Int]
        var best = 0
        var i = 0
        while (i < t.length - 1) {
          val bg = t(i) + " " + t(i + 1)
          val c = counts.getOrElse(bg, 0) + 1
          counts(bg) = c
          if (c > best) best = c
          i += 1
        }
        best
      }
    )
    f(toks)
  }

  /** PII scrubbing patterns (training-data hygiene): conservative
    * regexes for emails and long digit runs (account/phone shapes). Pure
    * regexp_replace — codegen'd, no shuffle; extend the list per corpus.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "digits" -> "[0-9]{4,}"
  )

  /** Count of matches of one PII pattern. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** `text` with every PII pattern replaced by `[PII]`. */
  def piiRedact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, p)) => regexp_replace(c, p, "[PII]") }
}
