package graft.search

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring — the ranking function OpenSearch/Lucene actually
  * runs for `match` queries (Robertson/Sparck-Jones probabilistic model,
  * k1/b parameterization).
  *
  * Plan shape (all hash aggregations + one broadcast, no cross join):
  *   1. (doc, term, tf) — explode tokens, count per doc+term
  *   2. corpus stats — docFreq per term (one groupBy), N + avgdl (scalar agg)
  *   3. restrict to query terms (tiny IN filter, pushed into the tf agg)
  *   4. score = Σ idf(term) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *
  * At 100 TB the per-term statistics are the inverted-index build — one
  * shuffle keyed by term — and scoring a query touches only the posting
  * rows of its terms.
  */
object Bm25 {

  /** The inverted index: the (id, dl, term, tf) posting table plus the
    * (n_docs, avgdl) corpus scalars. At 100 TB this is the one-shuffle
    * index BUILD — computed once, persisted/bucketed by term — and every
    * query then touches only its own terms' posting rows. `persist()` pins
    * both frames; the caller owns the cache lifecycle.
    */
  final case class Bm25Index(postings: DataFrame, corpus: DataFrame) {
    def persist(): Bm25Index = {
      postings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      this
    }
    def unpersist(): Unit = {
      postings.unpersist()
      corpus.unpersist()
    }
  }

  /** Build the inverted index for a corpus (tokenize → explode →
    * (id, term) count). Document frequency is not pre-aggregated: scoring
    * derives the df of exactly its query terms from the filtered postings
    * (bit-identical, and a groupBy over two terms instead of the whole
    * vocabulary). The optional `analyzer` applies the configured
    * token-filter chain (stopwords, stemming) at INDEX time; query terms
    * must pass through the same chain ([[Analyzer.normalizeTerms]]) —
    * the index/query symmetry every analyzed search depends on. Document
    * length `dl` is the POST-filter token count, the Lucene convention
    * (stopwords don't count toward length normalization). The default
    * standard chain compiles to exactly the pre-r10 expression, so
    * existing indexes and oracles are unchanged.
    */
  def buildIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      analyzer: Analyzer = Analyzer.standard
  ): Bm25Index = {
    val base = graft.Tables
      .ensureParallelism(docs.select(col(idCol).as("id"), col(textCol).as("_text")))
      .select(col("id"), SearchDsl.analyzeWith(col("_text"), analyzer).as("_toks"))
      .select(col("id"), col("_toks"), size(col("_toks")).as("dl"))
    val postings = base
      .select(col("id"), col("dl"), explode(col("_toks")).as("term"))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // sum_dl rides along so incremental maintenance (applyDelta) can
    // adjust the average with exact integer arithmetic; avgdl itself is
    // avg(dl) = sum.toDouble / count, the same IEEE division applyDelta
    // re-derives — bit-identical either way.
    val corpus = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"), avg(col("dl")).as("avgdl"))
    Bm25Index(postings, corpus)
  }

  /** Incrementally maintain a prebuilt index from a CDC batch — the daily
    * operation of a live search tier (the reference applies Debezium
    * c/u/d envelopes to its index one bulk call at a time; this is that
    * loop's index-maintenance half on the posting artifact). The touched
    * ids are anti-joined out of the posting table, the upserted docs are
    * tokenized ALONE, and the 1-row corpus stats adjust by the removed
    * and added (count, Σdl) in exact integer arithmetic — work scales
    * with |delta|, not |corpus|. Bm25IndexSpec proves
    * applyDelta(index, upserts, deletes) ≡ buildIndex(final corpus)
    * posting-for-posting (updates and deletes included).
    *
    * `upserts` carries the post-image (id, text) of created/updated docs,
    * one row per id (collapse a raw changelog upstream — CdcBatch);
    * `deletes` carries deleted ids. Zero-token documents are out of
    * contract: they leave no posting rows to subtract on removal (the
    * corpus parquet has none; the spec pins equivalence on real data).
    */
  def applyDelta(
      index: Bm25Index,
      upserts: DataFrame,
      deletes: DataFrame,
      idCol: String,
      textCol: String
  ): Bm25Index = {
    val up = upserts.select(col(idCol).as("id"), col(textCol).as("_text"))
    val touched = up.select(col("id")).unionByName(deletes.select(col(idCol).as("id"))).distinct()
    // No forced broadcast: the delta is the small side by construction and
    // AQE sizes it; at 100 TB the posting table is bucketed by term for
    // scoring, so the id-keyed anti join is the one shuffle this pays.
    val kept = index.postings.join(touched, Seq("id"), "left_anti")
    val fresh = buildIndex(up, "id", "_text")
    // Removed docs' (count, Σdl) from the old postings: dl repeats on
    // every posting row of a doc, so distinct (id, dl) recovers one row
    // per touched existing doc (an upsert of an existing id removes its
    // old rows too — touched covers both).
    val removed = index.postings
      .join(touched, Seq("id"), "left_semi")
      .select(col("id"), col("dl"))
      .distinct()
      .agg(count(lit(1)).as("_rm_n"), coalesce(sum(col("dl")), lit(0L)).as("_rm_sum"))
    val added = fresh.corpus.select(
      col("n_docs").as("_add_n"),
      coalesce(col("sum_dl"), lit(0L)).as("_add_sum")
    )
    val corpus = index.corpus
      .crossJoin(broadcast(removed))
      .crossJoin(broadcast(added))
      .select(
        (col("n_docs") - col("_rm_n") + col("_add_n")).as("n_docs"),
        (col("sum_dl") - col("_rm_sum") + col("_add_sum")).as("sum_dl")
      )
      .select(
        col("n_docs"),
        col("sum_dl"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl")
      )
    Bm25Index(kept.unionByName(fresh.postings), corpus)
  }

  /** Score `queryTerms` against a prebuilt index: filter the postings to
    * the query terms (tiny IN, prunes a bucketed/persisted posting table),
    * df per term from those rows, then the k1/b-parameterized BM25 sum.
    */
  def scoreAgainstIndex(
      index: Bm25Index,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase)
    val qPostings = index.postings.filter(col("term").isin(terms: _*))
    val docFreq = qPostings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    qPostings
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(index.corpus))
      .select(
        col("id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))).as("term_score")
      )
      .groupBy(col("id"))
      .agg(round(sum(col("term_score")), 4).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** `neural_sparse` query semantics (OpenSearch neural-sparse search:
    * query text and documents both map to sparse term→weight vectors and
    * score by their dot product) with a DETERMINISTIC statistical encoder
    * standing in for the learned model — the sandbox has no ML runtime,
    * and a reproducible encoder is what an oracle-gated engine can verify:
    * doc-side weight w_d(t) = ln(1 + tf) (sublinear term saturation, the
    * shape SPLADE's log-activation produces), query-side weight
    * w_q(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (the BM25 idf — rare
    * query terms carry more of the dot product). Score = Σ_{t ∈ q∩d}
    * w_q(t)·w_d(t). Unlike BM25 there is no document-length
    * normalization: sparse-vector dot products don't renormalize by dl,
    * which is exactly how the two rankings diverge (long documents are
    * not discounted here).
    *
    * Plan shape = the scoreAgainstIndex path: tiny IN filter prunes the
    * term-keyed posting artifact, df derived from the filtered rows,
    * corpus scalars broadcast, one hash agg per doc. A swap to a real
    * learned encoder changes only the two weight expressions; the
    * index/plumbing contract is identical.
    */
  def neuralSparseScored(
      index: Bm25Index,
      queryTerms: Seq[String],
      k: Int
  ): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase)
    val qPostings = index.postings.filter(col("term").isin(terms: _*))
    val docFreq = qPostings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    qPostings
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(index.corpus.select("n_docs")))
      .select(
        col("id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          log(lit(1.0) + col("tf"))).as("term_score")
      )
      .groupBy(col("id"))
      .agg(round(sum(col("term_score")), 4).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** `combined_fields` query: term-centric scoring across several short
    * text fields as if their tokens formed one combined field — the
    * BM25F-style weighted term frequencies of the OpenSearch
    * combined_fields query (field weights from `fields`; saturation
    * tf/(tf+k1); no length normalization, the short-field case).
    *
    * Plan: the weighted tf of each term is a codegen'd whole-row
    * expression (short fields — no token explode), the per-term document
    * frequencies come from ONE scalar aggregation broadcast back, and the
    * final score sums in fixed expression order so both engines run
    * identical IEEE double math. Two scans total; no shuffle keyed by
    * term.
    */
  def combinedFields(
      docs: DataFrame,
      idCol: String,
      fields: Seq[(String, Double)],
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2
  ): DataFrame =
    combinedFieldsScored(docs, fields, queryTerms, k1)
      .select(col(idCol), col("_score").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** The scored frame behind [[combinedFields]]: every matching doc with
    * its BM25F `_score`, all source columns intact — the wire executor's
    * shape (it owns sort/size/_source). Field stats are ONE aggregate
    * over the corpus broadcast back as a 1-row join; scoring is a pure
    * projection.
    */
  def combinedFieldsScored(
      docs: DataFrame,
      fields: Seq[(String, Double)],
      queryTerms: Seq[String],
      k1: Double = 1.2
  ): DataFrame = {
    // Distinct AFTER lowercasing: per-term df columns are name-keyed
    // (`_df_<term>`), so a legal wire body repeating a term ("small
    // small") would otherwise mint two identically-named columns and
    // blow up with an ambiguous-reference AnalysisException at score
    // time. A repeated term carries no extra signal under the df/tf
    // saturation model, so each distinct term scores once.
    val terms = queryTerms.map(_.toLowerCase).distinct
    def ctf(t: String): Column =
      fields
        .map { case (f, w) => lit(w) * size(filter(SearchDsl.analyze(col(f)), x => x === lit(t))) }
        .reduce(_ + _)
    val stats = docs.agg(
      count(lit(1)).as("_n"),
      terms.map(t => sum(when(ctf(t) > 0, 1).otherwise(0)).as(s"_df_$t")): _*
    )
    val score = terms
      .map { t =>
        val df = col(s"_df_$t")
        log(lit(1.0) + (col("_n") - df + lit(0.5)) / (df + lit(0.5))) * (ctf(t) / (ctf(t) + lit(k1)))
      }
      .reduce(_ + _)
    docs
      .crossJoin(broadcast(stats))
      .withColumn("_score", round(score, 6))
      .filter(col("_score") > 0)
      .drop("_n" +: terms.map(t => s"_df_$t"): _*)
  }

  /** One-shot top-k: build + score. Same plan as the fused form — the
    * split exists so repeated queries amortize the build
    * (see Bm25IndexSpec).
    */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame =
    scoreAgainstIndex(buildIndex(docs, idCol, textCol), queryTerms, k, k1, b)

  /** `more_like_this` against a prebuilt index: the posting table already
    * holds one row per (doc, distinct term), so the target's term set is
    * a tiny filtered fetch, the shared-term restriction is a broadcast
    * semi-join on the postings, and n_docs comes from the corpus scalars
    * — no re-tokenization of the corpus. Scores are identical to
    * [[moreLikeThis]] (Bm25IndexSpec asserts it).
    */
  /** The `_termvectors` API for one document: per-term statistics from
    * the inverted index — term_freq (tf in the doc), doc_freq (docs
    * containing the term), ttf (total term frequency across the
    * corpus) — term ascending. Plan: the vocabulary stats aggregate
    * ONCE over the posting table (map-side combined, vocabulary-sized
    * output); the single-document posting slice is a point filter on
    * the postings joined against it (AQE broadcasts the doc-sized
    * side) — the corpus is never re-tokenized per call.
    */
  def termVectors(index: Bm25Index, docId: Any): DataFrame = {
    val stats = index.postings
      .groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("tf")).as("ttf"))
    index.postings
      .filter(col("id") === lit(docId))
      .select(col("term"), col("tf").as("term_freq"))
      .join(stats, "term")
      .select(col("term"), col("term_freq"), col("doc_freq"), col("ttf"))
      .orderBy("term")
  }

  /** The `_explain` API: why one document scores as it does for a term
    * query — one row per MATCHED query term with the BM25 factor
    * breakdown (tf, df, idf, contribution), computed by exactly the
    * [[scoreAgainstIndex]] expressions in the same order, so the
    * contributions sum to the emitted score bit for bit. df counts the
    * term's documents across the WHOLE index (not just the explained
    * doc), as the real API reports.
    */
  def explainScore(
      index: Bm25Index,
      docId: Any,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    val qPostings = index.postings.filter(col("term").isin(terms: _*))
    val docFreq = qPostings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    qPostings
      .filter(col("id") === lit(docId))
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(index.corpus))
      .select(
        col("term"),
        col("tf"),
        col("df"),
        round(idf, 6).as("idf"),
        round(
          idf * (col("tf") * lit(k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))),
          4
        ).as("contribution")
      )
      .orderBy("term")
  }

  def moreLikeThisAgainstIndex(index: Bm25Index, targetId: Any, k: Int): DataFrame = {
    val terms = index.postings.select(col("id"), col("term"))
    val target = terms.filter(col("id") === lit(targetId)).select(col("term"))
    val shared = terms.join(broadcast(target), "term")
    val docFreq = shared.groupBy("term").agg(count(lit(1)).as("df"))
    shared
      .filter(col("id") =!= lit(targetId))
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(index.corpus.select(col("n_docs"))))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_shared"),
        round(sum(log(col("n_docs").cast("double") / col("df"))), 6).as("score")
      )
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** `more_like_this`: documents ranked by idf-weighted overlap with the
    * target document's distinct analyzed terms — the degenerate (tf=1)
    * form of Lucene's MLT, whose interesting part is exactly the idf
    * weighting (shared RARE terms say "alike", shared stopwords say
    * nothing).
    *
    * Plan: the target's term set is corpus-independent and tiny (one
    * document) → broadcast semi-join onto the exploded distinct-term
    * table; df per term from a groupBy of that restricted table only; one
    * final per-doc aggregation. The shuffle carries (term, doc_id) pairs
    * for matching terms only, never text. Score = Σ ln(N/df) over shared
    * terms plus the exact shared-term count as a deterministic integer
    * column (`n_shared`).
    */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String, targetId: Any, k: Int): DataFrame = {
    val terms = graft.Tables
      .ensureParallelism(docs.select(col(idCol).as("id"), col(textCol).as("_text")))
      .select(col("id"), explode(array_distinct(TextFns.tokens(col("_text")))).as("term"))
    val target = terms.filter(col("id") === lit(targetId)).select(col("term"))
    val shared = terms.join(broadcast(target), "term")
    val docFreq = shared.groupBy("term").agg(count(lit(1)).as("df"))
    // Count over the narrow id column only — an unprojected count(*)
    // makes the scan read a string column it never uses.
    val n = docs.select(col(idCol)).agg(count(lit(1)).as("n_docs"))
    shared
      .filter(col("id") =!= lit(targetId))
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(n))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_shared"),
        round(sum(log(col("n_docs").cast("double") / col("df"))), 6).as("score")
      )
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
