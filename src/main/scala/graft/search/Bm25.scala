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

  /** Top-k docs for `queryTerms` by BM25. Emits (doc id, score). */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val base = graft.Tables
      .ensureParallelism(docs.select(col(idCol).as("id"), col(textCol).as("_text")))
      .select(col("id"), TextFns.tokens(col("_text")).as("_toks"))
      .select(col("id"), col("_toks"), size(col("_toks")).as("dl"))

    val postings = base
      .select(col("id"), col("dl"), explode(col("_toks")).as("term"))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // Corpus stats: doc frequency per query term; N and avgdl as scalars.
    val terms = queryTerms.map(_.toLowerCase)
    val qPostings = postings.filter(col("term").isin(terms: _*))
    val docFreq = qPostings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    qPostings
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(corpus))
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
}
