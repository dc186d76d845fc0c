package graft

import graft.search.Bm25

/** The index/score split: one persisted index build serves many queries
  * with identical results to the fused one-shot path.
  */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  test("two queries reuse one persisted index; results equal the one-shot path") {
    val docs = Tables.documents(spark, Sf)
    val index = Bm25.buildIndex(docs, "doc_id", "text").persist()
    try {
      for (terms <- Seq(Seq("spark", "query"), Seq("fast", "stream"))) {
        val viaIndex = Bm25.scoreAgainstIndex(index, terms, 10).as[(Long, Double)].collect().toSeq
        val oneShot = Bm25.topK(docs, "doc_id", "text", terms, 10).as[(Long, Double)].collect().toSeq
        assert(viaIndex == oneShot, s"terms=$terms")
        assert(viaIndex.nonEmpty)
      }
      // scoring must not re-shuffle the corpus: the query plan reads the
      // cached posting table
      val plan = Bm25.scoreAgainstIndex(index, Seq("spark"), 5).queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan)
    } finally index.unpersist()
  }

  test("applyDelta ≡ full rebuild, posting-for-posting: inserts, updates, and deletes") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf)
    // Carve the corpus into: base (indexed first), inserts (new ids),
    // updates (base ids whose text changes), deletes (base ids removed).
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val inserts = docs.filter(col("doc_id") % 5 === 0)
    val updates = docs
      .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 11 === 1)
      .withColumn("text", concat(col("text"), lit(" updated revision")))
    val deleteIds = docs
      .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 11 === 2)
      .select("doc_id")
    val upserts = inserts.unionByName(updates)
    val incr = Bm25.applyDelta(Bm25.buildIndex(base, "doc_id", "text"), upserts, deleteIds, "doc_id", "text")
    val finalCorpus = docs
      .filter(!(col("doc_id") % 5 =!= 0 && col("doc_id") % 11 === 2))
      .join(updates.select(col("doc_id").as("_u")), col("doc_id") === col("_u"), "left_anti")
      .unionByName(updates)
    val full = Bm25.buildIndex(finalCorpus, "doc_id", "text")
    def postingSet(ix: Bm25.Bm25Index) =
      ix.postings.as[(Long, Int, String, Long)].collect().toSet
    assert(postingSet(incr) == postingSet(full))
    val Seq(ic) = incr.corpus.as[(Long, Long, Double)].collect().toSeq
    val Seq(fc) = full.corpus.as[(Long, Long, Double)].collect().toSeq
    assert(ic == fc, s"incremental corpus $ic != full $fc")
    // and the artifact scores identically
    val a = Bm25.scoreAgainstIndex(incr, Seq("spark", "query"), 10).as[(Long, Double)].collect().toSeq
    val b = Bm25.scoreAgainstIndex(full, Seq("spark", "query"), 10).as[(Long, Double)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("_explain contributions sum to the emitted score; _termvectors agrees with the postings") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf)
    val index = Bm25.buildIndex(docs, "doc_id", "text").persist()
    try {
      val terms = Seq("spark", "query")
      // every scored document's explain rows sum (rounded as the score
      // path rounds) to its emitted score — the breakdown IS the score
      val scored = Bm25.scoreAgainstIndex(index, terms, 5).as[(Long, Double)].collect().toSeq
      assert(scored.nonEmpty)
      scored.foreach { case (id, score) =>
        val contribs = Bm25
          .explainScore(index, id, terms)
          .select(col("contribution"))
          .as[Double]
          .collect()
        // contributions are rounded at 4dp individually; the score is the
        // rounded sum of UNrounded terms — allow one ulp-of-rounding slack
        assert(math.abs(contribs.sum - score) < 5e-4, s"doc $id: ${contribs.toSeq} vs $score")
      }
      // termvectors: term_freq equals the doc's posting tf; doc_freq and
      // ttf equal first-principles aggregates over the posting table
      val tv = Bm25
        .termVectors(index, 7L)
        .as[(String, Long, Long, Long)]
        .collect()
        .toSeq
      assert(tv.nonEmpty && tv.map(_._1) == tv.map(_._1).sorted)
      val postings = index.postings.select(col("id"), col("term"), col("tf")).as[(Long, String, Long)].collect()
      val mine = postings.filter(_._1 == 7L).map(t => t._2 -> t._3).toMap
      assert(tv.map(t => t._1 -> t._2).toMap == mine)
      tv.foreach { case (term, _, df, ttf) =>
        assert(df == postings.count(_._2 == term).toLong, term)
        assert(ttf == postings.filter(_._2 == term).map(_._3).sum, term)
      }
    } finally index.unpersist()
  }

  test("more_like_this against the index equals the from-scratch path") {
    val docs = Tables.documents(spark, Sf)
    val index = Bm25.buildIndex(docs, "doc_id", "text").persist()
    try {
      val viaIndex =
        Bm25.moreLikeThisAgainstIndex(index, 7L, 10).as[(Long, Long, Double)].collect().toSeq
      val scratch =
        Bm25.moreLikeThis(docs, "doc_id", "text", 7L, 10).as[(Long, Long, Double)].collect().toSeq
      assert(viaIndex == scratch)
      assert(viaIndex.nonEmpty)
    } finally index.unpersist()
  }

  test("neural_sparse: dot-product scoring, no length normalization, wire twin plan-equal") {
    import org.apache.spark.sql.functions._
    // Equal tf of the query term but very different document lengths:
    // neural_sparse (no dl normalization) scores them EQUALLY where BM25
    // separates them — the defining divergence of the two rankings.
    val docs = Seq(
      (1L, "spark fast"),
      (2L, "spark " + Seq.fill(40)("filler").mkString(" ")),
      (3L, "unrelated text entirely")
    ).toDF("doc_id", "text")
    val idx = Bm25.buildIndex(docs, "doc_id", "text")
    val ns = Bm25.neuralSparseScored(idx, Seq("spark"), 10).as[(Long, Double)].collect().toMap
    assert(ns.keySet == Set(1L, 2L) && ns(1L) == ns(2L), s"neural_sparse must not length-normalize: $ns")
    val bm = Bm25.scoreAgainstIndex(idx, Seq("spark"), 10).as[(Long, Double)].collect().toMap
    assert(bm(1L) != bm(2L), s"BM25 length normalization should separate the docs: $bm")
    // tf saturates logarithmically on the doc side: tf=3 scores ln(4)/ln(2)
    // times tf=1 at equal idf
    val rep = Seq((1L, "spark spark spark"), (2L, "spark")).toDF("doc_id", "text")
    val rIdx = Bm25.buildIndex(rep, "doc_id", "text")
    val r = Bm25.neuralSparseScored(rIdx, Seq("spark"), 10).as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) / r(2L) - math.log(4.0) / math.log(2.0)) < 1e-3, r.toString)
    // the wire twin compiles to the structured plan on the corpus index
    val corpus = Tables.documents(spark, Sf)
    val cIdx = Bm25.buildIndex(corpus, "doc_id", "text")
    val structured = Bm25.neuralSparseScored(cIdx, Seq("spark", "query"), 10)
    val wire = graft.search.JsonDsl.neuralSparse(
      cIdx,
      """{"query": {"neural_sparse": {"text": {"query_text": "spark query"}}}, "size": 10}"""
    )
    assert(
      wire.queryExecution.optimizedPlan.canonicalized == structured.queryExecution.optimizedPlan.canonicalized,
      "wire neural_sparse must compile to the structured plan"
    )
    assert(structured.as[(Long, Double)].collect().toSeq.nonEmpty)
  }

  test("stemmed index: plural queries reach singular corpus; dl excludes stopwords; default chain unchanged") {
    import graft.search.Analyzer
    import org.apache.spark.sql.functions.col
    val a = Analyzer("light_english", stopwords = Seq("the", "a"), stem = true)
    val docs = Seq(
      (1L, "the spark query planner"),
      (2L, "a slow scan of tables"),
      (3L, "spark queries run fast")
    ).toDF("doc_id", "text")
    val idx = Bm25.buildIndex(docs, "doc_id", "text", a)
    // index terms are stemmed and stopword-free: doc 3's "queries"
    // landed as "query", no "the"/"a" postings anywhere
    val terms = idx.postings.select("term").as[String].collect().toSet
    assert(terms.contains("query") && !terms.contains("queries"))
    assert(!terms.contains("the") && !terms.contains("a"))
    // dl is the POST-filter count (doc 1: 4 raw tokens, 3 after stop)
    val dl1 = idx.postings.filter($"id" === 1L).select(col("dl").cast("long")).as[Long].head()
    assert(dl1 == 3L, s"dl must exclude stopwords, got $dl1")
    // a plural query normalized through the same chain scores both docs
    val hits = Bm25.scoreAgainstIndex(idx, a.normalizeTerms(Seq("queries")), 10)
      .select("id").as[Long].collect().toSet
    assert(hits == Set(1L, 3L))
    // the default standard chain still builds the identical index
    val std = Bm25.buildIndex(docs, "doc_id", "text")
    val legacy = Bm25.buildIndex(docs, "doc_id", "text", Analyzer.standard)
    assert(std.postings.collect().toSet == legacy.postings.collect().toSet)
  }
}
