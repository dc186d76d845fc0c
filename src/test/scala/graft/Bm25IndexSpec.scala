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
}
