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
