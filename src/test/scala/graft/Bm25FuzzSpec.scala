package graft

import graft.search.Bm25
import org.apache.spark.sql.functions._

/** Generative drill for the BM25 scoring path and its CDC maintenance.
  *
  * Scoring: random corpora (repeated terms → tf > 1, varied lengths)
  * and random multi-term queries through the posting artifact must
  * reproduce the Lucene formula computed independently per doc —
  * idf = ln(1 + (N − df + ½)/(df + ½)), tf·(k1+1)/(tf + k1·(1 − b +
  * b·dl/avgdl)) — including the df-from-query-postings derivation and
  * the rounded tie-break ordering.
  *
  * Maintenance: random upsert/delete batches must leave the index
  * posting-for-posting equal to a fresh build of the final corpus —
  * the applyDelta ≡ rebuild invariant under random churn, including
  * the exact-integer corpus-stats adjustment.
  */
class Bm25FuzzSpec extends SparkSpec {

  private val vocab = Vector(
    "ant", "bee", "cow", "doe", "elk", "fox", "gnu", "hen",
    "ibis", "jay", "kit", "lark", "mole", "newt"
  )

  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("6 random corpora x 5 queries: scoreAgainstIndex == Lucene formula per doc") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xb25L)
    (1 to 6).foreach { ci =>
      val docs = Vector.tabulate(60) { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val index = Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id", "text")
      val toks: Map[Long, Seq[String]] = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val n = docs.size
      val avgdl = toks.values.map(_.size).sum.toDouble / n

      (1 to 5).foreach { qi =>
        val terms = Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))).distinct
        val got = Bm25
          .scoreAgainstIndex(index, terms, k = n)
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1)))
          .toVector

        val df = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
        val want = toks.toSeq
          .flatMap { case (id, dtoks) =>
            val score = terms.map { t =>
              val tf = dtoks.count(_ == t)
              if (tf == 0 || df(t) == 0) 0.0
              else {
                val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
                idf * (tf * (1.2 + 1)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dtoks.size / avgdl))
              }
            }.sum
            if (score > 0) Some((id, round4(score))) else None
          }
          .sortBy { case (id, sc) => (-sc, id) }

        got.zip(want).zipWithIndex.foreach { case (((gi, gs), (wi, ws)), rank) =>
          assert(
            gi == wi && math.abs(gs - ws) <= 1e-9,
            s"corpus #$ci query $terms rank $rank: got ($gi, $gs) want ($wi, $ws)"
          )
        }
        assert(got.size == want.size, s"corpus #$ci query $terms: ${got.size} vs ${want.size} hits")
      }
    }
  }

  test("4 random churn batches: applyDelta == rebuild of the final corpus, posting for posting") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xb26L)
    (1 to 4).foreach { ci =>
      val base = Vector.tabulate(50) { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val index = Bm25.buildIndex(base.toDF("doc_id", "text"), "doc_id", "text")

      // churn: updates of existing ids, brand-new ids, deletes (some of
      // ids also being upserted stay deleted or upserted per the SPLIT
      // frames — keep them disjoint, as CdcBatch collapse guarantees)
      val ids = rnd.shuffle(base.map(_._1) ++ (50L until 60L))
      val (upsertIds, rest) = ids.splitAt(1 + rnd.nextInt(20))
      val deleteIds = rest.take(rnd.nextInt(15))
      val upserts = upsertIds.map(id => (id, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))

      val maintained = Bm25.applyDelta(
        index,
        upserts.toDF("doc_id", "text"),
        deleteIds.toDF("doc_id"),
        "doc_id",
        "text"
      )

      val finalCorpus =
        base.filterNot(d => upsertIds.contains(d._1) || deleteIds.contains(d._1)) ++ upserts
      val rebuilt = Bm25.buildIndex(finalCorpus.toDF("doc_id", "text"), "doc_id", "text")

      def postingSet(ix: Bm25.Bm25Index) =
        ix.postings.collect().map(r =>
          (r.getLong(r.fieldIndex("id")), r.getInt(r.fieldIndex("dl")), r.getString(r.fieldIndex("term")), r.getLong(r.fieldIndex("tf")))
        ).toSet
      def corpusRow(ix: Bm25.Bm25Index) = {
        val r = ix.corpus.collect()(0)
        (r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("sum_dl")), r.getDouble(r.fieldIndex("avgdl")))
      }
      assert(postingSet(maintained) == postingSet(rebuilt), s"churn #$ci: postings differ")
      assert(corpusRow(maintained) == corpusRow(rebuilt), s"churn #$ci: corpus stats differ")
    }
  }
}
