package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** BPE merge learning: the distributed vocab-table implementation must
  * equal a straightforward in-memory reference BPE exactly — merge
  * sequence, pair counts, and final word segmentations (the
  * text_rolling_hash kernel-equality pattern: the contract FOR a
  * rows-only key).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: textbook greedy BPE over (word, freq),
    * left-to-right merge application, count-desc-then-lexicographic
    * tie rule.
    */
  private def referenceBpe(words: Map[String, Long], rounds: Int): (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var vocab: Map[Seq[String], Long] = words.map { case (w, f) => (w.map(_.toString): Seq[String]) -> f }
    var segs: Map[String, Seq[String]] = words.keys.map(w => w -> (w.map(_.toString): Seq[String])).toMap
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((l, rr), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((r, l, rr, cnt))
        def app(syms: Seq[String]): Seq[String] =
          syms.foldLeft(Seq.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == l && s == rr) acc.init :+ (l + rr)
            else acc :+ s
          }
        vocab = vocab.groupMapReduce { case (syms, _) => app(syms) } { case (_, f) => f }(_ + _)
        segs = segs.map { case (w, s) => w -> app(s) }
      }
    }
    (merges.toSeq, segs)
  }

  test("distributed merge sequence and segmentations equal the reference BPE on the real corpus") {
    val docs = Tables.documents(spark, Sf)
    val model = Bpe.train(docs, "text", 8)
    val wordFreq = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toMap
    val (refMerges, refSegs) = referenceBpe(wordFreq, 8)
    val gotMerges = model.merges.orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(gotMerges == refMerges, s"merge sequences differ:\n got $gotMerges\n ref $refMerges")
    assert(gotMerges.size == 8, "corpus must support 8 rounds (else the test is vacuous)")
    val gotSegs = model.vocab.select("word", "tokens").as[(String, Seq[String])].collect().toMap
    assert(gotSegs == refSegs, {
      val bad = gotSegs.collect { case (w, s) if refSegs.get(w).exists(_ != s) => (w, s, refSegs(w)) }.take(5)
      s"segmentations differ, e.g. $bad"
    })
    // segmentations reassemble their words, and merged tokens appear
    assert(gotSegs.forall { case (w, s) => s.mkString == w })
    assert(gotSegs.values.exists(_.exists(_.length > 1)), "no merge ever applied — vacuous corpus")
  }

  test("economics equals the hand fold over reference segmentations; exhaustion stops early") {
    val docs = Tables.documents(spark, Sf)
    val model = Bpe.train(docs, "text", 8)
    val eco = Bpe
      .economics(docs, "source", "text", model)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val segs = model.vocab.select("word", "tokens").as[(String, Seq[String])].collect().toMap
    val expected = docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .as[(String, String)].collect()
      .groupBy(_._1)
      .map { case (src, rows) =>
        val bytes = rows.map(_._2.length.toLong).sum
        val toks = rows.map(r => segs(r._2).size.toLong).sum
        src -> ((bytes, toks, bytes.toDouble / toks))
      }
    assert(eco == expected)
    // a corpus whose words collapse to single tokens stops early rather
    // than looping on nothing
    val tiny = Seq((1L, "ab ab ab"), (2L, "cd")).toDF("doc_id", "text")
    val m = Bpe.train(tiny, "text", 10)
    val got = m.merges.orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 3L), (2, "c", "d", 1L)), got.toString)
    assert(m.vocab.select("tokens").as[Seq[String]].collect().forall(_.size == 1))
  }
}
