package graft

import graft.cdc.CdcBatch
import graft.functions.TextFns
import graft.operators.{Dedup, Skew}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized invariants with fixed seeds: operator results must equal a
  * naive driver-side computation on arbitrary inputs, not just on the
  * hand-picked fixtures.
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("latestState equals the naive per-key argmax for random changelogs") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val rows = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toString))
      // unique seq per key to make the argmax well-defined
      val uniq = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val df = uniq.toDF("key", "seq", "payload")
      val got = CdcBatch
        .latestState(df, "key", struct(col("seq")), col("seq"), col("payload"))
        .as[(Long, Long, String)]
        .collect()
        .map(r => r._1 -> ((r._2, r._3)))
        .toMap
      val want = uniq.groupBy(_._1).map { case (k, rs) => k -> { val m = rs.maxBy(_._2); (m._2, m._3) } }
      assert(got == want, s"seed=$seed")
    }
  }

  test("fingerprint is invariant under token permutation and duplication") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val toks = Seq.fill(30)(('a' + rnd.nextInt(5)).toChar.toString * (1 + rnd.nextInt(3)))
      val t1 = toks.mkString(" ")
      val t2 = rnd.shuffle(toks ++ toks.take(rnd.nextInt(10))).mkString(" ")
      val fps = Seq((1L, t1), (2L, t2))
        .toDF("id", "text")
        .select(TextFns.fingerprint(col("text")))
        .as[String]
        .collect()
      assert(fps(0) == fps(1), s"seed=$seed")
    }
  }

  test("jaccardUdf equals the set formula for random token sets") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val a = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(15).toString)
      val b = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(15).toString)
      val got = Seq((a, b)).toDF("a", "b").select(Dedup.jaccardUdf(col("a"), col("b"))).as[Double].head()
      val want = {
        val (sa, sb) = (a.toSet, b.toSet)
        sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
      assert(math.abs(got - want) < 1e-12, s"seed=$seed")
    }
  }

  test("saltedJoin equals plain join for random data") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val fact = Seq.fill(100)((rnd.nextInt(5).toLong, rnd.nextInt(1000))).toDF("k", "v")
      val dim = (0L to 6L).map(k => (k, s"d$k")).toDF("k", "w")
      val salted = Skew.saltedJoin(fact, dim, "k", factor = 3).select("k", "v", "w").collect().map(_.toString).sorted
      val plain = fact.join(dim, "k").select("k", "v", "w").collect().map(_.toString).sorted
      assert(salted.toSeq == plain.toSeq, s"seed=$seed")
    }
  }

  test("minhash signature similarity tracks exact Jaccard") {
    val rnd = new Random(7)
    val vocabA = (1 to 60).map(i => s"tok$i")
    val docA = vocabA.mkString(" ")
    val docB = (vocabA.take(50) ++ (1 to 10).map(i => s"new$i")).mkString(" ") // high overlap
    val docC = (1 to 60).map(i => s"other$i").mkString(" ")
    val sigs = operators.MinHashLSH
      .signatures(Seq((1L, docA), (2L, docB), (3L, docC)).toDF("id", "text"), "id", "text", 1, 128)
      .orderBy("id")
      .collect()
      .map(_.getSeq[Int](1))
    def sim(x: Seq[Int], y: Seq[Int]) = x.zip(y).count(p => p._1 == p._2).toDouble / x.length
    assert(sim(sigs(0), sigs(1)) > 0.5, s"similar docs est ${sim(sigs(0), sigs(1))}")
    assert(sim(sigs(0), sigs(2)) < 0.2, s"dissimilar docs est ${sim(sigs(0), sigs(2))}")
    assert(rnd != null)
  }
}
