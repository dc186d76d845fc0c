package graft

import graft.operators.{Dedup, MinHashLSH, SimHash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Generative differential drill for the dedup family. The corpus
  * generator plants near-duplicates (token-level edits of base docs)
  * and exact duplicates, so both the "must find" and "must not
  * invent" directions are exercised:
  *
  *  - ngramJaccardPairs (exact PPJoin+): pair set AND jaccard values
  *    equal a brute-force all-pairs fold over Scala-computed distinct
  *    n-gram sets — with BOTH suffix-filter paths (the prefix /
  *    positional / suffix prunes must be lossless by construction);
  *  - containmentPairs: equal to a reference fold of the documented
  *    rare-gram containment (df-capped grams, shared/|rare| both
  *    directions, max >= threshold);
  *  - MinHash-LSH nearDupPairs: precision 1.0 with exact verified
  *    jaccard values (every emitted pair exists in the brute-force
  *    set at the same rounded jaccard), and planted EXACT duplicates
  *    are always emitted (identical text ⇒ identical signatures ⇒
  *    band collision);
  *  - MinHash incremental: full(A) ∪ incremental(index(A), B) ≡
  *    full(A ∪ B) pair-for-pair on random corpus splits — the
  *    append-mostly maintenance contract, generatively;
  *  - SimHash nearDupPairs: equal to all pairs at hamming ≤ max over
  *    the engine's own simhash values (the pigeonhole blocking is
  *    exact for maxHamming < blocks — this drills the distributed
  *    banding machinery, the risky part, without reimplementing the
  *    hash).
  */
class DedupFuzzSpec extends SparkSpec {

  private val vocab = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey", "xray"
  )

  /** Random corpus with planted near-dup and exact-dup structure.
    * Returns (id, text) rows plus the set of exact-duplicate pairs.
    */
  private def mkCorpus(rnd: scala.util.Random, nBase: Int): (Seq[(Long, String)], Set[(Long, Long)]) = {
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val exactPairs = scala.collection.mutable.Set[(Long, Long)]()
    var id = 0L
    (1 to nBase).foreach { _ =>
      val len = 6 + rnd.nextInt(30)
      val toks = Vector.fill(len)(vocab(rnd.nextInt(vocab.size)))
      val baseId = id
      docs += ((id, toks.mkString(" "))); id += 1
      // near-dup: a few token substitutions
      if (rnd.nextInt(3) == 0) {
        val t2 = toks.toArray
        (1 to 1 + rnd.nextInt(3)).foreach(_ => t2(rnd.nextInt(t2.length)) = vocab(rnd.nextInt(vocab.size)))
        docs += ((id, t2.mkString(" "))); id += 1
      }
      // exact dup
      if (rnd.nextInt(5) == 0) {
        docs += ((id, toks.mkString(" ")))
        exactPairs += ((baseId, id)); id += 1
      }
    }
    (docs.toSeq, exactPairs.toSet)
  }

  private def toDf(docs: Seq[(Long, String)], rnd: scala.util.Random): DataFrame = {
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text").repartition(1 + rnd.nextInt(4))
  }

  private def ngrams(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.split(" ", -1)
    if (toks.length < n) Set.empty
    else toks.iterator.sliding(n).map(_.mkString(" ")).toSet
  }

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def jac(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0 else (a & b).size.toDouble / (a | b).size.toDouble

  test("ngramJaccardPairs == brute-force all-pairs fold, both suffix-filter paths") {
    val rnd = new scala.util.Random(0xdedfacL)
    (1 to 5).foreach { ci =>
      val (docs, _) = mkCorpus(rnd, 25 + rnd.nextInt(25))
      val df = toDf(docs, rnd)
      val n = 2 + rnd.nextInt(2) // 2- or 3-grams
      val threshold = Seq(0.3, 0.4, 0.5, 0.6)(rnd.nextInt(4))
      val grams = docs.map { case (id, t) => id -> ngrams(t, n) }.filter(_._2.nonEmpty)
      val want = (for {
        (a, sa) <- grams
        (b, sb) <- grams
        if a < b
        j = r4(jac(sa, sb))
        if j >= threshold
      } yield (a, b, j)).toSet
      Seq(true, false).foreach { sf =>
        val got = Dedup
          .ngramJaccardPairs(df, "doc_id", "text", n = n, threshold = threshold, suffixFilter = sf)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSet
        assert(got == want, s"corpus $ci n=$n t=$threshold suffixFilter=$sf: PPJoin != brute force")
      }
    }
  }

  test("containmentPairs == reference rare-gram containment fold") {
    val rnd = new scala.util.Random(0xc07a11L)
    (1 to 5).foreach { ci =>
      val (docs, _) = mkCorpus(rnd, 25 + rnd.nextInt(25))
      val df = toDf(docs, rnd)
      val n = 2 + rnd.nextInt(2)
      val dfCap = 3 + rnd.nextInt(20)
      val threshold = Seq(0.3, 0.5, 0.7)(rnd.nextInt(3))
      val grams = docs.map { case (id, t) => id -> ngrams(t, n) }
      val gramDf = grams.flatMap { case (_, gs) => gs }.groupBy(identity).map { case (g, xs) => g -> xs.size }
      val rare = grams.map { case (id, gs) => id -> gs.filter(g => gramDf(g) <= dfCap) }.filter(_._2.nonEmpty).toMap
      val want = (for {
        (a, ra) <- rare
        (b, rb) <- rare
        if a < b
        shared = (ra & rb).size
        if shared > 0
        cab = r4(shared.toDouble / ra.size)
        cba = r4(shared.toDouble / rb.size)
        if math.max(cab, cba) >= threshold
      } yield (a, b, cab, cba)).toSet
      val got = Dedup
        .containmentPairs(df, "doc_id", "text", n = n, dfCap = dfCap, threshold = threshold)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      assert(got == want, s"corpus $ci n=$n dfCap=$dfCap t=$threshold: containment != reference")
    }
  }

  test("MinHash-LSH: precision 1.0 with exact jaccards; planted exact dups always emitted") {
    val rnd = new scala.util.Random(0x3a5b1dL)
    (1 to 4).foreach { ci =>
      val (docs, exactPairs) = mkCorpus(rnd, 30 + rnd.nextInt(20))
      val df = toDf(docs, rnd)
      val threshold = Seq(0.5, 0.6, 0.7)(rnd.nextInt(3))
      val grams = docs.map { case (id, t) => id -> ngrams(t, 3) }.toMap
      val truth = (for {
        (a, sa) <- grams
        (b, sb) <- grams
        if a < b && sa.nonEmpty
        j = r4(jac(sa, sb))
        if j >= threshold
      } yield (a, b) -> j).toMap
      val got = MinHashLSH
        .nearDupPairs(df, "doc_id", "text", threshold = threshold)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      got.foreach { case (a, b, j) =>
        assert(truth.get((a, b)).contains(j), s"corpus $ci: false positive or wrong jaccard ($a,$b,$j)")
      }
      // Exact duplicates of docs with >= 3 tokens are guaranteed candidates.
      exactPairs.filter { case (a, _) => grams(a).nonEmpty }.foreach { p =>
        assert(got.exists(g => (g._1, g._2) == p), s"corpus $ci: planted exact dup $p missed")
      }
    }
  }

  test("MinHash incremental: full(A) + incremental(index(A), B) == full(A u B), random splits") {
    val rnd = new scala.util.Random(0x1ac3e0L)
    (1 to 3).foreach { ci =>
      val (docs, _) = mkCorpus(rnd, 25 + rnd.nextInt(15))
      val threshold = 0.5
      val (a, b) = docs.partition(_ => rnd.nextInt(100) < 70)
      if (a.nonEmpty && b.nonEmpty) {
        def pairs(d: DataFrame): Set[(Long, Long, Double)] =
          MinHashLSH
            .nearDupPairs(d, "doc_id", "text", threshold = threshold)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            .toSet
        val idx = MinHashLSH.index(toDf(a, rnd), "doc_id", "text")
        val inc = MinHashLSH
          .incrementalPairs(idx, toDf(b, rnd), "doc_id", "text", threshold = threshold)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSet
        assert(
          pairs(toDf(a, rnd)) ++ inc == pairs(toDf(docs, rnd)),
          s"corpus $ci: incremental maintenance != full recompute"
        )
      }
    }
  }

  test("SimHash blocking exact: pairs == all pairs at hamming <= max over engine hashes") {
    val rnd = new scala.util.Random(0x51a5b7L)
    (1 to 4).foreach { ci =>
      val (docs, _) = mkCorpus(rnd, 30 + rnd.nextInt(20))
      val df = toDf(docs, rnd)
      val blocks = 4 + rnd.nextInt(2) * 4 // 4 or 8
      val maxHamming = 1 + rnd.nextInt(blocks - 1) // < blocks (pigeonhole)
      val hashes = SimHash
        .simhash64(df, "doc_id", "text")
        .collect()
        .map(r => (r.getLong(r.fieldIndex("id")), r.getLong(r.fieldIndex("simhash"))))
      val want = (for {
        (a, ha) <- hashes
        (b, hb) <- hashes
        if a < b
        h = java.lang.Long.bitCount(ha ^ hb)
        if h <= maxHamming
      } yield (a, b, h.toLong)).toSet
      val got = SimHash
        .nearDupPairs(df, "doc_id", "text", maxHamming = maxHamming, blocks = blocks)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString.toLong))
        .toSet
      assert(got == want, s"corpus $ci blocks=$blocks maxH=$maxHamming: simhash blocking mismatch")
    }
  }
}
