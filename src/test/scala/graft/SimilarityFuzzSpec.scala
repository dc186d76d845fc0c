package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Generative differential drill for the ANN family — the largest
  * component not yet under a fuzz harness. Every contract here is
  * checked against an INDEPENDENT evaluator of the documented
  * semantics (a plain Scala fold over the collected corpus), never
  * against the implementation:
  *
  *  - brute-force top-k / range search: exact list equality with a
  *    reference cosine fold (same strict left-to-right accumulation
  *    order the codegen expression documents, 6-dp HALF_UP rounding,
  *    (cos desc, id asc) ordering);
  *  - IVF with nProbe = nLists: probing every cell makes the index
  *    path EXACTLY the brute-force path — list equality, any centroid
  *    placement (the partition-pruning machinery cancels out);
  *  - knnJoin: per-probe reference top-k, rank for rank (drills the
  *    TopKPerKey bounded-heap exec under the cross-join shape);
  *  - LSH: planted exact duplicates of the query are GUARANTEED
  *    candidates (identical vector ⇒ identical signature in every
  *    table), every emitted score equals the reference cosine for
  *    that id (stale-score check), emitted ranking is internally
  *    sorted, and the batch path (knnJoinLsh) emits exactly the
  *    per-probe path's rows at the same radius;
  *  - mmrRerank: the documented greedy objective
  *    `λ·rel − (1−λ)·max_sel cos` with (objective, rel, −id) tie
  *    order, re-evaluated independently; λ=1 degenerates to the
  *    brute-force ranking.
  */
class SimilarityFuzzSpec extends SparkSpec {

  private val Id = "vec_id"
  private val Vec = "embedding"

  // --- reference kernels (independent of the engine) ---

  /** Strict left-to-right fold, floats widened per element — the
    * documented accumulation order of the codegen expression.
    */
  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference top-k: (cos desc, id asc) over 6-dp rounded cosines. */
  private def refTopK(corpus: Seq[(Long, Array[Float])], q: Array[Float], k: Int): Seq[(Long, Double)] =
    corpus
      .map { case (id, v) => (id, r6(cosRef(v, q))) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k)

  private def mkCorpus(rnd: scala.util.Random, n: Int, dim: Int): Array[(Long, Array[Float])] = {
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    Array.tabulate(n) { i =>
      val c = centers(rnd.nextInt(centers.length))
      (i.toLong, Array.tabulate(dim)(j => c(j) + (rnd.nextFloat() - 0.5f) * 0.6f))
    }
  }

  private def toDf(corpus: Seq[(Long, Array[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    corpus.toSeq.toDF(Id, Vec).select(col(Id), col(Vec).cast("array<float>").as(Vec))
  }

  private def collectScored(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(r.fieldIndex(Id)), r.getDouble(r.fieldIndex("cos")))).toSeq

  test("brute-force top-k and range search == reference fold, 8 random corpora") {
    val rnd = new scala.util.Random(0xa11f1L)
    (1 to 8).foreach { ci =>
      val dim = if (rnd.nextBoolean()) 8 else 16
      val corpus = mkCorpus(rnd, 60 + rnd.nextInt(120), dim)
      val df = toDf(corpus.toSeq).repartition(1 + rnd.nextInt(4))
      (1 to 3).foreach { qi =>
        val q = corpus(rnd.nextInt(corpus.length))._2.map(v => v + (rnd.nextFloat() - 0.5f) * 0.2f)
        val k = 1 + rnd.nextInt(12)
        val got = collectScored(Similarity.bruteForceTopK(df, Id, Vec, q.toSeq, k))
        val want = refTopK(corpus.toSeq, q, k)
        assert(got == want, s"corpus $ci query $qi brute-force mismatch")

        val minCos = 0.5 + rnd.nextDouble() * 0.4
        val gotR = collectScored(Similarity.rangeSearch(df, Id, Vec, q.toSeq, minCos))
        val wantR = corpus.toSeq
          .map { case (id, v) => (id, r6(cosRef(v, q))) }
          .filter(_._2 >= minCos)
          .sortBy { case (id, c) => (-c, id) }
        assert(gotR == wantR, s"corpus $ci query $qi range-search mismatch at minCos=$minCos")
      }
    }
  }

  test("IVF with nProbe = nLists degenerates to brute force exactly, any centroid placement") {
    val rnd = new scala.util.Random(0x1cf00dL)
    (1 to 6).foreach { ci =>
      val corpus = mkCorpus(rnd, 80 + rnd.nextInt(100), 8)
      val df = toDf(corpus.toSeq).repartition(1 + rnd.nextInt(4))
      val nLists = 2 + rnd.nextInt(7)
      val q = corpus(rnd.nextInt(corpus.length))._2.map(v => v + (rnd.nextFloat() - 0.5f) * 0.3f)
      val k = 1 + rnd.nextInt(10)
      val got = collectScored(Similarity.ivfTopK(df, Id, Vec, q.toSeq, k, nLists = nLists, nProbe = nLists))
      val want = refTopK(corpus.toSeq, q, k)
      assert(got == want, s"corpus $ci: full-probe IVF (nLists=$nLists) != brute force")
    }
  }

  test("knnJoin == per-probe reference top-k, rank for rank") {
    val rnd = new scala.util.Random(0x7b07e5L)
    (1 to 5).foreach { ci =>
      val corpus = mkCorpus(rnd, 60 + rnd.nextInt(80), 8)
      val probes = Array.tabulate(4)(i => (1000L + i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
      val k = 1 + rnd.nextInt(6)
      val got = Similarity
        .knnJoin(toDf(probes.toSeq), toDf(corpus.toSeq).repartition(1 + rnd.nextInt(4)), Id, Vec, k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val want = probes.flatMap { case (pid, pv) =>
        refTopK(corpus.toSeq, pv, k).zipWithIndex.map { case ((cid, c), i) => (pid, cid, c, i + 1) }
      }.toSet
      assert(got == want, s"corpus $ci knnJoin mismatch")
    }
  }

  test("LSH: planted duplicates guaranteed, emitted scores exact, batch path == per-probe path") {
    val rnd = new scala.util.Random(0x15a5e3L)
    (1 to 5).foreach { ci =>
      val base = mkCorpus(rnd, 60 + rnd.nextInt(80), 8)
      val q = Array.fill(8)(rnd.nextFloat() * 2f - 1f)
      // Plant an exact duplicate of the query inside the corpus.
      val dupId = base.length.toLong
      val corpus = base :+ ((dupId, q.clone()))
      val df = toDf(corpus.toSeq).repartition(1 + rnd.nextInt(4))
      val nBits = 4 + rnd.nextInt(5)
      val tables = 2 + rnd.nextInt(4)
      val idx = Similarity.lshIndex(df, Id, Vec, nBits, tables)
      val k = 3 + rnd.nextInt(8)

      val refCos = corpus.map { case (id, v) => id -> r6(cosRef(v, q)) }.toMap
      val got = collectScored(Similarity.scoreAgainstLsh(idx, Id, Vec, q.toSeq, k))
      assert(got.map(_._1).contains(dupId), s"corpus $ci: planted duplicate missed by LSH")
      assert(refCos(dupId) == 1.0)
      got.foreach { case (id, c) => assert(c == refCos(id), s"corpus $ci: stale LSH score for $id") }
      assert(got == got.sortBy { case (id, c) => (-c, id) }, s"corpus $ci: LSH result not sorted")
      assert(got.size <= k && got.map(_._1).distinct.size == got.size)

      // Batch path: one probe frame through knnJoinLsh == per-probe calls.
      val probes = Array.tabulate(3)(i => (2000L + i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
      val radius = rnd.nextInt(2)
      val batch = Similarity
        .knnJoinLsh(idx, toDf(probes.toSeq), Id, Vec, k, probeRadius = radius)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val single = probes.flatMap { case (pid, pv) =>
        Similarity
          .scoreAgainstLsh(idx, Id, Vec, pv.toSeq, k, probeRadius = radius)
          .collect()
          .zipWithIndex
          .map { case (r, i) => (pid, r.getLong(0), r.getDouble(1), i + 1) }
      }.toSet
      assert(batch == single, s"corpus $ci: knnJoinLsh != per-probe scoreAgainstLsh at radius $radius")
    }
  }

  test("mmrRerank == independent greedy fold; lambda=1 degenerates to brute-force ranking") {
    val rnd = new scala.util.Random(0x33a77L)
    (1 to 6).foreach { ci =>
      val corpus = mkCorpus(rnd, 50 + rnd.nextInt(60), 8)
      val df = toDf(corpus.toSeq).repartition(1 + rnd.nextInt(4))
      val q = Array.fill(8)(rnd.nextFloat() * 2f - 1f)
      val k = 2 + rnd.nextInt(5)
      val window = k + rnd.nextInt(20)
      val lambda = rnd.nextInt(4) match {
        case 0 => 1.0
        case 1 => 0.0
        case _ => math.rint(rnd.nextDouble() * 100) / 100
      }

      // Independent evaluation of the documented contract.
      val cand = corpus
        .map { case (id, v) => (id, r6(cosRef(v, q)), v.map(_.toDouble)) }
        .sortBy { case (id, rel, _) => (-rel, id) }
        .take(window)
      def pcos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length && i < b.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
      }
      val maxSim = Array.fill(cand.length)(Double.NegativeInfinity)
      val remaining = scala.collection.mutable.ArrayBuffer(cand.indices: _*)
      val want = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Double)]()
      while (want.size < k && remaining.nonEmpty) {
        val first = want.isEmpty
        val pick = remaining.maxBy { i =>
          val (id, rel, _) = cand(i)
          val pen = if (first) 0.0 else maxSim(i)
          (lambda * rel - (1 - lambda) * pen, rel, -id.toDouble)
        }
        val (id, rel, vec) = cand(pick)
        val mmr = if (first) lambda * rel else lambda * rel - (1 - lambda) * maxSim(pick)
        want += ((want.size + 1, id, rel, r6(mmr)))
        remaining -= pick
        remaining.foreach { i =>
          val s = pcos(cand(i)._3, vec)
          if (s > maxSim(i)) maxSim(i) = s
        }
      }

      val got = Similarity
        .mmrRerank(df, Id, Vec, q.toSeq, k, window, lambda)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
      assert(got == want.toSeq, s"corpus $ci: mmr mismatch at lambda=$lambda window=$window k=$k")

      if (lambda == 1.0) {
        val bf = refTopK(corpus.toSeq, q, k).map(_._1)
        assert(got.map(_._2) == bf, s"corpus $ci: lambda=1 mmr != brute-force order")
      }
    }
  }
}
