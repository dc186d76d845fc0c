package graft

import graft.functions.VectorFns
import graft.operators.{Dedup, MinHashLSH, SimHash, Similarity}
import org.apache.spark.sql.functions._

/** Brute-force replica verification for the approximate operators that have
  * no SQL oracle (the driver records them rows-only): precision by
  * re-verification against raw inputs, recall against the all-pairs ground
  * truth at test scale. Everything is deterministic — fixed corpus, fixed
  * murmur3 seeds — so these are exact, reproducible bounds, not flaky
  * statistical ones.
  */
class ReplicaSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, Sf)
  private def emb = Tables.embeddings(spark, Sf)

  test("SimHash banding equals the all-pairs Hamming ground truth (pigeonhole exactness)") {
    // maxHamming < blocks means a qualifying pair MUST agree on some band,
    // so the banded operator is exact: assert set equality, not a bound.
    val maxH = 3
    val got = SimHash
      .nearDupPairs(docs, "doc_id", "text", maxHamming = maxH)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val sigs = SimHash.simhash64(docs, "doc_id", "text")
    val l = sigs.select($"id".as("a"), $"simhash".as("ha"))
    val r = sigs.select($"id".as("b"), $"simhash".as("hb"))
    val want = l
      .crossJoin(r)
      .filter($"a" < $"b" && bit_count($"ha".bitwiseXOR($"hb")) <= maxH)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(want.nonEmpty, "vacuous ground truth — no near-dup pairs in the corpus")
    assert(got == want)
  }

  test("MinHash-LSH near-dups: precision 1.0, recall vs all-pairs Jaccard") {
    val t = 0.5
    val got = MinHashLSH
      .nearDupPairs(docs, "doc_id", "text", threshold = t)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    // Ground truth: all-pairs exact Jaccard over the same distinct
    // 3-shingle sets, with the operator's own rounding at the threshold.
    val sh = MinHashLSH.shingles(docs, "doc_id", "text", 3)
    val l = sh.select($"id".as("a"), $"shingles".as("sa"))
    val r = sh.select($"id".as("b"), $"shingles".as("sb"))
    val truth = l
      .crossJoin(r)
      .filter($"a" < $"b")
      .filter(round(Dedup.jaccardUdf($"sa", $"sb"), 4) >= t)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(truth.nonEmpty, "vacuous ground truth")
    // Precision = 1.0 by construction: the verify stage recomputes exact
    // Jaccard on every candidate, so nothing below t can be emitted.
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth)}")
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall=$recall truth=${truth.size} got=${got.size}")
  }

  test("embedding near-dups: precision 1.0, recall vs all-pairs cosine") {
    val t = 0.35
    val got = Similarity
      .embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = t, nBits = 6, tables = 32)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val l = emb.select($"vec_id".as("a"), $"embedding".as("va"))
    val r = emb.select($"vec_id".as("b"), $"embedding".as("vb"))
    val truth = l
      .crossJoin(r)
      .filter($"a" < $"b")
      .filter(round(VectorFns.cosine($"va", $"vb"), 6) >= t)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(truth.nonEmpty, "vacuous ground truth")
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth)}")
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall=$recall truth=${truth.size} got=${got.size}")
  }

  test("semantic (cluster-blocked) near-dups: precision 1.0, recall vs all-pairs cosine") {
    val t = 0.35
    val got = Similarity
      .semanticNearDupPairs(emb, "vec_id", "embedding", threshold = t)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val l = emb.select($"vec_id".as("a"), $"embedding".as("va"))
    val r = emb.select($"vec_id".as("b"), $"embedding".as("vb"))
    val truth = l
      .crossJoin(r)
      .filter($"a" < $"b")
      .filter(round(VectorFns.cosine($"va", $"vb"), 6) >= t)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(truth.nonEmpty, "vacuous ground truth")
    // Precision 1.0 by construction: every pair re-verified on raw vectors.
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth)}")
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(s"SemDeDup recall at t=$t (16 k-means cells, 2-assignment): $recall (truth ${truth.size}, got ${got.size})")
    // Recall loss is exactly the boundary pairs both of whose runner-up
    // cells still miss; 2-assignment measured 0.62 vs 0.29 single here.
    // LSH table OR-ing (dedup_embedding, 32 tables) is the high-recall
    // path; this is the cheaper cluster-pass SemDeDup trade.
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("approx cardinality tracks exact distinct counts within HLL++ error bounds") {
    import graft.search.Aggs
    val li = Tables.lineitem(spark, Sf)
    val fields = Seq("n_parts" -> col("l_partkey"), "n_supps" -> col("l_suppkey"), "n_orders" -> col("l_orderkey"))
    val exact = Aggs.cardinality(li, fields).head()
    val approx = Aggs.approxCardinality(li, fields).head()
    fields.indices.foreach { i =>
      val (e, a) = (exact.getLong(i).toDouble, approx.getLong(i).toDouble)
      // default rsd 0.05 -> 3-sigma bound 15%; deterministic given fixed data
      assert(math.abs(a - e) / e <= 0.15, s"${fields(i)._1}: exact=$e approx=$a")
    }
  }

  test("approx percentiles land within the sketch's rank-error bound of exact") {
    import graft.search.Aggs
    val li = Tables.lineitem(spark, Sf)
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val approx = Aggs.approxPercentiles(li, col("l_extendedprice"), ps).head()
    // approx_percentile(accuracy=10000) guarantees rank error <= N/10000
    // (0.01% of rows). Verify each sketch value sits between the exact
    // interpolated percentiles at p ± 0.005 — 50x the theoretical rank
    // slack, still a tight band — making this a deterministic bound, not
    // a tolerance guess.
    ps.zipWithIndex.foreach { case ((name, p), i) =>
      val lo = math.max(0.0, p - 0.005)
      val hi = math.min(1.0, p + 0.005)
      val bounds = li
        .agg(
          percentile(col("l_extendedprice"), lit(lo)).as("lo"),
          percentile(col("l_extendedprice"), lit(hi)).as("hi")
        )
        .head()
      val v = approx.getDouble(i)
      // the sketch returns an actual element; exact interpolates — allow
      // the 2dp rounding the library applies on top
      assert(
        v >= bounds.getDouble(0) - 0.01 && v <= bounds.getDouble(1) + 0.01,
        s"$name: approx=$v outside exact band [${bounds.getDouble(0)}, ${bounds.getDouble(1)}]"
      )
    }
  }

  test("approx boxplot: exact extrema, quartiles inside the rank-error band") {
    import graft.search.Aggs
    val li = Tables.lineitem(spark, Sf)
    val exact = Aggs.boxplot(li, col("l_extendedprice")).head()
    val approx = Aggs.approxBoxplot(li, col("l_extendedprice")).head()
    // min/max are real selections in both twins — bitwise equal.
    assert(approx.getDouble(0) == exact.getDouble(0), "min_v differs")
    assert(approx.getDouble(4) == exact.getDouble(4), "max_v differs")
    Seq(0.25 -> 1, 0.5 -> 2, 0.75 -> 3).foreach { case (p, i) =>
      val b = li
        .agg(
          percentile(col("l_extendedprice"), lit(p - 0.005)).as("lo"),
          percentile(col("l_extendedprice"), lit(p + 0.005)).as("hi")
        )
        .head()
      val v = approx.getDouble(i)
      assert(
        v >= b.getDouble(0) - 0.01 && v <= b.getDouble(1) + 0.01,
        s"q@$p: approx=$v outside exact band [${b.getDouble(0)}, ${b.getDouble(1)}]"
      )
    }
  }

  test("approx MAD: sketch median of |x - sketch-median| inside the staged rank band") {
    import graft.search.Aggs
    val od = Tables.orders(spark, Sf)
    val got = Aggs.approxMedianAbsoluteDeviation(od, col("o_totalprice")).head().getDouble(0)
    // Stage the contract: given the approx inner median the twin ACTUALLY
    // used (deterministic — same sketch), the outer sketch value must sit
    // in the exact 0.5±0.005 band of |x − m̃|. This is the rank-error
    // guarantee applied to the composition, not a tolerance guess.
    val mTilde =
      od.agg(approx_percentile(col("o_totalprice"), lit(0.5), lit(10000))).head().getDouble(0)
    val b = od
      .select(abs(col("o_totalprice") - lit(mTilde)).as("_d"))
      .agg(percentile(col("_d"), lit(0.495)).as("lo"), percentile(col("_d"), lit(0.505)).as("hi"))
      .head()
    assert(
      got >= b.getDouble(0) - 1e-6 && got <= b.getDouble(1) + 1e-6,
      s"approx MAD=$got outside band [${b.getDouble(0)}, ${b.getDouble(1)}]"
    )
  }

  test("approx moving percentiles: within one rank of the target order statistic per window") {
    // Windows hold <= 6 rows (<< sketch accuracy), so the sketch is an
    // exact nearest-rank selection while the exact twin interpolates.
    // Contract, verified per window on the tiny (~80-row) bucket table:
    // the approx value IS one of the window's values, at a rank within
    // one of the target rank ceil(p·n) — the sketch's guarantee with
    // zero rank error plus its rank-rounding convention.
    val approx = SparkEntry.queries("search_moving_percentiles_approx")(spark, Sf)
      .select("bucket", "p50_6m", "p90_6m")
      .collect()
      .map(r => (r.get(0).toString, r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val revenues = Tables
      .orders(spark, Sf)
      .groupBy(date_trunc("month", col("o_orderdate")).as("bucket"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("bucket")
      .collect()
      .map(r => (r.get(0).toString, r.getDouble(1)))
    assert(approx.map(_._1).toSeq == revenues.map(_._1).toSeq, "bucket spines differ")
    for (i <- revenues.indices) {
      val win = revenues.slice(math.max(0, i - 5), i + 1).map(_._2).sorted
      val n = win.length
      def okAt(p: Double, v: Double): Boolean = {
        val target = math.ceil(p * n).toInt.max(1)
        (target - 1 to target + 1).exists(r => r >= 1 && r <= n && math.abs(win(r - 1) - v) <= 0.01)
      }
      assert(okAt(0.5, approx(i)._2), s"bucket ${revenues(i)._1}: p50 ${approx(i)._2} not a ±1-rank stat of $win")
      assert(okAt(0.9, approx(i)._3), s"bucket ${revenues(i)._1}: p90 ${approx(i)._3} not a ±1-rank stat of $win")
    }
  }

  test("approx variable-width histogram: sketch seeds in-band, partition invariants hold") {
    import graft.search.Aggs
    val od = Tables.orders(spark, Sf)
    val n = od.count()
    val out = Aggs.approxVariableWidthHistogram(od, col("o_totalprice"), 8).collect()
    // Partition invariants: every row lands in exactly one of the 8
    // buckets; centroids sit inside their bucket's [min, max].
    assert(out.map(_.getAs[Long]("doc_count")).sum == n, "doc_counts do not partition the table")
    assert(out.length == 8, s"expected 8 buckets, got ${out.length}")
    out.foreach { r =>
      val (lo, hi, c) = (r.getAs[Double]("min_v"), r.getAs[Double]("max_v"), r.getAs[Double]("centroid"))
      assert(c >= lo - 0.01 && c <= hi + 0.01, s"centroid $c outside [$lo, $hi]")
    }
    // Seed quality: each sketch seed inside the exact band p ± 0.005.
    val ps = (0 until 8).map(i => (2 * i + 1).toDouble / 16)
    val seeds =
      od.agg(approx_percentile(col("o_totalprice"), lit(ps.toArray), lit(10000))).head().getSeq[Double](0)
    ps.zip(seeds).foreach { case (p, s) =>
      val b = od
        .agg(
          percentile(col("o_totalprice"), lit(math.max(0, p - 0.005))).as("lo"),
          percentile(col("o_totalprice"), lit(math.min(1, p + 0.005))).as("hi")
        )
        .head()
      assert(
        s >= b.getDouble(0) - 1e-6 && s <= b.getDouble(1) + 1e-6,
        s"seed@$p=$s outside [${b.getDouble(0)}, ${b.getDouble(1)}]"
      )
    }
  }

  test("k-means refinement never increases IVF inertia and keeps the recall bound") {
    val base = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 16)
    val refined = Similarity.ivfRefine(emb, "vec_id", "embedding", base, iters = 3)
    def inertia(idx: Similarity.IvfIndex): Double = {
      val cents = idx.centroids
      val sq = udf { (v: Seq[Float], cell: Int) =>
        val c = cents(cell)
        var d = 0.0
        var j = 0
        val n = math.min(c.length, v.length)
        while (j < n) { val t = v(j).toDouble - c(j).toDouble; d += t * t; j += 1 }
        d
      }
      idx.assigned.filter($"cell" >= 0).agg(sum(sq($"embedding", $"cell"))).head().getDouble(0)
    }
    val i0 = inertia(base)
    val i1 = inertia(refined)
    // Lloyd's guarantee: assignment and update steps each only decrease
    // the objective (float tolerance for the mean computed in double and
    // stored as float).
    assert(i1 <= i0 * (1 + 1e-6), s"inertia increased: $i0 -> $i1")
    assert(refined.centroids.map(_.toSeq) != base.centroids.map(_.toSeq), "refinement moved no centroid")
    // Same probe budget, refined cells: recall vs brute force per probe.
    val probes = Seq(0L, 7L, 21L, 100L, 499L)
    val recalls = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val got = Similarity
        .scoreAgainstIvf(refined, "vec_id", "embedding", q, 10, nProbe = 6)
        .select("vec_id")
        .as[Long]
        .collect()
        .toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    info(s"refined-IVF recall@10 (nLists=16, nProbe=6, 3 Lloyd iters): inertia $i0 -> $i1; " +
      s"per-probe ${recalls.mkString(", ")} (mean ${recalls.sum / recalls.size})")
    assert(recalls.forall(_ >= 0.3), s"refined recall below the documented bound: $recalls")
  }

  test("BQ Hamming ranking: 1 word per 64-dim vector; recall@10 measured vs brute force") {
    val idx = Similarity.bqIndex(emb, "vec_id", "embedding")
    // 64 dims pack into exactly one 64-bit word
    assert(idx.codes.select(size($"code")).head().getInt(0) == 1)
    val probes = Seq(0L, 7L, 21L, 100L, 499L)
    val recalls = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val got = Similarity
        .scoreAgainstBq(idx, "vec_id", "embedding", q, 10)
        .select("vec_id")
        .as[Long]
        .collect()
        .toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    info(s"BQ recall@10 (1 bit/dim, rerank=50): per-probe ${recalls.mkString(", ")} " +
      s"(mean ${recalls.sum / recalls.size})")
    // 1-bit codes + 50-candidate rescore on a 64-dim synthetic corpus:
    // measured 0.6-0.8 per probe (mean 0.72); the 0.4 floor documents the
    // honest trade at the bottom of the ladder (sign-only codes lose
    // magnitude entirely — below SQ8's 0.7 floor, above random).
    assert(recalls.forall(_ >= 0.4), s"BQ recall below the documented floor: $recalls")
  }

  test("multi-probe LSH candidates are a superset of single-probe; recall measured") {
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 4, tables = 4)
    val probes = Seq(0L, 7L, 21L, 100L, 499L)
    val corpus = emb.count().toInt
    val recallPairs = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      // k = corpus size → the full candidate set with exact scores.
      val c0 =
        Similarity.scoreAgainstLsh(idx, "vec_id", "embedding", q, corpus).select("vec_id").as[Long].collect().toSet
      val c1 = Similarity
        .scoreAgainstLsh(idx, "vec_id", "embedding", q, corpus, probeRadius = 1)
        .select("vec_id")
        .as[Long]
        .collect()
        .toSet
      assert(c0.subsetOf(c1), s"probe $pid: radius-1 candidates are not a superset")
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      def recall(c: Set[Long]) = {
        val top = Similarity
          .scoreAgainstLsh(idx, "vec_id", "embedding", q, 10, probeRadius = if (c eq c1) 1 else 0)
        truth.intersect(top.select("vec_id").as[Long].collect().toSet).size.toDouble / truth.size
      }
      (recall(c0), recall(c1))
    }
    val (r0s, r1s) = recallPairs.unzip
    info(s"LSH recall@10 (4 bits × 4 tables): single-probe ${r0s.mkString(", ")} (mean ${r0s.sum / r0s.size}); " +
      s"multi-probe r=1 ${r1s.mkString(", ")} (mean ${r1s.sum / r1s.size})")
    // Half the tables of the shipped 8-table config: multi-probe must make
    // up the recall (the superset makes per-probe regressions tie-breaks
    // only).
    assert(r1s.sum / r1s.size >= r0s.sum / r0s.size, "multi-probe lowered mean recall")
    assert(r1s.forall(_ >= 0.5), s"multi-probe recall floor: $r1s")
  }

  test("PQ-IVF: recall vs brute force, exact emitted scores, real compression") {
    val idx = Similarity.pqIndex(emb, "vec_id", "embedding", nLists = 16, m = 8, ksub = 16)
    // 8-byte codes instead of 64 floats — assert the logical payload AND
    // the physical one: the codes table written as parquet must be
    // several times smaller than the raw-vector IVF assignment table.
    assert(idx.codes.select(size($"code")).distinct().as[Int].collect().toSeq == Seq(8))
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq").toString
    idx.codes.write.parquet(s"$tmp/codes")
    Similarity.ivfIndex(emb, "vec_id", "embedding", 16).assigned.write.parquet(s"$tmp/assigned")
    def bytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L) else f.length()
      walk(new java.io.File(p))
    }
    val (cb, ab) = (bytes(s"$tmp/codes"), bytes(s"$tmp/assigned"))
    info(s"PQ index $cb bytes vs raw-vector IVF table $ab bytes (${ab.toDouble / cb}%x)")
    assert(cb * 3 < ab, s"PQ index not meaningfully smaller: $cb vs $ab")
    // Recall@10 vs brute force across probes; ADC ranks, exact rescore.
    val probes = Seq(0L, 7L, 21L, 100L, 499L)
    val recalls = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val got = Similarity
        .scoreAgainstPq(idx, "vec_id", "embedding", q, 10, nProbe = 8, rerank = 100)
        .select("vec_id")
        .as[Long]
        .collect()
        .toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    // Operating point re-measured on the r16 md5-sampled coarse
    // quantizer: the old draw at (nProbe=6, rerank=50) left two probes
    // at 0.2 — the ADC top-50 cut, not the cells, was the binding
    // constraint, so the contract point moves to (8, 100) where the
    // floor has honest headroom (per-probe 0.4-0.7, mean 0.6).
    info(s"PQ-IVF recall@10 (nLists=16, m=8, ksub=16, nProbe=8, rerank=100): " +
      s"per-probe ${recalls.mkString(", ")} (mean ${recalls.sum / recalls.size})")
    assert(recalls.forall(_ >= 0.3), s"PQ recall below the documented bound: $recalls")
    // Exact-score contract: every emitted cosine equals the brute-force one.
    val q0 = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q0, 500).as[(Long, Double)].collect().toMap
    Similarity
      .scoreAgainstPq(idx, "vec_id", "embedding", q0, 10, nProbe = 6)
      .as[(Long, Double)]
      .collect()
      .foreach { case (id, cos) => assert(all(id) == cos, s"stale PQ score for vec $id") }
  }

  test("distributed OPQ: corpus-trained rotation beats-or-ties plain PQ; orthonormal; recall + exact scores") {
    val idx = Similarity.opqIndexFull(emb, "vec_id", "embedding", nLists = 16, m = 8, ksub = 16)
    val (mse0, mseT) = idx.trainMse.get
    info(s"distributed-OPQ CORPUS quantization MSE: identity $mse0 → trained $mseT (×${mse0 / mseT} tighter)")
    // Best-of-iterations against the corpus objective: the rotation ships
    // only if it beats corpus-trained plain PQ.
    assert(mseT <= mse0, s"corpus-OPQ trained MSE $mseT worse than identity $mse0")
    idx.rotation.foreach { r =>
      val dim = r.length
      for (a <- 0 until dim; b <- a until dim) {
        val dot = (0 until dim).map(c => r(a)(c).toDouble * r(b)(c).toDouble).sum
        assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-3, s"RRᵀ[$a][$b] = $dot")
      }
    }
    val probes = Seq(0L, 7L, 21L, 100L, 499L)
    val recalls = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val got = Similarity
        .scoreAgainstPq(idx, "vec_id", "embedding", q, 10, nProbe = 6, rerank = 100)
        .select("vec_id")
        .as[Long]
        .collect()
        .toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    info(s"distributed-OPQ recall@10 (nProbe=6): per-probe ${recalls.mkString(", ")} (mean ${recalls.sum / recalls.size})")
    assert(recalls.forall(_ >= 0.3), s"corpus-OPQ recall below the documented bound: $recalls")
    val q0 = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q0, 500).as[(Long, Double)].collect().toMap
    Similarity
      .scoreAgainstPq(idx, "vec_id", "embedding", q0, 10, nProbe = 6, rerank = 100)
      .as[(Long, Double)]
      .collect()
      .foreach { case (id, cos) => assert(all(id) == cos, s"stale corpus-OPQ score for vec $id") }
  }

  test("SQ8: dequantization error within half a grid step; recall + exact scores; 4x smaller codes") {
    val idx = Similarity.sqIndex(emb, "vec_id", "embedding")
    // Error bound: |x - dequant(encode(x))| <= step/2 per dim.
    val rows = emb.filter($"vec_id" < 50).select("vec_id", "embedding").collect()
    val codeMap = idx.codes.filter($"vec_id" < 50).collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val code = codeMap(r.getLong(0))
      for (j <- v.indices) {
        val span = idx.hi(j) - idx.lo(j)
        val x = idx.lo(j) + (code(j) + 128) * span / 255f
        assert(math.abs(x - v(j)) <= span / 255f * 0.5f + 1e-6, s"dim $j of vec ${r.getLong(0)}")
      }
    }
    // Recall + exact-score contract, same probes as the PQ tests.
    val probes = Seq(0L, 7L, 21L, 100L, 499L)
    val recalls = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val got = Similarity
        .scoreAgainstSq(idx, "vec_id", "embedding", q, 10)
        .select("vec_id")
        .as[Long]
        .collect()
        .toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    info(s"SQ8 recall@10: per-probe ${recalls.mkString(", ")} (mean ${recalls.sum / recalls.size})")
    // 8-bit-per-dim quantization barely moves cosine ranks — demand a
    // floor well above the PQ bound.
    assert(recalls.forall(_ >= 0.7), s"SQ8 recall below the documented bound: $recalls")
    val q0 = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q0, 500).as[(Long, Double)].collect().toMap
    Similarity
      .scoreAgainstSq(idx, "vec_id", "embedding", q0, 10)
      .as[(Long, Double)]
      .collect()
      .foreach { case (id, cos) => assert(all(id) == cos, s"stale SQ8 score for vec $id") }
    // Stored codes are dim bytes (4x under float32).
    val bytes = idx.codes.agg(org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.length($"code"))).head().getInt(0)
    assert(bytes == 64, s"expected 64-byte codes, got $bytes")
  }

  test("OPQ: trained rotation never quantizes worse than identity; orthonormal; recall + exact scores") {
    val idx = Similarity.opqIndex(emb, "vec_id", "embedding", nLists = 16, m = 8, ksub = 16)
    val (mse0, mseT) = idx.trainMse.get
    info(s"OPQ sample quantization MSE: identity $mse0 → trained $mseT (×${mse0 / mseT} tighter)")
    // Best-of-iterations contract: the rotation ships only if it beats
    // the identity (= plain PQ) baseline on the sample objective.
    assert(mseT <= mse0, s"OPQ trained MSE $mseT worse than identity $mse0")
    // The rotation must actually be orthonormal (R·Rᵀ = I), or ADC
    // distances in the rotated space are meaningless.
    idx.rotation.foreach { r =>
      val dim = r.length
      for (a <- 0 until dim; b <- a until dim) {
        val dot = (0 until dim).map(c => r(a)(c).toDouble * r(b)(c).toDouble).sum
        assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-3, s"RRᵀ[$a][$b] = $dot")
      }
    }
    // Same recall + exact-score contract as the PQ path.
    val probes = Seq(0L, 7L, 21L, 100L, 499L)
    val recalls = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val got = Similarity
        .scoreAgainstPq(idx, "vec_id", "embedding", q, 10, nProbe = 6, rerank = 100)
        .select("vec_id")
        .as[Long]
        .collect()
        .toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    info(s"OPQ-IVF recall@10 (nProbe=6): per-probe ${recalls.mkString(", ")} (mean ${recalls.sum / recalls.size})")
    assert(recalls.forall(_ >= 0.3), s"OPQ recall below the documented bound: $recalls")
    val q0 = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q0, 500).as[(Long, Double)].collect().toMap
    Similarity
      .scoreAgainstPq(idx, "vec_id", "embedding", q0, 10, nProbe = 6, rerank = 100)
      .as[(Long, Double)]
      .collect()
      .foreach { case (id, cos) => assert(all(id) == cos, s"stale OPQ score for vec $id") }
  }

  test("graph ANN: bounded beam search recall vs brute force; exact emitted scores") {
    val idx = Similarity.graphIndex(emb, "vec_id", "embedding")
    // every node keeps at most m=8 neighbors (the bounded-heap truncation)
    val maxDeg = idx.neighbors.groupBy("id").count().agg(max("count")).as[Long].head()
    assert(maxDeg <= 8, s"node degree exceeds m: $maxDeg")
    // entry points: one per non-empty cell, bounded index metadata
    assert(idx.entryPoints.nonEmpty && idx.entryPoints.size <= 16, idx.entryPoints.toString)
    val probes = Seq(0L, 7L, 21L, 100L, 499L)
    val recalls = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val got = Similarity
        .graphSearch(idx, emb, "vec_id", "embedding", q, 10)
        .select("id")
        .as[Long]
        .collect()
        .toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    info(s"graph ANN recall@10 (m=8, nLists=16, beam=16, rounds=3): " +
      s"per-probe ${recalls.mkString(", ")} (mean ${recalls.sum / recalls.size})")
    assert(recalls.forall(_ >= 0.5), s"graph recall below the documented bound: $recalls")
    // Exact-score contract: every emitted cosine equals the brute-force one.
    val q0 = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q0, 500).as[(Long, Double)].collect().toMap
    Similarity
      .graphSearch(idx, emb, "vec_id", "embedding", q0, 10)
      .as[(Long, Double)]
      .collect()
      .foreach { case (id, cos) => assert(all(id) == cos, s"stale graph score for vec $id") }
  }

  test("graph build caps in-cell candidate work under deliberate skew (maxCell)") {
    // one pathological cell: 400 vectors all blocked together — the
    // skewed-100×-corpus straggler the uncapped build is quadratic on
    val rnd = new scala.util.Random(7)
    val skewed = (0 until 400)
      .map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat), 0))
      .toDF("id", "vec", "cell")
    val s = 400
    val capped = Similarity.graphCandidatePairs(skewed, maxCell = 50)
    val nCapped = capped.count()
    val nUncapped = s.toLong * (s - 1) / 2
    // sub-bucketing bounds enumeration + kernel work at ~s·maxCell/2
    assert(
      nCapped <= s.toLong * 50,
      s"capped candidate count $nCapped exceeds s·maxCell = ${s.toLong * 50}"
    )
    assert(
      nCapped < nUncapped / 4,
      s"cap had no effect: $nCapped vs uncapped $nUncapped"
    )
    // at or under the cap the build is BIT-IDENTICAL to the uncapped one
    val under = Similarity.graphCandidatePairs(skewed, maxCell = s)
    assert(under.count() == nUncapped)
    // recall floor survives capping: the capped graph on the real
    // fixture (maxCell forces splits at these cell sizes) still finds
    // at least half the true top-10 per probe
    val idxCapped = Similarity.graphIndex(emb, "vec_id", "embedding", maxCell = 48)
    val probes = Seq(0L, 21L, 100L)
    val recalls = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val got = Similarity
        .graphSearch(idxCapped, emb, "vec_id", "embedding", q, 10)
        .select("id")
        .as[Long]
        .collect()
        .toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    info(s"capped-graph recall@10 (maxCell=48): ${recalls.mkString(", ")}")
    assert(recalls.forall(_ >= 0.5), s"capped-graph recall below the floor: $recalls")
  }

  test("two-layer graph descent: warm entry points, recall at 2 bottom rounds vs single-layer A/B") {
    val idx2 = Similarity.graphIndex2(emb, "vec_id", "embedding")
    // the top layer is a strict deterministic subset of the corpus
    val topIds = idx2.top.neighbors.select("id").distinct().as[Long].collect().toSet
    val allIds = emb.select($"vec_id").as[Long].collect().toSet
    assert(topIds.subsetOf(allIds) && topIds.size < allIds.size / 4, s"top layer not a sparse subset: ${topIds.size}")
    val probes = Seq(0L, 7L, 21L, 100L, 499L)
    def recallOf(search: Seq[Float] => Set[Long]): Seq[Double] = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      truth.intersect(search(q)).size.toDouble / truth.size
    }
    val hier = recallOf(q =>
      Similarity.graphSearch2(idx2, emb, "vec_id", "embedding", q, 10).select("id").as[Long].collect().toSet
    )
    // A/B: single layer at the SAME bottom budget (2 rounds, train-time
    // entry points) — the hierarchy's warm start is what's under test
    val flat = recallOf(q =>
      Similarity
        .graphSearch(idx2.bottom, emb, "vec_id", "embedding", q, 10, rounds = 2)
        .select("id")
        .as[Long]
        .collect()
        .toSet
    )
    info(s"two-layer recall@10 (2 top + 2 bottom rounds): ${hier.mkString(", ")} (mean ${hier.sum / hier.size}); " +
      s"single-layer at 2 rounds: ${flat.mkString(", ")} (mean ${flat.sum / flat.size})")
    assert(hier.forall(_ >= 0.5), s"two-layer recall below the single-layer floor: $hier")
    assert(hier.sum >= flat.sum - 0.101, s"hierarchy made recall meaningfully worse: hier=$hier flat=$flat")
  }

  test("graph insert: new nodes link both ways, degree cap holds, post-insert recall measured") {
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val delta = emb.filter($"vec_id" % 5 === 0)
    val g0 = Similarity.graphIndex(base, "vec_id", "embedding")
    // the suite entry's insert budget (beam 12 / 2 rounds — lighter than
    // the query budget; the insert only needs m good neighbors)
    val g1 = Similarity.addToGraph(g0, emb, "vec_id", "embedding", delta, beam = 12, rounds = 2)
    // every delta node has a forward adjacency list, appears as someone's
    // neighbor (reverse links landed), and the m-cap survives re-pruning
    val deltaIds = delta.select($"vec_id").as[Long].collect().toSet
    val fwdIds = g1.neighbors.select("id").distinct().as[Long].collect().toSet
    assert(deltaIds.subsetOf(fwdIds), s"missing forward lists: ${(deltaIds -- fwdIds).take(5)}")
    val revTargets = g1.neighbors.select("nbr").distinct().as[Long].collect().toSet
    assert(deltaIds.subsetOf(revTargets), s"missing reverse links: ${(deltaIds -- revTargets).take(5)}")
    val maxDeg = g1.neighbors.groupBy("id").count().agg(max("count")).as[Long].head()
    assert(maxDeg <= 8, s"insert broke the degree cap: $maxDeg")
    // searching DELTA probes over the grown graph reaches their true
    // neighborhood (vs brute force over the full union corpus)
    val probes = Seq(0L, 5L, 100L, 495L)
    val recalls = probes.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val got = Similarity
        .graphSearch(g1, emb, "vec_id", "embedding", q, 10)
        .select("id")
        .as[Long]
        .collect()
        .toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    info(s"post-insert graph recall@10 (delta probes, no batch-internal edges): " +
      s"per-probe ${recalls.mkString(", ")} (mean ${recalls.sum / recalls.size})")
    assert(recalls.forall(_ >= 0.4), s"post-insert recall below the documented floor: $recalls")
  }

  test("batch graph beam search: per-probe recall floor, exact scores, zero driver collects in-plan") {
    val idx = Similarity.graphIndex(emb, "vec_id", "embedding")
    val probeIds = Seq(0L, 7L, 21L)
    val got = Similarity
      .graphSearchBatch(idx, emb, "vec_id", "embedding", emb.filter($"vec_id".isin(probeIds: _*)), 10)
      .select("probe_id", "id", "cos")
      .as[(Long, Long, Double)]
      .collect()
      .groupBy(_._1)
    val recalls = probeIds.map { pid =>
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val truth =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
      val exact =
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 500).as[(Long, Double)].collect().toMap
      val mine = got(pid).map(r => (r._2, r._3)).toSeq
      // exact-score contract per probe
      mine.foreach { case (id, cos) => assert(exact(id) == cos, s"stale batch score probe=$pid id=$id") }
      truth.intersect(mine.map(_._1).toSet).size.toDouble / truth.size
    }
    info(s"batch graph recall@10: ${recalls.mkString(", ")} (mean ${recalls.sum / recalls.size})")
    assert(recalls.forall(_ >= 0.5), s"batch graph recall below bound: $recalls")
    // No forced broadcast on the probe frame: an unbounded probe batch
    // (the knn-join use) must be free to shuffle — AQE may still pick
    // broadcast at small sizes from runtime stats, which is correct.
    // The only allowed hint is the bounded entry-point frame (index
    // metadata, O(nLists) rows, carries no probe_vec).
    val plan = Similarity
      .graphSearchBatch(idx, emb, "vec_id", "embedding", emb.limit(3), 10)
      .queryExecution.analyzed
    val hinted = plan.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.child.output.exists(a => a.name == "probe_vec" || a.name == "probe_id") => h
    }
    assert(hinted.isEmpty, "graphSearchBatch still broadcast-hints the probe frame")
  }

  test("batch LSH knn join returns exactly the per-probe multi-probe results") {
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 4, tables = 4)
    val batch = Similarity
      .knnJoinLsh(idx, emb.filter($"vec_id" < 3), "vec_id", "embedding", 5, probeRadius = 1)
      .select("probe_id", "cand_id", "cos")
      .as[(Long, Long, Double)]
      .collect()
      .groupBy(_._1)
    assert(batch.keySet == Set(0L, 1L, 2L))
    for (pid <- Seq(0L, 1L, 2L)) {
      val q = emb.filter($"vec_id" === pid).select("embedding").head().getSeq[Float](0)
      val single = Similarity
        .scoreAgainstLsh(idx, "vec_id", "embedding", q, 5, probeRadius = 1)
        .as[(Long, Double)]
        .collect()
        .toSet
      val got = batch(pid).map(t => (t._2, t._3)).toSet
      assert(got == single, s"probe $pid: batch $got vs per-probe $single")
    }
  }

  test("LSH/IVF top-k emit exact cosine scores — approximation lives only in candidate recall") {
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val all = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", q, 500)
      .as[(Long, Double)]
      .collect()
      .toMap
    val approx = Seq(
      "lsh" -> Similarity.lshTopK(emb, "vec_id", "embedding", q, 10, nBits = 4, tables = 8),
      "ivf" -> Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10, nLists = 16, nProbe = 6)
    )
    approx.foreach { case (name, df) =>
      val rows = df.as[(Long, Double)].collect()
      assert(rows.length == 10, name)
      rows.foreach { case (id, cos) => assert(all(id) == cos, s"$name: stale score for vec $id") }
    }
  }

  test("MMR re-rank: λ=1 ≡ plain top-k; greedy optimality vs a naive quadratic reference; diversity beats a near-dup") {
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val corpus = emb.filter($"vec_id" =!= 0)

    // λ=1 degenerates to plain relevance ranking — exact equality.
    val plain = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    val l1 = Similarity.mmrRerank(corpus, "vec_id", "embedding", q, 10, 50, 1.0)
      .select("vec_id", "rel").as[(Long, Double)].collect().toSeq
    assert(l1 == plain)

    // Greedy optimality at λ=0.5: a NAIVE quadratic reference (penalties
    // recomputed fresh every round, no incremental max-sim state) over
    // the same candidate window reproduces the emitted ranking and
    // scores exactly.
    val lambda = 0.5
    val got = Similarity.mmrRerank(corpus, "vec_id", "embedding", q, 10, 50, lambda)
      .select("rank", "vec_id", "rel", "mmr_score")
      .as[(Int, Long, Double, Double)].collect().toSeq
    val window: Array[(Long, Double, Array[Double])] = corpus
      .select(
        $"vec_id",
        round(VectorFns.cosine($"embedding", array(q.map(x => lit(x.toDouble)): _*)), 6).as("rel"),
        $"embedding".cast("array<double>")
      )
      .orderBy($"rel".desc, $"vec_id".asc)
      .limit(50)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    def cosRef(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum
      val nb = b.map(x => x * x).sum
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    var sel = Vector.empty[(Long, Double, Double)]
    var rem = window.toVector
    while (sel.size < 10 && rem.nonEmpty) {
      val best = rem.maxBy { case (id, rel, v) =>
        val pen = if (sel.isEmpty) 0.0
        else sel.map(s => cosRef(v, window.find(_._1 == s._1).get._3)).max
        (lambda * rel - (1 - lambda) * pen, rel, -id.toDouble)
      }
      val pen = if (sel.isEmpty) 0.0
      else sel.map(s => cosRef(best._3, window.find(_._1 == s._1).get._3)).max
      val mmr = BigDecimal(lambda * best._2 - (if (sel.isEmpty) 0.0 else (1 - lambda) * pen))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      sel :+= ((best._1, best._2, mmr))
      rem = rem.filterNot(_._1 == best._1)
    }
    val want = sel.zipWithIndex.map { case ((id, rel, mmr), i) => (i + 1, id, rel, mmr) }
    assert(got == want, s"got=$got\nwant=$want")

    // Diversity: a near-duplicate of the top hit is displaced by a
    // diverse doc at λ=0.5 where plain ranking keeps it at rank 2.
    val tiny = Seq(
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.9f, 0.11f)), // near-dup of 1 (cos ≈ 0.99995)
      (3L, Seq(0.5f, -0.5f))  // diverse (cos to 1 ≈ 0.62)
    ).toDF("vec_id", "embedding")
    val probe = Seq(1.0f, 0.0f)
    val plainTiny = Similarity.bruteForceTopK(tiny, "vec_id", "embedding", probe, 2)
      .as[(Long, Double)].collect().map(_._1).toSeq
    val mmrTiny = Similarity.mmrRerank(tiny, "vec_id", "embedding", probe, 2, 3, 0.5)
      .select("vec_id").as[Long].collect().toSeq
    assert(plainTiny == Seq(1L, 2L))
    assert(mmrTiny == Seq(1L, 3L))
  }

  // ── Grouped sketch twins (the under-bucket 100 TB percentile paths) ────
  // Contract, per BUCKET of n rows: the grouped approx_percentile value
  // must sit in that bucket's exact [p−ε, p+ε] percentile band with
  // ε = max(0.005, 1.5/n) — the 0.005 term is the sketch's rank-error
  // guarantee at accuracy 10000 (the top-level twins' contract); the
  // 1.5/n term covers SMALL buckets, where the sketch is an exact
  // nearest-rank selection while the exact twin interpolates between
  // ranks (±1 element plus the rounding convention) — the same treatment
  // the moving-percentiles contract gives its ≤6-row windows.

  private def assertInBucketBand(
      fact: org.apache.spark.sql.DataFrame,
      keyCol: String,
      valCol: String,
      bucketKey: Any,
      p: Double,
      got: Double,
      what: String
  ): Unit = {
    val bucket = fact.filter(col(keyCol) === lit(bucketKey))
    val n = bucket.count().toDouble
    val eps = math.max(0.005, 1.5 / math.max(1.0, n))
    val b = bucket
      .agg(
        percentile(col(valCol), lit(math.max(0.0, p - eps))).as("lo"),
        percentile(col(valCol), lit(math.min(1.0, p + eps))).as("hi")
      )
      .head()
    assert(
      got >= b.getDouble(0) - 0.01 && got <= b.getDouble(1) + 0.01,
      s"$what: bucket=$bucketKey p=$p approx=$got outside [${b.getDouble(0)}, ${b.getDouble(1)}]"
    )
  }

  test("grouped approx percentiles under terms: every bucket inside its own rank band") {
    val od = Tables.orders(spark, Sf)
    val rows = SparkEntry.queries("search_dsl_json_terms_percentiles_approx")(spark, Sf).collect()
    assert(rows.length == 5, s"expected 5 priority buckets, got ${rows.length}")
    rows.foreach { r =>
      val key = r.getAs[String]("key")
      assertInBucketBand(od, "o_orderpriority", "o_totalprice", key, 0.5,
        r.getAs[Double]("price_p50"), "terms_percentiles_approx p50")
      assertInBucketBand(od, "o_orderpriority", "o_totalprice", key, 0.9,
        r.getAs[Double]("price_p90"), "terms_percentiles_approx p90")
    }
  }

  test("grouped approx boxplot under terms: exact extrema per bucket, quartiles in-band") {
    val li = Tables.lineitem(spark, Sf)
    val approxRows = SparkEntry.queries("search_dsl_json_terms_boxplot_approx")(spark, Sf).collect()
    val exactRows = SparkEntry.queries("search_dsl_json_terms_boxplot")(spark, Sf)
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(approxRows.length == 3, s"expected 3 flag buckets, got ${approxRows.length}")
    approxRows.foreach { r =>
      val key = r.getAs[String]("key")
      val ex = exactRows(key)
      // min/max are real selections in both twins — bitwise equal.
      assert(r.getAs[Double]("price_min") == ex.getAs[Double]("price_min"), s"$key: min differs")
      assert(r.getAs[Double]("price_max") == ex.getAs[Double]("price_max"), s"$key: max differs")
      Seq(0.25 -> "price_q1", 0.5 -> "price_q2", 0.75 -> "price_q3").foreach { case (p, c) =>
        assertInBucketBand(li, "l_returnflag", "l_extendedprice", key, p,
          r.getAs[Double](c), "terms_boxplot_approx")
      }
    }
  }

  test("grouped approx percentiles under date_histogram: every month in-band, cardinality exact") {
    val od = Tables.orders(spark, Sf)
      .withColumn("_m", date_trunc("month", col("o_orderdate")))
    val approxRows = SparkEntry.queries("search_dsl_json_dh_percentiles_approx")(spark, Sf).collect()
    val exactRows = SparkEntry.queries("search_dsl_json_dh_percentiles")(spark, Sf)
      .collect().map(r => r.get(0) -> r).toMap
    assert(approxRows.nonEmpty, "no monthly buckets")
    approxRows.foreach { r =>
      val bucket = r.get(0)
      // buyers rides HLL++ in the sketch twin: exact below the sparse
      // threshold (these test-scale buckets), and within the 3σ band of
      // the default rsd=0.05 above it — both covered by one assertion.
      val exactBuyers = exactRows(bucket).getAs[Long]("buyers")
      val gotBuyers = r.getAs[Long]("buyers")
      assert(math.abs(gotBuyers - exactBuyers) <= math.max(1L, (0.15 * exactBuyers).toLong),
        s"$bucket: HLL buyers $gotBuyers outside the 3σ band of exact $exactBuyers")
      assertInBucketBand(od, "_m", "o_totalprice", bucket, 0.5,
        r.getAs[Double]("price_p50"), "dh_percentiles_approx p50")
      assertInBucketBand(od, "_m", "o_totalprice", bucket, 0.9,
        r.getAs[Double]("price_p90"), "dh_percentiles_approx p90")
    }
  }

  test("cumulative cardinality sketch twin: per-bucket ≤5% of exact, monotone non-decreasing") {
    val approx = SparkEntry.queries("search_cumulative_cardinality_approx")(spark, Sf)
      .collect().map(r => r.get(0) -> r.getAs[Long]("cum_cardinality")).toMap
    val exact = SparkEntry.queries("search_cumulative_cardinality")(spark, Sf)
      .collect().map(r => r.get(0) -> r.getAs[Long]("cum_cardinality"))
    assert(exact.nonEmpty, "no buckets")
    assert(approx.keySet == exact.map(_._1).toSet, "bucket spines diverge between the twins")
    exact.foreach { case (bucket, want) =>
      val got = approx(bucket)
      assert(math.abs(got - want) <= math.max(1L, (0.05 * want).toLong),
        s"$bucket: HLL cumulative cardinality $got outside 5% of exact $want")
    }
    val inOrder = exact.map { case (b, _) => approx(b) }
    assert(inOrder.zip(inOrder.tail).forall { case (a, b) => b >= a },
      "cumulative union is not monotone — sketches are not being unioned")
  }
}
