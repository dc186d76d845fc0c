package graft

import graft.functions.VectorFns
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // Orthogonal-ish crafted vectors: 0 and 1 nearly parallel, 2 orthogonal,
  // 3 anti-parallel.
  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine column matches hand-computed values") {
    val out = vecs
      .select($"vec_id", round(VectorFns.cosine($"embedding", array(lit(1.0), lit(0.0), lit(0.0), lit(0.0))), 4))
      .as[(Long, Double)]
      .collect()
      .toMap
    assert(out(0L) == 1.0)
    assert(out(3L) == -1.0)
    assert(out(2L) == 0.0)
    assert(math.abs(out(4L) - 0.7071) < 1e-4)
  }

  test("bruteForceTopK ranks by cosine desc") {
    val top = Similarity
      .bruteForceTopK(vecs.filter($"vec_id" =!= 0), "vec_id", "embedding", Seq(1.0f, 0.0f, 0.0f, 0.0f), 3)
      .select("vec_id")
      .as[Long]
      .collect()
    assert(top.toSeq == Seq(1L, 4L, 2L))
  }

  test("ivfIndex tolerates NULL embeddings: excluded from centroids and results") {
    val withNull = vecs
      .unionByName(Seq((9L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val idx = Similarity.ivfIndex(withNull, "vec_id", "embedding", nLists = 3)
    assert(idx.centroids.length == 3) // null row never sampled as a centroid
    val top = Similarity
      .scoreAgainstIvf(idx, "vec_id", "embedding", Seq(1.0f, 0.0f, 0.0f, 0.0f), k = 10, nProbe = 3)
      .select("vec_id")
      .as[Long]
      .collect()
    assert(!top.contains(9L)) // cell -1 is never probed
  }

  test("knnJoin returns k ranked neighbors per probe") {
    val out = Similarity
      .knnJoin(vecs.filter($"vec_id" < 2), vecs.filter($"vec_id" >= 2), "vec_id", "embedding", 2)
      .orderBy("probe_id", "rank")
      .select("probe_id", "cand_id", "rank")
      .as[(Long, Long, Int)]
      .collect()
    assert(out.length == 4)
    assert(out(0) == ((0L, 4L, 1)) && out(1) == ((0L, 2L, 2)))
    // No forced broadcast on the probe frame (same contract as
    // graphSearchBatch): the batch knn-join is exactly the use where
    // probes can be data-sized, so AQE must stay free to shuffle —
    // it still picks broadcast at small sizes from runtime stats.
    val plan = Similarity
      .knnJoin(vecs.limit(3), vecs, "vec_id", "embedding", 2)
      .queryExecution.analyzed
    val hinted = plan.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.child.output.exists(a => a.name == "probe_vec" || a.name == "probe_id") => h
    }
    assert(hinted.isEmpty, "knnJoin still broadcast-hints the probe frame")
  }

  test("LSH topk recall matches brute force on the real corpus") {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
    val lsh = Similarity
      .lshTopK(emb, "vec_id", "embedding", q, 10, nBits = 4, tables = 8)
      .select("vec_id")
      .as[Long]
      .collect()
      .toSet
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    assert(recall >= 0.5, s"LSH recall too low: $recall (bf=$bf lsh=$lsh)")
  }

  test("embeddingNearDupPairs finds the planted near-parallel pair") {
    val pairs = Similarity
      .embeddingNearDupPairs(vecs, "vec_id", "embedding", threshold = 0.95, nBits = 2, tables = 4)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((0L, 1L)), s"planted pair missed: $pairs")
    assert(!pairs.contains((0L, 3L)))
  }

  test("IVF topk recall matches brute force on the real corpus") {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).select("vec_id").as[Long].collect().toSet
    val ivf = Similarity
      .ivfTopK(emb, "vec_id", "embedding", q, 10, nLists = 16, nProbe = 8)
      .select("vec_id")
      .as[Long]
      .collect()
    assert(ivf.length == 10)
    val recall = bf.intersect(ivf.toSet).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF recall too low: $recall")
  }

  test("addToIvf folds a delta without retraining: cells verified first-principles, search covers the union") {
    val emb = Tables.embeddings(spark, Sf)
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val delta = emb.filter($"vec_id" % 5 === 0)
    val idx = Similarity.ivfIndex(base, "vec_id", "embedding", nLists = 16)
    val folded = Similarity.addToIvf(idx, delta, "vec_id", "embedding")
    // centroids untouched; assignment table = base ∪ delta, nothing dropped
    assert(folded.centroids.map(_.toSeq).toSeq == idx.centroids.map(_.toSeq).toSeq)
    assert(folded.assigned.count() == emb.count())
    // every delta cell is the true argmin-distance centroid (the same
    // math recomputed from scratch here, not via the production code)
    val cents = idx.centroids
    val deltaCells = folded.assigned
      .join(delta.select($"vec_id"), "vec_id")
      .select($"vec_id", $"embedding", $"cell")
      .as[(Long, Seq[Float], Int)]
      .collect()
    assert(deltaCells.nonEmpty)
    deltaCells.foreach { case (id, v, cell) =>
      val dists = cents.map { c =>
        var d = 0.0; var j = 0
        while (j < c.length) { val t = v(j).toDouble - c(j).toDouble; d += t * t; j += 1 }
        d
      }
      val best = dists.indices.minBy(i => (dists(i), i))
      assert(cell == best, s"vec $id assigned to cell $cell, nearest is $best")
    }
    // the grown index serves delta vectors too: searching a delta probe
    // finds it (cos 1.0 with itself) plus base neighbors, exact scores
    val q = emb.filter($"vec_id" === 5).select("embedding").head().getSeq[Float](0)
    val got = Similarity
      .scoreAgainstIvf(folded, "vec_id", "embedding", q, 10, nProbe = 8)
      .select("vec_id")
      .as[Long]
      .collect()
    assert(got.contains(5L), s"delta vector not searchable after fold: ${got.toSeq}")
  }

  test("addToPq folds a delta with frozen codebooks: codes verified first-principles, ADC search reaches delta") {
    val emb = Tables.embeddings(spark, Sf)
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val delta = emb.filter($"vec_id" % 5 === 0)
    val idx = Similarity.pqIndex(base, "vec_id", "embedding")
    val folded = Similarity.addToPq(idx, delta, "vec_id", "embedding")
    assert(folded.codes.count() == emb.count())
    assert((folded.centroids eq idx.centroids) && (folded.codebooks eq idx.codebooks))
    // every delta code re-derived from scratch here: nearest coarse cell,
    // then per-subspace argmin against the frozen codebooks
    val deltaCodes = folded.codes
      .join(delta.select($"vec_id"), "vec_id")
      .join(delta.select($"vec_id", $"embedding"), "vec_id")
      .select($"vec_id", $"embedding", $"cell", $"code")
      .as[(Long, Seq[Float], Int, Seq[Int])]
      .collect()
    assert(deltaCodes.nonEmpty)
    val m = idx.codebooks.length
    deltaCodes.foreach { case (id, v, cell, code) =>
      val dists = idx.centroids.map { c =>
        var d = 0.0; var j = 0
        while (j < c.length) { val t = v(j).toDouble - c(j).toDouble; d += t * t; j += 1 }
        d
      }
      val bestCell = dists.indices.minBy(i => (dists(i), i))
      assert(cell == bestCell, s"vec $id coarse cell $cell != nearest $bestCell")
      val cvec = idx.centroids(cell)
      // double residual — the engine's (and the DuckDB oracle's) exact
      // IEEE expression over the same parquet floats (r17)
      val res = Array.tabulate(v.length)(j => v(j).toDouble - (if (j < cvec.length) cvec(j).toDouble else 0.0))
      val dsub = v.length / m
      (0 until m).foreach { mi =>
        val book = idx.codebooks(mi)
        val best = book.indices.minBy { k =>
          var d = 0.0; var j = 0
          while (j < dsub) { val t = res(mi * dsub + j) - book(k)(j).toDouble; d += t * t; j += 1 }
          (d, k)
        }
        assert(code(mi) == best, s"vec $id subspace $mi code ${code(mi)} != argmin $best")
      }
    }
    // the grown index serves delta probes through the ADC path
    val q = emb.filter($"vec_id" === 5).select("embedding").head().getSeq[Float](0)
    val got = Similarity
      .scoreAgainstPq(folded, "vec_id", "embedding", q, 10, nProbe = 4)
      .select("vec_id")
      .as[Long]
      .collect()
    assert(got.contains(5L), s"delta vector not searchable after fold: ${got.toSeq}")
  }

  test("saltedJoin equals plain join, spreading hot keys") {
    import graft.operators.Skew
    val fact = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "w")
    val salted = Skew.saltedJoin(fact, dim, "k", factor = 4).select("k", "v", "w")
    val plain = fact.join(dim, "k").select("k", "v", "w")
    assert(salted.collect().map(_.toString).sorted.toSeq == plain.collect().map(_.toString).sorted.toSeq)
  }

  test("saltedAgg computes exact distinct counts per key") {
    import graft.operators.Skew
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val out = Skew
      .saltedAgg(df, $"k", 4, c => countDistinct(c), c => sum(c), $"v")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("knnJoin plan uses the bounded-heap exec, not a window sort") {
    val plan = Similarity
      .knnJoin(vecs.limit(1), vecs, "vec_id", "embedding", 2)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Window"), s"per-probe window sort is a straggler at scale:\n$plan")
    assert(plan.contains("TopKPerKey"), plan)
  }

  test("ivfIndex assignment is a pure projection — no window, join, or aggregation") {
    val idx = Similarity.ivfIndex(Tables.embeddings(spark, Sf), "vec_id", "embedding", 8)
    val plan = idx.assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join") && !plan.contains("HashAggregate"), plan)
    assert(idx.assigned.count() == Tables.embeddings(spark, Sf).count())
    assert(idx.centroids.length == 8)
    val cells = idx.assigned.select("cell").distinct().as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 8), cells.mkString(","))
  }

  test("LSH build/score split equals the one-shot path") {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 4, tables = 8)
    val split = Similarity.scoreAgainstLsh(idx, "vec_id", "embedding", q, 10)
    val oneShot = Similarity.lshTopK(emb, "vec_id", "embedding", q, 10, nBits = 4, tables = 8)
    assert(split.collect().toSeq == oneShot.collect().toSeq)
    // the signature table carries ids only — never the vectors
    assert(idx.sigs.columns.toSeq == Seq("vec_id", "table", "sig"))
  }

  test("IVF build/score split equals the one-shot path; score plan is filter + bounded top-k only") {
    val emb = Tables.embeddings(spark, Sf)
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", 16)
    val score = Similarity.scoreAgainstIvf(idx, "vec_id", "embedding", q, 10, nProbe = 8)
    val oneShot = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10, nLists = 16, nProbe = 8)
    assert(score.collect().toSeq == oneShot.collect().toSeq)
    val plan = score.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("brute-force plan broadcasts probes — no shuffle of the candidate side") {
    val plan = Similarity
      .knnJoin(vecs.limit(1), vecs, "vec_id", "embedding", 2)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
