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
}
