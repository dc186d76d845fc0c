package graft

import graft.operators.{Dedup, MinHashLSH, SimHash, Similarity}
import org.apache.spark.sql.functions._

/** The replica family's DETERMINISTIC sub-assertions re-run at a larger
  * scale factor: exact emitted scores, superset claims, degree caps, and
  * precision-by-construction re-verification — every claim that is a hard
  * contract rather than a statistical recall bound. (Recall floors stay in
  * ReplicaSpec at sf0.001, where the all-pairs ground truth is computable;
  * precision/exactness claims are re-checkable at ANY scale because they
  * only touch the emitted rows.)
  *
  * Gated on GRAFT_SCALE_SF so the driver's per-round `sbt test` keeps its
  * sf0.001 cost; run explicitly with
  *   GRAFT_SCALE_SF=/root/testdata/sf0.1 sbt 'testOnly graft.ReplicaScaleSpec'
  */
class ReplicaScaleSpec extends SparkSpec {
  import spark.implicits._

  private val scaleDir = sys.env.get("GRAFT_SCALE_SF")
  private def dir = scaleDir.get
  private def docs = Tables.documents(spark, dir)
  private def emb = Tables.embeddings(spark, dir)

  test("scale MinHash-LSH: every emitted pair re-verifies at exact Jaccard >= t") {
    assume(scaleDir.isDefined, "GRAFT_SCALE_SF not set")
    val t = 0.5
    val got = MinHashLSH.nearDupPairs(docs, "doc_id", "text", threshold = t).select("a", "b")
    val sh = MinHashLSH.shingles(docs, "doc_id", "text", 3)
    val bad = got
      .join(sh.select($"id".as("a"), $"shingles".as("sa")), Seq("a"))
      .join(sh.select($"id".as("b"), $"shingles".as("sb")), Seq("b"))
      .filter(round(Dedup.jaccardUdf($"sa", $"sb"), 4) < t)
      .count()
    assert(got.count() > 0, "vacuous: no near-dup pairs at scale")
    assert(bad == 0, s"$bad emitted pairs fail exact Jaccard re-verification")
  }

  test("scale SimHash: every banded pair is within maxHamming of its partner") {
    assume(scaleDir.isDefined, "GRAFT_SCALE_SF not set")
    val maxH = 3
    val got = SimHash.nearDupPairs(docs, "doc_id", "text", maxHamming = maxH).select("a", "b")
    val sigs = SimHash.simhash64(docs, "doc_id", "text")
    val bad = got
      .join(sigs.select($"id".as("a"), $"simhash".as("ha")), Seq("a"))
      .join(sigs.select($"id".as("b"), $"simhash".as("hb")), Seq("b"))
      .filter(bit_count($"ha".bitwiseXOR($"hb")) > maxH)
      .count()
    assert(got.count() > 0, "vacuous: no near-dup pairs at scale")
    assert(bad == 0, s"$bad banded pairs exceed maxHamming=$maxH")
  }

  test("scale graph ANN: degree cap, bounded entry points, exact emitted scores") {
    assume(scaleDir.isDefined, "GRAFT_SCALE_SF not set")
    val idx = Similarity.graphIndex(emb, "vec_id", "embedding")
    val maxDeg = idx.neighbors.groupBy("id").count().agg(max("count")).as[Long].head()
    assert(maxDeg <= 8, s"node degree exceeds m at scale: $maxDeg")
    assert(idx.entryPoints.nonEmpty && idx.entryPoints.size <= 16, idx.entryPoints.toString)
    val corpus = emb.count().toInt
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, corpus).as[(Long, Double)].collect().toMap
    val hits = Similarity.graphSearch(idx, emb, "vec_id", "embedding", q, 10).as[(Long, Double)].collect()
    assert(hits.length == 10)
    hits.foreach { case (id, cos) => assert(all(id) == cos, s"stale graph score for vec $id") }
  }

  test("scale multi-probe LSH: radius-1 candidates are a superset; top-k scores exact") {
    assume(scaleDir.isDefined, "GRAFT_SCALE_SF not set")
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 4, tables = 4)
    val corpus = emb.count().toInt
    val q = emb.filter($"vec_id" === 100).select("embedding").head().getSeq[Float](0)
    val c0 =
      Similarity.scoreAgainstLsh(idx, "vec_id", "embedding", q, corpus).select("vec_id").as[Long].collect().toSet
    val c1 = Similarity
      .scoreAgainstLsh(idx, "vec_id", "embedding", q, corpus, probeRadius = 1)
      .select("vec_id")
      .as[Long]
      .collect()
      .toSet
    assert(c0.nonEmpty && c0.subsetOf(c1), "radius-1 candidates are not a superset at scale")
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, corpus).as[(Long, Double)].collect().toMap
    Similarity
      .lshTopK(emb, "vec_id", "embedding", q, 10, nBits = 4, tables = 8)
      .as[(Long, Double)]
      .collect()
      .foreach { case (id, cos) => assert(all(id) == cos, s"stale LSH score for vec $id") }
  }

  test("scale MinHash-LSH on the MUTATED replica corpus: recall >= 0.9 vs composed truth, zero cross-replica leakage") {
    assume(scaleDir.isDefined, "GRAFT_SCALE_SF not set")
    // The contract behind the 10×/100× dedup bench evidence: on a
    // ScaleData-mutated N-copy corpus the TRUE pair set is exactly the
    // per-replica shifted union of the base pair set (DedupSpec proves
    // the identity at sf0.001; here the OPERATOR is held to it at the
    // scale-gate SF) — so recall is measurable at any scale without a
    // quadratic oracle over the scaled corpus.
    val t = 0.5
    val stride = docs.agg(max($"doc_id")).as[Long].head() + 1
    val copies = 3
    val mutated = (0 until copies)
      .map(i => ScaleData.mutateDocuments(docs.withColumn("doc_id", $"doc_id" + lit(stride * i)), "text", i))
      .reduce(_ unionByName _)
    val sh = MinHashLSH.shingles(docs, "doc_id", "text", 3)
    val baseTruth = sh.select($"id".as("a"), $"shingles".as("sa"))
      .crossJoin(sh.select($"id".as("b"), $"shingles".as("sb")))
      .filter($"a" < $"b")
      .filter(round(Dedup.jaccardUdf($"sa", $"sb"), 4) >= t)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(baseTruth.nonEmpty, "vacuous: no base near-dup pairs")
    val composed = (0 until copies).flatMap { i =>
      baseTruth.map { case (a, b) => (a + stride * i, b + stride * i) }
    }.toSet
    val got = MinHashLSH.nearDupPairs(mutated, "doc_id", "text", threshold = t)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // precision vs composed truth: every emitted pair is an exact-
    // verified pair of the mutated corpus, and by the density invariant
    // those are exactly the within-replica shifts — so ANY emitted pair
    // outside `composed` would mean cross-replica leakage (or a verify
    // bug) at this SF
    assert(got.subsetOf(composed), s"pairs outside the composed truth: ${got.diff(composed).take(5)}")
    val recall = got.intersect(composed).size.toDouble / composed.size
    info(s"mutated-corpus recall at $copies copies: $recall (truth ${composed.size}, got ${got.size})")
    assert(recall >= 0.9, s"recall=$recall on the mutated replica corpus")
  }

  test("scale IVF: top-k scores exact; k-means top-k exact too") {
    assume(scaleDir.isDefined, "GRAFT_SCALE_SF not set")
    val corpus = emb.count().toInt
    val q = emb.filter($"vec_id" === 21).select("embedding").head().getSeq[Float](0)
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, corpus).as[(Long, Double)].collect().toMap
    Similarity
      .ivfTopK(emb, "vec_id", "embedding", q, 10, nLists = 16, nProbe = 6)
      .as[(Long, Double)]
      .collect()
      .foreach { case (id, cos) => assert(all(id) == cos, s"stale IVF score for vec $id") }
  }

  test("scale grouped sketch twins: every bucket's quantiles inside its own rank band") {
    assume(scaleDir.isDefined, "GRAFT_SCALE_SF not set")
    // grouped accuracy 2000 → rank error ≤ 5e-4; asserted at the 10×-margin
    // 0.005 band (plus interpolation slack for small buckets) — the same
    // contract ReplicaSpec pins at sf0.001, re-proven where buckets hold
    // tens of thousands of rows and the sketch actually compresses.
    val od = Tables.orders(spark, dir)
    val odm = od.withColumn("_m", date_trunc("month", col("o_orderdate")))
    def band(keyCol: String, key: Any, p: Double, got: Double, what: String): Unit = {
      val bucket = odm.filter(col(keyCol) === lit(key))
      val eps = math.max(0.005, 1.5 / math.max(1.0, bucket.count().toDouble))
      val b = bucket.agg(
        percentile(col("o_totalprice"), lit(math.max(0.0, p - eps))).as("lo"),
        percentile(col("o_totalprice"), lit(math.min(1.0, p + eps))).as("hi")).head()
      assert(got >= b.getDouble(0) - 0.01 && got <= b.getDouble(1) + 0.01,
        s"$what: bucket=$key p=$p approx=$got outside [${b.getDouble(0)}, ${b.getDouble(1)}]")
    }
    SparkEntry.queries("search_dsl_json_terms_percentiles_approx")(spark, dir).collect().foreach { r =>
      band("o_orderpriority", r.getAs[String]("key"), 0.5, r.getAs[Double]("price_p50"), "terms p50")
      band("o_orderpriority", r.getAs[String]("key"), 0.9, r.getAs[Double]("price_p90"), "terms p90")
    }
    val dh = SparkEntry.queries("search_dsl_json_dh_percentiles_approx")(spark, dir).collect()
    val exact = SparkEntry.queries("search_dsl_json_dh_percentiles")(spark, dir)
      .collect().map(r => r.get(0) -> r.getAs[Long]("buyers")).toMap
    dh.foreach { r =>
      val bucket = r.get(0)
      band("_m", bucket, 0.5, r.getAs[Double]("price_p50"), "dh p50")
      // HLL buyers: within the 3σ band of rsd=0.05 at scale cardinalities
      val ex = exact(bucket)
      assert(math.abs(r.getAs[Long]("buyers") - ex) <= math.max(1L, (0.15 * ex).toLong),
        s"$bucket: HLL buyers ${r.getAs[Long]("buyers")} vs exact $ex")
    }
  }

  test("scale percolate index tier: every emitted match row-reverifies; candidates are a superset") {
    assume(scaleDir.isDefined, "GRAFT_SCALE_SF not set")
    import graft.search.Percolate
    val specs = Seq(
      (1L, Seq("dup", "vector"), false, Option.empty[Double], Option.empty[Double]),
      (2L, Seq("customer", "query", "join"), true, None, None),
      (5L, Seq("scan", "filter"), false, Some(100.0), Some(400.0)),
      (8L, Seq("window", "group", "sort", "hash"), true, None, None)
    ).toDF("query_id", "terms", "conj", "rgt", "rlte")
    val index = Percolate.buildIndex(specs)
    val got = Percolate.percolate(index, docs, "doc_id", "text", "n_chars")
    val cand = Percolate.candidates(index, docs, "doc_id", "text")
    assert(got.count() > 0, "vacuous at scale")
    assert(got.join(cand, Seq("doc_id", "query_id"), "left_anti").isEmpty,
      "verified matches escaped the candidate set at scale")
    // row re-verification: join the emitted pairs back to raw docs+specs
    // and re-evaluate the predicate first-principles
    val bad = got
      .join(docs.select(col("doc_id"),
        split(lower(col("text")), " ").as("_toks"), col("n_chars").cast("double").as("_rv")), Seq("doc_id"))
      .join(specs, Seq("query_id"))
      .filter(!(
        (col("conj") && forall(col("terms"), t => array_contains(col("_toks"), t))) ||
          (!col("conj") && exists(col("terms"), t => array_contains(col("_toks"), t)))
      ) || (col("rgt").isNotNull && !(col("_rv") > col("rgt")))
        || (col("rlte").isNotNull && !(col("_rv") <= col("rlte"))))
      .count()
    assert(bad == 0, s"$bad emitted percolate matches fail first-principles re-verification")
  }
}
