package graft

import graft.operators.{Dedup, MinHashLSH, SimHash}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  // One token differs, at the END so only ONE 3-shingle changes: Jaccard
  // 17/19 ≈ 0.895, where 16-band×8-row LSH recall is ~99.98% per hash
  // draw (the md5 permutation family is FIXED, so this is deterministic —
  // the old mid-string variant sat at J=0.714 / ~68% band recall and
  // passed only by the murmur3 draw's luck).
  private val nearDup = base.replace("upsilon", "upsiloid")
  private val shuffled = base.split(" ").reverse.mkString(" ") // same token set, reversed
  private val unrelated = "one two three four five six seven eight nine ten eleven twelve"

  private def docs = Seq(
    (1L, base),
    (2L, base), // exact dup of 1
    (3L, nearDup), // near dup of 1
    (4L, shuffled), // bag-of-words dup of 1
    (5L, unrelated)
  ).toDF("doc_id", "text")

  test("exactGroups finds the exact duplicate, keeps min id") {
    val groups = Dedup.exactGroups(docs, $"text", $"doc_id").filter($"n_dups" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n_dups") == 2L && groups.head.getAs[Long]("keep_id") == 1L)
  }

  test("fingerprintGroups also catches the reshuffled doc") {
    val groups = Dedup.fingerprintGroups(docs, $"text", $"doc_id").filter($"n_dups" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n_dups") == 3L) // 1, 2, 4
  }

  test("paragraphDedup: corpus-wide keep-first, in-order reassembly, ledger rows for fully-dropped docs") {
    val pA = "a1 a2 a3 a4 a5"; val pB = "b1 b2 b3 b4 b5"
    val pC = "c1 c2 c3 c4 c5"; val pE = "e1 e2 e3 e4 e5"
    val corpus = Seq(
      (1L, s"$pA $pB"),     // both kept (first occurrences)
      (2L, s"$pB $pC"),     // B already seen in doc 1 -> dropped; C kept
      (3L, s"$pA $pB"),     // everything seen -> fully dropped, ledger row stays
      (4L, "d1 d2 d3"),     // trailing partial paragraph is a real paragraph
      (5L, s"$pE $pE")      // within-doc repeat: second copy dropped
    ).toDF("doc_id", "text")
    val out = Dedup
      .paragraphDedup(corpus, "doc_id", "text", paraTokens = 5)
      .collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"), r.getAs[String]("kept_text"))))
      .toMap
    assert(out(1L) == ((2L, 2L, s"$pA $pB")))
    assert(out(2L) == ((2L, 1L, pC)))
    assert(out(3L) == ((2L, 0L, null))) // fully dropped but auditable
    assert(out(4L) == ((1L, 1L, "d1 d2 d3")))
    assert(out(5L) == ((2L, 1L, pE)))
  }

  test("MinHash LSH finds exact and near dups, not unrelated docs") {
    val pairs = MinHashLSH
      .nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((1L, 2L)), s"exact dup missed: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), s"near dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), s"unrelated doc matched: $pairs")
  }

  test("containmentPairs catches quote inclusion that symmetric Jaccard misses") {
    val quote = "alpha beta gamma delta epsilon zeta eta theta" // a prefix of `base`
    val cdocs = Seq((1L, base), (2L, quote), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup
      .containmentPairs(cdocs, "doc_id", "text", n = 3, dfCap = 50, threshold = 0.9)
      .as[(Long, Long, Double, Double)]
      .collect()
      .toSeq
    // the quote's every 3-gram lives in the host → containment 1.0 from
    // the quote side, even though Jaccard is only 6/18
    assert(pairs == Seq((1L, 2L, 0.3333, 1.0)), pairs.toString)
    val jac = Dedup
      .ngramJaccardPairs(cdocs, "doc_id", "text", n = 3, threshold = 0.9)
      .count()
    assert(jac == 0, "Jaccard at the same bar should NOT catch the inclusion")
  }

  test("incremental(corpus, delta) ∪ full(corpus) equals full(corpus ∪ delta) pair-for-pair") {
    // The append-mostly contract on real data: yesterday's artifact +
    // today's delta must reproduce exactly what a full recompute over
    // the union finds — same pairs, same exact-Jaccard scores.
    val all = Tables.documents(spark, Sf)
    val corpus = all.filter($"doc_id" % 7 =!= 3)
    val delta = all.filter($"doc_id" % 7 === 3)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val fullAll = pairSet(MinHashLSH.nearDupPairs(all, "doc_id", "text", threshold = 0.5))
    val fullCorpus = pairSet(MinHashLSH.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5))
    val idx = MinHashLSH.index(corpus, "doc_id", "text")
    val incr = pairSet(MinHashLSH.incrementalPairs(idx, delta, "doc_id", "text", threshold = 0.5))
    assert(fullCorpus ++ incr == fullAll, {
      val missing = fullAll -- (fullCorpus ++ incr)
      val extra = (fullCorpus ++ incr) -- fullAll
      s"missing=$missing extra=$extra"
    })
    // the delta actually contributed pairs (non-vacuous equivalence)
    assert(incr.nonEmpty, "delta produced no pairs — pick a different split")
    // incremental never re-emits corpus-internal pairs
    assert(incr.forall { case (a, b, _) => a % 7 == 3 || b % 7 == 3 }, incr.toString)
  }

  test("appendIndex folds the delta so the next increment sees it") {
    val all = Tables.documents(spark, Sf)
    val corpus = all.filter($"doc_id" % 7 =!= 3)
    val delta = all.filter($"doc_id" % 7 === 3)
    val folded = MinHashLSH.appendIndex(
      MinHashLSH.index(corpus, "doc_id", "text"),
      MinHashLSH.index(delta, "doc_id", "text")
    )
    val fromScratch = MinHashLSH.index(all, "doc_id", "text")
    assert(
      folded.banded.select("id", "band", "bandHash").as[(Long, Int, String)].collect().toSet ==
        fromScratch.banded.select("id", "band", "bandHash").as[(Long, Int, String)].collect().toSet
    )
  }

  test("MinHash signature sketches Jaccard: identical docs share all minhashes") {
    val sigs = MinHashLSH.signatures(docs, "doc_id", "text", 3, 32).orderBy("id").collect()
    assert(sigs(0).getSeq[Int](1) == sigs(1).getSeq[Int](1))
  }

  test("SimHash: hamming(exact dup)=0, near dup small, unrelated large") {
    val sh = SimHash.simhash64(docs, "doc_id", "text").orderBy("id").collect().map(_.getLong(1))
    assert(sh(0) == sh(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0), sh(2)) <= 16, s"near dup hamming ${ham(sh(0), sh(2))}")
    assert(ham(sh(0), sh(4)) > 16, s"unrelated hamming ${ham(sh(0), sh(4))}")
  }

  test("ngramJaccardPairs verifies exact Jaccard on blocked candidates") {
    val pairs = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.4)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L))) // 1-token change keeps most 3-shingles
    assert(!pairs.contains((1L, 4L))) // reversal destroys shingle order
  }

  test("dupSpanStats counts cross-document spans, not within-document repeats") {
    val corpus = Seq(
      // docs 1 and 2 share the 8-token span "a b c d e f g h"; their tails differ
      (1L, "a b c d e f g h x1 y1 z1 w1 v1 u1 t1"),
      (2L, "a b c d e f g h x2 y2 z2 w2 v2 u2 t2"),
      // doc 3 repeats ITS OWN span twice but shares nothing: dup_frac 0
      (3L, "p q r s t u v w p q r s t u v w"),
      // doc 4: too short for an 8-gram — absent from the output
      (4L, "only three tokens")
    ).toDF("doc_id", "text")
    val got = Dedup
      .dupSpanStats(corpus, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    val byId = got.map(r => r._1 -> r).toMap
    // docs 1/2: 8 distinct spans each, exactly 1 shared
    assert(byId(1L)._2 == 8 && byId(1L)._3 == 1 && byId(1L)._4 == 0.125)
    assert(byId(2L)._3 == 1)
    // doc 3: all spans self-repeats only → zero cross-document dups
    assert(byId(3L)._3 == 0 && byId(3L)._4 == 0.0)
  }

  test("exciseDupSpans: keeper retains, others lose covered tokens, overlaps union, full excision → empty") {
    val corpus = Seq(
      (1L, "a b c d e f g h x1 y1"),              // keeper of the shared span
      (2L, "z2 a b c d e f g h y2"),              // loses positions 1-8, keeps the flanks
      (3L, "a b c d e f g h i j"),                // two overlapping shared grams (with doc 4) → union of covers
      (4L, "a b c d e f g h i k"),                // shares [a..h] (keeper 1) and [b..i] (keeper 3)
      (5L, "a b c d e f g h"),                    // exactly the shared span → fully excised
      (6L, "totally unrelated words only here")   // untouched (too short for any shared 8-gram)
    ).toDF("doc_id", "text")
    val got = Dedup
      .exciseDupSpans(corpus, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "a b c d e f g h x1 y1")      // lowest-id keeper keeps everything
    assert(got(2L) == "z2 y2")                      // covered tokens cut, order preserved
    // doc 3 is the keeper of [b..i] but NOT of [a..h] (keeper: doc 1):
    // [a..h]'s cut removes positions 0-7, taking most of [b..i] with it —
    // the conservative bias (never keep two copies) over keeper courtesy.
    assert(got(3L) == "i j")
    // doc 4 loses the union of both grams' covers (positions 0-8) → "k"
    assert(got(4L) == "k")
    assert(got(5L) == "")                           // fully excised, still present
    assert(got(6L) == "totally unrelated words only here")
    // the span survives in exactly its keeper document
    assert(got.values.count(_.contains("a b c d e f g h")) == 1)
  }

  test("suffix filtering is lossless: identical pairs AND scores with it off") {
    // Run on the real corpus (sf0.001 documents), not the toy frame —
    // the suffix bound only engages when pairs share several prefix
    // shingles, which needs realistic doc lengths.
    val corpus = Tables.documents(spark, Sf)
    def run(sf: Boolean) = Dedup
      .ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.4, suffixFilter = sf)
      .as[(Long, Long, Double)]
      .collect()
      .toSet
    val withFilter = run(true)
    val without = run(false)
    assert(withFilter == without, s"suffix filter changed results: ${withFilter diff without} / ${without diff withFilter}")
    assert(withFilter.nonEmpty || Sf.contains("0.001"), "expected some pairs on real data")
  }

  test("blocking parameters scale with the corpus: auto cluster count and auto signature width") {
    import graft.operators.Similarity
    // SemDeDup cluster count: 16 at the gate SFs (results unchanged),
    // grows linearly past targetCell×16/nAssign so per-cell pair volume
    // stays ~n·targetCell — the 100× candidate/spill blow-up guard.
    assert(Similarity.semanticAutoLists(200) == 16)
    assert(Similarity.semanticAutoLists(2000) == 16)
    assert(Similarity.semanticAutoLists(200000) == 1563)
    assert(Similarity.semanticAutoLists(2000000) == 15625)
    // auto == the old fixed default at the spec fixture size, so the
    // replica recall contract is measuring the same operator
    val emb = (0L until 40L).map(i => (i, Array.tabulate(4)(d => ((i % 8) * 3 + d).toFloat))).toDF("id", "v")
    val auto = Similarity.semanticNearDupPairs(emb, "id", "v", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val fixed = Similarity.semanticNearDupPairs(emb, "id", "v", threshold = 0.9, nLists = 16)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == fixed)
    // embedding-LSH signature width: occupancy-constant bits — 6 at the
    // 2k gate corpus (the dedup_embedding operating point), 13 at 200k
    assert(Similarity.embeddingAutoBits(2000) == 6)
    assert(Similarity.embeddingAutoBits(200000) == 13)
    assert(Similarity.embeddingAutoBits(10) == 4, "floor at 4 bits")
  }

  test("ScaleData mutate mode holds text dup density constant: per-replica truth composes, zero cross-replica pairs") {
    // The constant-density invariant the 10×/100× dedup bench evidence
    // rests on: the mutated N-copy corpus's TRUE pair set (exact
    // 3-shingle Jaccard ≥ t) must be exactly the per-replica shifted
    // union of the base corpus's true pair set — within-replica Jaccard
    // values bit-identical (the token map is injective), cross-replica
    // pairs suppressed to ~0.008 Jaccard.
    val t = 0.5
    val baseDocs = Tables.documents(spark, Sf)
    val stride = baseDocs.agg(max($"doc_id")).as[Long].head() + 1
    val copies = 3
    val mutated = (0 until copies)
      .map(i => ScaleData.mutateDocuments(baseDocs.withColumn("doc_id", $"doc_id" + lit(stride * i)), "text", i))
      .reduce(_ unionByName _)

    def truthPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val sh = MinHashLSH.shingles(df, "doc_id", "text", 3)
      sh.select($"id".as("a"), $"shingles".as("sa"))
        .crossJoin(sh.select($"id".as("b"), $"shingles".as("sb")))
        .filter($"a" < $"b")
        .filter(round(Dedup.jaccardUdf($"sa", $"sb"), 4) >= t)
        .select("a", "b").as[(Long, Long)].collect().toSet
    }
    val baseTruth = truthPairs(baseDocs)
    assert(baseTruth.nonEmpty, "vacuous: base corpus has no near-dup pairs")
    val scaledTruth = truthPairs(mutated)
    val composed = (0 until copies).flatMap { i =>
      baseTruth.map { case (a, b) => (a + stride * i, b + stride * i) }
    }.toSet
    // density constant: the scaled truth IS the composed truth — every
    // planted pair survives mutation in every replica (injectivity) and
    // no cross-replica pair reaches the threshold (suppression)
    assert(scaledTruth == composed,
      s"extra=${scaledTruth.diff(composed).take(5)} missing=${composed.diff(scaledTruth).take(5)}")

    // within-replica Jaccard is BIT-identical, not merely threshold-stable
    val sh0 = MinHashLSH.shingles(baseDocs, "doc_id", "text", 3)
    val sh1 = MinHashLSH.shingles(
      ScaleData.mutateDocuments(baseDocs, "text", 1), "doc_id", "text", 3)
    val basePairsDf = baseTruth.toSeq.toDF("a", "b")
    def jmap(sh: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      basePairsDf
        .join(sh.select($"id".as("a"), $"shingles".as("sa")), Seq("a"))
        .join(sh.select($"id".as("b"), $"shingles".as("sb")), Seq("b"))
        .select($"a", $"b", Dedup.jaccardUdf($"sa", $"sb").as("j"))
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val j0 = jmap(sh0)
    val j1 = jmap(sh1)
    baseTruth.foreach(p => assert(j0(p) == j1(p), s"Jaccard drifted under mutation for $p: ${j0(p)} vs ${j1(p)}"))
  }

  test("ScaleData mutate mode on embeddings: orthogonal map preserves within-replica cosines; cross-replica tail is the natural iid rate") {
    import graft.functions.VectorFns
    val emb = Tables.embeddings(spark, Sf)
    val dim = emb.select(size($"embedding")).as[Int].head()
    val m1 = ScaleData.mutateEmbeddings(emb, "embedding", 1, dim)
    // orthogonality: every pairwise cosine preserved (fp reassociation
    // only — the permutation reorders the dot-product sum)
    val l0 = emb.select($"vec_id".as("a"), $"embedding".as("va"))
    val r0 = emb.select($"vec_id".as("b"), $"embedding".as("vb"))
    val c0 = l0.crossJoin(r0).filter($"a" < $"b")
      .select($"a", $"b", VectorFns.cosine($"va", $"vb").as("c"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val l1 = m1.select($"vec_id".as("a"), $"embedding".as("va"))
    val r1 = m1.select($"vec_id".as("b"), $"embedding".as("vb"))
    val c1 = l1.crossJoin(r1).filter($"a" < $"b")
      .select($"a", $"b", VectorFns.cosine($"va", $"vb").as("c"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    c0.foreach { case (p, c) => assert(math.abs(c1(p) - c) < 1e-5, s"cosine drifted for $p: $c vs ${c1(p)}") }
    // cross-replica: the scramble must behave like a FRESH iid draw —
    // per-pair rate at the 0.35 threshold within a loose band of the
    // base corpus's own rate (NOT the ×(N−1) exact-copy inflation,
    // and NOT zero: constant density is unattainable for low-dim
    // embeddings; see ScaleData's doc)
    val t = 0.35
    val baseRate = c0.values.count(_ >= t).toDouble / c0.size
    val cross = l0.crossJoin(r1.select($"b", $"vb"))
      .select(VectorFns.cosine($"va", $"vb").as("c")).as[Double].collect()
    val crossRate = cross.count(_ >= t).toDouble / cross.length
    info(f"embedding tail rates: base=$baseRate%.5f cross-replica=$crossRate%.5f")
    assert(crossRate < math.max(4 * baseRate, 0.02), s"cross-replica tail $crossRate far above natural rate $baseRate")
    // and the exact-copy pathology is gone: no cos≈1.0 identity pairs
    val sameId = l0.join(m1.select($"vec_id".as("a"), $"embedding".as("vm")), Seq("a"))
      .select(VectorFns.cosine($"va", $"vm").as("c")).as[Double].collect()
    assert(sameId.forall(_ < 0.95), s"identity pair survived the scramble: max=${sameId.max}")
  }
}
