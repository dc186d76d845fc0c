package graft

import graft.operators.{Components, Contamination, Sampling}
import graft.search.{Aggs, Fuzzy}
import org.apache.spark.sql.functions._

/** Crafted-fixture semantics for the training-pipeline and search-surface
  * operators added in round 2.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: min-label per component, chains converge") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Components
      .connectedComponents(pairs, "a", "b")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))

    // a 6-node chain needs multiple propagation rounds
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Components.connectedComponents(chain, "a", "b").as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L))
    assert(labels.keySet == (1L to 6L).toSet)

    // string ids would break the sum-based convergence test -> fail fast
    intercept[IllegalArgumentException] {
      Components.connectedComponents(Seq(("x", "y")).toDF("a", "b"), "a", "b")
    }
    // ...including a string id on only ONE side (union would widen both)
    intercept[IllegalArgumentException] {
      Components.connectedComponents(Seq((1L, "y")).toDF("a", "b"), "a", "b")
    }
    // a diameter beyond maxIter must refuse (partial labels are wrong)
    intercept[IllegalArgumentException] {
      Components.connectedComponents((1L to 10L).map(i => (i, i + 1)).toDF("a", "b"), "a", "b", maxIter = 3)
    }
  }

  test("clusterTopics: separated clusters get their exclusive terms ranked first; sizes conserve; partition-invariant") {
    // two well-separated embedding groups with cluster-exclusive vocab
    val emb = (0L until 12L)
      .map(i => (i, if (i < 6) Array(1.0f, 0.02f * i) else Array(-1.0f, 0.02f * i)))
      .toDF("vec_id", "embedding")
    val docs = (0L until 12L)
      .map(i => (i, if (i < 6) s"alpha shared filler$i" else s"omega shared filler$i"))
      .toDF("doc_id", "text")
    val out = graft.operators.ClusterTopics
      .clusterTopics(emb, "vec_id", "embedding", docs, "doc_id", "text", k = 2, iters = 3, topTerms = 2)
      .collect()
    // sizes conserve the corpus; exactly k clusters; topTerms bound holds
    val sizes = out.groupBy(_.getAs[Int]("cell")).map { case (c, rs) => c -> rs.head.getAs[Long]("n_docs") }
    assert(sizes.values.sum == 12L && sizes.size == 2)
    assert(out.groupBy(_.getAs[Int]("cell")).forall(_._2.length <= 2))
    // rank-1 term of each cluster is its exclusive token, never 'shared'
    // (shared has df = N so ln(N/df) = 0)
    val rank1 = out.filter(_.getAs[Int]("rank") == 1).map(_.getAs[String]("term")).toSet
    assert(rank1 == Set("alpha", "omega"))
    // partition invariance: same rows at a different parallelism
    val repart = graft.operators.ClusterTopics
      .clusterTopics(emb.repartition(5), "vec_id", "embedding", docs.repartition(3), "doc_id", "text", k = 2, iters = 3, topTerms = 2)
      .collect()
    assert(repart.map(_.toString).sorted.toSeq == out.map(_.toString).sorted.toSeq)
  }

  test("connectedComponents durable-checkpoint path matches the in-memory path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    // Two components + a chain: exercises several propagation rounds so
    // superseded-round cleanup actually runs in both modes.
    val pairs = (1L to 5L).map(i => (i, i + 1)) ++ Seq((10L, 11L), (11L, 12L))
    val df = pairs.toDF("a", "b")
    val local = Components.connectedComponents(df, "a", "b").as[(Long, Long)].collect().toMap
    val durable = Components
      .connectedComponents(df, "a", "b", checkpointDir = Some(dir))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(durable == local)
    // Superseded rounds are deleted — only the final round's parquet (and
    // nothing from the edge materialization) remains under the dir.
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(left.size == 1 && left.head.startsWith("round_"), left.toString)
  }

  test("dateHistogramFilled zero-fills in the metric's own type and needs an alias") {
    val df = Seq(
      ("2024-01-01 10:00:00", 3L),
      ("2024-01-03 11:00:00", 4L) // Jan 2 empty
    ).toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
    val got = Aggs.dateHistogramFilled(df, col("ts"), "day", sum("v").as("total"))
    // a bigint sum stays bigint (no silent widening to double)
    assert(got.schema("total").dataType == org.apache.spark.sql.types.LongType)
    assert(got.as[(java.sql.Timestamp, Long, Long)].collect().map(_._3).toSeq == Seq(3L, 0L, 4L))
    intercept[IllegalArgumentException] {
      Aggs.dateHistogramFilled(df, col("ts"), "day", sum("v")) // no alias
    }
  }

  test("hash split is deterministic, exhaustive, and roughly proportioned") {
    val ids = spark.range(10000).select(col("id"))
    val counts = ids
      .groupBy(Sampling.split(col("id")).as("split"))
      .count()
      .as[(String, Long)]
      .collect()
      .toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 7500) < 300, counts.toString)
    // determinism: re-evaluation assigns identically
    val twice = ids
      .select(Sampling.split(col("id")).as("s1"), Sampling.split(col("id")).as("s2"))
      .filter(col("s1") =!= col("s2"))
      .count()
    assert(twice == 0)
  }

  test("packSequences: concat-and-chunk pack ids, offsets, and boundary spans per shard") {
    val docs = Seq(
      ("s1", 1L, 100L),
      ("s1", 2L, 100L),
      ("s1", 3L, 100L), // starts at 200, ends at 299 → straddles the 256 boundary
      ("s2", 4L, 300L) // own shard: starts pack 0, longer than a whole pack
    ).toDF("source", "doc_id", "n")
    val out = Sampling
      .packSequences(docs, "doc_id", col("n"), Seq("source"), budget = 256)
      .orderBy("doc_id")
      .select("doc_id", "pack_id", "pack_offset", "spans_boundary")
      .as[(Long, Long, Long, Boolean)]
      .collect()
      .toSeq
    assert(
      out == Seq(
        (1L, 0L, 0L, false),
        (2L, 0L, 100L, false),
        (3L, 0L, 200L, true),
        (4L, 0L, 0L, true) // shards pack independently: doc 4 restarts at offset 0
      ),
      out.toString
    )
  }

  test("temperatureMix: smallest source keeps everything; heavier sources thin by (min/mass)^(1-a)") {
    val docs = (0 until 16).map(i => (100L + i, "big", 4L)) ++ (0 until 4).map(i => (200L + i, "small", 4L))
    val df = docs.toDF("doc_id", "source", "n_chars")
    val kept = Sampling
      .temperatureMix(df, "doc_id", "source", col("n_chars"), alpha = 0.5)
      .select("doc_id")
      .as[Long]
      .collect()
      .toSet
    // rate(small) = 1 (the smallest source), rate(big) = (16/64)^0.5 = 0.5
    def frac(id: Long): Double = (id * 2654435761L % 65536L).toDouble / 65536.0
    val expected =
      (200L until 204L).toSet ++ (100L until 116L).filter(frac(_) < 0.5).toSet
    assert(kept == expected, s"kept=$kept expected=$expected")
    assert((200L until 204L).forall(kept), "the smallest source must keep every doc")
    // alpha = 1 is the natural distribution: nothing is dropped
    assert(
      Sampling.temperatureMix(df, "doc_id", "source", col("n_chars"), alpha = 1.0).count() == df.count()
    )
  }

  test("weightedKeep: per-group rates hold, absent groups kept in full") {
    val rows = spark.range(6000).select(
      col("id"),
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c").as("g")
    )
    val kept = rows
      .filter(Sampling.weightedKeep(col("id"), col("g"), Map("a" -> 0.8, "b" -> 0.2)))
      .groupBy("g")
      .count()
      .as[(String, Long)]
      .collect()
      .toMap
    // 2000 per group; md5 is uniform, so ±200 is a generous band
    assert(math.abs(kept("a") - 1600) < 200, kept.toString)
    assert(math.abs(kept("b") - 400) < 200, kept.toString)
    assert(kept("c") == 2000, "group without a rate must be kept in full")
    // membership composes with split: a kept id keeps its split bucket
    assert(rows.filter(Sampling.weightedKeep(col("id"), col("g"), Map("a" -> 0.0))).filter(col("g") === "a").count() == 0)
    intercept[IllegalArgumentException](Sampling.weightedKeep(col("id"), col("g"), Map("a" -> 1.5)))
  }

  test("stratifiedKeep samples ~fraction inside every stratum") {
    val df = spark.range(8000).select(col("id"), (col("id") % 4).as("stratum"))
    val rates = df
      .groupBy("stratum")
      .agg(avg(Sampling.stratifiedKeep(col("id"), 0.25).cast("double")).as("rate"))
      .as[(Long, Double)]
      .collect()
    rates.foreach { case (s, r) => assert(math.abs(r - 0.25) < 0.05, s"stratum $s rate $r") }
    // boundary fractions: 1.0 keeps everything, tiny fractions keep some
    val n = spark.range(1000).filter(Sampling.stratifiedKeep(col("id"), 1.0)).count()
    assert(n == 1000)
    val tiny = spark.range(1000).filter(Sampling.stratifiedKeep(col("id"), 0.999)).count()
    assert(tiny == 1000) // rounds to 256 buckets
  }

  test("sharedNgrams flags only docs overlapping the benchmark") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon y"), // shares 2 distinct 4-grams
      (11L, "completely different words here"),
      (12L, "x alpha beta gamma delta") // shares 1
    ).toDF("doc_id", "text")
    val got = Contamination
      .sharedNgrams(train, bench, "doc_id", "text", 4)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == Map(10L -> 2L, 12L -> 1L))
  }

  test("sharedNgramsBloom is answer-identical to the exact path") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon y"),
      (11L, "completely different words here"),
      (12L, "x alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val exact = Contamination.sharedNgrams(train, bench, "doc_id", "text", 4).as[(Long, Long)].collect().toMap
    val bloom =
      Contamination.sharedNgramsBloom(train, bench, "doc_id", "text", 4).as[(Long, Long)].collect().toMap
    // lossless contract: the bloom prunes, the confirm join restores exactness
    assert(bloom == exact, s"bloom path diverged: $bloom vs $exact")
  }

  test("fuzzyMatch finds tokens within the edit distance, via the vocab") {
    val docs = Seq(
      (1L, "the spark engine"),
      (2L, "a spork is cutlery"),
      (3L, "sparks fly upward"),
      (4L, "nothing relevant"),
      (5L, "sprak typo here")
    ).toDF("doc_id", "text")
    val got = Fuzzy.fuzzyMatch(docs, "doc_id", "text", "spark", 1).as[Long].collect().toSet
    // spark (0), spork (1 sub), sparks (1 ins) — sprak is 2 edits away
    assert(got == Set(1L, 2L, 3L))
    val loose = Fuzzy.fuzzyMatch(docs, "doc_id", "text", "spark", 2).as[Long].collect().toSet
    assert(loose == Set(1L, 2L, 3L, 5L))
  }

  test("collapse keeps exactly the top doc per key with a deterministic tie-break") {
    val df = Seq(
      ("A", 1L, 10.0),
      ("A", 2L, 30.0),
      ("A", 3L, 30.0), // tie on value -> lower key wins
      ("B", 4L, 5.0)
    ).toDF("k", "id", "v")
    val got = Aggs
      .collapse(df, "k", Seq("id", "v"), struct(col("v"), (lit(-1L) * col("id")).as("neg")))
      .as[(String, Long, Double)]
      .collect()
      .toSet
    assert(got == Set(("A", 2L, 30.0), ("B", 4L, 5.0)))
  }

  test("dateHistogramFilled surfaces empty buckets as zeros") {
    val df = Seq(
      ("2024-01-03 10:00:00", 5.0),
      ("2024-01-06 11:00:00", 7.0) // Jan 4 and 5 have no rows
    ).toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
    val got = Aggs
      .dateHistogramFilled(df, col("ts"), "day", round(sum("v"), 2).as("total"))
      .as[(java.sql.Timestamp, Long, Double)]
      .collect()
    assert(got.length == 4)
    assert(got.map(_._2).toSeq == Seq(1L, 0L, 0L, 1L))
    assert(got.map(_._3).toSeq == Seq(5.0, 0.0, 0.0, 7.0))
  }

  test("piiRedact scrubs digit runs and emails") {
    val got = Seq(("call 12345 or mail bob.smith@example.com now", 1L))
      .toDF("t", "id")
      .select(graft.functions.TextFns.piiRedact(col("t")))
      .as[String]
      .head()
    assert(got == "call [PII] or mail [PII] now", got)
  }

  test("sentences: mixed terminators, punctuation runs, unterminated tails, whitespace, degenerate inputs") {
    def seg(t: String): Seq[String] =
      Seq((t, 1L)).toDF("t", "id")
        .select(graft.functions.TextFns.sentences(col("t")).as("s"))
        .as[Seq[String]].head()
    assert(seg("One. Two! Three?") == Seq("One.", "Two!", "Three?"))
    assert(seg("Wait... really?! yes") == Seq("Wait...", "really?!", "yes")) // runs stay attached; tail kept
    assert(seg("   spaced .  out  ") == Seq("spaced .", "out"))              // trimmed
    assert(seg("no terminators at all") == Seq("no terminators at all"))
    assert(seg("...") == Seq.empty)                                          // punctuation-only → nothing
    assert(seg("") == Seq.empty)
  }

  test("epochsUpsample: floor copies + deterministic partial epoch, contiguous ordinals, exclusion") {
    val docs = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    val out = graft.operators.Sampling
      .epochsUpsample(docs, col("id"), col("src"), Map("a" -> 2.25, "b" -> 0.5))
      .as[(Long, String, Long)].collect().toSeq

    // per-doc copy counts: source a gets 2 or 3, source b gets 0 or 1;
    // epoch ordinals are contiguous from 0
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      val src = rows.head._2
      val epochs = rows.map(_._3).sorted
      assert(epochs == (0L until epochs.size).toSeq, s"doc $id ordinals: $epochs")
      if (src == "a") assert(epochs.size == 2 || epochs.size == 3, s"doc $id: ${epochs.size}")
      else assert(epochs.size == 1, s"doc $id: ${epochs.size}") // 0-copy docs don't appear
    }
    // the partial epochs hit ~their fraction (deterministic, not flaky):
    // a's quarter epoch and b's half epoch over 200 docs each
    val aExtra = byDoc.collect { case (_, rows) if rows.head._2 == "a" && rows.size == 3 => 1 }.sum
    val bKept = byDoc.count(_._2.head._2 == "b")
    assert(aExtra >= 30 && aExtra <= 70, s"a partial-epoch kept $aExtra of 200 (expect ~50)")
    assert(bKept >= 75 && bKept <= 125, s"b kept $bKept of 200 (expect ~100)")
    // total output volume = sum of epoch factors times source sizes, within the same bounds
    assert(out.size == 200 * 2 + aExtra + bKept)
    // a source absent from the map contributes nothing
    val excl = graft.operators.Sampling
      .epochsUpsample(docs, col("id"), col("src"), Map("a" -> 1.0))
      .as[(Long, String, Long)].collect().toSeq
    assert(excl.size == 200 && excl.forall(_._2 == "a"))
    // determinism: re-running yields the identical multiset
    val again = graft.operators.Sampling
      .epochsUpsample(docs, col("id"), col("src"), Map("a" -> 2.25, "b" -> 0.5))
      .as[(Long, String, Long)].collect().toSeq
    assert(again.sorted == out.sorted)
  }
}
