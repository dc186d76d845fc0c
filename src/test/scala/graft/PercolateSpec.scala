package graft

import graft.search.{IndexMapping, JsonDsl, Percolate}
import org.apache.spark.sql.functions._

/** The percolator index tier's three contracts:
  *   1. candidates ⊇ matches (conservative selection, by data not just
  *      by construction);
  *   2. verified matches ≡ the COMPILED tier ([[JsonDsl.percolate]])
  *      run on the same registry rendered as JSON bodies — row-for-row;
  *   3. the 10⁵ bound: a 100 000-query registry percolates in one
  *      five-operator plan whose work is candidate-bound (the compiled
  *      tier's when-array would need a 100 000-branch expression tree —
  *      it cannot reach this registry size), and its matches still equal
  *      the flat evaluation of the live subset.
  */
class PercolateSpec extends SparkSpec {
  import spark.implicits._

  private val textMapping = IndexMapping(Map("text" -> "text"))

  private def registry = Seq(
    (1L, Seq("dup", "vector"), false, Option.empty[Double], Option.empty[Double]),
    (2L, Seq("customer", "query", "join"), true, None, None),
    (3L, Seq("spark"), false, Some(300.0), None),
    (4L, Seq("merge", "batch"), true, None, Some(250.0)),
    (5L, Seq("scan", "filter"), false, Some(100.0), Some(400.0)),
    (6L, Seq("dup"), true, None, None),
    (7L, Seq("the", "a"), false, None, None),
    (8L, Seq("window", "group", "sort", "hash"), true, None, None)
  )

  private def specsDf = registry.toDF("query_id", "terms", "conj", "rgt", "rlte")

  test("candidates are a superset of matches; AND anchors are genuinely conservative") {
    val docs = Tables.documents(spark, Sf)
    val index = Percolate.buildIndex(specsDf)
    val cand = Percolate.candidates(index, docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val got = Percolate.percolate(index, docs, "doc_id", "text", "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(got.nonEmpty, "vacuous: no matches at test scale")
    assert(got.subsetOf(cand), s"verified matches escaped the candidate set: ${(got -- cand).take(5)}")
    // the 4-term AND query (id 8) must have candidates its verifier
    // rejects — otherwise the superset assertion is vacuous for the
    // anchor-posted family.
    assert(
      cand.count(_._2 == 8L) > got.count(_._2 == 8L),
      "AND anchor candidacy never over-selected — the conservative-superset leg is untested"
    )
  }

  test("indexed tier ≡ compiled tier on the same registry (rendered JSON bodies)") {
    val docs = Tables.documents(spark, Sf)
    val bodies = registry.map { case (id, terms, conj, rgt, rlte) =>
      id -> Percolate.asJsonBody(terms, conj, rgt, rlte, "text", "n_chars")
    }
    val flat = JsonDsl.percolate(docs, bodies, textMapping)
      .select(col("doc_id"), col("query_id"))
      .as[(Long, Long)].collect().toSet
    val indexed = Percolate
      .percolate(Percolate.buildIndex(specsDf), docs, "doc_id", "text", "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(indexed == flat,
      s"tiers diverge: indexed-only=${(indexed -- flat).take(5)}, flat-only=${(flat -- indexed).take(5)}")
  }

  test("term-less stored queries are refused at build time") {
    val bad = Seq((9L, Seq.empty[String], false, Option.empty[Double], Option.empty[Double]))
      .toDF("query_id", "terms", "conj", "rgt", "rlte")
    intercept[IllegalArgumentException] { Percolate.buildIndex(bad) }
  }

  test("NULL terms arrays are refused too (size(NULL) never === 0 must not slip the guard)") {
    val bad = Seq((9L, Option.empty[Seq[String]], false, Option.empty[Double], Option.empty[Double]))
      .toDF("query_id", "terms", "conj", "rgt", "rlte")
    intercept[IllegalArgumentException] { Percolate.buildIndex(bad) }
  }

  test("AND verification ignores empty/null tokens — tier equivalence on a dirty registry") {
    val docs = Tables.documents(spark, Sf)
    // "" inside an AND term list: posting filters it out; verification
    // must check the SAME filtered set, or the indexed tier can never
    // match what the compiled tier matches.
    val dirty = Seq((1L, Seq("dup", "", "vector"), true, Option.empty[Double], Option.empty[Double]))
      .toDF("query_id", "terms", "conj", "rgt", "rlte")
    val indexed = Percolate.percolate(Percolate.buildIndex(dirty), docs, "doc_id", "text", "n_chars")
      .as[(Long, Long)].collect().toSet
    val clean = Seq((1L, Seq("dup", "vector"), true, Option.empty[Double], Option.empty[Double]))
      .toDF("query_id", "terms", "conj", "rgt", "rlte")
    val want = Percolate.percolate(Percolate.buildIndex(clean), docs, "doc_id", "text", "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "vacuous: the clean AND query matches nothing at test scale")
    assert(indexed == want, "a stray empty token changed AND-match results")
  }

  // ── RICH tier: bool.must of multi-field / operator:and / phrase ──

  private val richMapping = IndexMapping(Map("text" -> "text", "source" -> "text"))

  private def richRegistry: Seq[(Long, Seq[(String, String, Seq[String])], Option[Double], Option[Double])] = Seq(
    (1L, Seq(("text", "phrase", Seq("fast", "sort"))), None, None),
    (2L, Seq(("text", "or", Seq("dup", "vector")), ("text", "and", Seq("merge", "batch"))), None, None),
    (3L, Seq(("text", "or", Seq("spark")), ("source", "or", Seq("src3", "src5"))), None, None),
    (4L, Seq(("text", "phrase", Seq("table", "value"))), Some(200.0), None),
    (5L, Seq(("text", "and", Seq("scan", "filter")), ("text", "phrase", Seq("the", "line"))), None, None),
    (6L, Seq(("source", "or", Seq("src1"))), None, None),
    (7L, Seq(("text", "phrase", Seq("a", "row", "fast"))), None, None),
    (8L, Seq(("text", "and", Seq("window", "group")), ("source", "or", Seq("src2", "src4", "src6"))), None, Some(400.0)),
    // negation rows (bool.must_not): anchored by their positive clause
    (9L, Seq(("text", "or", Seq("spark")), ("text", "not_or", Seq("vector", "dup"))), None, None),
    (10L, Seq(("text", "and", Seq("table", "row")), ("text", "not_phrase", Seq("fast", "sort"))), None, None),
    (11L, Seq(("source", "or", Seq("src2", "src3")), ("text", "not_and", Seq("merge", "batch"))), None, None)
  )

  private def richSpecsDf =
    richRegistry
      .map { case (id, cls, rgt, rlte) =>
        (id, cls.map { case (f, k, ts) => (f, k, ts) }, rgt, rlte)
      }
      .toDF("query_id", "clauses", "rgt", "rlte")
      .withColumn(
        "clauses",
        expr("transform(clauses, c -> struct(c._1 AS field, c._2 AS kind, c._3 AS terms))")
      )

  test("rich tier: candidates ⊇ matches, with genuinely over-selecting anchors") {
    val docs = Tables.documents(spark, Sf)
    val index = Percolate.buildIndexRich(richSpecsDf)
    val cand = Percolate.candidatesRich(index, docs, "doc_id", Seq("text", "source"))
      .as[(Long, Long)].collect().toSet
    val got = Percolate.percolateRich(index, docs, "doc_id", Seq("text", "source"), "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(got.nonEmpty, "vacuous: no rich matches at test scale")
    assert(got.subsetOf(cand), s"verified matches escaped candidates: ${(got -- cand).take(5)}")
    // phrase anchors select on containment but verify adjacency — the
    // over-selection leg must be non-vacuous for the phrase family
    val phraseIds = Set(1L, 4L, 7L)
    assert(
      phraseIds.exists(q => cand.count(_._2 == q) > got.count(_._2 == q)),
      "no phrase query ever over-selected — the adjacency verifier is untested"
    )
  }

  test("rich tier ≡ compiled tier on rendered bool.must bodies (multi-field + phrase + and)") {
    val docs = Tables.documents(spark, Sf)
    val bodies = richRegistry.map { case (id, cls, rgt, rlte) =>
      id -> Percolate.asJsonBodyRich(cls, rgt, rlte, "n_chars")
    }
    val flat = JsonDsl.percolate(docs, bodies, richMapping)
      .select(col("doc_id"), col("query_id"))
      .as[(Long, Long)].collect().toSet
    val indexed = Percolate
      .percolateRich(Percolate.buildIndexRich(richSpecsDf), docs, "doc_id", Seq("text", "source"), "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(indexed == flat,
      s"rich tiers diverge: indexed-only=${(indexed -- flat).take(5)}, flat-only=${(flat -- indexed).take(5)}")
  }

  test("rich build guards: clause-less, term-less, unknown-kind, dirty-phrase registries refused") {
    def df(rows: Seq[(Long, Seq[(String, String, Seq[String])])]) =
      rows
        .map { case (id, cls) => (id, cls, Option.empty[Double], Option.empty[Double]) }
        .toDF("query_id", "clauses", "rgt", "rlte")
        .withColumn(
          "clauses",
          expr("transform(clauses, c -> struct(c._1 AS field, c._2 AS kind, c._3 AS terms))")
        )
    intercept[IllegalArgumentException] {
      Percolate.buildIndexRich(df(Seq((1L, Seq.empty))))
    }
    intercept[IllegalArgumentException] {
      Percolate.buildIndexRich(df(Seq((1L, Seq(("text", "or", Seq("", "")))))))
    }
    intercept[IllegalArgumentException] {
      Percolate.buildIndexRich(df(Seq((1L, Seq(("text", "fuzzy", Seq("dup")))))))
    }
    intercept[IllegalArgumentException] {
      Percolate.buildIndexRich(df(Seq((1L, Seq(("text", "phrase", Seq("fast", "", "sort")))))))
    }
    // a query with ONLY negative clauses has nothing to anchor candidacy
    intercept[IllegalArgumentException] {
      Percolate.buildIndexRich(df(Seq((1L, Seq(("text", "not_or", Seq("spark")))))))
    }
  }

  test("rich 10^5 stored queries: candidate-bound, live slice ≡ fixture matches") {
    val live = (0 until 1000).map { i =>
      val (_, cls, rgt, rlte) = richRegistry(i % richRegistry.size)
      (100000L + i, cls, rgt, rlte)
    }
    val dormant = (0 until 99000).map { i =>
      (200000L + i,
        Seq(("text", "phrase", Seq(s"rule_token_$i", "nonexistent_term")),
          ("source", "or", Seq(s"no_such_source_$i"))),
        Option.empty[Double], Option.empty[Double])
    }
    val specs = (live ++ dormant)
      .toDF("query_id", "clauses", "rgt", "rlte")
      .withColumn(
        "clauses",
        expr("transform(clauses, c -> struct(c._1 AS field, c._2 AS kind, c._3 AS terms))")
      )
    val docs = Tables.documents(spark, Sf)
    val t0 = System.nanoTime()
    val index = Percolate.buildIndexRich(specs)
    val got = Percolate.percolateRich(index, docs, "doc_id", Seq("text", "source"), "n_chars")
      .as[(Long, Long)].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"rich 10^5-query percolate: ${got.length} matches in $secs%.2f s")
    assert(got.forall(_._2 < 200000L), "a dormant rich rule matched")
    val gotBase = got.map { case (d, q) => (d, richRegistry(((q - 100000L) % richRegistry.size).toInt)._1) }.toSet
    val want = Percolate
      .percolateRich(Percolate.buildIndexRich(richSpecsDf), docs, "doc_id", Seq("text", "source"), "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(gotBase == want, "rich live-slice matches diverge from the fixture registry's")
  }

  test("JSON registry compiles to the rich index tier: same results as the hand-built rows") {
    val docs = Tables.documents(spark, Sf)
    // round-trip through the WIRE form: render each fixture row as the
    // JSON body a user would store, compile it back, percolate — must
    // equal the hand-built registry row-for-row. (asJsonBodyRich renders
    // 'and' clauses as must-of-single-term matches; the compiler reads
    // those as single-term clauses — semantically identical, and the
    // equality here proves it by data.)
    val bodies = richRegistry.map { case (id, cls, rgt, rlte) =>
      id -> Percolate.asJsonBodyRich(cls, rgt, rlte, "n_chars")
    }
    val compiled = Percolate.compileJsonRegistry(spark, bodies, Seq("text", "source"), "n_chars")
    val got = Percolate
      .percolateRich(Percolate.buildIndexRich(compiled), docs, "doc_id", Seq("text", "source"), "n_chars")
      .as[(Long, Long)].collect().toSet
    val want = Percolate
      .percolateRich(Percolate.buildIndexRich(richSpecsDf), docs, "doc_id", Seq("text", "source"), "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty && got == want,
      s"compiled-registry percolate diverges: got-only=${(got -- want).take(5)}, want-only=${(want -- got).take(5)}")
  }

  test("should/msm=1 and multi-range rules: indexed tier ≡ compiled tier (r16 widening)") {
    val docs = Tables.documents(spark, Sf)
    val bodies: Seq[(Long, String)] = Seq(
      // should-only (msm defaults to 1): OR candidacy IS the predicate
      1L -> """{"query": {"bool": {"should": [{"match": {"text": "dup vector"}}, {"match": {"source": "web"}}]}}}""",
      // must + should with explicit msm=1, mixed should kinds
      2L -> ("""{"query": {"bool": {"must": [{"match": {"text": "the"}}], """ +
        """"should": [{"match_phrase": {"text": "dup dup"}}, {"match": {"text": {"query": "spark sort", "operator": "and"}}}], """ +
        """"minimum_should_match": 1}}}"""),
      // must + should WITHOUT msm (scoring-only upstream): must-only match set
      3L -> """{"query": {"bool": {"must": [{"match": {"text": "dup"}}], "should": [{"match": {"text": "zz_nonexistent_zz"}}]}}}""",
      // multi-range conjuncts fold to (max gt, min lte)
      4L -> ("""{"query": {"bool": {"must": [{"match": {"text": "dup"}}], """ +
        """"filter": [{"range": {"n_chars": {"gt": 100}}}, {"range": {"n_chars": {"lte": 400}}}, {"range": {"n_chars": {"gt": 50}}}]}}}"""),
      // should-only + multi-range: msm stays 0 by the filter-context rule
      // upstream → shoulds compile away → must-less → refused; so pin a
      // should-only msm=1 EXPLICIT with ranges instead
      5L -> ("""{"query": {"bool": {"should": [{"match": {"text": "vector"}}, {"match": {"source": "curated"}}], """ +
        """"minimum_should_match": 1, "filter": [{"range": {"n_chars": {"gt": 150}}}, {"range": {"n_chars": {"lte": 500}}}]}}}""")
    )
    val compiledRegistry = Percolate.compileJsonRegistry(spark, bodies, Seq("text", "source"), "n_chars")
    val indexed = Percolate
      .percolateRich(Percolate.buildIndexRich(compiledRegistry), docs, "doc_id", Seq("text", "source"), "n_chars")
      .as[(Long, Long)].collect().toSet
    val flat = JsonDsl.percolate(docs, bodies, richMapping)
      .select(col("doc_id"), col("query_id"))
      .as[(Long, Long)].collect().toSet
    assert(indexed == flat,
      s"widened tiers diverge: indexed-only=${(indexed -- flat).take(5)}, flat-only=${(flat -- indexed).take(5)}")
    // non-vacuous: every rule family matched something
    Seq(1L, 2L, 3L, 4L, 5L).foreach { q =>
      assert(flat.exists(_._2 == q), s"rule $q matched nothing — fixture is vacuous for it")
    }
  }

  test("JSON registry compiler fail-fasts on non-indexable shapes (no silent degradation)") {
    def compile(body: String) =
      Percolate.compileJsonRegistry(spark, Seq(1L -> body), Seq("text"), "n_chars")
    intercept[IllegalArgumentException] {
      compile("""{"query": {"wildcard": {"text": "sp*rk"}}}""")
    }
    // should-only is INDEXABLE since r16 (msm defaults to 1 there); what
    // stays refused is k-of-n candidacy and dangling msm
    intercept[IllegalArgumentException] {
      compile(
        """{"query": {"bool": {"should": [{"match": {"text": "spark"}}, {"match": {"text": "flink"}}],
          |"minimum_should_match": 2}}}""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      compile("""{"query": {"bool": {"must": [{"match": {"text": "spark"}}], "minimum_should_match": 1}}}""")
    }
    intercept[IllegalArgumentException] {
      compile("""{"query": {"bool": {"must": [{"match": {"text": "spark"}}], "filter": [{"range": {"wrong_col": {"gt": 1}}}]}}}""")
    }
    intercept[IllegalArgumentException] {
      compile("""{"query": {"bool": {"must": [{"match": {"text": "spark"}}], "filter": [{"range": {"n_chars": {"gte": 1}}}]}}}""")
    }
    intercept[IllegalArgumentException] {
      compile("""{"query": {"match": {"not_a_text_field": "spark"}}}""")
    }
  }

  test("rich streaming face: stream-static, zero state, parity with batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = Percolate.buildIndexRich(richSpecsDf)
    val mem = MemoryStream[(Long, String, String, Long)]
    val alerts = graft.streaming.PercolateStream.alertsIndexedRich(
      index, mem.toDF.toDF("doc_id", "text", "source", "n_chars"),
      "doc_id", Seq("text", "source"), "n_chars")
    val q = alerts.writeStream.format("memory").queryName("rich_alerts").outputMode("append").start()
    val docs = Tables.documents(spark, Sf)
    val rows = docs.select("doc_id", "text", "source", "n_chars")
      .as[(Long, String, String, Long)].collect().toSeq
    try {
      mem.addData(rows)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        s"rich streaming percolate grew state: ${q.lastProgress.stateOperators.mkString(",")}")
    } finally q.stop()
    val got = spark.table("rich_alerts").as[(Long, Long)].collect().toSet
    val want = Percolate.percolateRich(index, docs, "doc_id", Seq("text", "source"), "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"rich streamed alerts diverge from batch: ${(got.diff(want) ++ want.diff(got)).take(5)}")
  }

  test("alertsIndexed: a streaming doc side through the index tier ≡ batch, with ZERO state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = Percolate.buildIndex(specsDf)
    val mem = MemoryStream[(Long, String, Long)]
    val alerts = graft.streaming.PercolateStream.alertsIndexed(
      index, mem.toDF.toDF("doc_id", "text", "n_chars"), "doc_id", "text", "n_chars")
    val q = alerts.writeStream.format("memory").queryName("idx_alerts").outputMode("append").start()
    val docs = Tables.documents(spark, Sf)
    val rows = docs.select("doc_id", "text", "n_chars").as[(Long, String, Long)].collect().toSeq
    try {
      mem.addData(rows.take(20))
      q.processAllAvailable()
      mem.addData(rows.drop(20))
      q.processAllAvailable()
      // stateless by construction: a stream-static join pipeline keeps
      // no state store (the property that lets the alerting tier run
      // append-mode at source parallelism with no watermark)
      assert(q.lastProgress.stateOperators.isEmpty,
        s"indexed streaming percolate grew state: ${q.lastProgress.stateOperators.mkString(",")}")
    } finally q.stop()
    val got = spark.table("idx_alerts").as[(Long, Long)].collect().toSet
    val want = Percolate.percolate(index, docs, "doc_id", "text", "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"streamed alerts diverge from batch percolate: ${(got.diff(want) ++ want.diff(got)).take(5)}")
  }

  test("10^5 stored queries: candidate-bound work, same matches as the live subset") {
    // 99 000 dormant rules (anchor tokens absent from the corpus — the
    // realistic alerting registry where most rules match nothing) +
    // 1 000 live rules cycling the fixture registry. The posting table
    // carries ~10^5 rows; candidates come ONLY from the live slice.
    val live = (0 until 1000).map { i =>
      val (_, terms, conj, rgt, rlte) = registry(i % registry.size)
      (100000L + i, terms, conj, rgt, rlte)
    }
    val dormant = (0 until 99000).map { i =>
      (200000L + i, Seq(s"rule_token_$i", "nonexistent_term"), true,
        Option.empty[Double], Option.empty[Double])
    }
    val specs = (live ++ dormant).toDF("query_id", "terms", "conj", "rgt", "rlte")
    val docs = Tables.documents(spark, Sf)
    val t0 = System.nanoTime()
    val index = Percolate.buildIndex(specs)
    val got = Percolate.percolate(index, docs, "doc_id", "text", "n_chars")
      .as[(Long, Long)].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10^5-query percolate: ${got.length} matches in $secs%.2f s")
    // no dormant rule may match; the live slice must reproduce the
    // fixture matches exactly (mod the cycled ids)
    assert(got.forall(_._2 < 200000L), "a dormant (no-corpus-term) rule matched")
    val gotBase = got.map { case (d, q) => (d, registry(((q - 100000L) % registry.size).toInt)._1) }.toSet
    val want = Percolate.percolate(Percolate.buildIndex(specsDf), docs, "doc_id", "text", "n_chars")
      .as[(Long, Long)].collect().toSet
    assert(gotBase == want, "live-slice matches diverge from the fixture registry's")
  }
}
