package graft

import graft.search.{Analyzer, IndexMapping, JsonDsl, SearchDsl}
import org.apache.spark.sql.functions._

/** The configurable analyzer chain: the SQL column rules
  * (SearchDsl.analyzeWith / sStem) and the JVM query-term twin
  * (Analyzer.normalizeTerm / sStem) must agree token for token — the
  * symmetry every stemmed match depends on.
  */
class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  test("S-stemmer: SQL column rules equal the JVM twin over a rule-covering vocabulary") {
    val words = Seq(
      // rule 1: -ies → -y (with the eies/aies exceptions)
      "queries", "cities", "flies", "ties", "movies", "eies_xeies", "aies_xaies",
      // rule 2: -es → -e (with aes/ees/oes exceptions)
      "tables", "caches", "phrases", "types", "goes", "trees", "aes", "shoes",
      // rule 3: -s → ∅ (with us/ss exceptions)
      "scans", "joins", "columns", "rows", "bus", "class", "is", "as",
      // untouched
      "spark", "fast", "query", "table", "s", "es", "ies", ""
    )
    val got = words.toDF("w").select(SearchDsl.sStem(col("w")).as("s")).as[String].collect().toSeq
    val want = words.map(Analyzer.sStem)
    assert(got == want, s"SQL and JVM stemmers diverged: ${words.zip(got).zip(want).filter(p => p._1._2 != p._2)}")
  }

  test("S-stemmer lockstep holds under generated vocabulary (property)") {
    // 400 deterministic pseudo-random tokens biased toward s/es/ies
    // suffixes and the exception tails — the space where the SQL CASE
    // and the JVM twin could drift apart.
    val rng = new scala.util.Random(42)
    val stems = Seq("", "s", "es", "ies", "us", "ss", "aes", "ees", "oes", "eies", "aies")
    val bases = Seq("quer", "tabl", "scan", "x", "cit", "bu", "cla", "go", "tre", "sho", "a", "zz")
    val words = (1 to 400).map { _ =>
      bases(rng.nextInt(bases.length)) + stems(rng.nextInt(stems.length))
    }.distinct
    val got = words.toDF("w").select(SearchDsl.sStem(col("w")).as("s")).as[String].collect().toSeq
    val want = words.map(Analyzer.sStem)
    assert(got == want, s"drift: ${words.zip(got).zip(want).collect { case ((w, g), e) if g != e => (w, g, e) }}")
  }

  test("analyzeWith: stopwords drop, stems apply, standard chain is the base analyze") {
    val a = Analyzer("light_english", stopwords = Seq("the", "a"), stem = true)
    val toks = Seq("The queries run against big tables").toDF("t")
      .select(SearchDsl.analyzeWith(col("t"), a).as("tt")).as[Seq[String]].collect().head
    assert(toks == Seq("query", "run", "against", "big", "table"))
    val std = Seq("The queries").toDF("t")
      .select(SearchDsl.analyzeWith(col("t"), Analyzer.standard).as("tt")).as[Seq[String]].collect().head
    assert(std == Seq("the", "queries"))
  }

  test("stemmed match is symmetric: plural query finds singular corpus and vice versa") {
    val a = Analyzer("light_english", stopwords = Seq("the"), stem = true)
    val docs = Seq(
      (1L, "the query planner"),
      (2L, "many queries arrive"),
      (3L, "unrelated text")
    ).toDF("id", "text")
    def hits(q: String): Set[Long] =
      docs.filter(SearchDsl.matchScoreWith(col("text"), a, q.split(" ").toSeq) > 0)
        .select("id").as[Long].collect().toSet
    assert(hits("queries") == Set(1L, 2L), "plural query must reach both forms")
    assert(hits("query") == Set(1L, 2L), "singular query must reach both forms")
    // a query of only stopwords is a 400-class error, not a silent match-none
    intercept[IllegalArgumentException](hits("the"))
  }

  test("wire match consults the mapping's per-field analyzer; _analyze reflects the chain") {
    val a = Analyzer("light_english", stopwords = Seq("the", "a"), stem = true)
    val mapping = IndexMapping(Map("text" -> "text")).withAnalyzer("text", a)
    val docs = Seq((1L, "fast scan engine"), (2L, "hash join plan"), (3L, "slow sort")).toDF("doc_id", "text")
    val got = JsonDsl.parse(
      docs,
      """{"query": {"match": {"text": "scans joins"}}, "sort": [{"doc_id": "asc"}], "_source": ["doc_id"]}""",
      mapping
    ).as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
    // same body WITHOUT the analyzer: plurals match nothing
    val plain = JsonDsl.parse(
      docs,
      """{"query": {"match": {"text": "scans joins"}}, "sort": [{"doc_id": "asc"}], "_source": ["doc_id"]}""",
      IndexMapping(Map("text" -> "text"))
    ).as[Long].collect().toSeq
    assert(plain.isEmpty)
    // _analyze with the filter chain shows the post-chain token stream
    val stream = JsonDsl.analyzeText(
      spark,
      """{"text": "The Queries against big Tables",
        | "filter": ["lowercase", {"type": "stop", "stopwords": ["the", "a"]}, "s_stem"]}""".stripMargin
    ).as[(Long, String)].collect().toSeq
    assert(stream == Seq((0L, "query"), (1L, "against"), (2L, "big"), (3L, "table")))
    intercept[IllegalArgumentException](
      JsonDsl.analyzeText(spark, """{"text": "x", "filter": ["porter"]}""")
    )
  }

  test("positional phrase under the chain: stop gaps preserved, filler-agnostic, stems apply") {
    val a = Analyzer("light_english", stopwords = Seq("the", "a"), stem = true)
    val docs = Seq(
      (1L, "scan the table the part done"),   // table@2, part@4 → gap 2 ✓
      (2L, "scan table big part done"),       // table@1, part@3 → gap 2 ✓ (filler-agnostic)
      (3L, "scan table part done"),           // adjacent → gap 1 ✗
      (4L, "scan tables a parts done"),       // stems + stop gap 2 ✓
      (5L, "part then table later")           // wrong order ✗
    ).toDF("doc_id", "text")
    def hits(phrase: String): Set[Long] =
      docs.filter(SearchDsl.matchPhraseWith(col("text"), a, phrase)).select("doc_id").as[Long].collect().toSet
    assert(hits("tables the parts") == Set(1L, 2L, 4L))
    // adjacent query phrase (no stopword between) requires gap 1
    assert(hits("table parts") == Set(3L))
    // single kept term degenerates to term presence
    assert(hits("the tables") == Set(1L, 2L, 3L, 4L, 5L))
    // an all-stopword phrase is a 400-class error
    intercept[IllegalArgumentException](hits("the a"))
    // the wire clause consults the mapping's analyzer for match_phrase
    val m = IndexMapping(Map("text" -> "text")).withAnalyzer("text", a)
    val wire = JsonDsl
      .parse(docs, """{"query": {"match_phrase": {"text": "tables the parts"}}, "_source": ["doc_id"]}""", m)
      .as[Long].collect().toSet
    assert(wire == Set(1L, 2L, 4L))
  }

  test("wire mapping declares the chain: settings.analysis named filters + per-field analyzer binding") {
    val body =
      """{"settings": {"analysis": {
        |   "filter": {"my_stop": {"type": "stop", "stopwords": ["the", "a"]}},
        |   "analyzer": {"light_english": {"filter": ["lowercase", "my_stop", "s_stem"]}}}},
        | "mappings": {"properties": {
        |   "doc_id": {"type": "long"},
        |   "text":   {"type": "text", "analyzer": "light_english"},
        |   "tag":    {"type": "keyword"}
        |}}}""".stripMargin
    val m = IndexMapping.fromJson(body)
    assert(m.isText("text") && m.fieldType("tag") == "keyword")
    val a = m.analyzerFor("text")
    assert(a.stem && a.stopwords == Seq("the", "a"))
    assert(m.analyzerFor("tag") == Analyzer.standard, "unbound fields keep the standard chain")
    // the bound chain drives a match end-to-end (plural reaches singular)
    val docs = Seq((1L, "fast scan engine"), (2L, "hash join plan")).toDF("doc_id", "text")
    val got = JsonDsl
      .parse(docs, """{"query": {"match": {"text": "scans"}}, "_source": ["doc_id"]}""", m)
      .as[Long].collect().toSeq
    assert(got == Seq(1L))
    // _analyze with `field` resolves the analyzer from this mapping
    val viaField = JsonDsl
      .analyzeText(spark, """{"field": "text", "text": "The Queries run"}""", m)
      .as[(Long, String)].collect().toSeq
    assert(viaField == Seq((0L, "query"), (1L, "run")))
    // an unbound field analyzes with the standard chain
    val unbound = JsonDsl
      .analyzeText(spark, """{"field": "tag", "text": "The Queries"}""", m)
      .as[(Long, String)].collect().toSeq
    assert(unbound == Seq((0L, "the"), (1L, "queries")))
    // field + explicit chain is ambiguous → 400-class; field without
    // mapping overload likewise
    intercept[IllegalArgumentException](
      JsonDsl.analyzeText(spark, """{"field": "text", "analyzer": "standard", "text": "x"}""", m))
    intercept[IllegalArgumentException](
      JsonDsl.analyzeText(spark, """{"field": "text", "text": "x"}"""))
    // binding an undeclared analyzer or an undeclared filter fails loudly
    intercept[IllegalArgumentException](IndexMapping.fromJson(
      """{"mappings": {"properties": {"text": {"type": "text", "analyzer": "ghost"}}}}"""))
    intercept[IllegalArgumentException](IndexMapping.fromJson(
      """{"settings": {"analysis": {"analyzer": {"x": {"filter": ["ghost_filter"]}}}},
        | "mappings": {"properties": {"text": {"type": "text", "analyzer": "x"}}}}""".stripMargin))
  }
}
