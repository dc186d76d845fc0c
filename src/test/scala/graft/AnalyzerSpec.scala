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

  test("chain lockstep property: random ordered filter chains, SQL analyzeWith ≡ JVM normalizeAll") {
    import graft.search.TokenFilter
    // The index/query symmetry every match depends on, across ARBITRARY
    // declared chains (any count, any order, any parameters) — not just
    // the hand-picked fixtures: the SQL column pipeline and the JVM
    // query-term twin must emit identical token streams.
    val rng = new scala.util.Random(7)
    val vocabulary = Seq(
      "the", "a", "Tables", "queries", "spark", "SCANS", "fast",
      "parts", "cities", "bus", "x", "glass", "goes", "trees"
    )
    def randChain(): Seq[TokenFilter] = Seq.fill(rng.nextInt(4)) {
      rng.nextInt(3) match {
        case 0 =>
          TokenFilter.Stop(
            Seq.fill(1 + rng.nextInt(3))(vocabulary(rng.nextInt(vocabulary.length)).toLowerCase).distinct
          )
        case 1 => TokenFilter.SStem
        case 2 =>
          val mn = 1 + rng.nextInt(2)
          TokenFilter.EdgeNgram(mn, mn + rng.nextInt(5))
      }
    }
    for (trial <- 1 to 50) {
      val a = Analyzer(s"rand$trial", randChain())
      val docs =
        (1 to 8).map(_ => Seq.fill(1 + rng.nextInt(8))(vocabulary(rng.nextInt(vocabulary.length))).mkString(" "))
      val got = docs.toDF("text").select(SearchDsl.analyzeWith(col("text"), a).as("toks")).as[Seq[String]].collect().toSeq
      val want = docs.map(d => a.normalizeTerms(d.split(" ").toSeq))
      assert(got == want, s"chain ${a.filters} drift on $docs: got=$got want=$want")
    }
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
    // a query of only stopwords analyzes to zero tokens and matches no
    // documents (MatchNoDocsQuery) — the reference's semantics, not a
    // 400-class error
    assert(hits("the") == Set.empty[Long])
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
    // an all-stopword phrase analyzes to zero tokens → matches nothing
    assert(hits("the a") == Set.empty[Long])
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

  test("filter ORDER is honored: stem-before-stop tests stopwords in stemmed form") {
    import graft.search.TokenFilter
    // stopword list holds the STEMMED form 'query': only the chain that
    // stems first can drop the surface forms 'query'/'queries'.
    val stemFirst = Analyzer("stem_first", Seq(TokenFilter.SStem, TokenFilter.Stop(Seq("query"))))
    val stopFirst = Analyzer("stop_first", Seq(TokenFilter.Stop(Seq("query")), TokenFilter.SStem))
    def toks(a: Analyzer, text: String): Seq[String] =
      Seq(text).toDF("t").select(SearchDsl.analyzeWith(col("t"), a).as("tt")).as[Seq[String]].collect().head
    assert(toks(stemFirst, "Queries run fast scans") == Seq("run", "fast", "scan"))
    assert(toks(stopFirst, "Queries run fast scans") == Seq("query", "run", "fast", "scan"))
    // same order sensitivity on the JVM query-term twin
    assert(stemFirst.normalizeTerms(Seq("Queries", "runs")) == Seq("run"))
    assert(stopFirst.normalizeTerms(Seq("Queries", "runs")) == Seq("query", "run"))
    // the wire mapping preserves declared order the same way
    def chainOf(order: String): Analyzer = IndexMapping.fromJson(
      s"""{"settings": {"analysis": {
         |   "filter": {"q_stop": {"type": "stop", "stopwords": ["query"]}},
         |   "analyzer": {"c": {"filter": $order}}}},
         | "mappings": {"properties": {"text": {"type": "text", "analyzer": "c"}}}}""".stripMargin
    ).analyzerFor("text")
    assert(chainOf("""["s_stem", "q_stop"]""").normalizeAll("queries") == Nil)
    assert(chainOf("""["q_stop", "s_stem"]""").normalizeAll("queries") == Seq("query"))
    // positional phrase honors the order too: under stem-first the term
    // 'queries' is a (stemmed) stopword and leaves a positional gap
    val docs = Seq((1L, "fast queries scan"), (2L, "fast big scan"), (3L, "fast scan now")).toDF("doc_id", "text")
    def phraseHits(a: Analyzer, p: String): Set[Long] =
      docs.filter(SearchDsl.matchPhraseWith(col("text"), a, p)).select("doc_id").as[Long].collect().toSet
    // "fast queries scan": stem-first drops 'queries' → fast@0, scan@2 (gap 2)
    assert(phraseHits(stemFirst, "fast queries scan") == Set(1L, 2L))
    // stop-first keeps 'query' as a positional term → only doc 1
    assert(phraseHits(stopFirst, "fast queries scan") == Set(1L))
  }

  test("edge_ngram chain + search_analyzer: indexed prefix tokens match un-expanded query terms") {
    import graft.search.TokenFilter
    val auto = Analyzer("autocomplete", Seq(TokenFilter.EdgeNgram(2, 4)))
    def toks(text: String): Seq[String] =
      Seq(text).toDF("t").select(SearchDsl.analyzeWith(col("t"), auto).as("tt")).as[Seq[String]].collect().head
    // prefixes 2..4 per token; a 1-char token emits nothing
    assert(toks("Spark a run") == Seq("sp", "spa", "spar", "ru", "run"))
    // JVM twin agrees
    assert(auto.normalizeAll("spark") == Seq("sp", "spa", "spar"))
    assert(auto.normalizeAll("a") == Nil)
    // wire: index-analyzer expands, search_analyzer keeps the typed prefix
    val body =
      """{"settings": {"analysis": {
        |   "filter": {"auto_edge": {"type": "edge_ngram", "min_gram": 2, "max_gram": 4}},
        |   "analyzer": {"autocomplete": {"filter": ["lowercase", "auto_edge"]}}}},
        | "mappings": {"properties": {
        |   "doc_id": {"type": "long"},
        |   "text":   {"type": "text", "analyzer": "autocomplete", "search_analyzer": "standard"}
        |}}}""".stripMargin
    val m = IndexMapping.fromJson(body)
    assert(m.analyzerFor("text").filters == Seq(TokenFilter.EdgeNgram(2, 4)))
    assert(m.searchAnalyzerFor("text") == Analyzer.standard)
    val docs = Seq((1L, "sparse vector scan"), (2L, "spark planner"), (3L, "dense rows")).toDF("doc_id", "text")
    def wireHits(q: String): Seq[Long] = JsonDsl.parse(
      docs,
      s"""{"query": {"match": {"text": "$q"}}, "sort": [{"doc_id": "asc"}], "_source": ["doc_id"]}""",
      m
    ).as[Long].collect().toSeq
    // the typed prefix "spa" (3 chars) matches BOTH spar(se) and spar(k)
    assert(wireHits("spa") == Seq(1L, 2L))
    assert(wireHits("spar") == Seq(1L, 2L))
    // 5-char query exceeds max_gram → no indexed token (the documented
    // edge_ngram truncation behavior at query time with a standard
    // search_analyzer)
    assert(wireHits("spark") == Seq.empty)
    // search_analyzer requires an index analyzer
    intercept[IllegalArgumentException](IndexMapping.fromJson(
      """{"mappings": {"properties": {"text": {"type": "text", "search_analyzer": "standard"}}}}"""))
    // phrase under an edge_ngram chain has no positional meaning → 400-class
    intercept[IllegalArgumentException](
      docs.filter(SearchDsl.matchPhraseWith(col("text"), auto, "spa sca")).count())
  }
}
