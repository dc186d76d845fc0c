package graft

import graft.search.{Aggs, IndexMapping, JsonDsl, SearchDsl}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The JSON request-body executor vs the structured DSL: every body must
  * compile to the IDENTICAL Catalyst plan (canonicalized optimizedPlan
  * equality — not just equal rows), because JsonDsl is a parser in front
  * of the same combinators, not a second engine.
  */
class JsonDslSpec extends SparkSpec {
  import spark.implicits._

  private val mapping = IndexMapping(Map("text" -> "text", "status" -> "keyword", "amount" -> "double"))

  private def cards = Seq(
    (1L, "ACTIVE", 50.0, "the fast cat runs"),
    (2L, "ACTIVE", 1500.0, "a slow dog sleeps"),
    (3L, "BLOCKED", 900.0, "the fast dog jumps"),
    (4L, "CLOSED", 120.0, "streaming spark jobs"),
    (5L, "ACTIVE", 2000.0, "spark query engine")
  ).toDF("id", "status", "amount", "text")

  private def samePlan(got: DataFrame, want: DataFrame): Unit = {
    val g = got.queryExecution.optimizedPlan.canonicalized
    val w = want.queryExecution.optimizedPlan.canonicalized
    assert(g == w, s"plans differ:\n--- json ---\n$g\n--- structured ---\n$w")
  }

  test("reference Dev Tools body: match + size compiles to the structured plan") {
    val df = cards
    val got = JsonDsl.parse(df, """{"query": {"match": {"status": "ACTIVE"}}, "size": 10}""", mapping)
    samePlan(got, df.filter(col("status") === lit("ACTIVE")).limit(10))
    assert(got.count() == 3)
  }

  test("reference Dev Tools body: range gte") {
    val df = cards
    val got = JsonDsl.parse(df, """{"query": {"range": {"amount": {"gte": 100}}}}""", mapping)
    samePlan(got, df.filter(col("amount") >= lit(100L)))
    assert(got.count() == 4)
  }

  test("match on a text-mapped field is analyzed; on keyword it is exact") {
    val df = cards
    val analyzed = JsonDsl.parse(df, """{"query": {"match": {"text": "spark dog"}}}""", mapping)
    samePlan(analyzed, df.filter(SearchDsl.matchScore(col("text"), Seq("spark", "dog")) > 0))
    assert(analyzed.select("id").as[Long].collect().toSet == Set(2L, 3L, 4L, 5L))
    // exact: the multi-word value matches nothing as a keyword
    val exact = JsonDsl.parse(df, """{"query": {"match": {"status": "ACTIVE BLOCKED"}}}""", mapping)
    assert(exact.count() == 0)
  }

  test("bool with must/filter/must_not/should + minimum_should_match") {
    val df = cards
    val body =
      """{"query": {"bool": {
        |  "must":     {"range": {"amount": {"gt": 100}}},
        |  "must_not": [{"term": {"status": "CLOSED"}}],
        |  "should":   [{"term": {"status": "ACTIVE"}}, {"range": {"amount": {"gte": 1900}}}],
        |  "minimum_should_match": 1
        |}}}""".stripMargin
    val got = JsonDsl.parse(df, body, mapping)
    val want = df.filter(
      SearchDsl.bool(
        must = Seq(col("amount") > lit(100L)),
        mustNot = Seq(col("status") === lit("CLOSED"))
      ) && SearchDsl.minimumShouldMatch(
        Seq(col("status") === lit("ACTIVE"), col("amount") >= lit(1900L)),
        1
      )
    )
    samePlan(got, want)
    assert(got.select("id").as[Long].collect().toSet == Set(2L, 5L))
  }

  test("bare should defaults to minimum_should_match=1; with must it is optional") {
    val df = cards
    val bare = JsonDsl.parse(
      df,
      """{"query": {"bool": {"should": [{"term": {"status": "CLOSED"}}, {"term": {"status": "BLOCKED"}}]}}}""",
      mapping
    )
    assert(bare.select("id").as[Long].collect().toSet == Set(3L, 4L))
    val withMust = JsonDsl.parse(
      df,
      """{"query": {"bool": {"must": [{"range": {"amount": {"lt": 1000}}}], "should": [{"term": {"status": "CLOSED"}}]}}}""",
      mapping
    )
    assert(withMust.select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
  }

  test("terms, exists, wildcard, prefix, match_phrase, query_string clauses") {
    val df = cards
    assert(
      JsonDsl
        .parse(df, """{"query": {"terms": {"status": ["CLOSED", "BLOCKED"]}}}""", mapping)
        .select("id").as[Long].collect().toSet == Set(3L, 4L)
    )
    assert(JsonDsl.parse(df, """{"query": {"exists": {"field": "status"}}}""", mapping).count() == 5)
    assert(
      JsonDsl
        .parse(df, """{"query": {"wildcard": {"status": {"value": "*LO*"}}}}""", mapping)
        .select("id").as[Long].collect().toSet == Set(3L, 4L)
    )
    assert(
      JsonDsl
        .parse(df, """{"query": {"prefix": {"text": "spar"}}}""", mapping)
        .select("id").as[Long].collect().toSet == Set(4L, 5L)
    )
    assert(
      JsonDsl
        .parse(df, """{"query": {"match_phrase": {"text": "fast dog"}}}""", mapping)
        .select("id").as[Long].collect().toSet == Set(3L)
    )
    val qs = JsonDsl.parse(
      df,
      """{"query": {"query_string": {"query": "status:ACTIVE AND amount:[1000 TO *]"}}}""",
      mapping
    )
    assert(qs.select("id").as[Long].collect().toSet == Set(2L, 5L))
  }

  test("terms aggregation compiles to the Aggs.termsAgg plan") {
    val df = cards
    val got = JsonDsl.parse(
      df,
      """{"query": {"range": {"amount": {"gte": 100}}},
        | "aggs": {"by_status": {"terms": {"field": "status", "size": 3}}}}""".stripMargin,
      mapping
    )
    samePlan(got, Aggs.termsAgg(df.filter(col("amount") >= lit(100L)), col("status"), 3))
    assert(got.as[(String, Long)].collect().toSeq == Seq(("ACTIVE", 2L), ("BLOCKED", 1L), ("CLOSED", 1L)))
  }

  test("date_histogram + metric sub-aggregations compile to the Aggs.dateHistogram plan") {
    val df = Seq(
      ("2024-01-03 10:00:00", 5.0),
      ("2024-01-20 11:00:00", 7.0),
      ("2024-03-06 11:00:00", 9.0)
    ).toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
    val got = JsonDsl.parse(
      df,
      """{"aggs": {"monthly": {
        |  "date_histogram": {"field": "ts", "calendar_interval": "month"},
        |  "aggs": {"total": {"sum": {"field": "v"}}, "peak": {"max": {"field": "v"}}}
        |}}}""".stripMargin
    )
    // r8: wire metrics follow the house money convention — sum is an
    // exact-DECIMAL accumulation rounded to 2 (partition-order-proof vs
    // the oracle), other metrics round to their oracle precision.
    samePlan(
      got,
      Aggs.dateHistogram(
        df,
        col("ts"),
        "month",
        Seq(
          round(sum(col("v").cast("decimal(12,2)")).cast("double"), 2).as("total"),
          round(max(col("v")), 2).as("peak")
        )
      )
    )
    assert(got.columns.toSeq == Seq("bucket", "doc_count", "total", "peak"))
    assert(got.as[(java.sql.Timestamp, Long, Double, Double)].collect().map(_._3).toSeq == Seq(12.0, 9.0))
  }

  test("sort, size, _source shape the hits; unsupported elements fail fast") {
    val df = cards
    val got = JsonDsl
      .parse(
        df,
        """{"query": {"match_all": {}},
          | "sort": [{"amount": {"order": "desc"}}], "size": 2, "_source": ["id", "amount"]}""".stripMargin,
        mapping
      )
    assert(got.columns.toSeq == Seq("id", "amount"))
    assert(got.as[(Long, Double)].collect().toSeq == Seq((5L, 2000.0), (2L, 1500.0)))
    intercept[IllegalArgumentException](JsonDsl.parse(df, """{"query": {"fuzzy_like_this": {}}}""", mapping))
    intercept[IllegalArgumentException](JsonDsl.parse(df, """{"highlight": {}}""", mapping))
    intercept[IllegalArgumentException](JsonDsl.parse(df, """{"query": {"range": {"amount": {}}}}""", mapping))
  }

  test("multi_match ORs analyzed text fields with exact keyword fields") {
    val df = cards
    val got = JsonDsl.parse(
      df,
      """{"query": {"multi_match": {"query": "spark", "fields": ["text", "status"]}}}""",
      mapping
    )
    samePlan(
      got,
      df.filter(
        (SearchDsl.matchScore(col("text"), Seq("spark")) > 0) || (col("status") === lit("spark"))
      )
    )
    assert(got.select("id").as[Long].collect().toSet == Set(4L, 5L))
  }

  test("match and multi_match honor operator:and (all terms, not any)") {
    val df = cards
    // match OR (default): any of {fast, dog} → ids 1, 2, 3
    val orGot = JsonDsl.parse(df, """{"query": {"match": {"text": "fast dog"}}}""", mapping)
    assert(orGot.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // match AND: both fast and dog → id 3 only
    val andGot = JsonDsl.parse(
      df, """{"query": {"match": {"text": {"query": "fast dog", "operator": "and"}}}}""", mapping)
    assert(andGot.select("id").as[Long].collect().toSet == Set(3L))
    // multi_match AND applies per field: text must contain BOTH terms
    // (status can't — it's a keyword equality on the whole query string)
    val mmAnd = JsonDsl.parse(
      df,
      """{"query": {"multi_match": {"query": "spark query", "fields": ["text", "status"], "operator": "and"}}}""",
      mapping)
    assert(mmAnd.select("id").as[Long].collect().toSet == Set(5L))
    val mmOr = JsonDsl.parse(
      df,
      """{"query": {"multi_match": {"query": "spark query", "fields": ["text", "status"]}}}""",
      mapping)
    assert(mmOr.select("id").as[Long].collect().toSet == Set(4L, 5L))
  }

  test("match fuzziness: per-token edit distance, AUTO ladder, composes with operator:and") {
    val df = cards
    // "sprak" is distance 2 from "spark" (transposition): fuzziness 2 hits
    val fz2 = JsonDsl.parse(
      df, """{"query": {"match": {"text": {"query": "sprak", "fuzziness": 2}}}}""", mapping)
    assert(fz2.select("id").as[Long].collect().toSet == Set(4L, 5L))
    // fuzziness 1 does not
    val fz1 = JsonDsl.parse(
      df, """{"query": {"match": {"text": {"query": "sprak", "fuzziness": 1}}}}""", mapping)
    assert(fz1.select("id").as[Long].collect().isEmpty)
    // AUTO: "sprak" (5 chars) → distance 1 → no hits; "streaminge" (10) → 2 → hits id 4
    val auto = JsonDsl.parse(
      df, """{"query": {"match": {"text": {"query": "sprak streaminge", "fuzziness": "AUTO"}}}}""", mapping)
    assert(auto.select("id").as[Long].collect().toSet == Set(4L))
    // composes with operator:and — every token must fuzzy-match
    val andFz = JsonDsl.parse(
      df,
      """{"query": {"match": {"text": {"query": "sprak querry", "operator": "and", "fuzziness": 2}}}}""",
      mapping)
    assert(andFz.select("id").as[Long].collect().toSet == Set(5L))
  }

  test("unsupported clause options fail loudly instead of silently degrading") {
    val df = cards
    // minimum_should_match on match — bool.should carries that semantic
    intercept[IllegalArgumentException](JsonDsl.parse(
      df, """{"query": {"match": {"text": {"query": "spark query", "minimum_should_match": 2}}}}""", mapping))
    // slop on match_phrase would silently tighten to adjacency
    intercept[IllegalArgumentException](JsonDsl.parse(
      df, """{"query": {"match_phrase": {"text": {"query": "fast dog", "slop": 2}}}}""", mapping))
    // multi_match types other than best_fields change semantics
    intercept[IllegalArgumentException](JsonDsl.parse(
      df,
      """{"query": {"multi_match": {"query": "spark", "fields": ["text"], "type": "cross_fields"}}}""",
      mapping))
    // time_zone on range would silently shift the bounds
    intercept[IllegalArgumentException](JsonDsl.parse(
      df, """{"query": {"range": {"amount": {"gte": 100, "time_zone": "+01:00"}}}}""", mapping))
    // case_insensitive on term would silently stay case-sensitive
    intercept[IllegalArgumentException](JsonDsl.parse(
      df, """{"query": {"term": {"status": {"value": "active", "case_insensitive": true}}}}""", mapping))
    // regexp flags would silently change the dialect
    intercept[IllegalArgumentException](JsonDsl.parse(
      df, """{"query": {"regexp": {"status": {"value": "ACT.*", "flags": "COMPLEMENT"}}}}""", mapping))
    // boost stays accepted (inert in filter context)
    assert(JsonDsl.parse(
      df, """{"query": {"match": {"text": {"query": "spark", "boost": 2.0}}}}""", mapping)
      .select("id").as[Long].collect().toSet == Set(4L, 5L))
  }

  test("ids selects by the _id column; fuzzy matches within edit distance") {
    val df = cards.withColumnRenamed("id", "_id")
    val byId = JsonDsl.parse(df, """{"query": {"ids": {"values": [2, 4]}}}""", mapping)
    assert(byId.select("_id").as[Long].collect().toSet == Set(2L, 4L))
    val fz = JsonDsl.parse(
      cards,
      """{"query": {"fuzzy": {"text": {"value": "sprk", "fuzziness": 1}}}}""",
      mapping
    )
    // 'sprk' is distance 1 from 'spark' only
    assert(fz.select("id").as[Long].collect().toSet == Set(4L, 5L))
    // keyword field: whole-value edit distance
    val kw = JsonDsl.parse(
      cards,
      """{"query": {"fuzzy": {"status": {"value": "ACTIVO", "fuzziness": 1}}}}""",
      mapping
    )
    assert(kw.select("id").as[Long].collect().toSet == Set(1L, 2L, 5L))
  }

  test("filters agg, terms sub-metrics, and top-level metric aggregations") {
    val df = cards
    val filters = JsonDsl.parse(
      df,
      """{"aggs": {"b": {"filters": {"filters": {
        |  "active": {"term": {"status": "ACTIVE"}},
        |  "big":    {"range": {"amount": {"gte": 1000}}}
        |}}}}}""".stripMargin,
      mapping
    )
    assert(filters.columns.toSeq == Seq("n_total", "active", "big"))
    assert(filters.as[(Long, Long, Long)].head() == ((5L, 3L, 2L)))
    val terms = JsonDsl.parse(
      df,
      """{"aggs": {"by_status": {"terms": {"field": "status", "size": 5},
        |  "aggs": {"avg_amt": {"avg": {"field": "amount"}}}}}}""".stripMargin,
      mapping
    )
    samePlan(
      terms,
      Aggs.termsAggWith(df, col("status"), 5, Seq(round(avg(col("amount")), 6).as("avg_amt")))
    )
    val single = JsonDsl.parse(df, """{"aggs": {"total": {"sum": {"field": "amount"}}}}""", mapping)
    assert(single.columns.toSeq == Seq("total"))
    assert(single.as[Double].head() == 4570.0)
  }

  test("knn query ranks by cosine; top_hits sub-agg uses the bounded-heap operator") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("_id", "embedding")
    val knn = JsonDsl.parse(
      emb,
      """{"query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 2}}},
        | "sort": ["_id"], "_source": ["_id", "_score"]}""".stripMargin,
      mapping
    )
    assert(knn.select("_id").as[Long].collect().toSeq == Seq(1L, 2L))
    val th = JsonDsl.parse(
      cards,
      """{"aggs": {"by_status": {"terms": {"field": "status"},
        |  "aggs": {"top": {"top_hits": {"size": 1, "sort": [{"amount": "desc"}]}}}}}}""".stripMargin,
      mapping
    )
    // one top row per status, ranked by amount; executed by TopKPerKeyExec
    assert(
      th.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      s"expected TopKPerKeyExec in:\n${th.queryExecution.executedPlan}"
    )
    assert(
      th.orderBy("status").select("status", "id").as[(String, Long)].collect().toSeq ==
        Seq(("ACTIVE", 5L), ("BLOCKED", 3L), ("CLOSED", 4L))
    )
  }

  test("must_not keeps docs where the field is NULL (missing field ≠ drop)") {
    val df = Seq((1L, Option("ACTIVE")), (2L, Option.empty[String]), (3L, Option("CLOSED")))
      .toDF("id", "status")
    val got = JsonDsl.parse(df, """{"query": {"bool": {"must_not": {"term": {"status": "CLOSED"}}}}}""", mapping)
    // OpenSearch must_not matches docs where the clause does NOT match —
    // including docs missing the field. Bare NOT under three-valued logic
    // would drop row 2.
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("malformed bodies raise IllegalArgumentException, never raw NPE") {
    val df = cards
    // long-form clause missing its value key
    intercept[IllegalArgumentException](
      JsonDsl.parse(df, """{"query": {"match": {"text": {"operator": "and"}}}}""", mapping)
    )
    // aggregation spec with no type key
    intercept[IllegalArgumentException](
      JsonDsl.parse(df, """{"aggs": {"x": {"aggs": {"y": {"sum": {"field": "amount"}}}}}}""", mapping)
    )
    intercept[IllegalArgumentException](JsonDsl.parse(df, """{"query": {"exists": {}}}""", mapping))
    intercept[IllegalArgumentException](JsonDsl.parse(df, """{"query": {"query_string": {}}}""", mapping))
    intercept[IllegalArgumentException](
      JsonDsl.parse(df, """{"aggs": {"h": {"histogram": {"field": "amount"}}}}""", mapping)
    )
    intercept[IllegalArgumentException](
      JsonDsl.parse(df, """{"aggs": {"m": {"date_histogram": {"calendar_interval": "month"}}}}""", mapping)
    )
    intercept[IllegalArgumentException](JsonDsl.parse(df, """not json at all""", mapping))
  }

  test("msearch folds same-index searches into one conditional-count pass") {
    val docs = cards
    val other = Seq((1L, 10.0), (2L, 500.0)).toDF("id", "value")
    val got = JsonDsl.msearchCounts(
      Map("cards" -> docs, "other" -> other),
      """{}
        |{"query": {"term": {"status": "ACTIVE"}}}
        |{"index": "cards"}
        |{"query": {"range": {"amount": {"gte": 900}}}}
        |{"index": "other"}
        |{"query": {"range": {"value": {"gt": 100}}}}""".stripMargin,
      defaultIndex = "cards",
      mapping
    )
    assert(got.as[(Int, Long)].collect().toSeq == Seq((0, 3L), (1, 3L), (2, 1L)))
    // two distinct indices → exactly two aggregate branches, NOT one scan
    // per search: the three searches share two scans.
    val unions = got.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(unions.size == 2, s"expected 2 aggregate branches, got ${unions.size}")
    // malformed streams fail fast
    intercept[IllegalArgumentException](
      JsonDsl.msearchCounts(Map("cards" -> docs), "{}", "cards", mapping)
    )
    intercept[IllegalArgumentException](
      JsonDsl.msearchCounts(Map("cards" -> docs), "{}\n{\"size\": 3}", "cards", mapping)
    )
  }

  test("search_after compiles to the structured cursor-predicate plan") {
    val got = JsonDsl.parse(
      cards,
      """{"sort": [{"amount": "desc"}, {"id": "desc"}],
        | "search_after": [900, 3],
        | "size": 2,
        | "_source": ["id", "amount"]}""".stripMargin,
      mapping
    )
    val want = cards
      .filter(col("amount") < 900 || (col("amount") === 900 && col("id") < 3))
      .orderBy(col("amount").desc, col("id").desc)
      .limit(2)
      .select("id", "amount")
    samePlan(got, want)
    assert(got.as[(Long, Double)].collect().toSeq == Seq((4L, 120.0), (1L, 50.0)))
    // one value per sort key, enforced
    intercept[IllegalArgumentException](
      JsonDsl.parse(cards, """{"sort": ["id"], "search_after": [1, 2]}""", mapping))
    // search_after without sort has no cursor meaning
    intercept[IllegalArgumentException](
      JsonDsl.parse(cards, """{"search_after": [1]}""", mapping))
  }

  test("highlight emits a snippet column, null where the term is absent") {
    val got = JsonDsl.parse(
      cards,
      """{"query": {"match": {"text": "spark"}},
        | "highlight": {"fields": {"text": {"fragment_size": 12}}},
        | "sort": ["id"],
        | "_source": ["id"]}""".stripMargin,
      mapping
    )
    val rows = got.as[(Long, Option[String])].collect().toSeq
    assert(rows.map(_._1) == Seq(4L, 5L))
    // doc 4: "streaming spark jobs" — window starts 15 back from pos 11 → clamped to 1
    assert(rows.head._2.contains("streaming sp"))
    // doc 5: "spark query engine" — term at pos 1
    assert(rows(1)._2.contains("spark query "))
    // same body against a frame where a doc matches analyzed but the term
    // is not at locate-able case: highlight must be null, not an error
    val mixed = Seq((1L, "Spark is capitalized here spark-free? no"), (2L, "no match")).toDF("id", "text")
    val hl = JsonDsl
      .parse(
        mixed,
        """{"query": {"match": {"text": "spark"}},
          | "highlight": {"fields": {"text": {}}}, "sort": ["id"]}""".stripMargin,
        IndexMapping(Map("text" -> "text"))
      )
    assert(hl.columns.toSeq == Seq("id", "text", "text_highlight"))
    // highlight with no clause on the field fails fast
    intercept[IllegalArgumentException](
      JsonDsl.parse(
        cards,
        """{"query": {"term": {"status": "ACTIVE"}}, "highlight": {"fields": {"text": {}}}}""",
        mapping
      ))
  }

  test("scroll pages equal sorted offset slices; exhaustion fails fast") {
    val body = """{"sort": [{"amount": "desc"}, {"id": "desc"}], "size": 2, "_source": ["id"]}"""
    val sortedIds = cards.orderBy(col("amount").desc, col("id").desc).select("id").as[Long].collect().toSeq
    for (p <- 0 to 2) {
      val got = JsonDsl.scroll(cards, body, mapping, page = p).as[Long].collect().toSeq
      assert(got == sortedIds.slice(2 * p, 2 * p + 2), s"page $p mismatch: $got")
    }
    // page past the end of a drained stream: the empty intermediate page
    // cannot yield a cursor
    intercept[IllegalArgumentException](JsonDsl.scroll(cards, body, mapping, page = 5))
    // scroll requires sort and size
    intercept[IllegalArgumentException](JsonDsl.scroll(cards, """{"size": 2}""", mapping, page = 1))
    intercept[IllegalArgumentException](JsonDsl.scroll(cards, """{"sort": ["id"]}""", mapping, page = 1))
  }

  test("regexp matches the whole keyword value, not a substring") {
    val full = JsonDsl.parse(
      cards, """{"query": {"regexp": {"status": {"value": "ACT.*"}}}, "sort": ["id"], "_source": ["id"]}""", mapping)
    assert(full.as[Long].collect().toSeq == Seq(1L, 2L, 5L))
    // unanchored substring would match ACTIVE; OpenSearch regexp must not
    val sub = JsonDsl.parse(
      cards, """{"query": {"regexp": {"status": {"value": "CTIV"}}}, "sort": ["id"], "_source": ["id"]}""", mapping)
    assert(sub.isEmpty)
  }

  test("terms order, date_range, and top_metrics aggregations") {
    val t = JsonDsl.parse(
      cards,
      """{"aggs": {"by_status": {"terms": {"field": "status", "order": {"mx": "desc"}},
        |          "aggs": {"mx": {"max": {"field": "amount"}}}}}}""".stripMargin,
      mapping
    )
    assert(t.columns.toSeq == Seq("key", "doc_count", "mx"))
    assert(t.as[(String, Long, Double)].collect().map(_._1).toSeq == Seq("ACTIVE", "BLOCKED", "CLOSED"))
    val tm = JsonDsl.parse(
      cards,
      """{"aggs": {"top": {"top_metrics": {"metrics": {"field": "amount"}, "sort": {"id": "desc"}}}}}""",
      mapping
    )
    assert(tm.as[(Double, Long)].collect().toSeq == Seq((2000.0, 5L)))
    // ordering by an undeclared metric fails fast
    intercept[IllegalArgumentException](
      JsonDsl.parse(cards, """{"aggs": {"b": {"terms": {"field": "status", "order": {"nope": "desc"}}}}}""", mapping))
  }

  test("adjacency_matrix, boxplot, MAD, string_stats aggs from the body") {
    val adj = JsonDsl.parse(
      cards,
      """{"aggs": {"x": {"adjacency_matrix": {"filters": {
        |  "act":  {"term": {"status": "ACTIVE"}},
        |  "rich": {"range": {"amount": {"gt": 1000}}}
        |}}}}}""".stripMargin,
      mapping
    )
    samePlan(
      adj,
      Aggs.adjacencyMatrix(cards, Seq("act" -> (col("status") === "ACTIVE"), "rich" -> (col("amount") > 1000)))
    )
    assert(adj.as[(String, Long)].collect().toMap == Map("act" -> 3L, "rich" -> 2L, "act&rich" -> 2L))
    val box = JsonDsl.parse(cards, """{"aggs": {"b": {"boxplot": {"field": "amount"}}}}""", mapping)
    assert(box.columns.toSeq == Seq("min_v", "q1", "q2", "q3", "max_v"))
    assert(box.head().getAs[Double]("q2") == 900.0)
    val mad = JsonDsl.parse(
      cards, """{"aggs": {"m": {"median_absolute_deviation": {"field": "amount"}}}}""", mapping)
    // |x−900| = {850, 600, 0, 780, 1100} → median 780
    assert(mad.head().getAs[Double]("mad") == 780.0)
    val ss = JsonDsl.parse(cards, """{"aggs": {"s": {"string_stats": {"field": "status"}}}}""", mapping)
    assert(ss.head().getAs[Long]("min_length") == 6L)
  }

  test("terms_set clause: analyzed minimum_should_match membership") {
    val got = JsonDsl.parse(
      cards,
      """{"query": {"terms_set": {"text": {
        |   "terms": ["spark", "query", "fast"], "minimum_should_match": 2}}},
        | "sort": ["id"], "_source": ["id"]}""".stripMargin,
      mapping
    )
    // id5 matches spark+query; id1/id3 match fast only; id4 spark only.
    assert(got.as[Long].collect().toSeq == Seq(5L))
    // keyword path: whole-value membership, msm defaults to 1
    val kw = JsonDsl.parse(
      cards,
      """{"query": {"terms_set": {"status": {"terms": ["CLOSED", "BLOCKED"]}}},
        | "sort": ["id"], "_source": ["id"]}""".stripMargin,
      mapping
    )
    assert(kw.as[Long].collect().toSeq == Seq(3L, 4L))
  }

  test("geo_distance / geo_bounding_box clauses filter a struct geo field") {
    val pts = Seq(
      (1L, 10.0, 20.0), // center
      (2L, 12.0, 22.0), // ~320 km away
      (3L, 80.0, 170.0) // antipodes-ish
    ).toDF("id", "lat", "lon").select(col("id"), struct(col("lat"), col("lon")).as("location"))
    val near = JsonDsl.parse(
      pts,
      """{"query": {"geo_distance": {"distance": "1000km", "location": {"lat": 10.0, "lon": 20.0}}},
        | "_source": ["id"]}""".stripMargin
    )
    assert(near.as[Long].collect().toSet == Set(1L, 2L))
    val boxed = JsonDsl.parse(
      pts,
      """{"query": {"geo_bounding_box": {"location": {
        |  "top_left": {"lat": 15.0, "lon": 18.0}, "bottom_right": {"lat": 5.0, "lon": 25.0}}}},
        | "_source": ["id"]}""".stripMargin
    )
    assert(boxed.as[Long].collect().toSet == Set(1L, 2L))
    intercept[IllegalArgumentException](
      JsonDsl.parse(pts, """{"query": {"geo_distance": {"distance": "500mi", "location": {"lat": 0, "lon": 0}}}}""")
    )
  }

  test("t_test aggregation compiles to the structured Aggs.tTest plan") {
    val got = JsonDsl.parse(
      cards,
      """{"aggs": {"cmp": {"t_test": {
        |  "a": {"field": "amount", "filter": {"term": {"status": "ACTIVE"}}},
        |  "b": {"field": "amount", "filter": {"term": {"status": "BLOCKED"}}}}}}}""".stripMargin,
      mapping
    )
    samePlan(got, Aggs.tTest(cards, col("amount"), col("status") === lit("ACTIVE"), col("status") === lit("BLOCKED")))
    assert(got.columns.toSeq == Seq("t_stat", "mean_a", "mean_b") && got.count() == 1)
  }

  test("percolate registry: one doc scan matches every stored body's forward parse") {
    val registry = Seq(
      10L -> """{"query": {"term": {"status": "ACTIVE"}}}""",
      20L -> """{"query": {"range": {"amount": {"gte": 1000}}}}""",
      30L -> """{"query": {"bool": {"must": [{"match": {"text": "spark"}}, {"term": {"status": "ACTIVE"}}]}}}"""
    )
    val got = JsonDsl
      .percolate(cards, registry, mapping)
      .select("id", "query_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val want = registry.flatMap { case (qid, body) =>
      JsonDsl
        .parse(cards, body, mapping)
        .select("id")
        .as[Long]
        .collect()
        .map(_ -> qid)
    }.toSet
    assert(got == want && got.contains((5L, 30L)))
    // the registry compiles into the plan — a single scan of the doc frame
    val scans = JsonDsl
      .percolate(cards, registry, mapping)
      .queryExecution
      .optimizedPlan
      .collect { case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l }
    assert(scans.size == 1, s"expected exactly one doc relation, got ${scans.size}")
    intercept[IllegalArgumentException](JsonDsl.percolate(cards, Seq(1L -> "{nope"), mapping))
    intercept[IllegalArgumentException](JsonDsl.percolate(cards, Seq.empty, mapping))
  }

  test("percolate registry scale bound: 10^4 stored queries compile and execute within the driver ceiling") {
    // Stored queries compile per registry row INTO THE PLAN (one
    // predicate branch each) — fine at dashboard counts; this pins the
    // behavior two orders beyond that. Compile cost rides the DRIVER
    // (json parse + Column tree per row, then one analysis pass over a
    // 10^4-branch projection — Spark's codegen splits oversized
    // projections into multiple methods, so execution stays codegen'd
    // or falls back safely); the doc-frame scan count stays ONE
    // regardless of registry size. Registries far beyond this ceiling
    // belong in a term-indexed pre-filter (registry-as-data), not a
    // bigger plan.
    val n = 10000
    val registry = (1 to n).map { i =>
      i.toLong -> s"""{"query": {"bool": {"must": [
                     |  {"range": {"amount": {"gte": ${i % 500}}}},
                     |  {"term": {"status": "${if (i % 2 == 0) "ACTIVE" else "BLOCKED"}"}}
                     |]}}}""".stripMargin
    }
    val t0 = System.nanoTime()
    val out = JsonDsl.percolate(cards, registry, mapping)
    val compiled = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val matches = out.groupBy("id").count().collect().toSeq
    val executed = (System.nanoTime() - t1) / 1e9
    info(f"percolate 10^4 registry: compile ${compiled}%.1fs, execute ${executed}%.1fs")
    // correctness spot-check: doc amounts are known; count matches for
    // one doc against a driver-side replay of the registry semantics
    val d5 = cards.filter($"id" === 5L).select("amount", "status").as[(Double, String)].head()
    val want5 = registry.count { case (i, _) =>
      d5._1 >= (i % 500) && d5._2 == (if (i % 2 == 0) "ACTIVE" else "BLOCKED")
    }
    val got5 = matches.find(_.getLong(0) == 5L).map(_.getLong(1)).getOrElse(0L)
    assert(got5 == want5, s"doc 5 matched $got5 stored queries, expected $want5")
    // the ceiling: compile+plan+run of the 10^4 registry stays within
    // interactive-driver bounds (generous — the point is to catch a
    // quadratic or codegen-explosion regression, not to race the JIT)
    assert(compiled + executed < 120.0, f"percolate 10^4 took ${compiled + executed}%.1fs")
  }

  test("mapping inference: prose becomes text, codes keyword, temporals date, numerics typed") {
    import java.sql.Timestamp
    val df = Seq(
      (1L, "ACTIVE", "the quick brown fox jumps over lazy dogs daily", 5.0, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "BLOCKED", "a stream of prose words goes here as well", 7.5, Timestamp.valueOf("2024-01-02 00:00:00"))
    ).toDF("id", "status", "body", "amount", "ts")
    val m = IndexMapping.infer(df)
    assert(m.isText("body") && !m.isText("status"))
    assert(m.fieldType("status") == "keyword")
    assert(m.fieldType("ts") == "date")
    assert(m.fieldType("amount") == "double" && m.fieldType("id") == "bigint")
    // the inferred mapping drives the same analyzed-vs-exact compile
    val got = JsonDsl.parse(df, """{"query": {"match": {"body": "prose fox"}}, "_source": ["id"]}""", m)
    assert(got.as[Long].collect().toSet == Set(1L, 2L))
  }

  test("knn.filter applies before scoring: plan-equal to the structured pre-filter top-k") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 2),
      (1L, Array(0.9f, 0.1f), 2),
      (2L, Array(0.95f, 0.05f), 1),
      (3L, Array(-1.0f, 0.0f), 2)
    ).toDF("_id", "embedding", "label")
    val got = JsonDsl.parse(
      emb,
      """{"query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 2,
        |  "filter": {"term": {"label": 2}}}}},
        | "sort": ["_id"], "_source": ["_id", "_score"]}""".stripMargin,
      IndexMapping.empty
    )
    // selection is score-driven (top-k nearest from the filtered
    // subset); the body's explicit sort re-orders the PRESENTATION of
    // those k hits — hence the outer sort after the limit
    val want = emb
      .filter(col("label") === lit(2))
      .withColumn(
        "_score",
        round(graft.functions.VectorFns.cosine(col("embedding"), array(lit(1.0), lit(0.0))), 6)
      )
      .orderBy(col("_score").desc, col("_id"))
      .limit(2)
      .orderBy(col("_id").asc, col("_score").desc)
      .select("_id", "_score")
    samePlan(got, want)
    // pre-filter semantics: the label=1 vector outscores the label=2
    // runner-up but must not appear — and the top k still fills to k
    // from the filtered subset (a post-filter would return it short).
    assert(got.select("_id").as[Long].collect().toSeq == Seq(0L, 1L))
  }

  test("collapse keeps one top hit per group via the bounded-heap operator") {
    val got = JsonDsl.parse(
      cards,
      """{"collapse": {"field": "status"},
        | "sort": [{"amount": "desc"}, {"id": "asc"}],
        | "_source": ["status", "id", "amount"]}""".stripMargin,
      mapping
    )
    assert(
      got.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      s"collapse must run through the bounded heap:\n${got.queryExecution.executedPlan}"
    )
    assert(
      got.as[(String, Long, Double)].collect().toSeq ==
        Seq(("ACTIVE", 5L, 2000.0), ("BLOCKED", 3L, 900.0), ("CLOSED", 4L, 120.0))
    )
    // collapse without a sort is an error (OpenSearch requires one here)
    intercept[IllegalArgumentException](
      JsonDsl.parse(cards, """{"collapse": {"field": "status"}}""", mapping)
    )
  }

  test("span_near: two span_terms within slop, ordered and unordered") {
    val docs = Seq(
      (1L, "big data table scan"), // big..table distance 2, in order
      (2L, "table of big numbers"), // reversed order, distance 2
      (3L, "big giant wide extra table"), // distance 4 > slop
      (4L, "nothing relevant here")
    ).toDF("doc_id", "text")
    def run(inOrder: Boolean): Seq[Long] =
      JsonDsl
        .parse(
          docs,
          s"""{"query": {"span_near": {"clauses": [
             |   {"span_term": {"text": "big"}}, {"span_term": {"text": "table"}}],
             |   "slop": 3, "in_order": $inOrder}},
             | "sort": ["doc_id"], "_source": ["doc_id"]}""".stripMargin,
          mapping
        )
        .as[Long]
        .collect()
        .toSeq
    assert(run(inOrder = true) == Seq(1L))
    assert(run(inOrder = false) == Seq(1L, 2L))
  }

  test("f.keyword resolves to the base column with exact semantics") {
    // 'text' is text-mapped: match analyzes; term on text.keyword is the
    // exact un-analyzed sub-field — whole-value equality on the base col.
    val whole = "spark query engine"
    val viaKeyword = JsonDsl.parse(
      cards,
      s"""{"query": {"term": {"text.keyword": {"value": "$whole"}}}}""",
      mapping
    )
    assert(viaKeyword.select("id").as[Long].collect().toSeq == Seq(5L))
    // a single analyzed token does NOT match the keyword sub-field
    assert(
      JsonDsl
        .parse(cards, """{"query": {"term": {"text.keyword": {"value": "spark"}}}}""", mapping)
        .count() == 0
    )
    // but the analyzed match on the text field still finds it
    assert(
      JsonDsl.parse(cards, """{"query": {"match": {"text": "spark"}}}""", mapping).count() == 2
    )
  }

  test("date_histogram pipeline sub-aggs: cumulative_sum, derivative, moving_avg over a sibling metric") {
    import java.sql.Timestamp
    val rows = Seq(
      (Timestamp.valueOf("2024-01-05 00:00:00"), 10.0),
      (Timestamp.valueOf("2024-01-20 00:00:00"), 20.0),
      (Timestamp.valueOf("2024-02-10 00:00:00"), 40.0),
      (Timestamp.valueOf("2024-03-15 00:00:00"), 10.0)
    ).toDF("ts", "amount")
    val got = JsonDsl
      .parse(
        rows,
        """{"aggs": {"by_month": {"date_histogram": {"field": "ts", "calendar_interval": "month"},
          |  "aggs": {"rev": {"sum": {"field": "amount"}},
          |           "cum": {"cumulative_sum": {"buckets_path": "rev"}},
          |           "deriv": {"derivative": {"buckets_path": "rev"}},
          |           "mov": {"moving_avg": {"buckets_path": "rev", "window": 2}}}}}}""".stripMargin,
        mapping
      )
      .select("doc_count", "rev", "cum", "deriv", "mov")
      .as[(Long, Double, Double, Option[Double], Double)]
      .collect()
      .toSeq
    assert(
      got == Seq(
        (2L, 30.0, 30.0, None, 30.0),
        (1L, 40.0, 70.0, Some(10.0), 35.0),
        (1L, 10.0, 80.0, Some(-30.0), 25.0)
      ),
      got.toString
    )
    // buckets_path must name a sibling metric or _count
    intercept[IllegalArgumentException](
      JsonDsl.parse(
        rows,
        """{"aggs": {"m": {"date_histogram": {"field": "ts", "calendar_interval": "month"},
          |  "aggs": {"cum": {"cumulative_sum": {"buckets_path": "nope"}}}}}}""".stripMargin,
        mapping
      )
    )
  }

  test("bucket_selector filters the bucket table like HAVING; selector emits no column") {
    import java.sql.Timestamp
    val rows = Seq(
      (Timestamp.valueOf("2024-01-05 00:00:00"), 10.0),
      (Timestamp.valueOf("2024-01-20 00:00:00"), 20.0),
      (Timestamp.valueOf("2024-02-10 00:00:00"), 40.0),
      (Timestamp.valueOf("2024-03-15 00:00:00"), 10.0)
    ).toDF("ts", "amount")
    val got = JsonDsl.parse(
      rows,
      """{"aggs": {"by_month": {"date_histogram": {"field": "ts", "calendar_interval": "month"},
        |  "aggs": {"rev": {"sum": {"field": "amount"}},
        |           "keep": {"bucket_selector": {"buckets_path": {"r": "rev"},
        |                                        "script": "params.r >= 30"}}}}}}""".stripMargin,
      mapping
    )
    // plan-equal to the structured HAVING over the bucket table (sum is
    // the exact-decimal rounded form per the house money convention)
    samePlan(
      got,
      Aggs
        .dateHistogram(
          rows,
          col("ts"),
          "month",
          Seq(round(sum(col("amount").cast("decimal(12,2)")).cast("double"), 2).as("rev"))
        )
        .filter(col("rev") >= 30.0)
    )
    assert(got.columns.toSeq == Seq("bucket", "doc_count", "rev"))
    assert(got.select("rev").as[Double].collect().toSeq == Seq(30.0, 40.0))
    // _count works as a buckets_path; an unknown path or script shape fails fast
    val byCount = JsonDsl.parse(
      rows,
      """{"aggs": {"m": {"date_histogram": {"field": "ts", "calendar_interval": "month"},
        |  "aggs": {"busy": {"bucket_selector": {"buckets_path": {"c": "_count"},
        |                                        "script": "params.c > 1"}}}}}}""".stripMargin,
      mapping
    )
    assert(byCount.select("doc_count").as[Long].collect().toSeq == Seq(2L))
    intercept[IllegalArgumentException](
      JsonDsl.parse(
        rows,
        """{"aggs": {"m": {"date_histogram": {"field": "ts", "calendar_interval": "month"},
          |  "aggs": {"bad": {"bucket_selector": {"buckets_path": {"x": "nope"},
          |                                       "script": "params.x > 1"}}}}}}""".stripMargin,
        mapping
      )
    )
    intercept[IllegalArgumentException](
      JsonDsl.parse(
        rows,
        """{"aggs": {"m": {"date_histogram": {"field": "ts", "calendar_interval": "month"},
          |  "aggs": {"bad": {"bucket_selector": {"buckets_path": {"c": "_count"},
          |                                       "script": "params.c + 1"}}}}}}""".stripMargin,
        mapping
      )
    )
  }

  test("function_score field_value_factor: filter-then-project plan, ranked by _score") {
    val df = cards
    val got = JsonDsl.parse(
      df,
      """{"query": {"function_score": {
        |   "query": {"match": {"text": "spark"}},
        |   "field_value_factor": {"field": "amount", "modifier": "ln1p", "factor": 1.0},
        |   "boost": 1.5}},
        | "sort": [{"id": "asc"}], "size": 2,
        | "_source": ["id", "_score"]}""".stripMargin,
      mapping
    )
    // explicit top-level sort REPLACES relevance ordering (the wire API
    // contract): size truncation follows the sort, _score trails as the
    // deterministic tiebreak
    samePlan(
      got,
      df.filter(SearchDsl.matchScore(col("text"), Seq("spark")) > 0)
        .withColumn("_score", round(lit(1.5) * log(lit(1.0) + lit(1.0) * col("amount")), 6))
        .orderBy(col("id").asc, col("_score").desc)
        .limit(2)
        .select(col("id"), col("_score"))
    )
    // docs 4 (120.0) and 5 (2000.0) match "spark"; the body sorts by id
    assert(
      got.as[(Long, Double)].collect().toSeq == Seq(
        (4L, BigDecimal(1.5 * math.log(121.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
        (5L, BigDecimal(1.5 * math.log(2001.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      )
    )
    intercept[IllegalArgumentException](
      JsonDsl.parse(
        df,
        """{"query": {"function_score": {
          |   "field_value_factor": {"field": "amount", "modifier": "cube"}}}}""".stripMargin,
        mapping
      )
    )
  }

  test("function_score gauss decay: plan-equal to the SearchDsl.gaussDecay projection") {
    val df = cards
    val got = JsonDsl.parse(
      df,
      """{"query": {"function_score": {
        |   "query": {"range": {"amount": {"lt": 1800}}},
        |   "gauss": {"amount": {"origin": 900.0, "scale": 500.0, "offset": 100.0, "decay": 0.5}}}},
        | "sort": [{"id": "asc"}], "size": 3,
        | "_source": ["id", "_score"]}""".stripMargin,
      mapping
    )
    samePlan(
      got,
      df.filter(col("amount") < 1800)
        .withColumn("_score", round(lit(1.0) * SearchDsl.gaussDecay(col("amount"), 900.0, 500.0, 100.0, 0.5), 6))
        .orderBy(col("id").asc, col("_score").desc)
        .limit(3)
        .select(col("id"), col("_score"))
    )
    // doc 3 (900) sits inside the offset → exactly 1.0; decay=0.5 at
    // origin±(offset+scale) means doc 2 (1500) scores 2^(-1) = 0.5.
    val scores = got.as[(Long, Double)].collect().toMap
    assert(scores(3L) == 1.0)
    assert(scores(2L) == 0.5)
  }

  test("simple_query_string clause: SimpleQuery predicate, OR across fields") {
    val got = JsonDsl.parse(
      cards,
      """{"query": {"simple_query_string": {
        |   "query": "spark + engine | \"fast cat\"",
        |   "fields": ["text"], "default_operator": "and"}},
        | "sort": [{"id": "asc"}], "_source": ["id"]}""".stripMargin,
      mapping
    )
    samePlan(
      got,
      cards
        .filter(graft.search.SimpleQuery.parse(col("text"), "spark + engine | \"fast cat\""))
        .orderBy(col("id").asc)
        .select("id")
    )
    assert(got.as[Long].collect().toSeq == Seq(1L, 5L))
  }

  test("pinned query: curated ids first in list order, organic follow sorted") {
    val df = cards.withColumnRenamed("id", "_id")
    val got = JsonDsl.parse(
      df,
      """{"query": {"pinned": {
        |   "ids": [3, 2],
        |   "organic": {"match": {"text": "spark"}}}},
        | "sort": [{"_id": "asc"}], "_source": ["_id"]}""".stripMargin,
      mapping
    )
    // pinned 3 then 2 (list order), then organic spark matches 4, 5
    assert(got.as[Long].collect().toSeq == Seq(3L, 2L, 4L, 5L))
  }

  test("search template renders {{params}} then compiles to the direct-body plan") {
    val body =
      """{"source": "{\"query\": {\"match\": {\"text\": \"{{term}}\"}}, \"sort\": [{\"id\": \"asc\"}], \"_source\": [\"id\"]}",
        | "params": {"term": "spark"}}""".stripMargin
    val got = JsonDsl.parseTemplate(cards, body, mapping)
    val direct = JsonDsl.parse(
      cards,
      """{"query": {"match": {"text": "spark"}}, "sort": [{"id": "asc"}], "_source": ["id"]}""",
      mapping
    )
    samePlan(got, direct)
    // unbound parameters fail fast, never compile a literal "{{x}}"
    intercept[IllegalArgumentException](
      JsonDsl.parseTemplate(cards, """{"source": "{\"query\": {\"match\": {\"text\": \"{{x}}\"}}}"}""", mapping)
    )
  }

  test("constant_score: filter context plus a fixed boost as _score") {
    val df = cards
    val got = JsonDsl.parse(
      df,
      """{"query": {"constant_score": {"filter": {"term": {"status": "ACTIVE"}}, "boost": 1.2}},
        | "sort": ["id"], "_source": ["id", "_score"]}""".stripMargin,
      mapping
    )
    samePlan(
      got,
      df.filter(col("status") === lit("ACTIVE"))
        .withColumn("_score", lit(1.2))
        .orderBy(col("id").asc)
        .select(col("id"), col("_score"))
    )
    assert(got.as[(Long, Double)].collect().toSeq == Seq((1L, 1.2), (2L, 1.2), (5L, 1.2)))
  }

  test("dis_max: clause scores fuse as best + tie_breaker × rest in one pass") {
    val df = cards
    val got = JsonDsl.parse(
      df,
      """{"query": {"dis_max": {"tie_breaker": 0.5, "queries": [
        |   {"constant_score": {"filter": {"match": {"text": "spark"}}, "boost": 2.0}},
        |   {"constant_score": {"filter": {"match": {"text": "dog"}}, "boost": 1.0}}]}},
        | "sort": ["id"], "_source": ["id", "_score"]}""".stripMargin,
      mapping
    )
    // doc 4 "streaming spark jobs" and 5 "spark query engine" match only
    // spark (2.0); docs 2/3 match only dog (1.0); no doc matches both.
    assert(
      got.as[(Long, Double)].collect().toSeq == Seq((4L, 2.0), (5L, 2.0), (2L, 1.0), (3L, 1.0))
    )
    // a non-constant_score clause fails fast
    intercept[IllegalArgumentException](
      JsonDsl.parse(
        df,
        """{"query": {"dis_max": {"queries": [{"match": {"text": "spark"}}]}}}""".stripMargin,
        mapping
      )
    )
  }

  test("hybrid query fuses the BM25 and knn legs in rank space (hand-computed RRF)") {
    val docs = Seq(
      (1L, "spark query engine"),
      (2L, "the fast cat runs"),
      (3L, "spark streaming jobs"),
      (4L, "a slow dog sleeps")
    ).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("_id", "embedding")
    val idx = graft.search.Bm25.buildIndex(docs, "doc_id", "text")
    val got = JsonDsl
      .hybrid(
        idx,
        vecs,
        "_id",
        """{"query": {"hybrid": {"queries": [
          |  {"match": {"text": "spark query"}},
          |  {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 2}}}]}},
          | "size": 3}""".stripMargin
      )
      .as[(Long, Double)]
      .collect()
      .toSeq
    // lexical ranks: doc 1 (both terms) then doc 3 (spark only);
    // knn ranks: doc 2 (cos 1.0) then doc 3 (0.993). Only doc 3 appears
    // in both legs → 1/62 + 1/62 tops; docs 1 and 2 tie at 1/61 and
    // break by id.
    assert(got.map(_._1) == Seq(3L, 1L, 2L), got.toString)
    val top = BigDecimal(1.0 / 62 + 1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tie = BigDecimal(1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._2) == Seq(top, tie, tie), got.toString)
  }

  test("hybridNormalized: min_max per leg, weighted mean, missing leg contributes 0, weights follow declared order") {
    val docs = Seq(
      (1L, "spark query engine"),
      (2L, "the fast cat runs"),
      (3L, "spark streaming jobs"),
      (4L, "a slow dog sleeps")
    ).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("_id", "embedding")
    val idx = graft.search.Bm25.buildIndex(docs, "doc_id", "text")
    def run(w: String) = JsonDsl
      .hybridNormalized(
        idx,
        vecs,
        "_id",
        s"""{"query": {"hybrid": {"queries": [
           |  {"match": {"text": "spark query"}},
           |  {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 2}}}]}},
           | "size": 4,
           | "search_pipeline": {"phase_results_processors": [
           |   {"normalization-processor": {
           |      "normalization": {"technique": "min_max"},
           |      "combination": {"technique": "arithmetic_mean",
           |                      "parameters": {"weights": $w}}}}]}}""".stripMargin
      )
      .as[(Long, Double)]
      .collect()
      .toSeq
    // lex leg retrieves docs 1, 3 -> min_max: doc1 = 1.0, doc3 = 0.0;
    // knn leg retrieves docs 2 (cos 1.0 -> 1.0), 3 (-> 0.0).
    // equal weights: doc1 = 0.5, doc2 = 0.5, doc3 = 0.0 — both-leg doc 3
    // happens to normalize to the min of BOTH legs here, so the
    // missing-leg zeros are what the assertion pins.
    val eq = run("[0.5, 0.5]").toMap
    assert(eq(1L) == 0.5 && eq(2L) == 0.5 && eq(3L) == 0.0)
    // weighted 0.3 lex / 0.7 vec: doc1 = 0.3, doc2 = 0.7
    val wgt = run("[0.3, 0.7]").toMap
    assert(wgt(1L) == 0.3 && wgt(2L) == 0.7)
    // single-valued leg normalizes to 1.0: k=1 on the knn leg
    val single = JsonDsl
      .hybridNormalized(
        idx,
        vecs,
        "_id",
        """{"query": {"hybrid": {"queries": [
          |  {"match": {"text": "spark query"}},
          |  {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 1}}}]}},
          | "size": 4,
          | "search_pipeline": {"phase_results_processors": [
          |   {"normalization-processor": {
          |      "normalization": {"technique": "min_max"},
          |      "combination": {"technique": "arithmetic_mean"}}}]}}""".stripMargin
      )
      .as[(Long, Double)]
      .collect()
      .toMap
    assert(single(2L) == 0.5) // lone knn hit: 1.0 * 0.5 weight share
    // error contract: unsupported techniques fail fast, naming the value
    val bad = intercept[IllegalArgumentException](run("[0.5]"))
    assert(bad.getMessage.contains("weights"))
    intercept[IllegalArgumentException] {
      JsonDsl.hybridNormalized(
        idx,
        vecs,
        "_id",
        """{"query": {"hybrid": {"queries": [
          |  {"match": {"text": "spark"}},
          |  {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 2}}}]}},
          | "search_pipeline": {"phase_results_processors": [
          |   {"normalization-processor": {"normalization": {"technique": "l2"}}}]}}""".stripMargin
      )
    }
  }

  test("_rank_eval: normalized dcg against explicit graded ratings (hand-computed)") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("_id", "embedding")
    val got = JsonDsl
      .rankEval(
        emb,
        "_id",
        """{"requests": [
          |  {"id": "q1", "request": {"query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 2}}}},
          |   "ratings": [{"_id": 2, "rating": 2}, {"_id": 3, "rating": 1}]}],
          | "metric": {"dcg": {"k": 2, "normalize": true}}}""".stripMargin
      )
    // heavy phase is the bounded knn top-k, never a full sort
    assert(
      got.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      got.queryExecution.executedPlan.toString
    )
    // top-2 = [_id 1 (unrated, gain 0), _id 2 (rating 2)];
    // dcg = (2^2-1)/log2(3); ideal = (2^2-1)/log2(2) + (2^1-1)/log2(3)
    val dcg = 3.0 / (math.log(3.0) / math.log(2.0))
    val ideal = 3.0 + 1.0 / (math.log(3.0) / math.log(2.0))
    val expect = BigDecimal(dcg / ideal).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.as[(String, Double)].collect().toSeq == Seq(("q1", expect)))
  }

  test("_rank_eval: precision and mean_reciprocal_rank metrics") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("_id", "embedding")
    def eval(metric: String): Seq[(String, Double)] =
      JsonDsl
        .rankEval(
          emb,
          "_id",
          s"""{"requests": [
             |  {"id": "q1", "request": {"query": {"knn": {"embedding": {"vector": [1.0, 0.0], "k": 2}}}},
             |   "ratings": [{"_id": 2, "rating": 2}, {"_id": 3, "rating": 1}]}],
             | "metric": $metric}""".stripMargin
        )
        .as[(String, Double)]
        .collect()
        .toSeq
    // top-2 = [1 (unrated), 2 (rating 2 >= threshold)]
    assert(eval("""{"precision": {"k": 2}}""") == Seq(("q1", 0.5)))
    assert(eval("""{"mean_reciprocal_rank": {"k": 2}}""") == Seq(("q1", 0.5)))
    // raising the threshold above every rating zeroes both metrics
    assert(eval("""{"precision": {"k": 2, "relevant_rating_threshold": 3}}""") == Seq(("q1", 0.0)))
    assert(eval("""{"mean_reciprocal_rank": {"k": 2, "relevant_rating_threshold": 3}}""") == Seq(("q1", 0.0)))
  }

  test("mapping artifact parses the reference _mapping format") {
    val m = IndexMapping.fromJson(
      """{"mappings": {"properties": {"a": {"type": "text"}, "b": {"type": "keyword"}, "c": {"type": "date"}}}}"""
    )
    assert(m.isText("a") && !m.isText("b"))
    assert(m.fieldType("c") == "date")
    assert(m.fieldType("undeclared") == "keyword") // dynamic-mapping default: exact
    val bare = IndexMapping.fromJson("""{"properties": {"x": {"type": "text"}}}""")
    assert(bare.isText("x"))
    intercept[IllegalArgumentException](IndexMapping.fromJson("""{"nope": 1}"""))
  }

  test("runtime-field scripts: precedence, parens, unary minus, doc. refs, error contract") {
    import graft.search.ScriptExpr
    val df = Seq((4.0, 2.0)).toDF("a", "b")
    def eval(src: String): Double =
      df.select(ScriptExpr.compile(src).cast("double").as("v")).as[Double].head()
    assert(eval("a + b * 3") == 10.0) // precedence: * binds tighter
    assert(eval("(a + b) * 3") == 18.0)
    assert(eval("doc.a - -b") == 6.0) // doc. prefix + unary minus
    assert(eval("a / b / 2") == 1.0) // left-assoc
    assert(eval("abs(b - a) * 2 + 1") == 5.0)
    assert(math.abs(eval("ln(a)") - math.log(4.0)) < 1e-12)
    assert(eval("-2.5 * b") == -5.0)
    for (bad <- Seq("a +", "ln a", "(a", "a ** b", "2..5", "@a", ""))
      intercept[IllegalArgumentException](ScriptExpr.compile(bad) :: Nil)
    // wired through the request body: the runtime field filters and sorts
    val out = JsonDsl
      .parse(
        cards,
        """{"runtime_mappings": {"pct": {"type": "double", "script": "amount / 100"}},
          | "query": {"range": {"pct": {"gte": 9}}},
          | "sort": [{"pct": {"order": "desc"}}],
          | "_source": ["id", "pct"]}""".stripMargin,
        mapping
      )
      .as[(Long, Double)]
      .collect()
      .toSeq
    assert(out == Seq((5L, 20.0), (2L, 15.0), (3L, 9.0)))
  }

  test("_validate compile-checks a body without touching data; _field_caps reports capabilities") {
    // valid: returns the compiled predicate description (the API's
    // "rewritten query"), and compiling ran zero Spark jobs
    val (ok, explanation) = JsonDsl.validate(
      cards,
      """{"query": {"bool": {"must": [{"term": {"status": {"value": "ACTIVE"}}}],
        |           "filter": [{"range": {"amount": {"gte": 100}}}]}}}""".stripMargin,
      mapping
    )
    assert(ok, explanation)
    assert(explanation.toLowerCase.contains("status"))
    // malformed JSON and unknown clauses are invalid with a real message
    assert(!JsonDsl.validate(cards, """{"query": {"bool": """)._1)
    val (bad, err) = JsonDsl.validate(cards, """{"query": {"no_such_clause": {}}}""")
    assert(!bad && err.nonEmpty)
    // an empty body is match_all — valid
    assert(JsonDsl.validate(cards, """{}""")._1)
    // a query on a nonexistent field is invalid here exactly as parse()
    // would throw — validate resolves the predicate against the schema
    val (ghost, ghostErr) = JsonDsl.validate(cards, """{"query": {"term": {"no_such_field": {"value": 1}}}}""")
    assert(!ghost && ghostErr.nonEmpty)
    // field_caps: text searchable but not aggregatable; keyword/numeric both
    val capRows = IndexMapping.fieldCaps(cards, mapping)
    assert(capRows.columns.toSeq == Seq("field", "es_type", "searchable", "aggregatable"))
    val byField = capRows.as[(String, String, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(byField("text")._2 == "text" && byField("text")._3 && !byField("text")._4)
    assert(byField("status")._2 == "keyword" && byField("status")._4)
    assert(byField("amount")._2 == "double" && byField("amount")._4)
    // undeclared numeric falls back to the schema-derived type
    assert(byField("id")._2 == "bigint" && byField("id")._4)
  }

  test("_terms_enum enumerates indexed terms: analyzed tokens for text, stored values for keyword") {
    // text field: terms are the index analyzer's token stream, asc
    val txt = JsonDsl
      .termsEnum(cards, """{"field": "text", "string": "s"}""", mapping)
      .as[String]
      .collect()
      .toSeq
    assert(txt == Seq("sleeps", "slow", "spark", "streaming"))
    // keyword field: raw stored values, case-insensitive prefix returns
    // terms AS STORED; size bounds; search_after resumes strictly after
    val kw = JsonDsl
      .termsEnum(
        cards,
        """{"field": "status", "string": "a", "case_insensitive": true, "size": 1}""",
        mapping
      )
      .as[String]
      .collect()
      .toSeq
    assert(kw == Seq("ACTIVE"))
    val paged = JsonDsl
      .termsEnum(
        cards,
        """{"field": "status", "search_after": "ACTIVE"}""",
        mapping
      )
      .as[String]
      .collect()
      .toSeq
    assert(paged == Seq("BLOCKED", "CLOSED"))
    // case-SENSITIVE prefix on a keyword field misses stored uppercase
    assert(JsonDsl.termsEnum(cards, """{"field": "status", "string": "a"}""", mapping).isEmpty)
    // contract errors: missing field / unknown field / malformed body
    assertThrows[IllegalArgumentException](JsonDsl.termsEnum(cards, """{"string": "a"}""", mapping))
    assertThrows[IllegalArgumentException](
      JsonDsl.termsEnum(cards, """{"field": "ghost"}""", mapping)
    )
    assertThrows[IllegalArgumentException](JsonDsl.termsEnum(cards, """{"field": """, mapping))
  }

  test("knn method=hnsw wire body runs the graph engine: equal to the structured graphSearch") {
    import graft.operators.Similarity
    val emb = (0L until 40L).map(i => (i, Array.tabulate(4)(d => ((i % 8) * 3 + d).toFloat))).toDF("vec_id", "embedding")
    val idx = Similarity.graphIndex(emb, "vec_id", "embedding", m = 4, nLists = 4)
    val body =
      """{"query": {"knn": {"embedding": {"vector": [3.0, 4.0, 5.0, 6.0], "k": 5,
        |  "method": {"name": "hnsw", "ef_search": 8, "rounds": 3}}}}}""".stripMargin
    val got = JsonDsl.knnGraph(idx, emb, "vec_id", "embedding", body).as[(Long, Double)].collect().toSeq
    val want = Similarity
      .graphSearch(idx, emb, "vec_id", "embedding", Seq(3f, 4f, 5f, 6f), 5, beam = 8, rounds = 3)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"wire hnsw diverged from structured graphSearch: $got vs $want")
    assert(got.nonEmpty && got.map(_._2) == got.map(_._2).sorted.reverse)
    // unsupported method name and mismatched field are 400-class errors
    intercept[IllegalArgumentException](
      JsonDsl.knnGraph(idx, emb, "vec_id", "embedding", body.replace("hnsw", "annoy")))
    intercept[IllegalArgumentException](
      JsonDsl.knnGraph(idx, emb, "vec_id", "other_col", body))
  }

  test("combined_fields: a repeated query term scores once (no ambiguous df-column blowup)") {
    val df = cards
    val dup = JsonDsl.parse(
      df,
      """{"query": {"combined_fields": {"query": "spark spark", "fields": ["text"]}},
        | "_source": ["id", "_score"]}""".stripMargin,
      mapping
    )
    val single = JsonDsl.parse(
      df,
      """{"query": {"combined_fields": {"query": "spark", "fields": ["text"]}},
        | "_source": ["id", "_score"]}""".stripMargin,
      mapping
    )
    assert(dup.as[(Long, Double)].collect().toSeq == single.as[(Long, Double)].collect().toSeq)
  }

  test("script_score with an explicit sort: the sort replaces relevance ordering for selection") {
    val df = cards
    val got = JsonDsl.parse(
      df,
      """{"query": {"script_score": {
        |   "query": {"match": {"text": "dog"}},
        |   "script": {"source": "amount * 2"}}},
        | "sort": [{"id": "asc"}], "size": 1, "_source": ["id", "_score"]}""".stripMargin,
      mapping
    )
    // docs 2 (1500→3000) and 3 (900→1800) match "dog"
    assert(got.as[(Long, Double)].collect().toSeq == Seq((2L, 3000.0)))
    val flipped = JsonDsl.parse(
      df,
      """{"query": {"script_score": {
        |   "query": {"match": {"text": "dog"}},
        |   "script": {"source": "amount * 2"}}},
        | "sort": [{"id": "desc"}], "size": 1, "_source": ["id", "_score"]}""".stripMargin,
      mapping
    )
    // id desc selects doc 3 (900 → 1800) even though doc 2 scores higher
    assert(flipped.as[(Long, Double)].collect().toSeq == Seq((3L, 1800.0)))
  }

  test("_sql: CTE-smuggled write rejected structurally; temp view scope is per-request") {
    val df = cards
    // passes the select/with prefix check but parses to an insert node
    intercept[IllegalArgumentException](
      JsonDsl.sqlQuery(df, "c_sql", """{"query": "WITH x AS (SELECT 1 AS a) INSERT INTO c_sql SELECT * FROM x"}""")
    )
    // the request's view registers in a child session, not the caller's
    val n = JsonDsl
      .sqlQuery(df, "scoped_view_x", """{"query": "SELECT count(*) AS n FROM scoped_view_x"}""")
      .as[Long].collect().head
    assert(n == 5L)
    assert(!spark.catalog.tableExists("scoped_view_x"), "endpoint leaked its temp view into the caller session")
    // a caller-session temp view is NOT readable through the endpoint
    spark.range(1).toDF("secret").createOrReplaceTempView("secret_view")
    try
      intercept[org.apache.spark.sql.AnalysisException](
        JsonDsl.sqlQuery(df, "c_sql", """{"query": "SELECT * FROM secret_view"}""")
      )
    finally spark.catalog.dropTempView("secret_view")
  }

  test("pit search: two pit ids over one changelog are time travel; query composes over the frozen state") {
    val log = Seq(
      (1L, "2024-01-01 10:00:00", 10L, "signup", 1.0),
      (2L, "2024-01-02 10:00:00", 10L, "purchase", 5.0),
      (3L, "2024-01-03 10:00:00", 10L, "click", 0.0), // after pit A: 10's latest is no longer purchase
      (4L, "2024-01-02 12:00:00", 20L, "purchase", 7.0),
      (5L, "2024-01-04 10:00:00", 20L, "purchase", 9.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    def search(pit: String) = JsonDsl.pitSearch(
      log, "user_id", Seq("ts", "event_id"), "ts", Seq("event_id", "ts", "event_type", "value"),
      s"""{"pit": {"id": "$pit"}, "query": {"term": {"event_type": "purchase"}},
         | "sort": [{"user_id": "asc"}], "_source": ["user_id", "event_id", "value"]}""".stripMargin
    )
    val atA = search("2024-01-02 23:59:59").select("user_id", "event_id").as[(Long, Long)].collect().toSeq
    assert(atA == Seq((10L, 2L), (20L, 4L)), s"pit A state: $atA")
    val atB = search("2024-01-05 00:00:00").select("user_id", "event_id").as[(Long, Long)].collect().toSeq
    // user 10's latest is now the click — gone from the purchase query;
    // user 20's latest purchase advanced: same pit contract, later snapshot
    assert(atB == Seq((20L, 5L)), s"pit B state: $atB")
    intercept[IllegalArgumentException](
      JsonDsl.pitSearch(log, "user_id", Seq("ts"), "ts", Seq("event_id"), """{"query": {"term": {"event_type": "x"}}}""")
    )
  }

  test("_mget keeps request order and missing ids (found=false); _bulk folds the sequential contract") {
    val docs = Seq((3L, "alpha", "en"), (7L, "beta", "de")).toDF("doc_id", "text", "lang")
    val got = JsonDsl
      .mget(docs, "doc_id", """{"docs": [{"_id": 7}, {"_id": 99}, {"_id": 3}], "_source": ["lang"]}""")
      .as[(Long, String, Boolean, String)].collect().toSeq
    assert(got == Seq((1L, "7", true, "de"), (2L, "99", false, null), (3L, "3", true, "en")), got.toString)
    val ledger = JsonDsl
      .bulkLedger(
        docs,
        "doc_id",
        """{"create": {"_id": 3}}
          |{"text": "conflict"}
          |{"delete": {"_id": 3}}
          |{"create": {"_id": 3}}
          |{"text": "ok now"}
          |{"update": {"_id": 99}}
          |{"doc": {"text": "no upsert"}}
          |{"index": {"_id": 99}}
          |{"text": "created"}
          |{"delete": {"_id": 50}}""".stripMargin
      )
      .as[(Long, String, String, String)].collect().toSeq
    assert(
      ledger == Seq(
        (1L, "create", "3", "version_conflict"),
        (2L, "delete", "3", "deleted"),
        (3L, "create", "3", "created"),
        (4L, "update", "99", "document_missing"),
        (5L, "index", "99", "created"),
        (6L, "delete", "50", "not_found")
      ),
      ledger.toString
    )
    // a source line where an action line is expected is a 400, not a silent skip
    intercept[IllegalArgumentException](
      JsonDsl.bulkLedger(docs, "doc_id", """{"index": {"_id": 3}}""")
    )
  }

  test("_update_by_query / _delete_by_query / _reindex: script sequencing, type preservation, ledgers") {
    val docs = Seq((1L, "en", 100L), (2L, "de", 300L), (3L, "de", 900L), (4L, "fr", 50L))
      .toDF("doc_id", "lang", "n_chars")

    // update_by_query: only matches are emitted, statements apply in
    // order (the second sees the first's assignment), and an assignment
    // to an existing column casts back to the STORED type — the mapping
    // never changes.
    val upd = JsonDsl
      .updateByQuery(
        docs,
        """{"query": {"term": {"lang": "de"}},
          | "script": {"source": "ctx._source.n_chars = ctx._source.n_chars * 2; ctx._source.n_chars = ctx._source.n_chars + 1"}}""".stripMargin
      )
      .orderBy("doc_id")
    assert(upd.schema("n_chars").dataType == org.apache.spark.sql.types.LongType)
    assert(upd.as[(Long, String, Long)].collect().toSeq == Seq((2L, "de", 601L), (3L, "de", 1801L)))
    // no script → 400; a non-assignment statement → 400
    intercept[IllegalArgumentException](JsonDsl.updateByQuery(docs, """{"query": {"match_all": {}}}"""))
    intercept[IllegalArgumentException](
      JsonDsl.updateByQuery(docs, """{"script": {"source": "ctx._source.n_chars += 1"}}""")
    )

    // delete_by_query: the conditional-count ledger conserves total; a
    // query is required.
    val del = JsonDsl.deleteByQuery(docs, """{"query": {"range": {"n_chars": {"gte": 300}}}}""")
    assert(del.as[(Long, Long, Long)].collect().toSeq == Seq((2L, 2L, 4L)))
    intercept[IllegalArgumentException](JsonDsl.deleteByQuery(docs, """{}"""))

    // reindex: _id always survives _source projection, the script may ADD
    // a column (no stored type to cast back to), and dest.index is
    // required — the wire contract.
    val re = JsonDsl
      .reindex(
        docs,
        "doc_id",
        """{"source": {"index": "docs", "query": {"range": {"n_chars": {"lt": 500}}}, "_source": ["n_chars"]},
          | "dest": {"index": "docs2"},
          | "script": {"source": "ctx._source.half = ctx._source.n_chars / 2"}}""".stripMargin
      )
      .orderBy("doc_id")
    assert(re.columns.toSeq == Seq("doc_id", "n_chars", "half"))
    assert(re.as[(Long, Long, Double)].collect().toSeq ==
      Seq((1L, 100L, 50.0), (2L, 300L, 150.0), (4L, 50L, 25.0)))
    intercept[IllegalArgumentException](
      JsonDsl.reindex(docs, "doc_id", """{"source": {"index": "docs"}}""")
    )
  }

  test("search_pipeline filter_query fuses with the body's query into one pushed-down predicate") {
    val docs = Seq((1L, "en", 600L), (2L, "de", 700L), (3L, "en", 100L), (4L, "en", 900L))
      .toDF("doc_id", "lang", "n_chars")
    val piped = JsonDsl.parse(
      docs,
      """{"search_pipeline": {"request_processors": [
        |    {"filter_query": {"query": {"term": {"lang": "en"}}}}]},
        | "query": {"range": {"n_chars": {"gte": 500}}},
        | "sort": [{"doc_id": "asc"}]}""".stripMargin
    )
    assert(piped.select("doc_id").as[Long].collect().toSeq == Seq(1L, 4L))
    // the pipeline predicate and the body predicate fuse: at most ONE
    // Filter survives optimization (zero here — Catalyst folds both into
    // the LocalRelation), never two passes over the scan
    val filters = piped.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(filters.size <= 1, piped.queryExecution.optimizedPlan.toString)
    // unsupported processor type and mixing with phase_results_processors are 400s
    intercept[IllegalArgumentException](JsonDsl.parse(
      docs,
      """{"search_pipeline": {"request_processors": [{"rename_field": {}}]}, "query": {"match_all": {}}}"""
    ))
    intercept[IllegalArgumentException](JsonDsl.parse(
      docs,
      """{"search_pipeline": {"request_processors": [{"filter_query": {"query": {"match_all": {}}}}],
        |                     "phase_results_processors": []},
        | "query": {"match_all": {}}}""".stripMargin
    ))
  }

  test("derivative `unit: day` normalizes by the REAL calendar gap between bucket starts") {
    // Jan→Feb is 31 days, Feb→Mar is 28 (2023): same diff, different
    // normalized_value — a constant divisor would collapse them.
    val rows = Seq(
      ("2023-01-10", 10.0), ("2023-01-20", 21.0),
      ("2023-02-10", 62.0), ("2023-03-10", 90.0)
    ).toDF("ts0", "v").select(to_timestamp($"ts0").as("ts"), $"v")
    val got = JsonDsl
      .parse(
        rows,
        """{"aggs": {"m": {"date_histogram": {"field": "ts", "calendar_interval": "month"},
          |  "aggs": {"total": {"sum": {"field": "v"}},
          |           "d": {"derivative": {"buckets_path": "total", "unit": "day"}}}}}}""".stripMargin
      )
      .select("total", "d", "d_normalized")
      .as[(Double, Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(
      (31.0, None, None),
      (62.0, Some(31.0), Some(1.0)),           // +31 over the 31-day January
      (90.0, Some(28.0), Some(1.0))            // +28 over the 28-day February
    ), got.toString)
  }

  test("rich metric sub-aggs (percentiles/boxplot/extended_stats/cardinality) compile as ONE aggregation") {
    // However many output columns the metrics expand to, the fact table
    // is scanned once and aggregated once — never a per-metric scan, a
    // join of separate aggs, or k independent percentile buffers.
    val od = Tables.orders(spark, Sf)
    val body =
      """{"aggs": {"by_priority": {
        |   "terms": {"field": "o_orderpriority", "size": 5},
        |   "aggs": {"price": {"percentiles": {"field": "o_totalprice", "percents": [50, 90]}},
        |            "box":   {"boxplot": {"field": "o_totalprice"}},
        |            "stats": {"extended_stats": {"field": "o_totalprice"}},
        |            "buyers": {"cardinality": {"field": "o_custkey"}}}
        | }}}""".stripMargin
    val got = JsonDsl.parse(od, body)
    val plan = got.queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).length == 1, s"expected one fact scan:\n$plan")
    assert(!plan.contains("Join"), s"rich metrics must not join separate aggregations:\n$plan")
    // Distinct aggregates (cardinality) legitimately add a two-key round;
    // the aggregate-node count stays the partial/merge/final ladder of
    // ONE aggregation (4 nodes), not one ladder per metric.
    val aggNodes = "HashAggregate".r.findAllIn(plan).length
    assert(aggNodes <= 4, s"expected one aggregation ladder, got $aggNodes nodes:\n$plan")
    // values spot-check against the structured twins on one bucket
    val row = got.filter(col("key") === "1-URGENT").head()
    val box = graft.search.Aggs
      .boxplot(od.filter(col("o_orderpriority") === "1-URGENT"), col("o_totalprice"))
      .head()
    assert(row.getAs[Double]("box_q2") == box.getAs[Double]("q2"), "grouped q2 != per-bucket boxplot q2")
    assert(row.getAs[Double]("box_min") == box.getAs[Double]("min_v"))
  }

  test("sketch-tier grouped percentiles ('approx': true) keep the one-aggregation plan") {
    // Same one-ladder shape as the exact twin — the sketch changes the
    // aggregate function (bounded GK buffers), never the plan topology.
    val od = Tables.orders(spark, Sf)
    val got = JsonDsl.parse(
      od,
      """{"aggs": {"by_priority": {
        |   "terms": {"field": "o_orderpriority", "size": 5},
        |   "aggs": {"price": {"percentiles": {"field": "o_totalprice", "percents": [50, 90], "approx": true}},
        |            "box":   {"boxplot": {"field": "o_totalprice", "approx": true}}}
        | }}}""".stripMargin
    )
    val plan = got.queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).length == 1, s"expected one fact scan:\n$plan")
    assert(!plan.contains("Join"), s"sketch metrics must not join separate aggregations:\n$plan")
    assert(plan.contains("approx_percentile"), s"approx flag did not select the sketch:\n$plan")
    assert("(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty,
      s"exact percentile leaked into the sketch tier:\n$plan")
    assert(got.columns.toSeq == Seq("key", "doc_count", "price_p50", "price_p90",
      "box_min", "box_q1", "box_q2", "box_q3", "box_max"), got.columns.mkString(","))
  }

  test("pipelines address rich-metric columns via dotted buckets_path (price.50)") {
    val od = Tables.orders(spark, Sf)
    val got = JsonDsl.parse(
      od,
      """{"aggs": {"monthly": {
        |   "date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
        |   "aggs": {"price": {"percentiles": {"field": "o_totalprice", "percents": [50]}},
        |            "trend": {"moving_avg": {"buckets_path": "price.50", "window": 3}}}
        | }}}""".stripMargin
    ).orderBy("bucket").collect()
    assert(got.nonEmpty)
    // the pipeline column is the trailing-3 mean of the percentile column
    val p50s = got.map(_.getAs[Double]("price_p50"))
    got.zipWithIndex.foreach { case (r, i) =>
      val win = p50s.slice(math.max(0, i - 2), i + 1)
      val want = BigDecimal(win.sum / win.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("trend") - want) < 1e-9,
        s"row $i: trend ${r.getAs[Double]("trend")} != mean of $win")
    }
    // an unknown dotted path still fails loudly
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        od,
        """{"aggs": {"monthly": {
          |   "date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
          |   "aggs": {"price": {"percentiles": {"field": "o_totalprice", "percents": [50]}},
          |            "trend": {"moving_avg": {"buckets_path": "price.95", "window": 3}}}
          | }}}""".stripMargin
      )
    }
  }

  test("dotted buckets_path resolves FRACTIONAL percents (price.99.9 → price_p99_9)") {
    val od = Tables.orders(spark, Sf)
    val got = JsonDsl.parse(
      od,
      """{"aggs": {"monthly": {
        |   "date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
        |   "aggs": {"price": {"percentiles": {"field": "o_totalprice", "percents": [99.9]}},
        |            "cum": {"cumulative_sum": {"buckets_path": "price.99.9"}}}
        | }}}""".stripMargin
    ).orderBy("bucket").collect()
    assert(got.nonEmpty)
    val vals = got.map(_.getAs[Double]("price_p99_9"))
    var running = 0.0
    got.zipWithIndex.foreach { case (r, i) =>
      running += vals(i)
      // cumulative_sum keeps the money convention (2 dp)
      val want = BigDecimal(running).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("cum") - want) < 1e-6,
        s"row $i: cum ${r.getAs[Double]("cum")} != running $want")
    }
  }
}
