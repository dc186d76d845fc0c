package graft

import graft.search.JsonDsl
import org.apache.spark.sql.functions._

/** The r8 wire-format sweep: JSON twins for the last structured-only
  * query-DSL families. Value correctness is oracle-gated (Verify); this
  * spec pins the error contracts and the relations mechanism, which the
  * oracle cannot see.
  */
class WireTwinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark is fast", 13L),
    (2L, "spark is slow today", 19L),
    (3L, "nothing here", 12L)
  ).toDF("doc_id", "text", "n_chars")

  test("boosting demotes negative matches instead of excluding them") {
    val out = JsonDsl.parse(
      docs,
      """{"query": {"boosting": {
        |   "positive": {"match": {"text": "spark"}},
        |   "negative": {"match": {"text": "slow"}},
        |   "negative_boost": 0.5}},
        | "sort": [{"doc_id": "asc"}], "_source": ["doc_id", "_score"]}""".stripMargin,
      graft.search.IndexMapping(Map("text" -> "text"))
    ).as[(Long, Double)].collect().toSeq
    // demoted doc 2 is PRESENT with score 0.5, ranked after doc 1
    assert(out == Seq((1L, 1.0), (2L, 0.5)))
  }

  test("rescore touches only the window and requires a deterministic first-phase sort") {
    val out = JsonDsl.parse(
      docs,
      """{"query": {"match_all": {}},
        | "sort": [{"n_chars": "desc"}, {"doc_id": "asc"}],
        | "rescore": {"window_size": 2,
        |   "query": {"rescore_query": {"match": {"text": "spark fast"}}}},
        | "_source": ["doc_id", "_score"]}""".stripMargin
    ).as[(Long, Int)].collect().toSeq
    // window of 2 under n_chars desc = docs 2 (19) and 1 (13); doc 3
    // never enters the second phase. doc 1 matches both terms.
    assert(out == Seq((1L, 2), (2L, 1)))
    intercept[IllegalArgumentException] {
      JsonDsl.parse(docs, """{"rescore": {"query": {"rescore_query": {"match": {"text": "x"}}}}}""")
    }
  }

  test("has_child resolves the relation or fails loudly; join keys come from the clause") {
    val parents = Seq((10L, "a"), (20L, "b")).toDF("pk", "name")
    val children = Seq((10L, 5.0), (20L, 1.0)).toDF("ck", "v")
    val body =
      """{"query": {"has_child": {"type": "kids",
        |   "join": {"parent": "pk", "child": "ck"},
        |   "query": {"range": {"v": {"gte": 3}}}}},
        | "sort": [{"pk": "asc"}], "_source": ["pk"]}""".stripMargin
    val hits = JsonDsl.parse(parents, body, relations = Map("kids" -> children)).as[Long].collect().toSeq
    assert(hits == Seq(10L))
    val err = intercept[IllegalArgumentException](JsonDsl.parse(parents, body))
    assert(err.getMessage.contains("unknown relation"))
  }

  test("terms lookup requires _source and the lookup relation") {
    val lookup = Seq((0L, "alpha beta")).toDF("_id", "text")
    val corpus = Seq((1L, "alpha here"), (2L, "gamma only")).toDF("doc_id", "text")
    val hits = JsonDsl.parse(
      corpus,
      """{"query": {"terms": {"text": {"index": "lk", "id": 0, "path": "text"}}},
        | "sort": [{"doc_id": "asc"}], "_source": ["doc_id"]}""".stripMargin,
      relations = Map("lk" -> lookup)
    ).as[Long].collect().toSeq
    assert(hits == Seq(1L))
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        corpus,
        """{"query": {"terms": {"text": {"index": "lk", "id": 0, "path": "text"}}}}""",
        relations = Map("lk" -> lookup)
      )
    }
  }

  test("span_not honors the pre-window; span family rejects non-span sub-clauses") {
    val d = Seq((1L, "big data rocks"), (2L, "data only")).toDF("doc_id", "text")
    val hits = JsonDsl.parse(
      d,
      """{"query": {"span_not": {
        |   "include": {"span_term": {"text": {"value": "data"}}},
        |   "exclude": {"span_term": {"text": {"value": "big"}}}, "pre": 1}},
        | "sort": [{"doc_id": "asc"}], "_source": ["doc_id"]}""".stripMargin
    ).as[Long].collect().toSeq
    assert(hits == Seq(2L))
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        d,
        """{"query": {"span_within": {
          |   "little": {"span_term": {"text": {"value": "x"}}},
          |   "big": {"match": {"text": "y"}}}}}""".stripMargin
      ).collect()
    }
  }

  test("distance_feature rejects unknown pivot units; scoring bool rejects mixed should") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))).toDF("event_id", "ts")
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        ev,
        """{"query": {"bool": {"should": [{"distance_feature": {
          |   "field": "ts", "origin": "2024-02-01T00:00:00Z", "pivot": "7w"}}]}}}""".stripMargin
      ).collect()
    }
  }

  test("r9 agg-family error contracts: bucket_script vars, moving_percentiles percent, ip_prefix length, cumulative_cardinality sibling") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 5L))
      .toDF("event_id", "ts", "user_id")
    // bucket_script: script variable not bound in buckets_path
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        ev,
        """{"aggs": {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day"},
          |  "aggs": {"r": {"bucket_script": {"buckets_path": {"a": "_count"},
          |           "script": "params.a / params.MISSING"}}}}}}""".stripMargin
      ).collect()
    }
    // moving_percentiles: needs a single percent per pipeline entry
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        ev,
        """{"aggs": {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day"},
          |  "aggs": {"p": {"moving_percentiles": {"buckets_path": "_count", "window": 3}}}}}}""".stripMargin
      ).collect()
    }
    // ip_prefix: prefix_length outside [0, 32]
    val ips = Seq((1L, "10.1.2.3")).toDF("event_id", "ip")
    intercept[IllegalArgumentException] {
      JsonDsl.parse(ips, """{"aggs": {"n": {"ip_prefix": {"field": "ip", "prefix_length": 40}}}}""").collect()
    }
    // cumulative_cardinality: buckets_path must name a cardinality sibling
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        ev,
        """{"aggs": {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day"},
          |  "aggs": {"c": {"cumulative_cardinality": {"buckets_path": "nope"}}}}}}""".stripMargin
      ).collect()
    }
    // moving_fn ewma: malformed script (no alpha)
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        ev,
        """{"aggs": {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day"},
          |  "aggs": {"e": {"moving_fn": {"buckets_path": "_count", "window": 3,
          |           "script": "MovingFunctions.ewma(values)"}}}}}}""".stripMargin
      ).collect()
    }
  }

  test("script_score: the script replaces relevance; malformed scripts fail the wire contract") {
    val out = JsonDsl.parse(
      docs,
      """{"query": {"script_score": {
        |   "query": {"match": {"text": "spark"}},
        |   "script": {"source": "mod(doc_id, 2) + n_chars / 100"}}},
        | "sort": [{"doc_id": "asc"}], "_source": ["doc_id", "_score"]}""".stripMargin,
      graft.search.IndexMapping(Map("text" -> "text"))
    ).as[(Long, Double)].collect().toSeq
    // doc 1: 1%2 + 13/100 = 1.13; doc 2: 0 + 0.19; doc 3 filtered out
    assert(out == Seq((1L, 1.13), (2L, 0.19)))
    intercept[IllegalArgumentException] {
      JsonDsl.parse(docs, """{"query": {"script_score": {"script": "mod(doc_id 2)"}}}""")
    }
    intercept[IllegalArgumentException] {
      JsonDsl.parse(docs, """{"query": {"script_score": {"query": {"match_all": {}}}}}""")
    }
  }

  test("combined_fields parses f^w boosts and rejects empty terms") {
    val parts = Seq((1L, "small brass rod", "small"), (2L, "large case", "anodized")).toDF("pk", "name", "typ")
    val out = JsonDsl.parse(
      parts,
      """{"query": {"combined_fields": {"query": "small", "fields": ["name", "typ^0.5"]}},
        | "sort": [{"pk": "asc"}], "_source": ["pk", "_score"]}""".stripMargin
    ).as[(Long, Double)].collect().toSeq
    // doc 1 has ctf 1.0 + 0.5 = 1.5, doc 2 zero -> filtered; score > 0
    assert(out.map(_._1) == Seq(1L) && out.head._2 > 0)
    intercept[IllegalArgumentException] {
      JsonDsl.parse(parts, """{"query": {"combined_fields": {"query": "  ", "fields": ["name"]}}}""")
    }
    intercept[IllegalArgumentException] {
      JsonDsl.parse(parts, """{"query": {"combined_fields": {"query": "small", "fields": ["a^b^c"]}}}""")
    }
  }

  test("random_score is a deterministic function of (seed, id)") {
    val a = JsonDsl.parse(
      docs,
      """{"query": {"function_score": {"random_score": {"seed": 7, "field": "doc_id"}}},
        | "sort": [{"doc_id": "asc"}], "_source": ["doc_id", "_score"]}""".stripMargin
    ).as[(Long, Double)].collect().toSeq
    val b = JsonDsl.parse(
      docs.repartition(3),
      """{"query": {"function_score": {"random_score": {"seed": 7, "field": "doc_id"}}},
        | "sort": [{"doc_id": "asc"}], "_source": ["doc_id", "_score"]}""".stripMargin
    ).as[(Long, Double)].collect().toSeq
    assert(a == b && a.forall { case (_, s) => s >= 0.0 && s < 1.0 })
  }

  test("script_fields project computed columns and refuse aggs") {
    val out = JsonDsl.parse(
      docs,
      """{"script_fields": {"half": {"script": {"source": "n_chars / 2"}}},
        | "sort": [{"doc_id": "asc"}], "_source": ["doc_id", "half"]}""".stripMargin
    ).as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 6.5), (2L, 9.5), (3L, 6.0)))
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        docs,
        """{"script_fields": {"half": {"script": "n_chars / 2"}},
          | "aggs": {"n": {"value_count": {"field": "doc_id"}}}}""".stripMargin
      )
    }
  }

  test("global computes the all-docs bucket from the unfiltered frame") {
    val ev = Seq(("buy", 10.0), ("buy", 20.0), ("view", 40.0)).toDF("event_type", "value")
    val out = JsonDsl.parse(
      ev,
      """{"query": {"term": {"event_type": "buy"}},
        | "aggs": {
        |   "hits_avg": {"avg": {"field": "value"}},
        |   "all": {"global": {}, "aggs": {"total_avg": {"avg": {"field": "value"}}}}}}""".stripMargin
    ).as[(Long, Double, Long, Double)].collect().toSeq
    // hits: 2 docs avg 15; global escapes the query: 3 docs avg 23.333333
    assert(out == Seq((2L, 15.0, 3L, 23.333333)))
    intercept[IllegalArgumentException] {
      JsonDsl.parse(ev, """{"aggs": {"all": {"global": {}}}}""")
    }
  }

  test("children agg joins the bound relation and fails loudly on an unbound type") {
    val parents = Seq((1L, "HI"), (2L, "LO")).toDF("pk", "prio")
    val children = Seq((1L, 3.0), (1L, 4.0), (2L, 5.0)).toDF("ck", "qty")
    val body =
      """{"aggs": {"per_prio": {"terms": {"field": "prio"},
        |  "aggs": {"to_child": {
        |    "children": {"type": "kids", "join": {"parent": "pk", "child": "ck"}},
        |    "aggs": {"child_count": {"value_count": {"field": "ck"}},
        |             "total_qty": {"sum": {"field": "qty"}}}}}}}}""".stripMargin
    val out = JsonDsl.parse(parents, body, relations = Map("kids" -> children))
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("HI", 2L, 7.0), ("LO", 1L, 5.0)))
    intercept[IllegalArgumentException] {
      JsonDsl.parse(parents, body).collect()
    }
  }

  test("diversified_sampler caps docs per diversity value before the terms sub-agg") {
    val d = Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "book"), (4L, "de", "web")
    ).toDF("doc_id", "lang", "source")
    val out = JsonDsl.parse(
      d,
      """{"aggs": {"sample": {
        |   "diversified_sampler": {"field": "lang", "max_docs_per_value": 2, "id_field": "doc_id"},
        |   "aggs": {"src": {"terms": {"field": "source"}}}}}}""".stripMargin
    ).as[(String, Long)].collect().toSeq
    // en contributes exactly 2 of its 3 docs + de's 1: total 3 sampled
    assert(out.map(_._2).sum == 3)
    intercept[IllegalArgumentException] {
      JsonDsl.parse(d, """{"aggs": {"s": {"diversified_sampler": {"field": "lang", "id_field": "doc_id"}}}}""")
    }
  }

  test("phrase suggester composes per-position corrections; unknown suggester type fails") {
    val d = Seq(
      (1L, "fast query engine"), (2L, "fast query plans"), (3L, "slow scan")
    ).toDF("doc_id", "text")
    val out = JsonDsl.parse(
      d,
      """{"suggest": {"fix": {"text": "fast qery",
        |   "phrase": {"field": "text", "max_errors": 2, "size": 3}}}}""".stripMargin
    ).collect()
    // the corpus-bigram-backed correction ranks first
    assert(out.head.getString(0) == "fast query")
    intercept[IllegalArgumentException] {
      JsonDsl.parse(d, """{"suggest": {"fix": {"text": "x", "nope": {"field": "text"}}}}""")
    }
  }

  test("missing and filter aggs bucket one row; nested agg folds without exploding") {
    val c = Seq((1L, Some(10L), 5.0), (2L, None, 7.0), (3L, None, 9.0)).toDF("id", "ref", "bal")
    val miss = JsonDsl.parse(
      c,
      """{"aggs": {"no_ref": {"missing": {"field": "ref"},
        |   "aggs": {"avg_bal": {"avg": {"field": "bal"}}}}}}""".stripMargin
    ).as[(Long, Double)].collect().toSeq
    assert(miss == Seq((2L, 8.0)))
    val filt = JsonDsl.parse(
      c,
      """{"aggs": {"big": {"filter": {"range": {"bal": {"gte": 7}}},
        |   "aggs": {"avg_bal": {"avg": {"field": "bal"}}}}}}""".stripMargin
    ).as[(Long, Double)].collect().toSeq
    assert(filt == Seq((2L, 8.0)))
  }

  test("nested agg metrics fold per row; reverse_nested counts distinct parents") {
    val parents = Seq((10L, "a"), (20L, "b")).toDF("pk", "name")
    val children = Seq((10L, 2.0, "R"), (10L, 4.0, "R"), (20L, 6.0, "N")).toDF("ck", "qty", "flag")
    val nested = graft.search.Nested.nestedIndex(parents, children, "pk", "ck", "items", Seq("qty", "flag"))
    val m = JsonDsl.parse(
      nested,
      """{"aggs": {"li": {"nested": {"path": "items"},
        |   "aggs": {"avg_qty": {"avg": {"field": "items.qty"}}}}}}""".stripMargin
    ).as[(Long, Double)].collect().toSeq
    assert(m == Seq((3L, 4.0)))
    val rn = JsonDsl.parse(
      nested,
      """{"aggs": {"li": {"nested": {"path": "items"},
        |   "aggs": {"by_flag": {"terms": {"field": "items.flag"},
        |     "aggs": {"parents": {"reverse_nested": {"id_field": "pk"}}}}}}}}""".stripMargin
    ).as[(String, Long, Long)].collect().toSeq
    assert(rn == Seq(("N", 1L, 1L), ("R", 2L, 1L)))
    // a non-path-prefixed sub-field fails the wire contract
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        nested,
        """{"aggs": {"li": {"nested": {"path": "items"},
          |   "aggs": {"avg_qty": {"avg": {"field": "qty"}}}}}}""".stripMargin
      )
    }
  }

  test("parent agg counts each parent once per bucket and needs its relation") {
    val parents = Seq((10L, 100.0), (20L, 50.0)).toDF("pk", "total")
    val children = Seq((10L, "R"), (10L, "R"), (20L, "N")).toDF("ck", "flag")
    val body =
      """{"aggs": {"by_flag": {"terms": {"field": "flag"},
        |   "aggs": {"to_parent": {
        |     "parent": {"type": "p", "join": {"parent": "pk", "child": "ck"}},
        |     "aggs": {"avg_total": {"avg": {"field": "total"}}}}}}}}""".stripMargin
    val out = JsonDsl.parse(children, body, relations = Map("p" -> parents))
      .as[(String, Long, Double)].collect().toSeq
    // flag R has TWO child rows but ONE parent: parent_count 1, avg 100
    assert(out == Seq(("N", 1L, 50.0), ("R", 1L, 100.0)))
    intercept[IllegalArgumentException] {
      JsonDsl.parse(children, body).collect()
    }
  }

  test("_analyze streams the analyzer's tokens; _field_caps reflects schema + mapping") {
    val toks = JsonDsl.analyzeText(spark, """{"text": "Fast CAR"}""").as[(Long, String)].collect().toSeq
    assert(toks == Seq((0L, "fast"), (1L, "car")))
    intercept[IllegalArgumentException] {
      JsonDsl.analyzeText(spark, """{"analyzer": "whitespace", "text": "x"}""")
    }
    intercept[IllegalArgumentException] { JsonDsl.analyzeText(spark, """{"analyzer": "standard"}""") }
    val caps = JsonDsl
      .fieldCaps(docs, graft.search.IndexMapping(Map("text" -> "text")))
      .as[(String, String, Boolean, Boolean)].collect().toSeq
    assert(caps == Seq(
      ("doc_id", "long", true, true),
      ("n_chars", "long", true, true),
      ("text", "text", true, false)
    ))
  }

  test("_sql accepts only SELECT; _script sort ranks by the compiled expression") {
    val out = JsonDsl.sqlQuery(docs, "d_sql", """{"query": "SELECT count(*) AS n FROM d_sql"}""")
      .as[Long].collect().toSeq
    assert(out == Seq(3L))
    intercept[IllegalArgumentException] {
      JsonDsl.sqlQuery(docs, "d_sql", """{"query": "DROP TABLE d_sql"}""")
    }
    val ranked = JsonDsl.parse(
      docs,
      """{"sort": [{"_script": {"type": "number",
        |   "script": {"source": "n_chars - doc_id"}, "order": "desc"}}],
        | "_source": ["doc_id"]}""".stripMargin
    ).as[Long].collect().toSeq
    // n_chars - doc_id: doc2 = 17, doc1 = 12, doc3 = 9
    assert(ranked == Seq(2L, 1L, 3L))
  }

  test("indexed knn compiles onto the IVF scale path and pins its contract") {
    import graft.operators.Similarity
    val emb = (0L until 40L).map(i => (i, Array.tabulate(4)(d => (i % 7 + d).toFloat))).toDF("id", "v")
    val idx = Similarity.ivfIndex(emb, "id", "v", nLists = 4)
    val body =
      """{"query": {"knn": {"v": {"vector": [1.0, 2.0, 3.0, 4.0], "k": 5,
        |  "method": {"name": "ivf", "nprobe": 2}}}}}""".stripMargin
    val wire = JsonDsl.knnIvf(idx, "id", "v", body).collect().toSeq
    val structured = Similarity.scoreAgainstIvf(idx, "id", "v", Seq(1f, 2f, 3f, 4f), 5, 2).collect().toSeq
    assert(wire == structured && wire.size == 5)
    intercept[IllegalArgumentException] {
      JsonDsl.knnIvf(idx, "id", "v",
        """{"query": {"knn": {"v": {"vector": [1, 2, 3, 4], "k": 5, "method": {"name": "hnsw"}}}}}""")
    }
    intercept[IllegalArgumentException] {
      JsonDsl.knnIvf(idx, "id", "wrong",
        """{"query": {"knn": {"v": {"vector": [1, 2, 3, 4], "k": 5, "method": {"name": "ivf"}}}}}""")
    }

    // the faiss ivf+pq encoder spelling routes to the PQ engine and
    // matches the structured scoreAgainstPq exactly; a pq body on the
    // flat-ivf handler (and vice versa) is a 400, not a silent fallback
    val pqIdx = Similarity.pqIndex(emb, "id", "v", nLists = 4, m = 2, ksub = 4)
    val pqBody =
      """{"query": {"knn": {"v": {"vector": [1.0, 2.0, 3.0, 4.0], "k": 5,
        |  "method": {"name": "ivf", "encoder": {"name": "pq"}, "nprobe": 2}}}}}""".stripMargin
    val pqWire = JsonDsl.knnPq(pqIdx, "id", "v", pqBody).collect().toSeq
    val pqStructured = Similarity.scoreAgainstPq(pqIdx, "id", "v", Seq(1f, 2f, 3f, 4f), 5, 2).collect().toSeq
    assert(pqWire == pqStructured && pqWire.size == 5)
    intercept[IllegalArgumentException](JsonDsl.knnIvf(idx, "id", "v", pqBody))
    intercept[IllegalArgumentException](JsonDsl.knnPq(pqIdx, "id", "v", body))
  }

  test("span_multi wraps a prefix matcher as a span; non-prefix matchers fail") {
    val d = Seq((1L, "sparse data fast"), (2L, "fast code"), (3L, "spartan text")).toDF("doc_id", "text")
    val near = JsonDsl.parse(
      d,
      """{"query": {"span_near": {
        |   "clauses": [
        |     {"span_multi": {"match": {"prefix": {"text": {"value": "spar"}}}}},
        |     {"span_term": {"text": {"value": "fast"}}}],
        |   "slop": 2, "in_order": false}},
        | "sort": [{"doc_id": "asc"}], "_source": ["doc_id"]}""".stripMargin,
      graft.search.IndexMapping(Map("text" -> "text"))
    ).as[Long].collect().toSeq
    assert(near == Seq(1L))
    val standalone = JsonDsl.parse(
      d,
      """{"query": {"span_multi": {"match": {"prefix": {"text": {"value": "spar"}}}}},
        | "sort": [{"doc_id": "asc"}], "_source": ["doc_id"]}""".stripMargin
    ).as[Long].collect().toSeq
    assert(standalone == Seq(1L, 3L))
    intercept[IllegalArgumentException] {
      JsonDsl.parse(d, """{"query": {"span_multi": {"match": {"wildcard": {"text": {"value": "sp*"}}}}}}""")
    }
  }

  test("date_histogram min_doc_count=0 zero-fills gap days in the metric's own type") {
    val ev = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5.0),
      (java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 7.0)
    ).toDF("ts", "v")
    val out = JsonDsl.parse(
      ev,
      """{"aggs": {"daily": {
        |   "date_histogram": {"field": "ts", "calendar_interval": "day", "min_doc_count": 0},
        |   "aggs": {"total": {"sum": {"field": "v"}}}}}}""".stripMargin
    ).collect()
    assert(out.length == 3)
    val gap = out(1)
    assert(gap.getLong(1) == 0L && gap.getDouble(2) == 0.0)
  }
}
