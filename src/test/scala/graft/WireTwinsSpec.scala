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
}
