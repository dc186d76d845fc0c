package graft

import graft.search.{JsonDsl, Nested}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The `nested` field type: per-ELEMENT clause matching over
  * array-of-struct columns, plus the inner_hits payload. The load-bearing
  * test is the object-vs-nested distinction: a clause must hold on ONE
  * element as a whole, never assembled across elements.
  */
class NestedSpec extends SparkSpec {
  import spark.implicits._

  // parent 1: one item satisfies BOTH predicates (matches)
  // parent 2: predicates hold only ACROSS elements (object semantics
  //           would match; nested must not)
  // parent 3: no children at all
  // parent 4: children, none matching
  private lazy val parents = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("pid", "tag")
  private lazy val children = Seq(
    (1L, 1, "R", 50.0),
    (1L, 2, "N", 10.0),
    (2L, 1, "R", 10.0), // flag matches, qty does not
    (2L, 2, "N", 50.0), // qty matches, flag does not
    (4L, 1, "N", 5.0)
  ).toDF("cid", "line", "flag", "qty")

  private lazy val nested =
    Nested.nestedIndex(parents, children, "pid", "cid", "items", Seq("line", "qty", "flag"))

  private val pred: Column => Column =
    x => x.getField("flag") === "R" && x.getField("qty") >= 48

  test("nested matches per element, not across elements (the object-vs-nested distinction)") {
    val hits = nested.filter(Nested.query(col("items"), pred)).select("pid").as[Long].collect().toSet
    assert(hits == Set(1L), "parent 2 satisfies the clause only across two elements and must not match")
    // the childless parent has an EMPTY array (not null): presence is
    // well-defined and the clause correctly never matches it
    val empt = nested.filter(col("pid") === 3L).select(size(col("items"))).as[Int].head()
    assert(empt == 0)
  }

  test("inner_hits returns exactly the matching elements in stored order") {
    val ih = nested
      .filter(Nested.query(col("items"), pred))
      .select(col("pid"), Nested.innerHits(col("items"), pred).as("ih"))
      .select(col("pid"), size(col("ih")).as("n"), col("ih").getItem(0).getField("line").as("line"))
      .as[(Long, Int, Int)]
      .collect()
      .toSeq
    assert(ih == Seq((1L, 1, 1)))
  }

  test("wire nested compiles to the structured plan and agrees row-for-row") {
    val wire = JsonDsl.parse(
      nested,
      """{"query": {"nested": {"path": "items",
        |   "query": {"bool": {"must": [
        |     {"term": {"items.flag": {"value": "R"}}},
        |     {"range": {"items.qty": {"gte": 48}}}]}}}},
        | "sort": [{"pid": "asc"}], "_source": ["pid", "tag"]}""".stripMargin
    )
    val structured = nested
      .filter(Nested.query(col("items"), pred))
      .select("pid", "tag")
      .orderBy("pid")
    assert(wire.collect().toSeq == structured.collect().toSeq)
  }

  test("wire inner_hits explodes matching elements with parent _source columns") {
    val out = JsonDsl.innerHits(
      nested,
      """{"query": {"nested": {"path": "items", "inner_hits": {},
        |   "query": {"bool": {"must": [{"term": {"items.flag": {"value": "R"}}}]}}}},
        | "sort": [{"pid": "asc"}, {"line": "asc"}], "_source": ["pid"]}""".stripMargin
    )
    assert(out.columns.toSeq == Seq("pid", "line", "qty", "flag"))
    val rows = out.select("pid", "line").as[(Long, Int)].collect().toSeq
    assert(rows == Seq((1L, 1), (2L, 1)))
  }

  test("error contract: fields outside the path, scoring clauses, missing inner_hits") {
    intercept[IllegalArgumentException] {
      JsonDsl.parse(nested, """{"query": {"nested": {"path": "items", "query": {"term": {"tag": {"value": "a"}}}}}}""")
        .collect()
    }
    intercept[IllegalArgumentException] {
      JsonDsl.parse(
        nested,
        """{"query": {"nested": {"path": "items", "query": {"match_phrase": {"items.flag": "R"}}}}}"""
      ).collect()
    }
    intercept[IllegalArgumentException] {
      JsonDsl.innerHits(nested, """{"query": {"nested": {"path": "items", "query": {"match_all": {}}}}}""")
    }
  }

  test("nested composes inside bool at the top level") {
    val wire = JsonDsl.parse(
      nested,
      """{"query": {"bool": {
        |   "must": [{"nested": {"path": "items",
        |              "query": {"range": {"items.qty": {"gte": 48}}}}}],
        |   "must_not": [{"term": {"tag": {"value": "b"}}}]}},
        | "sort": [{"pid": "asc"}], "_source": ["pid"]}""".stripMargin
    )
    assert(wire.as[Long].collect().toSeq == Seq(1L))
  }

  private def summarize(idx: org.apache.spark.sql.DataFrame) =
    idx
      .select(col("pid"), expr("transform(items, x -> struct(x.line, x.qty, x.flag))").as("items"))
      .as[(Long, Seq[(Int, Double, String)])]
      .collect()
      .toMap

  test("applyDelta: upsert replaces the ordinal group, delete removes it, others untouched") {
    val delta = Seq(
      (1L, 1, "R", 99.0, "u"), // replace parent 1's line-1 element
      (2L, 3, "X", 1.0, "u"),  // append a new ordinal to parent 2
      (4L, 1, "N", 0.0, "d"),  // delete parent 4's only element
      (9L, 1, "Z", 7.0, "u")   // unknown parent: dropped (no parent, no nested doc)
    ).toDF("cid", "line", "flag", "qty", "op")
    val out = summarize(
      Nested.applyDelta(nested, delta, "pid", "cid", "items", Seq("line", "qty", "flag"))
    )
    assert(out(1L) == Seq((1, 99.0, "R"), (2, 10.0, "N")), s"upsert-replace wrong: ${out(1L)}")
    assert(out(2L) == Seq((1, 10.0, "R"), (2, 50.0, "N"), (3, 1.0, "X")), s"append wrong: ${out(2L)}")
    assert(out(3L).isEmpty && out(4L).isEmpty, "delete/empty parents wrong")
    assert(!out.contains(9L), "a child of an unknown parent must not materialize a parent")
  }

  test("applyDelta folded over deltas equals a fresh build on the net child set") {
    val d1 = Seq((1L, 1, "R", 99.0, "u"), (3L, 1, "A", 2.0, "u")).toDF("cid", "line", "flag", "qty", "op")
    val d2 = Seq((3L, 1, "A", 0.0, "d"), (4L, 2, "B", 3.0, "u")).toDF("cid", "line", "flag", "qty", "op")
    val live = Nested.applyDelta(
      Nested.applyDelta(nested, d1, "pid", "cid", "items", Seq("line", "qty", "flag")),
      d2, "pid", "cid", "items", Seq("line", "qty", "flag")
    )
    val netChildren = Seq(
      (1L, 1, "R", 99.0), (1L, 2, "N", 10.0),
      (2L, 1, "R", 10.0), (2L, 2, "N", 50.0),
      (4L, 1, "N", 5.0), (4L, 2, "B", 3.0)
    ).toDF("cid", "line", "flag", "qty")
    val rebuilt = Nested.nestedIndex(parents, netChildren, "pid", "cid", "items", Seq("line", "qty", "flag"))
    assert(summarize(live) == summarize(rebuilt), "live-maintained artifact diverged from rebuild")
  }

  test("applyDelta with seqCol: multi-op deltas resolve to the LAST op per (parent, ordinal)") {
    // insert-then-delete in ONE delta (a routine CDC micro-batch shape):
    // without the sequence reduction the set-shaped aggregation would keep
    // the upsert regardless of order; with seqCol the element must vanish.
    val insThenDel = Seq(
      (2L, 3, "X", 1.0, "u", 10L), // insert a new element on parent 2 ...
      (2L, 3, "X", 1.0, "d", 11L)  // ... then delete it, later offset
    ).toDF("cid", "line", "flag", "qty", "op", "off")
    val out1 = summarize(
      Nested.applyDelta(nested, insThenDel, "pid", "cid", "items",
        Seq("line", "qty", "flag"), seqCol = Some("off"))
    )
    assert(out1(2L) == Seq((1, 10.0, "R"), (2, 50.0, "N")), s"u-then-d must delete: ${out1(2L)}")
    // the mirror order: delete-then-reinsert keeps the reinserted value
    val delThenIns = Seq(
      (1L, 1, "R", 10.0, "d", 10L),
      (1L, 1, "Q", 77.0, "u", 11L)
    ).toDF("cid", "line", "flag", "qty", "op", "off")
    val out2 = summarize(
      Nested.applyDelta(nested, delThenIns, "pid", "cid", "items",
        Seq("line", "qty", "flag"), seqCol = Some("off"))
    )
    assert(out2(1L) == Seq((1, 77.0, "Q"), (2, 10.0, "N")), s"d-then-u must reinsert: ${out2(1L)}")
  }
}
