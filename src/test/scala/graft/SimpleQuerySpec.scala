package graft

import graft.search.SimpleQuery
import org.apache.spark.sql.DataFrame

/** The simple_query_string parser vs hand-built predicates: each query
  * must select exactly the rows its structured equivalent does, with
  * Lucene SimpleQueryParser precedence (`+` binds tighter than `|`).
  */
class SimpleQuerySpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, "the fast cat runs"),
    (2L, "a slow dog sleeps"),
    (3L, "the fast dog jumps"),
    (4L, "streaming spark jobs"),
    (5L, "spark query engine"),
    (6L, "spark hash join planner"),
    (7L, "slow spark merge path")
  ).toDF("id", "text")

  private def ids(q: String, defaultAnd: Boolean = true): Set[Long] =
    rows.filter(SimpleQuery.parse(col("text"), q, defaultAnd)).select("id").as[Long].collect().toSet

  private def col(c: String) = org.apache.spark.sql.functions.col(c)

  test("terms, + (AND), | (OR), and precedence: + binds tighter than |") {
    assert(ids("spark") == Set(4L, 5L, 6L, 7L))
    assert(ids("spark + query") == Set(5L))
    assert(ids("cat | dog") == Set(1L, 2L, 3L))
    // a + b | c parses as (a AND b) OR c, not a AND (b OR c)
    assert(ids("spark + query | cat") == Set(1L, 5L))
  }

  test("negation keeps non-matching rows; phrases require adjacency") {
    assert(ids("spark -slow") == Set(4L, 5L, 6L))
    assert(ids("\"hash join\"") == Set(6L))
    assert(ids("\"join hash\"") == Set.empty)
  }

  test("grouping, prefix, and the default operator") {
    assert(ids("spark + (merge | \"hash join\") -slow") == Set(6L))
    assert(ids("stream*") == Set(4L))
    // bare adjacency: AND by default, OR when defaultAnd=false
    assert(ids("fast dog") == Set(3L))
    assert(ids("fast dog", defaultAnd = false) == Set(1L, 2L, 3L))
  }

  test("malformed input fails fast") {
    intercept[IllegalArgumentException](ids("\"unterminated"))
    intercept[IllegalArgumentException](ids("bad&char"))
  }

  test("stray ) is dropped (Lucene fault tolerance), not a silent truncation") {
    // before the fix, "spark) + query" parsed as just "spark" — the
    // unmatched ) ended parseOr early and the rest of the query vanished
    assert(ids("spark) + query") == ids("spark + query"))
    assert(ids(") spark") == ids("spark"))
    // matched groups still close correctly after a stray ) is dropped
    assert(ids("spark) + (merge | \"hash join\") -slow") == Set(6L))
    // an unterminated group is still an error (same contract as phrases)
    intercept[IllegalArgumentException](ids("(spark + query"))
  }

  test("default operator is OR, matching simple_query_string default_operator") {
    // bare adjacency with no explicit defaultAnd: OR semantics
    assert(ids2("fast dog") == Set(1L, 2L, 3L))
  }

  private def ids2(q: String): Set[Long] =
    rows.filter(SimpleQuery.parse(col("text"), q)).select("id").as[Long].collect().toSet
}
