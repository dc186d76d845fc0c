package graft

import graft.search.QueryString
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** The Discover query-string parser vs hand-built predicates: each query
  * string must select exactly the rows its structured-DSL equivalent does.
  */
class QueryStringSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, "ACTIVE", "DEBIT", 50.0, true, "the fast cat runs"),
    (2L, "ACTIVE", "CREDIT", 1500.0, false, "a slow dog sleeps"),
    (3L, "BLOCKED", "DEBIT", 900.0, true, "the fast dog jumps"),
    (4L, "CLOSED", "PREPAID", 120.0, false, "streaming spark jobs"),
    (5L, null, "DEBIT", 2000.0, true, "spark query engine")
  ).toDF("id", "status", "card_type", "amount", "is_active", "text")

  private def ids(df: DataFrame, q: String, default: Option[String] = None): Set[Long] =
    df.filter(QueryString.parse(df, q, default)).select("id").as[Long].collect().toSet

  test("field terms with AND / OR / NOT / parens (reference Discover syntax)") {
    assert(ids(rows, "status:ACTIVE AND card_type:DEBIT") == Set(1L))
    assert(ids(rows, "status:ACTIVE OR status:BLOCKED") == Set(1L, 2L, 3L))
    assert(ids(rows, "(status:ACTIVE OR status:BLOCKED) AND NOT card_type:CREDIT") == Set(1L, 3L))
  }

  test("comparisons and boolean literals (`amount > 1000 AND is_active:true`)") {
    assert(ids(rows, "amount > 1000") == Set(2L, 5L))
    assert(ids(rows, "amount >= 900 AND amount <= 1500") == Set(2L, 3L))
    assert(ids(rows, "is_active:true AND amount > 100") == Set(3L, 5L))
  }

  test("ranges: inclusive [a TO b], exclusive {a TO b}, and field:>=x") {
    assert(ids(rows, "amount:[120 TO 1500]") == Set(2L, 3L, 4L))
    assert(ids(rows, "amount:{120 TO 1500}") == Set(3L))
    assert(ids(rows, "amount:>=1500") == Set(2L, 5L))
  }

  test("wildcards, existence, and implicit AND adjacency") {
    assert(ids(rows, "card_type:*RE*") == Set(2L, 4L))
    assert(ids(rows, "status:*") == Set(1L, 2L, 3L, 4L))
    assert(ids(rows, "card_type:DEBIT amount:>100") == Set(3L, 5L)) // KQL: space = AND
  }

  test("bare terms and quoted phrases hit the default (analyzed) field") {
    assert(ids(rows, "spark", Some("text")) == Set(4L, 5L))
    assert(ids(rows, "\"the fast\"", Some("text")) == Set(1L, 3L))
    assert(ids(rows, "fast NOT jumps", Some("text")) == Set(1L))
  }

  test("literal underscores in wildcard values stay literal") {
    val df = Seq((1L, "card_type"), (2L, "cardXtype"), (3L, "card_")).toDF("id", "status")
    assert(ids(df, "status:card_*") == Set(1L, 3L)) // '_' must not match 'X'
    assert(ids(df, "status:card?type") == Set(1L, 2L)) // '?' matches any one char
  }

  test("unknown fields and malformed input fail fast") {
    intercept[IllegalArgumentException](ids(rows, "nope:1"))
    intercept[IllegalArgumentException](ids(rows, "bare-term-no-default"))
    intercept[IllegalArgumentException](ids(rows, "status:ACTIVE AND (card_type:DEBIT"))
  }

  test("open-ended range endpoints (`*`) are unbounded, not string literals") {
    assert(ids(rows, "amount:[900 TO *]") == Set(2L, 3L, 5L))
    assert(ids(rows, "amount:[* TO 120]") == Set(1L, 4L))
    assert(ids(rows, "amount:{900 TO *}") == Set(2L, 5L))
    assert(ids(rows, "amount:[* TO *]") == Set(1L, 2L, 3L, 4L, 5L)) // existence
  }

  test("non-numeric literals against numeric/boolean fields fail fast, not null-filter") {
    intercept[IllegalArgumentException](ids(rows, "amount:[abc TO 100]"))
    intercept[IllegalArgumentException](ids(rows, "amount > abc"))
    intercept[IllegalArgumentException](ids(rows, "amount:oops"))
    intercept[IllegalArgumentException](ids(rows, "is_active:maybe"))
  }

  test("date comparisons coerce string literals against timestamp columns") {
    val o = Tables.orders(spark, Sf)
    val got = o.filter(QueryString.parse(o, "o_orderdate >= 2000-01-01 AND o_orderdate < 2000-02-01")).count()
    val want = o
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("2000-02-01").cast("timestamp"))
      .count()
    assert(got == want && want > 0)
  }

  test("parsed predicates push down to the parquet scan") {
    val o = Tables.orders(spark, Sf)
    val q = o
      .filter(QueryString.parse(o, "o_orderstatus:O AND o_totalprice > 150000"))
      .select("o_orderkey")
    // toString elides long filter lists, so assert the untruncated prefix.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), IsNotNull(o_totalprice), " +
      "EqualTo(o_orderstatus,O), GreaterThan(o_total"), plan)
  }

  test("compiles to the same rows as the structured DSL on the real corpus") {
    val o = Tables.orders(spark, Sf)
    val viaString = o.filter(
      QueryString.parse(o, "o_orderstatus:O AND o_totalprice > 200000 AND NOT o_orderpriority:5-LOW")
    )
    val viaDsl = o.filter(
      graft.search.SearchDsl.bool(
        must = Seq(
          graft.search.SearchDsl.term(o("o_orderstatus"), "O"),
          o("o_totalprice") > 200000
        ),
        mustNot = Seq(graft.search.SearchDsl.term(o("o_orderpriority"), "5-LOW"))
      )
    )
    assert(
      viaString.select("o_orderkey").as[Long].collect().sorted.toSeq ==
        viaDsl.select("o_orderkey").as[Long].collect().sorted.toSeq
    )
  }
}
