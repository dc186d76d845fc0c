package graft

import graft.search.{Aggs, SearchDsl}
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox", "ACTIVE", 10.0),
    (2L, "lazy dog sleeps", "ACTIVE", 150.0),
    (3L, "quick quick dog", "BLOCKED", 75.0),
    (4L, "nothing here", "INACTIVE", 200.0)
  ).toDF("id", "text", "status", "amount")

  test("matchScore: OR semantics, per-term hit count") {
    val out = docs
      .select($"id", SearchDsl.matchScore($"text", Seq("quick", "dog")).as("score"))
      .filter($"score" > 0)
      .orderBy($"score".desc, $"id")
      .as[(Long, Int)]
      .collect()
    assert(out.toSeq == Seq((3L, 2), (1L, 1), (2L, 1)))
  }

  test("bool combines must/mustNot; range is inclusive") {
    val out = docs
      .filter(
        SearchDsl.bool(
          must = Seq(SearchDsl.range($"amount", gte = Some(75.0))),
          mustNot = Seq(SearchDsl.term($"status", "INACTIVE"))
        )
      )
      .select("id")
      .as[Long]
      .collect()
      .sorted
    assert(out.toSeq == Seq(2L, 3L))
  }

  test("wildcard maps * and ? to SQL LIKE") {
    assert(docs.filter(SearchDsl.wildcard($"text", "*quick*")).count() == 2)
    assert(docs.filter(SearchDsl.wildcard($"text", "lazy do? sleeps")).count() == 1)
  }

  test("termsAgg orders by count desc then key") {
    val out = Aggs.termsAgg(docs, $"status", 2).as[(String, Long)].collect()
    assert(out.toSeq == Seq(("ACTIVE", 2L), ("BLOCKED", 1L)))
  }

  test("filteredCounts computes conditional counts in one pass") {
    val out = Aggs.filteredCounts(docs, Seq("n_big" -> ($"amount" > 100))).collect().head
    assert(out.getLong(0) == 4L && out.getLong(1) == 2L)
  }

  test("topN is TakeOrderedAndProject (no global sort at scale)") {
    val q = Aggs.topN(docs, 2, Seq($"amount".desc))
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(q.select("id").as[Long].collect().toSeq == Seq(4L, 2L))
  }

  test("matchPhrase requires adjacency, prefixQuery matches token starts") {
    assert(docs.filter(SearchDsl.matchPhrase($"text", "quick brown")).count() == 1)
    assert(docs.filter(SearchDsl.matchPhrase($"text", "brown quick")).count() == 0)
    assert(docs.filter(SearchDsl.prefixQuery($"text", "sle")).count() == 1)
  }

  test("histogram buckets by fixed width") {
    val out = Aggs.histogram(docs, $"amount", 100.0).as[(Double, Long)].collect()
    assert(out.toSeq == Seq((0.0, 2L), (100.0, 1L), (200.0, 1L)))
  }

  test("rangeAgg labels [from, to) buckets") {
    val out = Aggs
      .rangeAgg(docs, $"amount", Seq(("lo", None, Some(100.0)), ("hi", Some(100.0), None)))
      .as[(String, Long)]
      .collect()
    assert(out.toSeq == Seq(("hi", 2L), ("lo", 2L)))
  }

  test("topHits bounds ranks per bucket — via the heap exec, no window sort") {
    val q = Aggs.topHits(docs, $"status", 1, Seq($"amount".desc))
    val out = q
      .select("id", "rank")
      .as[(Long, Int)]
      .collect()
      .toSet
    assert(out == Set((2L, 1), (3L, 1), (4L, 1))) // max-amount doc per status
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort of the whole table:\n$plan")
    assert(plan.contains("TopKPerKey"), plan)
    // ties + multi-column ordering keep window-form semantics
    val multi = Aggs
      .topHits(docs, $"status", 2, Seq($"amount".desc, $"id".asc))
      .select("id", "rank")
      .as[(Long, Int)]
      .collect()
      .toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"status").orderBy($"amount".desc, $"id".asc)
    val windowForm = docs
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 2)
      .select("id", "rank")
      .as[(Long, Int)]
      .collect()
      .toSet
    assert(multi == windowForm)
  }

  test("significantTerms scores foreground lift") {
    val out = Aggs
      .significantTerms(docs, $"status", $"amount" > 100)
      .select("term", "fg_count", "bg_count")
      .as[(String, Long, Long)]
      .collect()
    // foreground docs: id2 (ACTIVE), id4 (INACTIVE)
    assert(out.find(_._1 == "INACTIVE").get._2 == 1L)
    assert(out.find(_._1 == "BLOCKED").get._2 == 0L)
  }

  test("compositePage resumes strictly after the cursor") {
    val out = Aggs
      .compositePage(docs, Seq($"status", $"text"), after = Some(Seq("ACTIVE", "lazy dog sleeps")), size = 10)
      .select("k0")
      .as[String]
      .collect()
    // "the quick brown fox" (ACTIVE) sorts after the cursor text, so one
    // ACTIVE bucket remains on this page.
    assert(out.toSeq == Seq("ACTIVE", "BLOCKED", "INACTIVE"))
  }

  test("predicates push down to the parquet scan") {
    val q = Tables.lineitem(spark, Sf).filter($"l_quantity" > 10).select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)]"), scan)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), scan)
  }
}
