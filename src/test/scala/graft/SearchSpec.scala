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

  test("adjacencyMatrix counts pairwise intersections in one pass, drops empty cells") {
    val out = Aggs
      .adjacencyMatrix(
        docs,
        Seq("act" -> ($"status" === "ACTIVE"), "rich" -> ($"amount" > 100), "q" -> $"text".contains("quick"))
      )
      .as[(String, Long)]
      .collect()
      .toMap
    assert(out == Map("act" -> 2L, "rich" -> 2L, "q" -> 2L, "act&rich" -> 1L, "act&q" -> 1L))
    // "rich&q" is empty (no quick doc above 100) and must be dropped.
    assert(!out.contains("rich&q"))
  }

  test("autoDateHistogram picks the smallest interval fitting the target") {
    val ts = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-02-10 23:00:00"))
    ).toDF("id", "ts")
    // span ≈ 41 days: hour (985 buckets) and day (41) overflow 12 → month.
    val m = Aggs.autoDateHistogram(ts, $"ts", targetBuckets = 12)
    assert(m.select("interval").distinct().as[String].collect().toSeq == Seq("month"))
    assert(m.count() == 2)
    // day fits a target of 50.
    val d = Aggs.autoDateHistogram(ts, $"ts", targetBuckets = 50)
    assert(d.select("interval").distinct().as[String].collect().toSeq == Seq("day"))
  }

  test("cumulativeCardinality counts each key once, at its first bucket") {
    val ev = Seq(
      ("u1", "2024-01-01 01:00:00"),
      ("u2", "2024-01-01 02:00:00"),
      ("u1", "2024-01-02 01:00:00"), // repeat: not re-counted
      ("u3", "2024-01-03 01:00:00")
    ).map { case (u, t) => (u, java.sql.Timestamp.valueOf(t)) }.toDF("user", "ts")
    val out = Aggs
      .cumulativeCardinality(ev, $"ts", $"user", "day")
      .select("new_keys", "cum_cardinality")
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(out == Seq((2L, 2L), (0L, 2L), (1L, 3L)))
  }

  test("stringStats entropy matches a hand-computed distribution") {
    // "aab" + "b": 2×a, 2×b → uniform over 2 symbols → exactly 1 bit.
    val df = Seq("aab", "b").toDF("t")
    val row = Aggs.stringStats(df, $"t").head()
    assert(row.getAs[Long]("cnt") == 2L)
    assert(row.getAs[Long]("min_length") == 1L)
    assert(row.getAs[Long]("max_length") == 3L)
    assert(row.getAs[Double]("entropy") == 1.0)
  }

  test("medianAbsoluteDeviation on a known set") {
    // values 1..5: median 3, |x-3| = {2,1,0,1,2} → MAD 1.
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    assert(Aggs.medianAbsoluteDeviation(df, $"v").head().getAs[Double]("mad") == 1.0)
  }

  test("predicates push down to the parquet scan") {
    val q = Tables.lineitem(spark, Sf).filter($"l_quantity" > 10).select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)]"), scan)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), scan)
  }
}
