package graft

import graft.search.Ppl
import org.apache.spark.sql.functions._

/** The PPL pipeline compiler: each pipe stage must land as the
  * corresponding DataFrame combinator in ONE Catalyst plan, with the
  * documented error contract for everything outside the subset.
  */
class PplSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, "click", 1.0, "2024-01-01 10:00:00"),
    (2L, "purchase", 10.0, "2024-01-01 11:00:00"),
    (3L, "purchase", 30.0, "2024-01-02 09:00:00"),
    (4L, "signup", 0.0, "2024-01-02 10:00:00"),
    (5L, "purchase", 5.0, "2024-01-02 11:30:00")
  ).toDF("event_id", "event_type", "value", "ts")
    .withColumn("ts", col("ts").cast("timestamp"))

  private def run(ppl: String) = Ppl.query(_ => events, ppl)

  test("where/fields/sort/head compose; the filter reaches the plan as one Filter") {
    val got = run("source=e | where value >= 5 and not event_type = 'signup' | fields event_id, value | sort -value | head 2")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((3L, 30.0), (2L, 10.0)))
    // one plan: filter + project + bounded sort (TakeOrdered, no global sort)
    val plan = run("source=e | where value >= 5 | fields event_id | sort -event_id | head 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("eval computes, where sees evaled columns, parenthesized comparisons backtrack") {
    val got = run("source=e | eval double_v = value * 2 | where (double_v + 1) > 20 | fields event_id, double_v | sort event_id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 20.0), (3L, 60.0)))
    // boolean parens still group
    val or = run("source=e | where (event_type = 'signup' or value > 25) and event_id < 4 | fields event_id | sort event_id")
      .as[Long].collect().toSeq
    assert(or == Seq(3L))
  }

  test("stats: exact decimal sums, avg as fixed division, span bucketing, rename") {
    val got = run("source=e | stats count() as cnt, sum(value) as sv, avg(value) as av by event_type | sort event_type")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("click", 1L, 1.0, 1.0), ("purchase", 3L, 45.0, 15.0), ("signup", 1L, 0.0, 0.0)))
    val spanned = run("source=e | stats count() as cnt by span(ts, 1d) as day | sort day")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("cnt")).as[(String, Long)].collect().toSeq
    assert(spanned == Seq(("2024-01-01", 2L), ("2024-01-02", 3L)))
    val renamed = run("source=e | rename event_type as kind | stats distinct_count(kind) as kinds")
      .as[Long].collect().toSeq
    assert(renamed == Seq(3L))
  }

  test("top by group ranks on the bounded-heap operator; like() is SQL LIKE") {
    val docs = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"), ("s1", "fr"), ("s2", "de"))
      .toDF("source", "lang")
    val top = Ppl.query(_ => docs, "source=d | top 2 lang by source").orderBy("source", "lang")
    assert(top.as[(String, String, Long)].collect().toSeq == Seq(("s1", "de", 1L), ("s1", "en", 2L), ("s2", "de", 1L)))
    assert(top.queryExecution.executedPlan.toString.contains("TopKPerKey"), "grouped top must use the bounded-heap exec")
    val liked = run("source=e | where like(event_type, 'purch%') | stats count() as cnt").as[Long].head()
    assert(liked == 3L)
  }

  test("parse extracts named groups as columns; in-lists filter; unnamed groups rejected") {
    val logs = Seq(
      (1L, "GET /api/users 200"),
      (2L, "POST /api/orders 500"),
      (3L, "GET /health 200"),
      (4L, "malformed line")
    ).toDF("id", "msg")
    val got = Ppl
      .query(_ => logs, "source=l | parse msg '^(?<verb>[A-Z]+) (?<path>\\S+) (?<status>\\d+)' | fields id, verb, status | sort id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "GET", "200"), (2L, "POST", "500"), (3L, "GET", "200"), (4L, "", "")))
    // parsed columns feed downstream stages like stored ones
    val counted = Ppl
      .query(_ => logs, "source=l | parse msg '^(?<verb>[A-Z]+)' | where verb in ('GET', 'PUT') | stats count() as cnt")
      .as[Long].head()
    assert(counted == 2L)
    // numeric in-list
    val nums = run("source=e | where event_id in (1, 3, 99) | stats count() as cnt").as[Long].head()
    assert(nums == 2L)
    intercept[IllegalArgumentException](
      Ppl.query(_ => logs, "source=l | parse msg '^([A-Z]+) (?<path>\\S+)'") // unnamed group
    )
    intercept[IllegalArgumentException](
      Ppl.query(_ => logs, "source=l | parse msg '^[A-Z]+'") // no groups at all
    )
  }

  test("eventstats appends group stats to every row (null-safe keys); ungrouped form broadcasts") {
    val got = run("source=e | eventstats avg(value) as av by event_type | where value > av | fields event_id | sort event_id")
      .as[Long].collect().toSeq
    assert(got == Seq(3L)) // purchase avg 15.0: only the 30.0 row is above
    // every input row survives (left join), rows and columns appended
    val all = run("source=e | eventstats count() as n by event_type")
    assert(all.count() == 5L && all.columns.contains("n"))
    // a NULL group key joins its own statistics (window-partition semantics)
    val withNull = events.withColumn("event_type", when($"event_id" > 3, lit(null: String)).otherwise($"event_type"))
    val nulls = Ppl.query(_ => withNull, "source=e | eventstats count() as n by event_type")
      .filter($"event_type".isNull).select("n").distinct().as[Long].collect().toSeq
    assert(nulls == Seq(2L))
    // ungrouped: the 1-row aggregate rides a broadcast
    val ungrouped = run("source=e | eventstats max(value) as mx | where value = mx | fields event_id")
      .as[Long].collect().toSeq
    assert(ungrouped == Seq(3L))
  }

  test("trendline: NULL until the window fills, decimal-exact sma, sort required; fillnull replaces") {
    val got = run("source=e | stats sum(value) as hourly by span(ts, 1h) as hr | trendline sort hr sma(2, hourly) as sma2 | sort hr")
      .select(col("sma2")).as[Option[Double]].collect().toSeq
    // hourly series: 1.0, 10.0, 30.0, 0.0, 5.0 -> sma2: null, 5.5, 20.0, 15.0, 2.5
    assert(got == Seq(None, Some(5.5), Some(20.0), Some(15.0), Some(2.5)))
    // default alias <field>_trendline; fillnull 'with ... in' replaces the warm-up NULL
    val filled = run("source=e | stats sum(value) as hourly by span(ts, 1h) as hr | trendline sort hr sma(2, hourly) | fillnull with -1 in hourly_trendline | sort hr")
      .select(col("hourly_trendline")).as[Double].collect().toSeq
    assert(filled.head == -1.0 && filled(1) == 5.5)
    // fillnull 'using f = v' form
    val usingForm = Ppl.query(
      _ => events.withColumn("value", when($"event_id" === 1, lit(null: java.lang.Double)).otherwise($"value")),
      "source=e | fillnull using value = 0 | stats sum(value) as sv"
    ).as[Double].head()
    assert(usingForm == 45.0)
    intercept[IllegalArgumentException](run("source=e | trendline sma(2, value)")) // sort is required
    intercept[IllegalArgumentException](run("source=e | trendline sort ts wma(2, value)"))
  }

  test("property: random expression trees round-trip through the PPL parser bit-identically") {
    // The parser's risky surface is precedence + parenthesized-group
    // backtracking; generate random arith trees and predicates, render
    // them with random redundant parens/whitespace, and compare the
    // compiled pipeline against the directly-built Column. Seeded — a
    // failure reproduces.
    val rnd = new scala.util.Random(20260815L)
    def ws: String = " " * rnd.nextInt(3)

    // (ppl rendering, reference Column, precedence: 1 = +/-, 2 = *, 3 = atom).
    // Precedence-aware unparse: a child is parenthesized only when the
    // flat rendering would re-associate it — left child when strictly
    // looser, right child also on EQUAL precedence (double + and - are
    // not associative bitwise, so the tree shape must survive). Tighter
    // children stay bare, which is exactly what exercises the parser's
    // precedence climbing.
    def genArith(depth: Int): (String, org.apache.spark.sql.Column, Int) =
      if (depth == 0 || rnd.nextInt(4) == 0) rnd.nextInt(4) match {
        case 0 => ("value", col("value"), 3)
        case 1 => ("event_id", col("event_id"), 3)
        case 2 => val n = rnd.nextInt(10); (n.toString, lit(n.toLong), 3)
        case _ => val d = rnd.nextInt(90) / 10.0; (d.toString, lit(d), 3)
      }
      else {
        def sub(parentPrec: Int, rightSide: Boolean): (String, org.apache.spark.sql.Column) = {
          val (s, c, p) = genArith(depth - 1)
          if (p < parentPrec || (rightSide && p == parentPrec)) (s"($s)", c) else (s, c)
        }
        rnd.nextInt(4) match {
          case 0 =>
            val (ls, lc) = sub(1, rightSide = false); val (rs, rc) = sub(1, rightSide = true)
            (s"$ls$ws+$ws$rs", lc + rc, 1)
          case 1 =>
            val (ls, lc) = sub(1, rightSide = false); val (rs, rc) = sub(1, rightSide = true)
            (s"$ls$ws-$ws$rs", lc - rc, 1)
          case 2 =>
            val (ls, lc) = sub(2, rightSide = false); val (rs, rc) = sub(2, rightSide = true)
            (s"$ls$ws*$ws$rs", lc * rc, 2)
          case _ =>
            val (s, c, _) = genArith(depth - 1)
            if (rnd.nextBoolean()) (s"($s)", c, 3) else (s"-($s)", lit(0) - c, 3)
        }
      }

    def genPred(depth: Int): (String, org.apache.spark.sql.Column) =
      if (depth == 0 || rnd.nextInt(3) == 0) {
        val (ls, lc, _) = genArith(2); val (rs, rc, _) = genArith(2)
        rnd.nextInt(4) match {
          case 0 => (s"$ls$ws>$ws$rs", lc > rc)
          case 1 => (s"$ls$ws<=$ws$rs", lc <= rc)
          case 2 => (s"$ls$ws=$ws$rs", lc === rc)
          case _ => (s"$ls$ws!=$ws$rs", lc =!= rc)
        }
      }
      else rnd.nextInt(3) match {
        case 0 =>
          val (ls, lc) = genPred(depth - 1); val (rs, rc) = genPred(depth - 1)
          (s"$ls and $rs", lc.and(rc))
        case 1 =>
          val (ls, lc) = genPred(depth - 1); val (rs, rc) = genPred(depth - 1)
          (s"($ls or $rs)", lc.or(rc))
        case _ =>
          val (s, c) = genPred(depth - 1)
          (s"not ($s)", !c)
      }

    (1 to 60).foreach { i =>
      val (es, ec, _) = genArith(3)
      val got = run(s"source=e | eval z = $es | fields event_id, z | sort event_id")
        .collect().map(r => (r.getLong(0), r.get(1)))
      val want = events.select(col("event_id"), ec.as("z")).orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.get(1)))
      assert(got.toSeq == want.toSeq, s"arith case $i: '$es'")
    }
    (1 to 60).foreach { i =>
      val (ps, pc) = genPred(3)
      val got = run(s"source=e | where $ps | fields event_id | sort event_id").as[Long].collect().toSeq
      val want = events.filter(pc).select("event_id").orderBy("event_id").as[Long].collect().toSeq
      assert(got == want, s"pred case $i: '$ps'")
    }
  }

  test("lookup enriches from a dimension index: as-mapping, replace semantics, left-join misses, no hint") {
    val users = Seq((1L, "ACME", "gold"), (2L, "INIT", "silver")).toDF("uid", "org", "tier")
    def resolve(n: String) =
      n match { case "users" => users; case _ => throw new RuntimeException(s"no $n") }
    def runL(ppl: String) = Ppl.query({ case "e" => events; case n => resolve(n) }, ppl)

    // as-mapping joins uid onto event_id; non-matching rows survive with nulls
    val got = runL("source=e | lookup users uid as event_id | fields event_id, org, tier | sort event_id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, "ACME", "gold"), (2L, "INIT", "silver"),
      (3L, null, null), (4L, null, null), (5L, null, null)))

    // replace semantics: a pre-existing column of the lookup's name is
    // overwritten by the lookup value (null where unmatched)
    val shadowed = Ppl.query(
      { case "e" => events.withColumn("org", lit("pre")); case n => resolve(n) },
      "source=e | lookup users uid as event_id | fields event_id, org | sort event_id"
    ).as[(Long, String)].collect().toSeq
    assert(shadowed == Seq((1L, "ACME"), (2L, "INIT"), (3L, null), (4L, null), (5L, null)))

    // no broadcast hint in the logical plan — AQE owns the strategy
    val plan = runL("source=e | lookup users uid as event_id").queryExecution.logical.toString
    assert(!plan.contains("ResolvedHint"), plan)

    // error contract: unknown index / unknown fields / malformed syntax
    intercept[IllegalArgumentException](runL("source=e | lookup nope uid as event_id"))
    intercept[IllegalArgumentException](runL("source=e | lookup users missing as event_id"))
    intercept[IllegalArgumentException](runL("source=e | lookup users uid as missing"))
    intercept[IllegalArgumentException](runL("source=e | lookup users"))
  }

  test("error contract: unknown command, unknown index, malformed stats, trailing garbage") {
    intercept[IllegalArgumentException](run("source=e | explode value"))
    intercept[IllegalArgumentException](Ppl.query(n => throw new RuntimeException(n), "source=nope | head 1"))
    intercept[IllegalArgumentException](run("source=e | stats median(value) as m"))
    intercept[IllegalArgumentException](run("source=e | stats sum(value)")) // metric aggs need an alias
    intercept[IllegalArgumentException](run("source=e | where value > 1 garbage"))
    intercept[IllegalArgumentException](run("head 3")) // must start with source=
    // wire body form parses the same pipeline
    val viaBody = Ppl.queryBody(_ => events, """{"query": "source=e | stats count() as cnt"}""").as[Long].head()
    assert(viaBody == 5L)
    intercept[IllegalArgumentException](Ppl.queryBody(_ => events, """{"q": "x"}"""))
  }
}
