package graft

import graft.search.JsonDsl
import org.apache.spark.sql.DataFrame

/** Generative drill for the hits-shaping stages of the wire API that
  * run AFTER query compilation — collapse, two-phase rescore, and
  * highlight — against independent Scala folds:
  *
  *  - collapse: one top hit per group under the body's sort (the
  *    TopKPerKey k=1 path through the wire face), winners re-sorted
  *    and size-truncated;
  *  - rescore: first phase = filter + sort + window_size truncation,
  *    second = score by |distinct analyzed doc tokens ∩ distinct
  *    rescore terms|, re-rank by (_score desc, first-phase sort) —
  *    the two-phase cost-model semantics, including that docs OUTSIDE
  *    the window never re-enter however well they'd score;
  *  - highlight: fragment_size window starting 15 chars before the
  *    first literal occurrence of the query's term, null when the
  *    term does not literally occur.
  */
class HitsShapingFuzzSpec extends SparkSpec {

  private val vocab = Vector(
    "amber", "basalt", "cobalt", "delta", "ember", "flint", "granite", "harbor",
    "indigo", "jasper", "krypton", "lumen", "marble", "nickel", "onyx", "pewter"
  )

  private case class Doc(id: Long, grp: String, num: Int, text: String)

  private def mkDocs(rnd: scala.util.Random, n: Int): Seq[Doc] =
    Seq.tabulate(n) { i =>
      val len = 4 + rnd.nextInt(20)
      Doc(
        i.toLong,
        s"g${rnd.nextInt(8)}",
        rnd.nextInt(40),
        Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      )
    }

  private def toDf(docs: Seq[Doc], rnd: scala.util.Random): DataFrame = {
    val s = spark
    import s.implicits._
    docs.map(d => (d.id, d.grp, d.num, d.text)).toDF("id", "grp", "num", "text").repartition(1 + rnd.nextInt(4))
  }

  test("collapse: one top hit per group under the body sort, winners re-sorted and sized") {
    val rnd = new scala.util.Random(0xc0112a5eL)
    (1 to 8).foreach { ci =>
      val docs = mkDocs(rnd, 60 + rnd.nextInt(100))
      val df = toDf(docs, rnd)
      val asc = rnd.nextBoolean()
      val dir = if (asc) "asc" else "desc"
      val k = 1 + rnd.nextInt(6)
      val cut = rnd.nextInt(30)
      val body =
        s"""{"query": {"range": {"num": {"gte": $cut}}},
           | "sort": [{"num": "$dir"}, {"id": "asc"}],
           | "collapse": {"field": "grp"}, "size": $k}""".stripMargin
      val got = JsonDsl.parse(df, body).collect().map(r => r.getLong(r.fieldIndex("id"))).toSeq
      val ord = Ordering.by[(Doc, Unit), (Int, Long)] { case (d, _) => (if (asc) d.num else -d.num, d.id) }
      val want = docs
        .filter(_.num >= cut)
        .groupBy(_.grp)
        .map { case (_, xs) => xs.map(d => (d, ())).min(ord)._1 }
        .toSeq
        .sortBy(d => (if (asc) d.num else -d.num, d.id))
        .take(k)
        .map(_.id)
      assert(got == want, s"corpus $ci ($dir, size=$k, cut=$cut): collapse mismatch")
    }
  }

  test("rescore: window truncation then term-overlap re-rank, docs outside the window stay out") {
    val rnd = new scala.util.Random(0x4e5c04eL)
    (1 to 8).foreach { ci =>
      val docs = mkDocs(rnd, 60 + rnd.nextInt(100))
      val df = toDf(docs, rnd)
      val window = 5 + rnd.nextInt(25)
      val k = 1 + rnd.nextInt(window)
      val cut = rnd.nextInt(20)
      val nTerms = 1 + rnd.nextInt(4)
      val terms = Vector.fill(nTerms)(vocab(rnd.nextInt(vocab.size)))
      val body =
        s"""{"query": {"range": {"num": {"gte": $cut}}},
           | "sort": [{"num": "desc"}, {"id": "asc"}],
           | "rescore": {"window_size": $window,
           |   "query": {"rescore_query": {"match": {"text": "${terms.mkString(" ")}"}}}},
           | "size": $k}""".stripMargin
      val got = JsonDsl
        .parse(df, body)
        .collect()
        .map(r => (r.getLong(r.fieldIndex("id")), r.getInt(r.fieldIndex("_score"))))
        .toSeq
      val qTerms = terms.map(_.toLowerCase).distinct.toSet
      val want = docs
        .filter(_.num >= cut)
        .sortBy(d => (-d.num, d.id))
        .take(window)
        .map(d => (d, d.text.toLowerCase.split(" ", -1).toSet.intersect(qTerms).size))
        .sortBy { case (d, sc) => (-sc, -d.num, d.id) }
        .take(k)
        .map { case (d, sc) => (d.id, sc) }
      assert(got == want, s"corpus $ci (window=$window k=$k terms=$terms): rescore mismatch")
    }
  }

  test("highlight: fragment window around the first literal occurrence, null when absent") {
    val rnd = new scala.util.Random(0x81611317L)
    (1 to 8).foreach { ci =>
      val docs = mkDocs(rnd, 40 + rnd.nextInt(80))
      val df = toDf(docs, rnd)
      val term = vocab(rnd.nextInt(vocab.size))
      val fragSize = 20 + rnd.nextInt(80)
      val body =
        s"""{"query": {"match": {"text": "$term"}},
           | "sort": [{"id": "asc"}],
           | "highlight": {"fields": {"text": {"fragment_size": $fragSize}}}}""".stripMargin
      // `text` must be DECLARED text: the dynamic-mapping default is
      // keyword (exact match), under which a single-term match finds
      // nothing in multi-token prose — by contract, not by accident.
      val got = JsonDsl
        .parse(df, body, graft.search.IndexMapping(Map("text" -> "text")))
        .collect()
        .map(r => (r.getLong(r.fieldIndex("id")), Option(r.getString(r.fieldIndex("text_highlight")))))
        .toSeq
      val want = docs
        .filter(_.text.toLowerCase.split(" ", -1).contains(term))
        .sortBy(_.id)
        .map { d =>
          val pos0 = d.text.indexOf(term)
          val snippet =
            if (pos0 < 0) None
            else {
              val start = math.max(pos0 - 15, 0)
              Some(d.text.substring(start, math.min(start + fragSize, d.text.length)))
            }
          (d.id, snippet)
        }
      assert(got == want, s"corpus $ci (term=$term frag=$fragSize): highlight mismatch")
    }
  }
}
