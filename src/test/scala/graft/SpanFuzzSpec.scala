package graft

import graft.search.{IndexMapping, JsonDsl}
import org.apache.spark.sql.functions._

/** Differential fuzzer for the POSITIONAL clause family — span_term /
  * span_near (in_order and not, with slop) / span_or / span_first /
  * span_not (pre/post exclusion windows) / span_within /
  * span_containing / intervals (all_of ordered, max_gaps, any_of
  * sources) / match_bool_prefix — the token-position HOF plans where
  * off-by-ones live. Texts are SHORT sequences over a TINY vocabulary,
  * so repeated terms, adjacent pairs, self-pairs (same term twice) and
  * boundary slops all actually occur. The reference evaluator works on
  * 0-based occurrence position lists, mirroring the documented
  * contract of each clause.
  */
class SpanFuzzSpec extends SparkSpec {

  private val vocab = Vector("ax", "by", "cu", "do", "el")

  private case class Doc(id: Long, text: Option[String])

  private val docs: Vector[Doc] = {
    val rnd = new scala.util.Random(0x59a9L)
    Vector.tabulate(260) { i =>
      Doc(
        i.toLong,
        if (rnd.nextInt(12) == 0) None
        else Some(Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      )
    }
  }

  private lazy val frame = {
    val s = spark
    import s.implicits._
    docs.map(d => (d.id, d.text.orNull)).toDF("_id", "text").cache()
  }

  // ── AST ─────────────────────────────────────────────────────────────
  private sealed trait Sp
  private case class STerm(t: String) extends Sp
  private case class SNear(a: String, b: String, slop: Int, inOrder: Boolean) extends Sp
  private case class SOr(cs: Seq[Sp]) extends Sp
  private case class SFirst(t: String, end: Int) extends Sp
  private case class SNot(incl: String, excl: String, pre: Int, post: Int) extends Sp
  private case class SWithin(little: String, bigA: String, bigB: String, slop: Int, containing: Boolean) extends Sp
  private case class Ivl(aTerms: Seq[String], bTerms: Seq[String], maxGaps: Option[Int]) extends Sp
  private case class MBP(terms: Seq[String], lastPrefix: String) extends Sp

  private def w(rnd: scala.util.Random) = vocab(rnd.nextInt(vocab.size))

  private def gen(rnd: scala.util.Random, depth: Int): Sp = rnd.nextInt(8) match {
    case 0 => STerm(w(rnd))
    case 1 => SNear(w(rnd), w(rnd), rnd.nextInt(4), rnd.nextBoolean())
    case 2 if depth > 0 => SOr(Seq.fill(1 + rnd.nextInt(2))(gen(rnd, 0)) :+ STerm(w(rnd)))
    case 3 => SFirst(w(rnd), 1 + rnd.nextInt(5))
    case 4 => SNot(w(rnd), w(rnd), rnd.nextInt(3), rnd.nextInt(3))
    case 5 => SWithin(w(rnd), w(rnd), w(rnd), 1 + rnd.nextInt(3), rnd.nextBoolean())
    case 6 =>
      Ivl(
        Seq.fill(1 + rnd.nextInt(2))(w(rnd)).distinct,
        Seq(w(rnd)),
        if (rnd.nextBoolean()) Some(rnd.nextInt(4)) else None
      )
    case _ =>
      val ts = Seq.fill(rnd.nextInt(2))(w(rnd))
      val last = w(rnd)
      MBP(ts, last.take(1 + rnd.nextInt(last.length)))
  }

  // ── wire rendering ──────────────────────────────────────────────────
  private def st(t: String) = s"""{"span_term": {"text": {"value": "$t"}}}"""

  private def render(q: Sp): String = q match {
    case STerm(t) => st(t)
    case SNear(a, b, slop, io) =>
      s"""{"span_near": {"clauses": [${st(a)}, ${st(b)}], "slop": $slop, "in_order": $io}}"""
    case SOr(cs) => s"""{"span_or": {"clauses": [${cs.map(render).mkString(",")}]}}"""
    case SFirst(t, end) => s"""{"span_first": {"match": ${st(t)}, "end": $end}}"""
    case SNot(i, e, pre, post) =>
      s"""{"span_not": {"include": ${st(i)}, "exclude": ${st(e)}, "pre": $pre, "post": $post}}"""
    case SWithin(l, a, b, slop, containing) =>
      val name = if (containing) "span_containing" else "span_within"
      s"""{"$name": {"little": ${st(l)}, "big": {"span_near": {"clauses": [${st(a)}, ${st(b)}], "slop": $slop, "in_order": true}}}}"""
    case Ivl(as_, bs, gaps) =>
      def src(ts: Seq[String]) =
        if (ts.size == 1) s"""{"match": {"query": "${ts.head}"}}"""
        else s"""{"any_of": {"intervals": [${ts.map(t => s"""{"match": {"query": "$t"}}""").mkString(",")}]}}"""
      val g = gaps.map(v => s""", "max_gaps": $v""").getOrElse("")
      s"""{"intervals": {"text": {"all_of": {"ordered": true$g, "intervals": [${src(as_)}, ${src(bs)}]}}}}"""
    case MBP(ts, last) =>
      s"""{"match_bool_prefix": {"text": {"query": "${(ts :+ last).mkString(" ")}"}}}"""
  }

  // ── reference evaluator over 0-based positions ──────────────────────
  private def eval(q: Sp, toks: Vector[String]): Boolean = {
    def pos(t: String): Vector[Int] = toks.zipWithIndex.collect { case (x, i) if x == t => i }
    q match {
      case STerm(t) => toks.contains(t)
      case SNear(a, b, slop, io) =>
        val pa = pos(a); val pb = pos(b)
        if (io) pa.exists(x => pb.exists(y => y > x && y - x <= slop))
        else pa.exists(x => pb.exists(y => y != x && math.abs(y - x) <= slop))
      case SOr(cs) => cs.exists(eval(_, toks))
      case SFirst(t, end) =>
        val p = toks.indexOf(t)
        p >= 0 && p + 1 <= end
      case SNot(i, e, pre, post) =>
        pos(i).exists(x => !pos(e).exists(y => y >= x - pre && y <= x + post))
      case SWithin(l, a, b, slop, containing) =>
        val pp = pos(l); val pa = pos(a); val pb = pos(b)
        def bigs = for { x <- pa; y <- pb if y > x && y - x <= slop } yield (x, y)
        if (!containing) pp.exists(p => bigs.exists { case (x, y) => p > x && p < y })
        else bigs.exists { case (x, y) => pp.exists(p => p > x && p < y) }
      case Ivl(as_, bs, gaps) =>
        val pa = as_.flatMap(pos); val pb = bs.flatMap(pos)
        pa.exists(x => pb.exists(y => y > x && gaps.forall(g => y - x - 1 <= g)))
      case MBP(ts, last) =>
        ts.exists(toks.contains) || toks.exists(_.startsWith(last))
    }
  }

  test("600 random positional clauses: hit sets == position reference") {
    val rnd = new scala.util.Random(0x59a10L)
    val mapping = IndexMapping(Map("text" -> "text"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val queries = Seq.fill(600) { val q = gen(rnd, 1); (q, render(q)) }
    queries.grouped(50).foreach { group =>
      val cols = group.zipWithIndex.map { case ((_, json), i) =>
        coalesce(JsonDsl.compileQuery(frame, mapper.readTree(json), mapping), lit(false)).as(s"q$i")
      }
      val rows = frame.select(col("_id") +: cols: _*).collect()
      group.zipWithIndex.foreach { case ((q, json), i) =>
        val got = rows.filter(_.getBoolean(i + 1)).map(_.getLong(0)).toSet
        val want = docs
          .filter(d => d.text.exists(t => eval(q, t.toLowerCase.split(" ", -1).toVector)))
          .map(_.id)
          .toSet
        if (got != want) {
          val extra = (got -- want).toSeq.sorted.take(5)
          val missing = (want -- got).toSeq.sorted.take(5)
          fail(
            s"""mismatch for $json
               |  spark-only: $extra ${extra.headOption.map(x => docs(x.toInt)).getOrElse("")}
               |  reference-only: $missing ${missing.headOption.map(x => docs(x.toInt)).getOrElse("")}""".stripMargin
          )
        }
      }
    }
  }
}
