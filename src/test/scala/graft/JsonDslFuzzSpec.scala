package graft

import graft.search.{IndexMapping, JsonDsl}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential fuzzer for the wire-format query compiler.
  *
  * The r14 percolator tier-equality fixture caught a REAL compiled-tier
  * defect (`match` silently dropping `operator: "and"`) by accident of
  * one hand-written registry row. This spec hunts that class
  * systematically: a seeded generator emits random query ASTs, renders
  * each to its OpenSearch wire JSON, compiles it through
  * [[JsonDsl.compileQuery]], and batch-evaluates hundreds of compiled
  * predicates in a FEW scans (50 boolean columns per projection — one
  * pass each, no per-query jobs). An independent plain-Scala evaluator —
  * written against the documented contract of each clause, NOT against
  * the Spark implementation — scores the same corpus, and the hit sets
  * must agree query by query, row by row.
  *
  * The corpus is adversarial on the axes SQL gets wrong silently:
  * NULL fields (three-valued logic under must_not / should counting),
  * mixed-case keyword values (term is case-sensitive, match is not),
  * and keyword values containing the SQL LIKE metacharacters `_` and
  * `%` (a wildcard compiled naively to LIKE leaks them as wildcards —
  * OpenSearch treats only `*` and `?` as special).
  *
  * Determinism: fixed seed, so a failure reproduces; on mismatch the
  * assertion prints the exact wire JSON and the differing doc ids.
  */
class JsonDslFuzzSpec extends SparkSpec {

  // ── corpus ──────────────────────────────────────────────────────────
  private val vocab = Vector(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega", "grid"
  )
  // underscores and percents on purpose: LIKE metachars that OpenSearch
  // wildcard treats as literals
  private val tagVals = Vector(
    "red", "Red", "blue", "dark_blue", "light_blue", "a%b", "a_b", "axb",
    "green", "gr"
  )

  private case class Doc(
      id: Long,
      text: Option[String],
      tag: Option[String],
      price: Option[Double],
      qty: Option[Int]
  )

  private val docs: Vector[Doc] = {
    val rnd = new scala.util.Random(20260815L)
    Vector.tabulate(240) { i =>
      val text =
        if (rnd.nextInt(10) == 0) None
        else Some(Seq.fill(2 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val tag = if (rnd.nextInt(10) == 0) None else Some(tagVals(rnd.nextInt(tagVals.size)))
      val price = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(10000) / 100.0)
      val qty = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(21))
      Doc(i.toLong, text, tag, price, qty)
    }
  }

  private lazy val frame: DataFrame = {
    val s = spark
    import s.implicits._
    docs
      .map(d => (d.id, d.text.orNull, d.tag.orNull, d.price.map(Double.box).orNull, d.qty.map(Int.box).orNull))
      .toDF("_id", "text", "tag", "price", "qty")
      .select(
        col("_id"),
        col("text"),
        col("tag"),
        col("price").cast("double").as("price"),
        col("qty").cast("int").as("qty")
      )
      .cache()
  }

  private val mapping = IndexMapping(Map("text" -> "text", "tag" -> "keyword"))

  // ── query AST ───────────────────────────────────────────────────────
  private sealed trait Q
  private case object MatchAll extends Q
  private case class Term(v: String) extends Q
  private case class TermsIn(vs: Seq[String]) extends Q
  private case class RangeQ(field: String, gte: Option[Double], lt: Option[Double]) extends Q
  private case class Exists(field: String) extends Q
  private case class MatchQ(tokens: Seq[String], and: Boolean) extends Q
  private case class Phrase(tokens: Seq[String]) extends Q
  private case class Prefix(field: String, p: String) extends Q
  private case class Wildcard(pattern: String) extends Q
  private case class Ids(vals: Seq[Long]) extends Q
  private case class FuzzyQ(field: String, v: String, fuzz: Int) extends Q
  private case class MatchFuzzy(tokens: Seq[String], auto: Boolean, and: Boolean) extends Q
  private case class PhrasePrefix(tokens: Seq[String]) extends Q
  private case class TermsSet(field: String, terms: Seq[String], msm: Int) extends Q
  private case class MultiMatch(tokens: Seq[String], and: Boolean) extends Q
  private case class StrRange(gte: Option[String], lt: Option[String]) extends Q
  private case class Regexp(pattern: String) extends Q
  private case class Bool(
      must: Seq[Q],
      filter: Seq[Q],
      should: Seq[Q],
      mustNot: Seq[Q],
      msm: Option[Int]
  ) extends Q

  private def mutate(rnd: scala.util.Random, s: String): String =
    if (s.isEmpty) s
    else rnd.nextInt(3) match {
      case 0 => s.updated(rnd.nextInt(s.length), ('a' + rnd.nextInt(26)).toChar) // substitute
      case 1 => s.patch(rnd.nextInt(s.length), "", 1) // delete
      case 2 => s.patch(rnd.nextInt(s.length + 1), ('a' + rnd.nextInt(26)).toChar.toString, 0) // insert
    }

  private def genLeaf(rnd: scala.util.Random): Q = rnd.nextInt(17) match {
    case 0 => Term(tagVals(rnd.nextInt(tagVals.size)))
    case 1 => TermsIn(Seq.fill(1 + rnd.nextInt(3))(tagVals(rnd.nextInt(tagVals.size))).distinct)
    case 2 =>
      val field = if (rnd.nextBoolean()) "price" else "qty"
      val lo = if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None
      val hi = if (lo.isEmpty || rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None
      RangeQ(field, lo, hi)
    case 3 => Exists(Seq("text", "tag", "price", "qty")(rnd.nextInt(4)))
    case 4 | 5 =>
      MatchQ(Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).distinct, rnd.nextBoolean())
    case 6 => Phrase(Seq.fill(1 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size))))
    case 7 =>
      if (rnd.nextBoolean()) {
        val w = vocab(rnd.nextInt(vocab.size))
        Prefix("text", w.substring(0, 1 + rnd.nextInt(w.length)))
      } else {
        val t = tagVals(rnd.nextInt(tagVals.size))
        Prefix("tag", t.substring(0, 1 + rnd.nextInt(t.length)))
      }
    case 8 =>
      // patterns built FROM corpus values so literal `_`/`%` collide
      // with real data; `*`/`?` are the only OpenSearch wildcards
      val base = tagVals(rnd.nextInt(tagVals.size))
      val pattern = rnd.nextInt(4) match {
        case 0 => base
        case 1 => base.take(1 + rnd.nextInt(math.max(1, base.length))) + "*"
        case 2 => "*" + base.drop(rnd.nextInt(base.length))
        case 3 => if (base.nonEmpty) base.updated(rnd.nextInt(base.length), '?') else "?"
      }
      Wildcard(pattern)
    case 9 => Ids(Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(docs.size).toLong).distinct)
    case 10 =>
      // fuzzy: near-miss values built by mutating real corpus values,
      // so the edit-distance boundary is actually exercised
      if (rnd.nextBoolean()) {
        val v = mutate(rnd, mutate(rnd, tagVals(rnd.nextInt(tagVals.size))))
        FuzzyQ("tag", v, 1 + rnd.nextInt(2))
      } else {
        val v = mutate(rnd, vocab(rnd.nextInt(vocab.size)))
        FuzzyQ("text", v, 1 + rnd.nextInt(2))
      }
    case 11 =>
      MatchFuzzy(
        Seq.fill(1 + rnd.nextInt(2))(mutate(rnd, vocab(rnd.nextInt(vocab.size)))).distinct,
        auto = rnd.nextBoolean(),
        and = rnd.nextBoolean()
      )
    case 12 =>
      val ts = Seq.fill(1 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size)))
      val last = ts.last
      PhrasePrefix(ts.init :+ last.substring(0, 1 + rnd.nextInt(last.length)))
    case 13 =>
      if (rnd.nextBoolean())
        TermsSet("text", Seq.fill(2 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).distinct, 1 + rnd.nextInt(3))
      else
        TermsSet("tag", Seq.fill(1 + rnd.nextInt(3))(tagVals(rnd.nextInt(tagVals.size))).distinct, 1 + rnd.nextInt(2))
    case 14 =>
      // multi_match over [text, tag]: query tokens from the text vocab,
      // OR a tag value (hitting the keyword leg's whole-string equality)
      val q =
        if (rnd.nextInt(4) == 0) Seq(tagVals(rnd.nextInt(tagVals.size)))
        else Seq.fill(1 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size))).distinct
      MultiMatch(q, rnd.nextBoolean())
    case 15 =>
      val lo = if (rnd.nextBoolean()) Some(tagVals(rnd.nextInt(tagVals.size))) else None
      val hi = if (lo.isEmpty || rnd.nextBoolean()) Some(tagVals(rnd.nextInt(tagVals.size))) else None
      StrRange(lo, hi)
    case 16 =>
      // safe dialect subset shared by Java regex and OpenSearch regexp:
      // literals (tag chars are not regex-special), alternation, `.*`
      val a = tagVals(rnd.nextInt(tagVals.size))
      val b = tagVals(rnd.nextInt(tagVals.size))
      val pattern = rnd.nextInt(4) match {
        case 0 => a
        case 1 => s"$a|$b"
        case 2 => a.take(1 + rnd.nextInt(a.length)) + ".*"
        case 3 => ".*" + a.drop(rnd.nextInt(a.length))
      }
      Regexp(pattern)
  }

  private def genQ(rnd: scala.util.Random, depth: Int): Q =
    if (depth <= 0 || rnd.nextInt(3) > 0) genLeaf(rnd)
    else {
      def list(max: Int): Seq[Q] = Seq.fill(rnd.nextInt(max + 1))(genQ(rnd, depth - 1))
      val should = list(3)
      Bool(
        must = list(2),
        filter = list(2),
        should = should,
        mustNot = list(2),
        msm = if (should.nonEmpty && rnd.nextInt(3) == 0) Some(1 + rnd.nextInt(should.size + 1)) else None
      )
    }

  // ── wire rendering (manual JSON; all values are [a-z0-9_%?*.] safe) ──
  private def jstr(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def render(q: Q): String = q match {
    case MatchAll => """{"match_all": {}}"""
    case Term(v) => s"""{"term": {"tag": {"value": ${jstr(v)}}}}"""
    case TermsIn(vs) => s"""{"terms": {"tag": [${vs.map(jstr).mkString(",")}]}}"""
    case RangeQ(f, gte, lt) =>
      val bounds = gte.map(v => s""""gte": $v""").toSeq ++ lt.map(v => s""""lt": $v""")
      s"""{"range": {"$f": {${bounds.mkString(",")}}}}"""
    case Exists(f) => s"""{"exists": {"field": "$f"}}"""
    case MatchQ(ts, and) =>
      val op = if (and) """, "operator": "and"""" else ""
      s"""{"match": {"text": {"query": ${jstr(ts.mkString(" "))}$op}}}"""
    case Phrase(ts) => s"""{"match_phrase": {"text": ${jstr(ts.mkString(" "))}}}"""
    case Prefix(f, p) => s"""{"prefix": {"$f": {"value": ${jstr(p)}}}}"""
    case Wildcard(p) => s"""{"wildcard": {"tag": {"value": ${jstr(p)}}}}"""
    case Ids(vals) => s"""{"ids": {"values": [${vals.mkString(",")}]}}"""
    case FuzzyQ(f, v, fuzz) =>
      s"""{"fuzzy": {"$f": {"value": ${jstr(v)}, "fuzziness": $fuzz}}}"""
    case MatchFuzzy(ts, auto, and) =>
      val fz = if (auto) "\"AUTO\"" else "1"
      val op = if (and) """, "operator": "and"""" else ""
      s"""{"match": {"text": {"query": ${jstr(ts.mkString(" "))}, "fuzziness": $fz$op}}}"""
    case PhrasePrefix(ts) =>
      s"""{"match_phrase_prefix": {"text": {"query": ${jstr(ts.mkString(" "))}}}}"""
    case TermsSet(f, ts, msm) =>
      s"""{"terms_set": {"$f": {"terms": [${ts.map(jstr).mkString(",")}], "minimum_should_match": $msm}}}"""
    case MultiMatch(ts, and) =>
      val op = if (and) """, "operator": "and"""" else ""
      s"""{"multi_match": {"query": ${jstr(ts.mkString(" "))}, "fields": ["text", "tag"]$op}}"""
    case StrRange(gte, lt) =>
      val bounds = gte.map(v => s""""gte": ${jstr(v)}""").toSeq ++ lt.map(v => s""""lt": ${jstr(v)}""")
      s"""{"range": {"tag": {${bounds.mkString(",")}}}}"""
    case Regexp(p) => s"""{"regexp": {"tag": {"value": ${jstr(p)}}}}"""
    case Bool(must, fil, should, mustNot, msm) =>
      val parts = Seq(
        if (must.nonEmpty) Some(s""""must": [${must.map(render).mkString(",")}]""") else None,
        if (fil.nonEmpty) Some(s""""filter": [${fil.map(render).mkString(",")}]""") else None,
        if (should.nonEmpty) Some(s""""should": [${should.map(render).mkString(",")}]""") else None,
        if (mustNot.nonEmpty) Some(s""""must_not": [${mustNot.map(render).mkString(",")}]""") else None,
        msm.map(m => s""""minimum_should_match": $m""")
      ).flatten
      s"""{"bool": {${parts.mkString(",")}}}"""
  }

  // ── independent evaluator (documented contract, not the impl) ───────
  private def analyzeRef(text: String): Seq[String] = text.toLowerCase.split(" ", -1).toSeq

  /** Textbook Levenshtein DP — independent of Spark's expression. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      )
    d(a.length)(b.length)
  }

  /** OpenSearch AUTO fuzziness ladder: 0 for <3 chars, 1 for 3–5, 2 past. */
  private def autoFuzz(t: String): Int = if (t.length < 3) 0 else if (t.length <= 5) 1 else 2

  private def eval(q: Q, d: Doc): Boolean = q match {
    case MatchAll => true
    case Term(v) => d.tag.contains(v)
    case TermsIn(vs) => d.tag.exists(vs.contains)
    case RangeQ(f, gte, lt) =>
      val v: Option[Double] = if (f == "price") d.price else d.qty.map(_.toDouble)
      v.exists(x => gte.forall(x >= _) && lt.forall(x < _))
    case Exists(f) =>
      f match {
        case "text" => d.text.isDefined
        case "tag" => d.tag.isDefined
        case "price" => d.price.isDefined
        case "qty" => d.qty.isDefined
      }
    case MatchQ(ts, and) =>
      d.text.exists { t =>
        val toks = analyzeRef(t).toSet
        if (and) ts.forall(toks) else ts.exists(toks)
      }
    case Phrase(ts) =>
      d.text.exists(t => (" " + t.toLowerCase + " ").contains(" " + ts.mkString(" ") + " "))
    case Prefix(f, p) =>
      if (f == "text") d.text.exists(analyzeRef(_).exists(_.startsWith(p.toLowerCase)))
      else d.tag.exists(_.startsWith(p))
    case Wildcard(p) =>
      // OpenSearch contract: ONLY `*` and `?` are wildcards; everything
      // else — including `_` and `%` — is literal.
      val regex = p.flatMap {
        case '*' => ".*"
        case '?' => "."
        case c => java.util.regex.Pattern.quote(c.toString)
      }
      d.tag.exists(_.matches(regex))
    case Ids(vals) => vals.contains(d.id)
    case FuzzyQ(f, v, fuzz) =>
      // keyword: whole-value edit distance, case-sensitive; text: any
      // analyzed token within distance of the LOWERCASED query value
      if (f == "tag") d.tag.exists(t => lev(t, v) <= fuzz)
      else d.text.exists(analyzeRef(_).exists(t => lev(t, v.toLowerCase) <= fuzz))
    case MatchFuzzy(ts, auto, and) =>
      d.text.exists { t =>
        val toks = analyzeRef(t)
        def hit(q: String): Boolean = {
          val dd = if (auto) autoFuzz(q) else 1
          if (dd == 0) toks.contains(q) else toks.exists(lev(_, q) <= dd)
        }
        if (and) ts.forall(hit) else ts.exists(hit)
      }
    case PhrasePrefix(ts) =>
      d.text.exists { t =>
        val toks = analyzeRef(t)
        val n = ts.length
        toks.indices.exists { i =>
          i + n <= toks.length &&
          ts.init.zipWithIndex.forall { case (q, j) => toks(i + j) == q } &&
          toks(i + n - 1).startsWith(ts.last)
        }
      }
    case TermsSet(f, ts, msm) =>
      if (f == "text")
        d.text.exists(t => analyzeRef(t).toSet.intersect(ts.map(_.toLowerCase).toSet).size >= msm)
      else d.tag.exists(t => (if (ts.contains(t)) 1 else 0) >= msm)
    case MultiMatch(ts, and) =>
      // best_fields filter context: ANY field matches; text leg analyzed
      // (operator applies per field), keyword leg is whole-string
      // equality with the RAW query
      val q = ts.mkString(" ")
      val textHit = d.text.exists { t =>
        val toks = analyzeRef(t).toSet
        val qs = q.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
        if (and) qs.forall(toks) else qs.exists(toks)
      }
      textHit || d.tag.contains(q)
    case StrRange(gte, lt) =>
      d.tag.exists(t => gte.forall(t.compareTo(_) >= 0) && lt.forall(t.compareTo(_) < 0))
    case Regexp(p) => d.tag.exists(_.matches(p))
    case Bool(must, fil, should, mustNot, msmOpt) =>
      val msm = msmOpt.getOrElse(if (must.isEmpty && fil.isEmpty && should.nonEmpty) 1 else 0)
      must.forall(eval(_, d)) &&
      fil.forall(eval(_, d)) &&
      mustNot.forall(!eval(_, d)) &&
      (should.isEmpty || msm == 0 || should.count(eval(_, d)) >= msm)
  }

  // ── the drill ───────────────────────────────────────────────────────
  private val QueryCount = 800
  private val Batch = 50

  test(s"$QueryCount random wire queries: compiled hit sets == reference evaluator") {
    val rnd = new scala.util.Random(0xfade2026L)
    val queries: Seq[(Q, String)] = Seq.fill(QueryCount) {
      val q = genQ(rnd, 3)
      (q, render(q))
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var checked = 0
    queries.grouped(Batch).foreach { group =>
      val cols: Seq[Column] = group.zipWithIndex.map { case ((_, json), i) =>
        coalesce(JsonDsl.compileQuery(frame, mapper.readTree(json), mapping), lit(false)).as(s"q$i")
      }
      val rows = frame.select(col("_id") +: cols: _*).collect()
      group.zipWithIndex.foreach { case ((q, json), i) =>
        val got = rows.filter(_.getBoolean(i + 1)).map(_.getLong(0)).toSet
        val want = docs.filter(eval(q, _)).map(_.id).toSet
        if (got != want) {
          val extra = (got -- want).toSeq.sorted.take(5)
          val missing = (want -- got).toSeq.sorted.take(5)
          fail(
            s"hit-set mismatch for $json\n  spark-only ids: $extra\n  reference-only ids: $missing\n" +
              s"  sample spark-only doc: ${extra.headOption.map(id => docs(id.toInt))}\n" +
              s"  sample reference-only doc: ${missing.headOption.map(id => docs(id.toInt))}"
          )
        }
        checked += 1
      }
    }
    assert(checked == QueryCount)
  }
}
