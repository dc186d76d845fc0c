package graft

import graft.search.QueryString
import org.apache.spark.sql.functions._

/** Differential fuzzer for the Lucene/KQL query-string parser — the
  * third leg of the generative drills (wire clauses: JsonDslFuzzSpec;
  * aggregations: AggsFuzzSpec; percolator tiers: PercolateFuzzSpec).
  *
  * Random boolean expression trees over every clause form the grammar
  * accepts — field:term (quoted and bare), field wildcards, numeric
  * comparisons in BOTH spellings (`price>=10` and `price:>=10`),
  * inclusive/exclusive ranges with `*` endpoints, existence, bare
  * terms / phrases / wildcards against the default field — rendered to
  * query-string syntax with randomized AND spelling (explicit keyword
  * vs KQL adjacency) and parenthesization, parsed by
  * [[QueryString.compile]], and batch-evaluated against an independent
  * evaluator of the documented grammar: OR lowest precedence, AND
  * higher, NOT highest, adjacency = AND.
  *
  * The corpus reuses the adversarial axes: NULL fields, mixed-case
  * values, LIKE metachars (`_`) inside real values. (`%` is not in the
  * lexer's word-char set — by the grammar such values must be quoted,
  * and quoted field values are exact equality, so the wildcard path
  * never sees them; `_` IS a word char and must stay literal.)
  */
class QueryStringFuzzSpec extends SparkSpec {

  private val vocab = Vector(
    "amber", "birch", "cedar", "dune", "elder", "flint", "gorse", "heath",
    "iris", "juno", "kelp", "lark", "mire", "nook", "osier", "pike"
  )
  private val tagVals = Vector("red", "Red", "blue", "dark_blue", "light_blue", "axb", "a_b", "green", "gr")

  private case class Doc(id: Long, text: Option[String], tag: Option[String], price: Option[Double], qty: Option[Int])

  private val docs: Vector[Doc] = {
    val rnd = new scala.util.Random(31337L)
    Vector.tabulate(240) { i =>
      Doc(
        i.toLong,
        if (rnd.nextInt(10) == 0) None
        else Some(Seq.fill(2 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))).mkString(" ")),
        if (rnd.nextInt(10) == 0) None else Some(tagVals(rnd.nextInt(tagVals.size))),
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(10000) / 100.0),
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(50))
      )
    }
  }

  private lazy val frame = {
    val s = spark
    import s.implicits._
    docs
      .map(d => (d.id, d.text.orNull, d.tag.orNull, d.price.map(Double.box).orNull, d.qty.map(Int.box).orNull))
      .toDF("_id", "text", "tag", "price", "qty")
      .select(col("_id"), col("text"), col("tag"), col("price").cast("double").as("price"), col("qty").cast("int").as("qty"))
      .cache()
  }

  // ── AST ─────────────────────────────────────────────────────────────
  private sealed trait E
  private case class TagEq(v: String, quoted: Boolean) extends E
  private case class TagWild(pattern: String) extends E
  private case class NumCmp(field: String, op: String, v: Double, colonForm: Boolean) extends E
  private case class NumRange(field: String, lo: Option[Int], hi: Option[Int], incl: Boolean) extends E
  private case class ExistsQ(field: String) extends E
  private case class BareTerm(w: String) extends E
  private case class BarePhrase(ws: Seq[String]) extends E
  private case class BareWild(pattern: String) extends E
  private case class Not(e: E) extends E
  private case class AndE(l: E, r: E, explicit: Boolean) extends E
  private case class OrE(l: E, r: E) extends E

  private def genLeaf(rnd: scala.util.Random): E = rnd.nextInt(8) match {
    case 0 =>
      val v = tagVals(rnd.nextInt(tagVals.size))
      TagEq(v, quoted = rnd.nextBoolean())
    case 1 =>
      val base = tagVals(rnd.nextInt(tagVals.size))
      TagWild(
        if (rnd.nextBoolean()) base.take(1 + rnd.nextInt(base.length)) + "*"
        else base.updated(rnd.nextInt(base.length), '?')
      )
    case 2 =>
      val f = if (rnd.nextBoolean()) "price" else "qty"
      NumCmp(f, Vector(">", ">=", "<", "<=")(rnd.nextInt(4)), rnd.nextInt(100).toDouble, rnd.nextBoolean())
    case 3 =>
      val f = if (rnd.nextBoolean()) "price" else "qty"
      val lo = if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(60))
      val hi = if (lo.isEmpty || rnd.nextInt(3) > 0) Some(40 + rnd.nextInt(60)) else None
      NumRange(f, lo, hi, incl = rnd.nextBoolean())
    case 4 => ExistsQ(Vector("tag", "price", "qty", "text")(rnd.nextInt(4)))
    case 5 => BareTerm(vocab(rnd.nextInt(vocab.size)))
    case 6 => BarePhrase(Seq.fill(1 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size))))
    case 7 =>
      val w = vocab(rnd.nextInt(vocab.size))
      BareWild(w.take(1 + rnd.nextInt(w.length)) + "*")
  }

  private def gen(rnd: scala.util.Random, depth: Int): E =
    if (depth <= 0 || rnd.nextInt(3) == 0) genLeaf(rnd)
    else rnd.nextInt(4) match {
      case 0 => Not(gen(rnd, depth - 1))
      case 1 => AndE(gen(rnd, depth - 1), gen(rnd, depth - 1), explicit = rnd.nextBoolean())
      case 2 => OrE(gen(rnd, depth - 1), gen(rnd, depth - 1))
      case 3 => genLeaf(rnd)
    }

  // ── rendering (parenthesize compounds under operators: unambiguous) ──
  private def fmtNum(v: Double): String = if (v == v.floor) v.toInt.toString else v.toString

  private def render(e: E): String = e match {
    case TagEq(v, quoted) => if (quoted) s"""tag:"$v"""" else s"tag:$v"
    case TagWild(p) => s"tag:$p"
    case NumCmp(f, op, v, colonForm) => if (colonForm) s"$f:$op${fmtNum(v)}" else s"$f$op${fmtNum(v)}"
    case NumRange(f, lo, hi, incl) =>
      val (l, r) = if (incl) ("[", "]") else ("{", "}")
      s"$f:$l${lo.map(_.toString).getOrElse("*")} TO ${hi.map(_.toString).getOrElse("*")}$r"
    case ExistsQ(f) => s"$f:*"
    case BareTerm(w) => w
    case BarePhrase(ws) => "\"" + ws.mkString(" ") + "\""
    case BareWild(p) => p
    case Not(x) => s"NOT ${wrap(x)}"
    case AndE(l, r, explicit) => s"${wrap(l)}${if (explicit) " AND " else " "}${wrap(r)}"
    case OrE(l, r) => s"${wrap(l)} OR ${wrap(r)}"
  }

  private def wrap(e: E): String = e match {
    case _: AndE | _: OrE => s"(${render(e)})"
    case _ => render(e)
  }

  // ── independent evaluator ───────────────────────────────────────────
  private def likeMatch(pattern: String, v: String): Boolean = {
    // `*`/`?` wildcards, everything else literal (toLikePattern parity)
    val regex = pattern.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c => java.util.regex.Pattern.quote(c.toString)
    }
    v.matches(regex)
  }

  private def eval(e: E, d: Doc): Boolean = e match {
    case TagEq(v, _) => d.tag.contains(v)
    case TagWild(p) => d.tag.exists(likeMatch(p, _))
    case NumCmp(f, op, v, _) =>
      val x = if (f == "price") d.price else d.qty.map(_.toDouble)
      x.exists(xx => op match {
        case ">" => xx > v
        case ">=" => xx >= v
        case "<" => xx < v
        case "<=" => xx <= v
      })
    case NumRange(f, lo, hi, incl) =>
      val x = if (f == "price") d.price else d.qty.map(_.toDouble)
      if (lo.isEmpty && hi.isEmpty) x.isDefined
      else
        x.exists(xx =>
          lo.forall(l => if (incl) xx >= l else xx > l) && hi.forall(h => if (incl) xx <= h else xx < h)
        )
    case ExistsQ(f) =>
      f match {
        case "tag" => d.tag.isDefined
        case "price" => d.price.isDefined
        case "qty" => d.qty.isDefined
        case "text" => d.text.isDefined
      }
    case BareTerm(w) => d.text.exists(_.toLowerCase.split(" ", -1).contains(w.toLowerCase))
    case BarePhrase(ws) =>
      d.text.exists(t => (" " + t.toLowerCase + " ").contains(" " + ws.mkString(" ") + " "))
    case BareWild(p) =>
      d.text.exists(_.toLowerCase.split(" ", -1).exists(likeMatch(p.toLowerCase, _)))
    case Not(x) => !eval(x, d)
    case AndE(l, r, _) => eval(l, d) && eval(r, d)
    case OrE(l, r) => eval(l, d) || eval(r, d)
  }

  // ── the drill ───────────────────────────────────────────────────────
  test("500 random query strings: parsed hit sets == reference evaluator") {
    val rnd = new scala.util.Random(0x9057f1e5L)
    val queries = Seq.fill(500) { val e = gen(rnd, 3); (e, render(e)) }
    queries.grouped(50).foreach { group =>
      val cols = group.zipWithIndex.map { case ((_, q), i) =>
        coalesce(QueryString.parse(frame, q, defaultField = Some("text")), lit(false)).as(s"q$i")
      }
      val rows = frame.select(col("_id") +: cols: _*).collect()
      group.zipWithIndex.foreach { case ((e, q), i) =>
        val got = rows.filter(_.getBoolean(i + 1)).map(_.getLong(0)).toSet
        val want = docs.filter(eval(e, _)).map(_.id).toSet
        if (got != want) {
          val extra = (got -- want).toSeq.sorted.take(5)
          val missing = (want -- got).toSeq.sorted.take(5)
          fail(
            s"""hit-set mismatch for <$q>
               |  spark-only ids: $extra  ${extra.headOption.map(id => docs(id.toInt)).getOrElse("")}
               |  reference-only ids: $missing  ${missing.headOption.map(id => docs(id.toInt)).getOrElse("")}""".stripMargin
          )
        }
      }
    }
  }

  test("operator precedence: OR binds loosest, adjacency = AND, NOT tightest") {
    // a OR b c  ==  a OR (b AND c);  NOT a b == (NOT a) AND b
    val q1 = QueryString.parse(frame, "tag:red OR tag:blue qty>=25", Some("text"))
    val q2 = QueryString.parse(frame, "tag:red OR (tag:blue AND qty>=25)", Some("text"))
    val n1 = frame.filter(q1).count()
    assert(n1 == frame.filter(q2).count())
    val want = docs.count(d => d.tag.contains("red") || (d.tag.contains("blue") && d.qty.exists(_ >= 25)))
    assert(n1 == want)
    val q3 = QueryString.parse(frame, "NOT tag:red qty>=25", Some("text"))
    val want3 = docs.count(d => !d.tag.contains("red") && d.qty.exists(_ >= 25))
    assert(frame.filter(q3).count() == want3)
  }
}
