package graft

import graft.search.Ppl
import org.apache.spark.sql.functions._

/** Differential fuzzer for the PPL `where` expression parser — the
  * fourth generative drill. PPL is the SQL-semantics surface (unlike
  * the KQL set-complement world): NULL propagates Kleene-style through
  * arithmetic and comparisons, `where` keeps only definite-true rows,
  * and `not` of unknown stays unknown. The reference evaluator
  * implements exactly that three-valued logic, plus the engine's typed
  * arithmetic (int fields promote to long/double by operand, IEEE
  * double ops in source order), so hit sets must match bit for bit
  * with no tolerance.
  *
  * Rendering is precedence-aware (parentheses only where the tree
  * needs them), so the parser's documented precedence ladder —
  * or < and < not < comparison < additive < multiplicative < unary —
  * is exercised by every unparenthesized composite, not bypassed by
  * defensive parens.
  */
class PplFuzzSpec extends SparkSpec {

  private val tagVals = Vector("red", "blue", "green", "dark_blue", "a_b", "amber")

  private case class Doc(id: Long, tag: Option[String], price: Option[Double], qty: Option[Int])

  private val docs: Vector[Doc] = {
    val rnd = new scala.util.Random(555L)
    Vector.tabulate(250) { i =>
      Doc(
        i.toLong,
        if (rnd.nextInt(8) == 0) None else Some(tagVals(rnd.nextInt(tagVals.size))),
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(10000) / 100.0),
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(50))
      )
    }
  }

  private lazy val frame = {
    val s = spark
    import s.implicits._
    docs
      .map(d => (d.id, d.tag.orNull, d.price.map(Double.box).orNull, d.qty.map(Int.box).orNull))
      .toDF("_id", "tag", "price", "qty")
      .select(col("_id"), col("tag"), col("price").cast("double").as("price"), col("qty").cast("int").as("qty"))
      .cache()
  }

  // ── typed arithmetic AST ────────────────────────────────────────────
  private sealed trait A
  private case object FPrice extends A
  private case object FQty extends A
  private case class LitL(v: Long) extends A
  private case class LitD(v: Double) extends A
  private case class Bin(op: Char, l: A, r: A) extends A // + - *
  private case class NegA(x: A) extends A

  private sealed trait B
  private case class CmpB(op: String, l: A, r: A) extends B
  private case class TagCmp(eq: Boolean, v: String) extends B
  private case class TagIn(vs: Seq[String]) extends B
  private case class QtyIn(vs: Seq[Long]) extends B
  private case class LikeB(pattern: String) extends B
  private case class NotB(x: B) extends B
  private case class AndB(l: B, r: B) extends B
  private case class OrB(l: B, r: B) extends B

  private def genA(rnd: scala.util.Random, depth: Int, mults: Int): A =
    if (depth <= 0) rnd.nextInt(4) match {
      case 0 => FPrice
      case 1 => FQty
      case 2 => LitL(rnd.nextInt(100).toLong)
      case 3 => LitD(rnd.nextInt(1000) / 10.0)
    }
    else rnd.nextInt(6) match {
      case 0 | 1 => Bin(if (rnd.nextBoolean()) '+' else '-', genA(rnd, depth - 1, mults), genA(rnd, depth - 1, mults))
      // bound multiplication chains: int*int stays in INT on the engine,
      // and modeling overflow is not the point of this drill
      case 2 if mults > 0 => Bin('*', genA(rnd, depth - 1, mults - 1), genA(rnd, depth - 1, 0))
      case 3 => NegA(genA(rnd, depth - 1, mults))
      case _ => genA(rnd, 0, mults)
    }

  private def genB(rnd: scala.util.Random, depth: Int): B =
    if (depth <= 0) rnd.nextInt(6) match {
      case 0 =>
        CmpB(Vector("=", "!=", ">", ">=", "<", "<=")(rnd.nextInt(6)), genA(rnd, 2, 1), genA(rnd, 1, 1))
      case 1 => TagCmp(rnd.nextBoolean(), tagVals(rnd.nextInt(tagVals.size)))
      case 2 => TagIn(Seq.fill(1 + rnd.nextInt(3))(tagVals(rnd.nextInt(tagVals.size))).distinct)
      case 3 => QtyIn(Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(50).toLong).distinct)
      case 4 =>
        val base = tagVals(rnd.nextInt(tagVals.size))
        // SQL LIKE by the PPL spec: % and _ ARE wildcards here
        LikeB(rnd.nextInt(3) match {
          case 0 => base.take(1 + rnd.nextInt(base.length)) + "%"
          case 1 => "%" + base.drop(rnd.nextInt(base.length))
          case 2 => base.updated(rnd.nextInt(base.length), '_')
        })
      case 5 => CmpB("=", FQty, LitL(rnd.nextInt(50).toLong))
    }
    else rnd.nextInt(4) match {
      case 0 => NotB(genB(rnd, depth - 1))
      case 1 => AndB(genB(rnd, depth - 1), genB(rnd, depth - 1))
      case 2 => OrB(genB(rnd, depth - 1), genB(rnd, depth - 1))
      case 3 => genB(rnd, 0)
    }

  // ── precedence-aware rendering ──────────────────────────────────────
  private def fmtD(v: Double): String = if (v == v.floor) s"${v.toLong}.0" else v.toString

  // arithmetic precedence: additive 1, multiplicative 2, unary/leaf 3
  private def precA(a: A): Int = a match {
    case Bin('+', _, _) | Bin('-', _, _) => 1
    case Bin('*', _, _) => 2
    case _ => 3
  }

  private def renderA(a: A): String = a match {
    case FPrice => "price"
    case FQty => "qty"
    case LitL(v) => v.toString
    case LitD(v) => fmtD(v)
    case Bin(op, l, r) =>
      val lp = precA(a)
      // left child may share the level (left-assoc); right child must
      // bind TIGHTER to preserve the tree under left-assoc parsing
      val ls = if (precA(l) < lp) s"(${renderA(l)})" else renderA(l)
      val rs = if (precA(r) <= lp) s"(${renderA(r)})" else renderA(r)
      s"$ls $op $rs"
    case NegA(x) =>
      val xs = if (precA(x) < 3) s"(${renderA(x)})" else renderA(x)
      s"-$xs"
  }

  // boolean precedence: or 1, and 2, not 3, comparison 4
  private def precB(b: B): Int = b match {
    case _: OrB => 1
    case _: AndB => 2
    case _: NotB => 3
    case _ => 4
  }

  private def renderB(b: B): String = b match {
    case CmpB(op, l, r) => s"${renderA(l)} $op ${renderA(r)}"
    case TagCmp(eq, v) => s"tag ${if (eq) "=" else "!="} '$v'"
    case TagIn(vs) => s"tag in (${vs.map(v => s"'$v'").mkString(", ")})"
    case QtyIn(vs) => s"qty in (${vs.mkString(", ")})"
    case LikeB(p) => s"like(tag, '$p')"
    case NotB(x) =>
      val xs = if (precB(x) < 3) s"(${renderB(x)})" else renderB(x)
      s"not $xs"
    case AndB(l, r) =>
      val ls = if (precB(l) < 2) s"(${renderB(l)})" else renderB(l)
      val rs = if (precB(r) <= 2 && precB(r) < 3) s"(${renderB(r)})" else renderB(r)
      s"$ls and $rs"
    case OrB(l, r) =>
      val ls = if (precB(l) < 1) s"(${renderB(l)})" else renderB(l)
      val rs = if (precB(r) <= 1) s"(${renderB(r)})" else renderB(r)
      s"$ls or $rs"
  }

  // ── reference evaluator: typed arithmetic + Kleene 3VL ──────────────
  private def evalA(a: A, d: Doc): Option[Either[Long, Double]] = a match {
    case FPrice => d.price.map(Right(_))
    case FQty => d.qty.map(v => Left(v.toLong))
    case LitL(v) => Some(Left(v))
    case LitD(v) => Some(Right(v))
    case NegA(x) =>
      // the engine compiles unary minus as 0 - x
      evalA(x, d).map {
        case Left(v) => Left(0L - v)
        case Right(v) => Right(0.0 - v)
      }
    case Bin(op, l, r) =>
      for { lv <- evalA(l, d); rv <- evalA(r, d) } yield (lv, rv) match {
        case (Left(a0), Left(b0)) =>
          Left(op match { case '+' => a0 + b0; case '-' => a0 - b0; case '*' => a0 * b0 })
        case _ =>
          val a0 = lv.fold(_.toDouble, identity)
          val b0 = rv.fold(_.toDouble, identity)
          Right(op match { case '+' => a0 + b0; case '-' => a0 - b0; case '*' => a0 * b0 })
      }
  }

  private def likeMatch(pattern: String, v: String): Boolean = {
    val regex = pattern.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c => java.util.regex.Pattern.quote(c.toString)
    }
    v.matches(regex)
  }

  private def and3(l: Option[Boolean], r: Option[Boolean]): Option[Boolean] = (l, r) match {
    case (Some(false), _) | (_, Some(false)) => Some(false)
    case (Some(true), Some(true)) => Some(true)
    case _ => None
  }
  private def or3(l: Option[Boolean], r: Option[Boolean]): Option[Boolean] = (l, r) match {
    case (Some(true), _) | (_, Some(true)) => Some(true)
    case (Some(false), Some(false)) => Some(false)
    case _ => None
  }

  private def evalB3(b: B, d: Doc): Option[Boolean] = b match {
    case CmpB(op, l, r) =>
      for { lv <- evalA(l, d); rv <- evalA(r, d) } yield {
        val c = (lv, rv) match {
          case (Left(a0), Left(b0)) => java.lang.Long.compare(a0, b0)
          case _ => java.lang.Double.compare(lv.fold(_.toDouble, identity), rv.fold(_.toDouble, identity))
        }
        op match {
          case "=" => c == 0
          case "!=" => c != 0
          case ">" => c > 0
          case ">=" => c >= 0
          case "<" => c < 0
          case "<=" => c <= 0
        }
      }
    case TagCmp(eq, v) => d.tag.map(t => if (eq) t == v else t != v)
    case TagIn(vs) => d.tag.map(vs.contains)
    case QtyIn(vs) => d.qty.map(q => vs.contains(q.toLong))
    case LikeB(p) => d.tag.map(likeMatch(p, _))
    case NotB(x) => evalB3(x, d).map(!_)
    case AndB(l, r) => and3(evalB3(l, d), evalB3(r, d))
    case OrB(l, r) => or3(evalB3(l, d), evalB3(r, d))
  }

  // ── the drill ───────────────────────────────────────────────────────
  test("250 random PPL where-expressions: hit sets == 3VL reference, bit for bit") {
    val rnd = new scala.util.Random(0x99111L)
    val resolve: String => org.apache.spark.sql.DataFrame = { case "t" => frame; case other => fail(s"index $other") }
    (1 to 250).foreach { qi =>
      val b = genB(rnd, 3)
      val q = s"source=t | where ${renderB(b)} | fields _id"
      val got = Ppl.query(resolve, q).collect().map(_.getLong(0)).toSet
      val want = docs.filter(d => evalB3(b, d).contains(true)).map(_.id).toSet
      if (got != want) {
        val extra = (got -- want).toSeq.sorted.take(5)
        val missing = (want -- got).toSeq.sorted.take(5)
        fail(
          s"""#$qi hit-set mismatch for <$q>
             |  spark-only: $extra ${extra.headOption.map(i => docs(i.toInt)).getOrElse("")}
             |  reference-only: $missing ${missing.headOption.map(i => docs(i.toInt)).getOrElse("")}""".stripMargin
        )
      }
    }
  }

  test("10 random full pipelines: where | eval | stats..by | sort == typed reference fold") {
    // the command-plumbing face: a filtered frame gains an eval-computed
    // column, aggregates by a NULLABLE key (SQL semantics: the null
    // group EXISTS in PPL), and sorts. sum/avg go through the engine's
    // exact-decimal rule (each value quantized at 6dp HALF_UP, summed
    // exactly, one double conversion) — the reference replays it, so
    // sums compare bit-for-bit; generator keeps eval outputs within 4dp
    // (one multiplication of 2dp operands) so the quantization is the
    // identity and the drill tests PLUMBING, not rounding edges.
    val rnd = new scala.util.Random(0x991f2L)
    val resolve: String => org.apache.spark.sql.DataFrame = { case "t" => frame }
    (1 to 10).foreach { ci =>
      val filterB = genB(rnd, 2)
      val evalA = genA(rnd, 2, 1)
      val q = s"source=t | where ${renderB(filterB)} | eval m = ${renderA(evalA)} | " +
        "stats sum(m) as s_m, avg(m) as a_m, count() as n, min(m) as mn, max(m) as mx by tag | sort tag"
      val got = Ppl
        .query(resolve, q)
        .collect()
        .map { r =>
          (Option(r.get(r.fieldIndex("tag"))).map(_.toString),
           Option(r.get(r.fieldIndex("s_m"))).map(_.toString.toDouble),
           Option(r.get(r.fieldIndex("a_m"))).map(_.toString.toDouble),
           r.getLong(r.fieldIndex("n")),
           Option(r.get(r.fieldIndex("mn"))).map(_.toString.toDouble),
           Option(r.get(r.fieldIndex("mx"))).map(_.toString.toDouble))
        }
        .toVector

      val kept = docs.filter(d => evalB3(filterB, d).contains(true))
      val want = kept
        .groupBy(_.tag)
        .toSeq
        .sortBy(_._1) // None (null key) first — Spark asc nulls-first
        .map { case (tag, g) =>
          val vs = g.flatMap(d => evalA match { case _ => evalA1(evalA, d) })
          val sumExact =
            if (vs.isEmpty) None
            else
              Some(
                vs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
                  .sum
                  .toDouble
              )
          (tag,
           sumExact,
           sumExact.map(_ / vs.size),
           g.size.toLong,
           if (vs.isEmpty) None else Some(vs.min),
           if (vs.isEmpty) None else Some(vs.max))
        }

      assert(got.size == want.size, s"#$ci <$q>: ${got.size} groups vs ${want.size}")
      got.zip(want).foreach { case (g, w) =>
        def close(a: Option[Double], b: Option[Double]) = (a, b) match {
          case (None, None) => true
          case (Some(x), Some(y)) => math.abs(x - y) <= 1e-9 + 1e-12 * math.abs(x)
          case _ => false
        }
        assert(
          g._1 == w._1 && close(g._2, w._2) && close(g._3, w._3) && g._4 == w._4 &&
            close(g._5, w._5) && close(g._6, w._6),
          s"#$ci <$q>: got $g want $w"
        )
      }
    }
  }

  /** eval-expression value as a double (None when a referenced field is null). */
  private def evalA1(a: A, d: Doc): Option[Double] =
    evalA(a, d).map(_.fold(_.toDouble, identity))

  test("PPL precedence ladder: or < and < not < comparison < additive < multiplicative") {
    val resolve: String => org.apache.spark.sql.DataFrame = { case "t" => frame }
    // qty + 2 * 3 = qty + 6 (not (qty+2)*3); not A and B groups as (not A) and B
    val q1 = Ppl.query(resolve, "source=t | where qty + 2 * 3 = 10 | fields _id").collect().map(_.getLong(0)).toSet
    assert(q1 == docs.filter(_.qty.contains(4)).map(_.id).toSet)
    val q2 = Ppl
      .query(resolve, "source=t | where not tag = 'red' and qty > 40 | fields _id")
      .collect()
      .map(_.getLong(0))
      .toSet
    val want2 = docs.filter(d => d.tag.exists(_ != "red") && d.qty.exists(_ > 40)).map(_.id).toSet
    assert(q2 == want2)
  }

  test("row-shaping pipelines: fillnull | rename | where | fields | sort | head == reference fold") {
    // the commands that move/patch columns rather than compute: fillnull
    // patches BEFORE the filter sees the column (ordering is the point —
    // a filled qty passes a qty-filter the null row would have failed),
    // rename rebinds the name downstream commands must use, head
    // truncates AFTER the sort. The sort appends _id so ties are
    // deterministic and the fold compares ordered, not as a set.
    val rnd = new scala.util.Random(0x991f3L)
    val resolve: String => org.apache.spark.sql.DataFrame = { case "t" => frame }
    (1 to 12).foreach { ci =>
      val fill = rnd.nextInt(50).toLong
      val cut = rnd.nextInt(50)
      val desc = rnd.nextBoolean()
      val n = 1 + rnd.nextInt(30)
      val q = s"source=t | fillnull with $fill in qty | rename tag as label | " +
        s"where qty >= $cut | fields _id, label, qty | sort ${if (desc) "-" else "+"}qty, +_id | head $n"
      val got = Ppl
        .query(resolve, q)
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.get(2).toString.toInt)) // qty widens to long via the fill literal
        .toSeq
      val want = docs
        .map(d => (d.id, d.tag, d.qty.getOrElse(fill.toInt)))
        .filter(_._3 >= cut)
        .sortBy { case (id, _, qty) => (if (desc) -qty else qty, id) }
        .take(n)
      assert(got == want, s"#$ci <$q>: got ${got.take(5)} want ${want.take(5)}")
    }
  }

  test("top / rare with and without by == frequency folds (count tie-break by key asc)") {
    val rnd = new scala.util.Random(0x991f4L)
    val resolve: String => org.apache.spark.sql.DataFrame = { case "t" => frame }
    (1 to 10).foreach { ci =>
      val n = 1 + rnd.nextInt(6)
      val rare = rnd.nextBoolean()
      val cmd = if (rare) "rare" else "top"

      // ungrouped: ranked value frequencies with deterministic tie-break.
      // tag is nullable and the bucketing family drops null keys nowhere
      // here — PPL top/rare ranks the VALUES present; null tags group as
      // the null value in Spark's groupBy, so the fold keeps them too.
      val got = Ppl
        .query(resolve, s"source=t | $cmd $n tag")
        .collect()
        .map(r => (Option(r.getString(0)), r.getLong(1)))
        .toSeq
      val freq = docs.groupBy(_.tag).map { case (t, xs) => (t, xs.size.toLong) }.toSeq
      val want = freq
        .sortBy { case (t, c) => (if (rare) c else -c, t.isDefined, t.getOrElse("")) } // null key first (asc nulls-first)
        .take(n)
      assert(got == want, s"#$ci $cmd $n tag: got $got want $want")

      // grouped: per-group ranking through the bounded-heap operator
      val gotBy = Ppl
        .query(resolve, s"source=t | $cmd $n qty by tag")
        .collect()
        .map(r =>
          (Option(r.get(r.fieldIndex("tag"))).map(_.toString),
           Option(r.get(r.fieldIndex("qty"))).map(_.toString.toInt),
           r.getLong(r.fieldIndex("count")))
        )
        .toSet
      val wantBy = docs
        .groupBy(_.tag)
        .flatMap { case (t, xs) =>
          xs.groupBy(_.qty)
            .map { case (q, g) => (q, g.size.toLong) }
            .toSeq
            .sortBy { case (q, c) => (if (rare) c else -c, q.isDefined, q.getOrElse(0)) }
            .take(n)
            .map { case (q, c) => (t.map(_.toString), q, c) }
        }
        .toSet
      assert(gotBy == wantBy, s"#$ci $cmd $n qty by tag mismatch")
    }
  }
}
