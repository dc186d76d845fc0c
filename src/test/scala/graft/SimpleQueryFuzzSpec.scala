package graft

import graft.search.SimpleQuery
import org.apache.spark.sql.functions._

/** Differential fuzzer for the `simple_query_string` parser — random
  * queries generated IN GRAMMAR SHAPE (an `|`-chain of operator chains
  * of atoms: words, trailing-`*` prefixes, phrases, `-` negations,
  * parenthesized groups), under BOTH default operators, evaluated
  * against a three-valued reference: atoms on a NULL text are unknown,
  * `-` coalesces (Lucene must_not keeps missing-field docs), `+` and
  * adjacency fold left at the same precedence level with adjacency
  * taking the default operator — the quirky Lucene SimpleQueryParser
  * behavior the implementation documents.
  */
class SimpleQueryFuzzSpec extends SparkSpec {

  private val vocab = Vector(
    "ash", "bark", "cove", "dell", "fen", "glen", "holt", "mead",
    "ridge", "shaw", "tor", "vale", "weir", "yarrow"
  )

  private case class Doc(id: Long, text: Option[String])

  private val docs: Vector[Doc] = {
    val rnd = new scala.util.Random(808L)
    Vector.tabulate(220) { i =>
      Doc(
        i.toLong,
        if (rnd.nextInt(8) == 0) None
        else Some(Seq.fill(2 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      )
    }
  }

  private lazy val frame = {
    val s = spark
    import s.implicits._
    docs.map(d => (d.id, d.text.orNull)).toDF("_id", "text").cache()
  }

  // ── grammar-shaped AST ──────────────────────────────────────────────
  private sealed trait Atom
  private case class W(w: String) extends Atom
  private case class Pre(p: String) extends Atom
  private case class Ph(ws: Seq[String]) extends Atom
  private case class Neg(a: Atom) extends Atom
  private case class Grp(e: OrChain) extends Atom

  // (explicitPlus, atom): first element's op is ignored
  private case class AndChain(parts: Seq[(Boolean, Atom)])
  private case class OrChain(chains: Seq[AndChain])

  private def genAtom(rnd: scala.util.Random, depth: Int): Atom = rnd.nextInt(6) match {
    case 0 | 1 => W(vocab(rnd.nextInt(vocab.size)))
    case 2 =>
      val w = vocab(rnd.nextInt(vocab.size))
      Pre(w.take(1 + rnd.nextInt(w.length)))
    case 3 => Ph(Seq.fill(1 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size))))
    case 4 => Neg(genAtom(rnd, depth))
    case 5 =>
      if (depth > 0) Grp(genOr(rnd, depth - 1)) else W(vocab(rnd.nextInt(vocab.size)))
  }

  private def genAnd(rnd: scala.util.Random, depth: Int): AndChain =
    AndChain(Seq.fill(1 + rnd.nextInt(3))((rnd.nextBoolean(), genAtom(rnd, depth))))

  private def genOr(rnd: scala.util.Random, depth: Int): OrChain =
    OrChain(Seq.fill(1 + rnd.nextInt(3))(genAnd(rnd, depth)))

  private def renderAtom(a: Atom): String = a match {
    case W(w) => w
    case Pre(p) => s"$p*"
    case Ph(ws) => "\"" + ws.mkString(" ") + "\""
    case Neg(x) => s"-${renderAtom(x)}"
    case Grp(e) => s"(${render(e)})"
  }

  private def render(e: OrChain): String =
    e.chains
      .map(c =>
        c.parts.zipWithIndex
          .map { case ((plus, a), i) => (if (i > 0 && plus) "+ " else "") + renderAtom(a) }
          .mkString(" ")
      )
      .mkString(" | ")

  // ── 3VL reference ───────────────────────────────────────────────────
  private def evalAtom(a: Atom, d: Doc, defaultAnd: Boolean): Option[Boolean] = a match {
    case W(w) => d.text.map(_.toLowerCase.split(" ", -1).contains(w.toLowerCase))
    case Pre(p) => d.text.map(_.toLowerCase.split(" ", -1).exists(_.startsWith(p.toLowerCase)))
    case Ph(ws) => d.text.map(t => (" " + t.toLowerCase + " ").contains(" " + ws.mkString(" ") + " "))
    case Neg(x) => Some(!evalAtom(x, d, defaultAnd).getOrElse(false))
    case Grp(e) => evalOr(e, d, defaultAnd)
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

  private def evalAnd(c: AndChain, d: Doc, defaultAnd: Boolean): Option[Boolean] =
    c.parts.tail.foldLeft(evalAtom(c.parts.head._2, d, defaultAnd)) { case (acc, (plus, a)) =>
      val rhs = evalAtom(a, d, defaultAnd)
      if (plus || defaultAnd) and3(acc, rhs) else or3(acc, rhs)
    }

  private def evalOr(e: OrChain, d: Doc, defaultAnd: Boolean): Option[Boolean] =
    e.chains.map(evalAnd(_, d, defaultAnd)).reduce(or3)

  // ── the drill ───────────────────────────────────────────────────────
  test("400 random simple queries x both default operators: hit sets == 3VL reference") {
    val rnd = new scala.util.Random(0x51319L)
    Seq(false, true).foreach { defaultAnd =>
      val queries = Seq.fill(200) { val e = genOr(rnd, 2); (e, render(e)) }
      queries.grouped(50).foreach { group =>
        val cols = group.zipWithIndex.map { case ((_, q), i) =>
          coalesce(SimpleQuery.parse(col("text"), q, defaultAnd), lit(false)).as(s"q$i")
        }
        val rows = frame.select(col("_id") +: cols: _*).collect()
        group.zipWithIndex.foreach { case ((e, q), i) =>
          val got = rows.filter(_.getBoolean(i + 1)).map(_.getLong(0)).toSet
          val want = docs.filter(d => evalOr(e, d, defaultAnd).contains(true)).map(_.id).toSet
          assert(
            got == want,
            s"defaultAnd=$defaultAnd <$q>: spark-only=${(got -- want).toSeq.sorted.take(5)} " +
              s"ref-only=${(want -- got).toSeq.sorted.take(5)}"
          )
        }
      }
    }
  }
}
