package graft

import graft.search.{JsonDsl, ScriptExpr}
import org.apache.spark.sql.functions._

/** Differential fuzzer for the runtime-field script compiler
  * ([[graft.search.ScriptExpr]]) — random arithmetic ASTs rendered to
  * script text (with adversarial whitespace and doc.-prefixed refs) must
  * compile to expressions that reproduce an independent evaluator of the
  * documented SQL semantics on nullable columns:
  *
  *   - 3VL: any null operand → null result
  *   - x / 0 and x % 0 → NULL (Spark's Divide/Remainder, NOT IEEE Inf)
  *   - ln(x ≤ 0) → NULL (Spark's Logarithm), Java-sign % otherwise
  *
  * Finite results compare BITWISE — both engines execute the identical
  * double-op tree, so any divergence is a parse bug (precedence,
  * associativity, literal parsing), not rounding. A mutation arm then
  * corrupts each rendered script (dropped paren, trailing garbage,
  * alien character) and requires a LOUD IllegalArgumentException —
  * a malformed script must never silently mis-parse to a different
  * expression.
  */
class ScriptExprFuzzSpec extends SparkSpec {

  // ── AST ───────────────────────────────────────────────────────────────
  private sealed trait E
  private case class Num(txt: String) extends E
  private case class Ref(name: String, doc: Boolean) extends E
  private case class Bin(op: Char, l: E, r: E) extends E
  private case class Neg(e: E) extends E
  private case class Fn1(fn: String, a: E) extends E
  private case class Mod(a: E, b: E) extends E

  private val fields = Vector("a", "b", "c")

  private def gen(rnd: scala.util.Random, depth: Int): E =
    if (depth == 0) {
      if (rnd.nextBoolean()) Ref(fields(rnd.nextInt(fields.size)), rnd.nextBoolean())
      else {
        // the grammar's number form: digits + optional '.', no exponent;
        // values round-trip exactly through toDouble
        val txts = Vector("0", "2", "7", "13", "100", "0.5", "3.25", "12.75")
        Num(txts(rnd.nextInt(txts.size)))
      }
    } else
      rnd.nextInt(8) match {
        case 0 | 1 => Bin("+-"(rnd.nextInt(2)), gen(rnd, depth - 1), gen(rnd, depth - 1))
        case 2 | 3 => Bin("*/"(rnd.nextInt(2)), gen(rnd, depth - 1), gen(rnd, depth - 1))
        case 4     => Neg(gen(rnd, depth - 1))
        case 5     => Fn1(if (rnd.nextBoolean()) "ln" else "abs", gen(rnd, depth - 1))
        case 6     => Mod(gen(rnd, depth - 1), gen(rnd, depth - 1))
        case 7     => gen(rnd, depth - 1)
      }

  // render with randomized (but grammar-legal) spacing; parenthesize
  // every compound operand so the rendered text's tree IS the AST — the
  // reference evaluates the AST, so precedence bugs surface as value
  // mismatches on the flat-spelling arm below
  private def render(e: E, rnd: scala.util.Random): String = {
    def sp = if (rnd.nextInt(3) == 0) " " else ""
    e match {
      case Num(t)       => t
      case Ref(n, doc)  => if (doc) s"doc.$n" else n
      case Bin(op, l, r) => s"($sp${render(l, rnd)}$sp$op$sp${render(r, rnd)}$sp)"
      case Neg(x)       => s"-($sp${render(x, rnd)}$sp)"
      case Fn1(f, a)    => s"$f($sp${render(a, rnd)}$sp)"
      case Mod(a, b)    => s"mod($sp${render(a, rnd)}$sp,$sp${render(b, rnd)}$sp)"
    }
  }

  // ── reference evaluator (documented contract) ─────────────────────────
  private def eval(e: E, row: Map[String, Option[Double]]): Option[Double] = e match {
    case Num(t)      => Some(t.toDouble)
    case Ref(n, _)   => row(n)
    case Neg(x)      => eval(x, row).map(v => -v)
    case Fn1("abs", a) => eval(a, row).map(math.abs)
    // StrictMath, not Math: Spark's log codegen calls StrictMath.log for
    // cross-platform reproducibility — Math.log's intrinsic differs by
    // 1 ulp on some inputs (found by the bitwise compare)
    case Fn1(_, a) => eval(a, row).flatMap(v => if (v > 0) Some(StrictMath.log(v)) else None)
    case Mod(a, b) =>
      for { x <- eval(a, row); y <- eval(b, row); r <- if (y == 0.0) None else Some(x % y) } yield r
    case Bin(op, l, r) =>
      for {
        x <- eval(l, row)
        y <- eval(r, row)
        v <- op match {
          case '+' => Some(x + y)
          case '-' => Some(x - y)
          case '*' => Some(x * y)
          case '/' => if (y == 0.0) None else Some(x / y)
        }
      } yield v
  }

  private val rows: Vector[(Long, Option[Double], Option[Double], Option[Double])] = {
    val rnd = new scala.util.Random(0x5c819L)
    def v(): Option[Double] =
      if (rnd.nextInt(6) == 0) None
      else
        Some(rnd.nextInt(5) match {
          case 0 => 0.0 // division/mod-by-zero and ln(0) fodder
          case 1 => -(1 + rnd.nextInt(50)).toDouble // ln(<0) fodder
          case _ => (rnd.nextInt(2000) - 500) / 4.0
        })
    Vector.tabulate(60)(i => (i.toLong, v(), v(), v()))
  }

  private lazy val frame = {
    val s = spark
    import s.implicits._
    rows
      .map { case (id, a, b, c) => (id, a.map(Double.box).orNull, b.map(Double.box).orNull, c.map(Double.box).orNull) }
      .toDF("_id", "a", "b", "c")
      .select(col("_id"), col("a").cast("double"), col("b").cast("double"), col("c").cast("double"))
      .cache()
  }

  private def bits(v: Option[Double]): Option[Long] = v.map(java.lang.Double.doubleToLongBits)

  test("150 random scripts: compile == reference, bitwise, through nulls and 0-divisors") {
    val rnd = new scala.util.Random(0xab5e11L)
    (1 to 150).foreach { qi =>
      val ast = gen(rnd, 1 + rnd.nextInt(3))
      val script = render(ast, rnd)
      val got = frame
        .select(col("_id"), ScriptExpr.compile(script).cast("double").as("v"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      rows.foreach { case (id, a, b, c) =>
        val want = eval(ast, Map("a" -> a, "b" -> b, "c" -> c))
        assert(
          bits(got(id)) == bits(want),
          s"#$qi row $id: got ${got(id)} want $want\n  script=$script\n  row=(a=$a b=$b c=$c)"
        )
      }
    }
  }

  test("flat spellings exercise precedence: a op b op c with no parens") {
    // the parenthesized arm can't catch precedence bugs — these flat
    // renders must associate left-to-right with * / binding over + -
    val rnd = new scala.util.Random(0xf1a7L)
    val ops = "+-*/"
    (1 to 60).foreach { qi =>
      val o1 = ops(rnd.nextInt(4))
      val o2 = ops(rnd.nextInt(4))
      val script = s"a $o1 b $o2 c"
      // reference tree per the documented precedence
      def tighter(c: Char) = c == '*' || c == '/'
      val ast =
        if (!tighter(o1) && tighter(o2)) Bin(o1, Ref("a", false), Bin(o2, Ref("b", false), Ref("c", false)))
        else Bin(o2, Bin(o1, Ref("a", false), Ref("b", false)), Ref("c", false))
      val got = frame
        .select(col("_id"), ScriptExpr.compile(script).cast("double").as("v"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      rows.foreach { case (id, a, b, c) =>
        val want = eval(ast, Map("a" -> a, "b" -> b, "c" -> c))
        assert(bits(got(id)) == bits(want), s"#$qi row $id: got ${got(id)} want $want script=$script")
      }
    }
  }

  test("mutated scripts fail loudly, never silently mis-parse") {
    val rnd = new scala.util.Random(0xdeadL)
    (1 to 40).foreach { qi =>
      val good = render(gen(rnd, 1 + rnd.nextInt(2)), rnd)
      val bad = rnd.nextInt(4) match {
        case 0 => good + ")"
        case 1 => good + " 7" // trailing input
        case 2 =>
          val i = rnd.nextInt(good.length)
          good.substring(0, i) + "?" + good.substring(i)
        case 3 => if (good.contains(")")) good.replaceFirst("\\)", "") else good + "("
      }
      val threw =
        try { ScriptExpr.compile(bad); false }
        catch { case _: IllegalArgumentException => true }
      assert(threw, s"#$qi mutated script compiled silently: '$bad' (from '$good')")
    }
  }

  test("runtime_mappings end-to-end: script field queries, sorts, projects") {
    val out = JsonDsl
      .parse(
        frame,
        """{"runtime_mappings": {"score": {"type": "double", "script": "abs(a) + b * 2"}},
          | "query": {"range": {"score": {"gte": 100}}},
          | "sort": [{"score": {"order": "desc"}}, "_id"],
          | "_source": ["_id", "score"]}""".stripMargin
      )
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq
    val want = rows
      .flatMap { case (id, a, b, _) =>
        for { x <- a; y <- b } yield (id, math.abs(x) + y * 2)
      }
      .filter(_._2 >= 100)
      .sortBy { case (id, v) => (-v, id) }
    assert(out == want, s"got $out\nwant $want")
  }
}
