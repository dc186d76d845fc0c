package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The arithmetic subset of runtime-field scripts (`runtime_mappings` —
  * OpenSearch computes these per hit at query time; here they compile to
  * a codegen'd Catalyst expression, so a runtime field costs the same as
  * a stored one). Grammar, by precedence:
  *
  *   expr   := term (('+' | '-') term)*
  *   term   := factor (('*' | '/') factor)*
  *   factor := number | ident | 'doc.'ident | 'ln(' expr ')' |
  *             'abs(' expr ')' | 'mod(' expr ',' expr ')' |
  *             '(' expr ')' | '-' factor
  *
  * `doc.field` and bare `field` both reference frame columns (the
  * script API's doc-values access, minus the ceremony). Hand-rolled
  * recursive descent in the QueryString lexer's house style; every
  * malformed script raises IllegalArgumentException — the wire error
  * contract.
  *
  * Degenerate arithmetic is NULL, never a crash: `/` and `mod` compile
  * to try_divide/try_mod (x/0 → NULL) and ln(≤0) is NULL (Spark's log)
  * — under Spark's default ANSI mode the plain operators THROW
  * SparkArithmeticException on a zero divisor, so one bad row would
  * kill the whole dashboard query at scale (found by ScriptExprFuzzSpec,
  * the same defect family as the r14 sampler Long-overflow). NULL is
  * the 3VL contract every other engine surface already follows.
  *
  * DOCUMENTED DEVIATION from upstream painless semantics: painless
  * floating-point division by zero yields ±Infinity/NaN (only integer
  * division throws); this surface yields NULL for EVERY zero divisor.
  * Deliberate: Infinity is not representable in the oracle comparison
  * (DuckDB renders it engine-specifically, JSON wire has no literal for
  * it, and downstream aggregations of Infinity poison whole buckets),
  * while NULL composes with the family-wide 3VL rule — missing inputs
  * and degenerate arithmetic both drop out of aggregates instead of
  * propagating a sentinel. Callers who need upstream parity on zero
  * divisors must pre-filter or guard the divisor in the script itself.
  */
object ScriptExpr {

  def compile(src: String): Column = {
    require(src != null && src.trim.nonEmpty, "empty runtime-field script")
    new Parser(src).parse()
  }

  private final class Parser(s: String) {
    private var i = 0

    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s(i) else '\u0000'

    def parse(): Column = {
      val e = expr()
      ws()
      require(i == s.length, s"trailing input in script at offset $i: '${s.drop(i)}'")
      e
    }

    private def expr(): Column = {
      var l = term()
      ws()
      while (peek == '+' || peek == '-') {
        val op = peek; i += 1
        val r = term()
        l = if (op == '+') l + r else l - r
        ws()
      }
      l
    }

    private def term(): Column = {
      var l = factor()
      ws()
      while (peek == '*' || peek == '/') {
        val op = peek; i += 1
        val r = factor()
        l = if (op == '*') l * r else try_divide(l, r)
        ws()
      }
      l
    }

    private def factor(): Column = {
      ws()
      if (peek == '-') { i += 1; -factor() }
      else if (peek == '(') {
        i += 1
        val e = expr(); ws()
        require(peek == ')', s"expected ')' at offset $i in: $s"); i += 1
        e
      } else if (peek.isDigit || peek == '.') {
        val j = i
        while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
        val txt = s.substring(j, i)
        try lit(txt.toDouble)
        catch { case _: NumberFormatException => throw new IllegalArgumentException(s"bad number '$txt' in: $s") }
      } else if (peek.isLetter || peek == '_') {
        val j = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i += 1
        s.substring(j, i) match {
          case fn @ ("ln" | "abs") =>
            ws()
            require(peek == '(', s"$fn needs parenthesized argument in: $s"); i += 1
            val a = expr(); ws()
            require(peek == ')', s"unclosed $fn(...) in: $s"); i += 1
            if (fn == "ln") log(a) else abs(a)
          case "mod" =>
            ws()
            require(peek == '(', s"mod needs parenthesized arguments in: $s"); i += 1
            val a = expr(); ws()
            require(peek == ',', s"mod needs two comma-separated arguments in: $s"); i += 1
            val b = expr(); ws()
            require(peek == ')', s"unclosed mod(...) in: $s"); i += 1
            try_mod(a, b)
          case ref if ref.startsWith("doc.") => col(ref.stripPrefix("doc."))
          case ref                           => col(ref)
        }
      } else throw new IllegalArgumentException(s"unexpected character '$peek' at offset $i in: $s")
    }
  }
}
