package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OpenSearch `simple_query_string`: the fault-tolerant end-user syntax
  * (`+` AND, `|` OR, `-` negate, `"..."` phrase, trailing `*` prefix,
  * `(...)` grouping), compiled to one filter Column over the analyzed
  * text — the whole query becomes a codegen'd predicate in the scan, the
  * same shape as the `query_string` compiler in [[QueryString]].
  *
  * Operator precedence follows Lucene's SimpleQueryParser: `+` binds
  * tighter than `|`; bare adjacency takes the `defaultAnd` operator
  * (default false = OR, OpenSearch's `default_operator`). Stray `)` with
  * no open group is dropped before parsing — Lucene's fault tolerance —
  * so `a) b` parses as `a b` instead of silently truncating at the `)`.
  * Reference surface: the `simple_query_string` body of the search DSL
  * (DASHBOARD_GUIDE.md query catalogue).
  */
object SimpleQuery {

  def parse(text: Column, q: String, defaultAnd: Boolean = false): Column = {
    // drop RParens with no matching open LParen (fault tolerance); with
    // the remainder balanced, one top-level Or chain consumes every token
    val toks = {
      var depth = 0
      lex(q).filter {
        case LParen => depth += 1; true
        case RParen => if (depth > 0) { depth -= 1; true } else false
        case _      => true
      }
    }
    val p = new Parser(toks, text, defaultAnd)
    val c = p.parseOr()
    require(p.done, s"unconsumed tokens in simple query: $q")
    c
  }

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object Or extends Tok
  private case object And extends Tok
  private case object Not extends Tok
  private final case class Phrase(s: String) extends Tok
  private final case class Word(s: String) extends Tok

  private val WordChars: Set[Char] = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toSet + '_' + '*'

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      q(i) match {
        case c if c.isWhitespace => i += 1
        case '('                 => out += LParen; i += 1
        case ')'                 => out += RParen; i += 1
        case '|'                 => out += Or; i += 1
        case '+'                 => out += And; i += 1
        case '-'                 => out += Not; i += 1
        case '"' =>
          val end = q.indexOf('"', i + 1)
          require(end > 0, s"unterminated phrase in: $q")
          out += Phrase(q.substring(i + 1, end)); i = end + 1
        case c if WordChars(c) =>
          val start = i
          while (i < q.length && WordChars(q(i))) i += 1
          out += Word(q.substring(start, i))
        case c => throw new IllegalArgumentException(s"unexpected character '$c' in: $q")
      }
    }
    out.result()
  }

  private final class Parser(tokens: Vector[Tok], text: Column, defaultAnd: Boolean) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < tokens.length) Some(tokens(pos)) else None
    private def next(): Tok = { val t = tokens(pos); pos += 1; t }
    def done: Boolean = pos == tokens.length

    def parseOr(): Column = {
      var acc = parseAnd()
      while (peek.contains(Or)) { next(); acc = acc || parseAnd() }
      acc
    }

    // `+` chains AND explicitly; bare adjacency (an atom/NOT/( following
    // an atom) applies the default operator.
    private def parseAnd(): Column = {
      var acc = parseUnary()
      var continue = true
      while (continue) peek match {
        case Some(And)                                     => next(); acc = acc && parseUnary()
        case Some(LParen) | Some(Not) | Some(Word(_)) | Some(Phrase(_)) =>
          val rhs = parseUnary()
          acc = if (defaultAnd) acc && rhs else acc || rhs
        case _ => continue = false
      }
      acc
    }

    // must_not keeps rows where the clause is NULL (missing field) —
    // same coalesce convention as SearchDsl.bool. Recursive: `--x`
    // composes (negation of negation) instead of crashing — this is the
    // fault-tolerant parser; throwing on stacked operators was the one
    // input shape the SimpleQueryFuzzSpec generator produced that the
    // parser refused.
    private def parseUnary(): Column = peek match {
      case Some(Not) => next(); !coalesce(parseUnary(), lit(false))
      case _         => parseAtom()
    }

    private def parseAtom(): Column = next() match {
      case LParen =>
        val inner = parseOr()
        require(peek.contains(RParen), "missing )"); next(); inner
      case Phrase(p)                      => SearchDsl.matchPhrase(text, p)
      case Word(w) if w.endsWith("*")     => SearchDsl.prefixQuery(text, w.dropRight(1))
      case Word(w)                        => array_contains(SearchDsl.analyze(text), w.toLowerCase)
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }
  }
}
