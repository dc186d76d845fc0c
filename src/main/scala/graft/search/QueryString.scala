package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Lucene/KQL-style query-string parser — the reference's Discover search
  * box and saved-filter syntax (DASHBOARD_GUIDE.md:89 `status:ACTIVE AND
  * card_type:DEBIT`, :124 `amount > 1000 AND status_enum:0`, :131
  * `is_active:true AND pending_amount > 0`), compiled to one Catalyst
  * `Column` predicate so the whole query participates in pushdown exactly
  * like a hand-built filter.
  *
  * Grammar (case-insensitive keywords; adjacency = AND, as in KQL):
  * {{{
  *   expr    := and ( OR and )*
  *   and     := not ( [AND] not )*
  *   not     := NOT not | '(' expr ')' | clause
  *   clause  := field ':' value | field cmp literal | bareTerm
  *   value   := '[' lit TO lit ']' | '{' lit TO lit '}'   // incl/excl range
  *            | cmp literal                               // field:>=10
  *            | '*'                                       // existence
  *            | quoted | word                             // term (wildcards ok)
  *   cmp     := '>=' | '<=' | '>' | '<'
  * }}}
  *
  * Semantics are resolved against the frame's schema: clause values are
  * typed by the column (numbers/booleans parsed, anything else compared as
  * string), values containing `*`/`?` compile to LIKE, and bare terms /
  * quoted phrases without a field hit `defaultField` with the analyzed
  * match / match_phrase semantics of [[SearchDsl]]. Unknown fields fail
  * fast with the field name.
  */
object QueryString {

  /** Parse `q` into a filter predicate for `df`. */
  def parse(df: DataFrame, q: String, defaultField: Option[String] = None): Column =
    compile(q, df.schema, defaultField)

  def compile(q: String, schema: StructType, defaultField: Option[String] = None): Column = {
    val tokens = lex(q)
    val p = new Parser(tokens, schema, defaultField)
    val c = p.parseExpr()
    p.expectEnd()
    c
  }

  // ── Lexer ─────────────────────────────────────────────────────────────
  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object LBrack extends Tok // [
  private case object RBrack extends Tok // ]
  private case object LBrace extends Tok // {
  private case object RBrace extends Tok // }
  private case object Colon extends Tok
  private final case class Cmp(op: String) extends Tok
  private final case class Quoted(s: String) extends Tok
  private final case class Word(s: String) extends Tok

  private val WordChars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_.*?+-@/".toSet

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      q(i) match {
        case c if c.isWhitespace => i += 1
        case '('                 => out += LParen; i += 1
        case ')'                 => out += RParen; i += 1
        case '['                 => out += LBrack; i += 1
        case ']'                 => out += RBrack; i += 1
        case '{'                 => out += LBrace; i += 1
        case '}'                 => out += RBrace; i += 1
        case ':'                 => out += Colon; i += 1
        case '>' | '<' =>
          if (i + 1 < q.length && q(i + 1) == '=') { out += Cmp(q.substring(i, i + 2)); i += 2 }
          else { out += Cmp(q(i).toString); i += 1 }
        case '"' =>
          val end = q.indexOf('"', i + 1)
          require(end > 0, s"unterminated quote at offset $i in: $q")
          out += Quoted(q.substring(i + 1, end))
          i = end + 1
        case c if WordChars(c) =>
          val start = i
          while (i < q.length && WordChars(q(i))) i += 1
          out += Word(q.substring(start, i))
        case c => throw new IllegalArgumentException(s"unexpected character '$c' at offset $i in: $q")
      }
    }
    out.result()
  }

  // ── Parser ────────────────────────────────────────────────────────────
  private final class Parser(tokens: Vector[Tok], schema: StructType, defaultField: Option[String]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < tokens.length) Some(tokens(pos)) else None
    // A query ending mid-clause ("a AND", "x OR") must be a syntax error,
    // not an index error from reading past the token stream.
    private def next(): Tok = {
      require(pos < tokens.length, s"unexpected end of query after ${tokens.lastOption.getOrElse("")}")
      val t = tokens(pos); pos += 1; t
    }
    private def isKeyword(t: Tok, kw: String): Boolean = t match {
      case Word(w) => w.equalsIgnoreCase(kw)
      case _       => false
    }

    def expectEnd(): Unit =
      require(pos == tokens.length, s"dangling tokens after position $pos: ${tokens.drop(pos)}")

    def parseExpr(): Column = {
      var c = parseAnd()
      while (peek.exists(isKeyword(_, "OR"))) { next(); c = c || parseAnd() }
      c
    }

    // Explicit AND or bare adjacency (KQL): anything that can start a new
    // clause continues the conjunction.
    private def parseAnd(): Column = {
      var c = parseNot()
      var continue = true
      while (continue) peek match {
        case Some(t) if isKeyword(t, "AND")                     => next(); c = c && parseNot()
        case Some(t) if isKeyword(t, "OR")                      => continue = false
        case Some(LParen) | Some(_: Word) | Some(_: Quoted)     => c = c && parseNot()
        case _                                                  => continue = false
      }
      c
    }

    private def parseNot(): Column = peek match {
      // Lucene/KQL NOT is set complement: a clause over a MISSING field
      // "did not match", so its negation MUST match. Bare `!` flips SQL
      // NULL to NULL and the filter drops the doc — the same three-valued
      // trap SearchDsl.bool coalesces for must_not (and SimpleQuery for
      // `-`). NULL→false commutes with AND/OR (both Kleene-monotone), so
      // this NOT-site coalesce is the only one the parser needs. Found by
      // the QueryStringFuzzSpec differential drill (`NOT m* AND qty>41`
      // dropped null-text docs).
      case Some(t) if isKeyword(t, "NOT") => next(); !coalesce(parseNot(), lit(false))
      case Some(LParen) =>
        next()
        val c = parseExpr()
        require(peek.contains(RParen), "expected ')'")
        next()
        c
      case _ => parseClause()
    }

    private def parseClause(): Column = next() match {
      case Quoted(phrase) => defaultMatch(phrase, phrase = true)
      case Word(w) =>
        peek match {
          case Some(Colon) => next(); parseFieldValue(w)
          case Some(Cmp(op)) =>
            next()
            val lit0 = literal(w, nextLiteral())
            compare(field(w), op, lit0)
          case _ => defaultMatch(w, phrase = false)
        }
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

    private def parseFieldValue(name: String): Column = {
      val c = field(name)
      next() match {
        case Cmp(op)    => compare(c, op, literal(name, nextLiteral()))
        case LBrack     => range(name, c, incl = true)
        case LBrace     => range(name, c, incl = false)
        case Word("*")  => c.isNotNull
        case Word(v) if v.contains("*") || v.contains("?") =>
          c.like(toLikePattern(v))
        case Word(v)   => c === literal(name, v)
        case Quoted(v) => c === lit(v)
        case t         => throw new IllegalArgumentException(s"unexpected value token $t for field $name")
      }
    }

    private def range(name: String, c: Column, incl: Boolean): Column = {
      val lo = nextLiteral()
      require(peek.exists(isKeyword(_, "TO")), s"expected TO in range for $name")
      next()
      val hi = nextLiteral()
      val close = next()
      require(
        (incl && close == RBrack) || (!incl && close == RBrace),
        s"range bracket mismatch for $name"
      )
      // Lucene's `*` endpoint is "unbounded": drop that side of the
      // conjunct. Both sides open ([* TO *]) degenerates to existence.
      val conds = Seq(
        Option(lo).filter(_ != "*").map(v => if (incl) c >= literal(name, v) else c > literal(name, v)),
        Option(hi).filter(_ != "*").map(v => if (incl) c <= literal(name, v) else c < literal(name, v))
      ).flatten
      conds.reduceOption(_ && _).getOrElse(c.isNotNull)
    }

    private def nextLiteral(): String = next() match {
      case Word(w)   => w
      case Quoted(s) => s
      case t         => throw new IllegalArgumentException(s"expected literal, got $t")
    }

    private def compare(c: Column, op: String, v: Column): Column = op match {
      case ">"  => c > v
      case ">=" => c >= v
      case "<"  => c < v
      case "<=" => c <= v
    }

    private def fieldType(name: String): DataType = {
      val f = schema.fields.find(_.name.equalsIgnoreCase(name))
      require(f.isDefined, s"unknown field '$name' (have: ${schema.fieldNames.mkString(", ")})")
      f.get.dataType
    }

    private def field(name: String): Column = { fieldType(name); col(name) }

    /** Type the literal by the column: numeric columns get numeric
      * literals — an unparseable value FAILS FAST (the silent alternative,
      * a string literal against a numeric column, compiles to a null
      * predicate that drops every row); boolean true/false parsed;
      * everything else compared as the raw string (Spark coerces
      * date/timestamp strings in comparisons).
      */
    private def literal(name: String, raw: String): Column = fieldType(name) match {
      case StringType => lit(raw)
      case _: org.apache.spark.sql.types.NumericType =>
        scala.util.Try(lit(raw.toLong))
          .orElse(scala.util.Try(lit(raw.toDouble)))
          .getOrElse(
            throw new IllegalArgumentException(
              s"value '$raw' is not numeric for numeric field '$name' (use * for an unbounded range endpoint)"
            )
          )
      case org.apache.spark.sql.types.BooleanType =>
        require(
          raw.equalsIgnoreCase("true") || raw.equalsIgnoreCase("false"),
          s"value '$raw' is not a boolean for boolean field '$name'"
        )
        lit(raw.toBoolean)
      case _ => lit(raw)
    }

    private def defaultMatch(term: String, phrase: Boolean): Column = {
      val f = defaultField.getOrElse(
        throw new IllegalArgumentException(s"bare term '$term' needs a default field")
      )
      fieldType(f)
      if (phrase) SearchDsl.matchPhrase(col(f), term)
      else if (term.contains("*") || term.contains("?"))
        exists(SearchDsl.analyze(col(f)), t => t.like(toLikePattern(term.toLowerCase)))
      else SearchDsl.matchScore(col(f), Seq(term)) > 0
    }

    /** Query wildcards → LIKE, with LIKE's own metacharacters escaped
      * first so a literal `_` or `%` in the value stays literal
      * (OpenSearch wildcard semantics).
      */
    private def toLikePattern(v: String): String =
      v.replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("*", "%")
        .replace("?", "_")
  }
}
