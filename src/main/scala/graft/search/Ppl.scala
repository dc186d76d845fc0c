package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The `_plugins/_ppl` endpoint — OpenSearch's Piped Processing Language,
  * the observability-facing sibling of the `_sql` endpoint (reference
  * DASHBOARD_GUIDE.md users query the same indexes either way). A PPL
  * request is a pipeline: `source=<index> | cmd | cmd | ...`, each stage
  * transforming the previous stage's frame — which is EXACTLY the
  * DataFrame combinator model, so every command compiles to the
  * corresponding declarative operator and the whole pipeline lands in
  * Catalyst as one plan (pushdown/pruning/AQE all apply; a `where` after
  * `source` reaches the parquet scan like any filter).
  *
  * Supported commands (the documented subset — unknown commands raise
  * the wire 400):
  *
  *   source=<index>
  *   where <predicate>            and/or/not, comparisons, like(f,'pat'),
  *                                f in ('a', 'b', ...)
  *   fields [-] f1, f2, ...       projection (or exclusion with -)
  *   parse field '<regex>'        named-group extraction: every
  *                                (?<name>...) group becomes a column
  *                                (empty string where unmatched)
  *   eval name = <arith>, ...     computed columns (+ - * /, parens)
  *   rename a as b, ...
  *   stats <agg> [as alias], ... [by key | span(ts, 1d) [as alias], ...]
  *   eventstats <agg> [as alias], ... [by key, ...]
  *                                group statistics appended to every row
  *                                (agg + null-safe join back, not a window)
  *   trendline sort [+|-]f sma(N, field) [as alias], ...
  *                                trailing N-row moving average in declared
  *                                order; NULL until the window fills; the
  *                                sort clause is required (determinism)
  *   fillnull with <v> in f, ...  null replacement (also: using f = v, ...)
  *   sort [+|-]field, ...
  *   head N
  *   top N field [by group]       most frequent values (bounded heaps)
  *   rare N field                 least frequent values
  *
  * Aggregations: count(), sum(x), avg(x), min(x), max(x),
  * distinct_count(x) (alias dc). Sums and averages of double columns
  * accumulate through DECIMAL(38,6) and convert once to double — the
  * house exactness rule: a double sum's value depends on partition
  * order, the decimal sum's does not, so results are stable under any
  * layout and engine (the oracle replays the same cast).
  *
  * `span(ts, 1h|1d|1M)` buckets a timestamp by calendar unit
  * (hour/day/month — unit-1 spans, the dashboard histogram grain).
  * `dedup` is deliberately absent: PPL's keep-first semantics depend on
  * document arrival order, which a distributed scan does not define —
  * the deterministic alternatives are `top`/`stats`.
  */
object Ppl {

  /** Compile and run a PPL pipeline. `resolve` maps the source index
    * name to its frame (the msearch convention).
    */
  def query(resolve: String => DataFrame, ppl: String): DataFrame = {
    require(ppl != null && ppl.trim.nonEmpty, "empty PPL query")
    val stages = splitPipes(ppl)
    require(stages.nonEmpty, "empty PPL query")
    val srcStage = stages.head.trim
    require(srcStage.matches("(?i)source\\s*=\\s*[A-Za-z_][A-Za-z0-9_]*"), s"PPL must start with source=<index>: '$srcStage'")
    val index = srcStage.split("=")(1).trim
    val base =
      try resolve(index)
      catch { case e: Exception => throw new IllegalArgumentException(s"unknown source index '$index'", e) }
    stages.tail.foldLeft(base)((df, cmd) => applyCommand(df, cmd.trim, resolve))
  }

  /** The wire body form: `{"query": "source=... | ..."}`. */
  def queryBody(resolve: String => DataFrame, body: String): DataFrame = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => throw new IllegalArgumentException(s"malformed _ppl body: ${e.getMessage}") }
    require(root != null && root.hasNonNull("query"), "_ppl body requires a \"query\" string")
    query(resolve, root.get("query").asText)
  }

  // Split on '|' outside single-quoted string literals.
  private def splitPipes(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case '|' if !inStr => out += cur.toString(); cur.clear()
      case c => cur += c
    }
    require(!inStr, s"unterminated string literal in PPL: $s")
    out += cur.toString()
    out.toSeq
  }

  private def applyCommand(
      df: DataFrame,
      cmd: String,
      resolve: String => DataFrame = n => throw new IllegalArgumentException(s"unknown lookup index '$n'")
  ): DataFrame = {
    val (word, rest) = cmd.span(c => c.isLetter || c == '_')
    (word.toLowerCase, rest.trim) match {
      case ("lookup", p) => lookupCommand(df, p, resolve)
      case ("where", p) => df.filter(new Expr(p).parsePredicate())
      case ("fields", p) =>
        if (p.startsWith("-")) df.drop(splitIdents(p.drop(1)): _*)
        else df.select(splitIdents(p).map(col): _*)
      case ("eval", p) =>
        splitTop(p).foldLeft(df) { (acc, a) =>
          val eq = a.indexOf('=')
          require(eq > 0, s"eval expects name = expr: '$a'")
          acc.withColumn(a.take(eq).trim, new Expr(a.drop(eq + 1)).parseArith())
        }
      case ("rename", p) =>
        splitTop(p).foldLeft(df) { (acc, a) =>
          a.split("(?i)\\s+as\\s+").map(_.trim) match {
            case Array(from, to) => acc.withColumnRenamed(from, to)
            case _ => throw new IllegalArgumentException(s"rename expects a as b: '$a'")
          }
        }
      case ("parse", p) => parseCommand(df, p)
      case ("stats", p) => statsCommand(df, p)
      case ("eventstats", p) => eventstatsCommand(df, p)
      case ("trendline", p) => trendlineCommand(df, p)
      case ("fillnull", p) => fillnullCommand(df, p)
      case ("sort", p) =>
        val keys = splitTop(p).map { k =>
          val t = k.trim
          if (t.startsWith("-")) col(t.drop(1).trim).desc
          else if (t.startsWith("+")) col(t.drop(1).trim).asc
          else col(t).asc
        }
        df.orderBy(keys: _*)
      case ("head", p) => df.limit(p.trim.toInt)
      case ("top", p) => topRare(df, p, asc = false)
      case ("rare", p) => topRare(df, p, asc = true)
      case (w, _) => throw new IllegalArgumentException(s"unsupported PPL command '$w'")
    }
  }

  /** `lookup <index> <lookupField> [as <sourceField>]`: enrich each row
    * from a lookup index — the PPL spelling of a dimension join. All
    * non-key lookup fields are appended with REPLACE semantics (a
    * pre-existing source column of the same name is overwritten by the
    * lookup's value, per the command's default).
    *
    * Scale shape: a left equi-join with NO broadcast hint — the lookup
    * side is dimension-sized by design and AQE converts it to a
    * broadcast join from runtime stats; if a user points lookup at a
    * fact-sized index, the plan degrades to a shuffle join instead of
    * OOMing every executor.
    */
  private def lookupCommand(df: DataFrame, p: String, resolve: String => DataFrame): DataFrame = {
    val pat =
      """^([A-Za-z_][A-Za-z0-9_]*)\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+(?i:as)\s+([A-Za-z_][A-Za-z0-9_]*))?\s*$""".r
    p.trim match {
      case pat(index, lookupField, srcFieldOrNull) =>
        val srcField = Option(srcFieldOrNull).getOrElse(lookupField)
        val lk =
          try resolve(index)
          catch { case e: Exception => throw new IllegalArgumentException(s"unknown lookup index '$index'", e) }
        require(lk.columns.contains(lookupField), s"lookup index '$index' has no field '$lookupField'")
        require(df.columns.contains(srcField), s"source has no field '$srcField'")
        val appended = lk.columns.filterNot(_ == lookupField).toSeq
        val pruned = appended.foldLeft(df)((acc, c) => if (acc.columns.contains(c)) acc.drop(c) else acc)
        pruned
          .join(lk.withColumnRenamed(lookupField, "__lk_key"), col(srcField) === col("__lk_key"), "left")
          .drop("__lk_key")
      case _ =>
        throw new IllegalArgumentException(s"lookup expects: lookup <index> <field> [as <sourcefield>]: '$p'")
    }
  }

  private def splitIdents(s: String): Seq[String] = splitTop(s).map(_.trim)

  // Split on top-level commas (outside parens and strings).
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case ',' if !inStr && depth == 0 => out += cur.toString(); cur.clear()
      case c => cur += c
    }
    out += cur.toString()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** `parse field '<regex>'`: each (?<name>...) named group becomes a
    * column via regexp_extract (one codegen'd projection per group over
    * the same scan — no second pass). The grammar requires EVERY
    * capturing group to be named, so group numbering is unambiguous and
    * the oracle's positional regexp_extract replays it exactly; Spark's
    * convention (empty string where the pattern does not match) is kept.
    */
  private def parseCommand(df: DataFrame, p: String): DataFrame = {
    val m = "(?s)^([A-Za-z_][A-Za-z0-9_.]*)\\s+'(.*)'$".r
    p.trim match {
      case m(field, pattern) =>
        val names = "\\(\\?<([A-Za-z][A-Za-z0-9]*)>".r.findAllMatchIn(pattern).map(_.group(1)).toSeq
        require(names.nonEmpty, s"parse pattern has no (?<name>...) groups: '$pattern'")
        val unnamed = "(?<!\\\\)\\((?!\\?)".r.findAllMatchIn(pattern).size
        require(
          unnamed == 0,
          s"parse requires every capturing group to be named, found $unnamed unnamed group(s): '$pattern'"
        )
        names.zipWithIndex.foldLeft(df) { case (acc, (name, idx)) =>
          acc.withColumn(name, regexp_extract(col(field), pattern, idx + 1))
        }
      case other => throw new IllegalArgumentException(s"parse expects: field '<regex>', got '$other'")
    }
  }

  /** The decimal-accumulation rule (see object doc): exact sum, one
    * conversion to double — partition-order-proof and engine-identical.
    */
  private def exactSum(e: Column): Column = sum(e.cast("decimal(38,6)")).cast("double")

  private def splitBy(p: String): (String, Option[String]) =
    p.split("(?i)\\s+by\\s+") match {
      case Array(a) => (a, None)
      case Array(a, b) => (a, Some(b))
      case _ => throw new IllegalArgumentException(s"only one 'by' clause allowed: '$p'")
    }

  private def parseAggList(aggPart: String, cmd: String): Seq[Column] =
    splitTop(aggPart).map { a =>
      val m = "(?i)^(count|sum|avg|min|max|distinct_count|dc)\\s*\\(([^)]*)\\)(?:\\s+as\\s+([A-Za-z_][A-Za-z0-9_]*))?$".r
      a.trim match {
        case m(fn, argS, alias) =>
          val arg = argS.trim
          val fl = fn.toLowerCase
          val c = fl match {
            case "count" =>
              require(arg.isEmpty, s"count() takes no argument: '$a'")
              count(lit(1))
            case _ =>
              require(arg.nonEmpty, s"$fl() needs a field: '$a'")
              val e = new Expr(arg).parseArith()
              fl match {
                case "sum" => exactSum(e)
                case "avg" => exactSum(e) / count(e)
                case "min" => min(e)
                case "max" => max(e)
                case _ => countDistinct(e)
              }
          }
          val name = Option(alias).getOrElse {
            require(fl == "count", s"$cmd ${fl}() needs an 'as' alias: '$a'")
            "count"
          }
          c.as(name)
        case other => throw new IllegalArgumentException(s"unsupported $cmd aggregation: '$other'")
      }
    }

  private def statsCommand(df: DataFrame, p: String): DataFrame = {
    val (aggPart, byPart) = splitBy(p)
    val aggs = parseAggList(aggPart, "stats")
    byPart match {
      case None => df.agg(aggs.head, aggs.tail: _*)
      case Some(bp) =>
        val keys = splitTop(bp).map { b =>
          val sp = "(?i)^span\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_.]*)\\s*,\\s*1([hdM])\\s*\\)(?:\\s+as\\s+([A-Za-z_][A-Za-z0-9_]*))?$".r
          b.trim match {
            case sp(f, unit, alias) =>
              val u = unit match { case "h" => "hour"; case "d" => "day"; case _ => "month" }
              date_trunc(u, col(f)).as(Option(alias).getOrElse(f))
            case ident if ident.matches("[A-Za-z_][A-Za-z0-9_.]*") => col(ident)
            case other => throw new IllegalArgumentException(s"unsupported by-key: '$other'")
          }
        }
        df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** `eventstats <agg> [as alias], ... [by k1, k2]`: the stats
    * aggregates APPENDED to every input row instead of collapsing them —
    * the "compare each row to its group's statistic" primitive (above-
    * average filters, share-of-group). Compiled as a hash aggregate plus
    * a null-safe join back on the group keys, NOT a window over the
    * keys: the agg partial-aggregates map-side and the join is
    * AQE-sized (broadcast when the group table is small), so a hot
    * group never serializes one window reducer. The ungrouped form is a
    * crossJoin against the broadcast 1-row aggregate.
    */
  private def eventstatsCommand(df: DataFrame, p: String): DataFrame = {
    val (aggPart, byPart) = splitBy(p)
    val aggs = parseAggList(aggPart, "eventstats")
    byPart match {
      case None => df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
      case Some(bp) =>
        val keys = splitIdents(bp)
        keys.foreach(k =>
          require(k.matches("[A-Za-z_][A-Za-z0-9_.]*"), s"eventstats by-keys must be plain fields: '$k'")
        )
        // Null-safe equality so a NULL group joins its own statistics,
        // exactly as a window PARTITION BY would group it.
        val gk = keys.map(k => col(k).as(s"_esk_$k"))
        val stats = df.groupBy(gk: _*).agg(aggs.head, aggs.tail: _*)
        val cond = keys.map(k => col(k) <=> col(s"_esk_$k")).reduce(_ && _)
        df.join(stats, cond, "left").drop(keys.map(k => s"_esk_$k"): _*)
    }
  }

  /** `trendline sort [+|-]field sma(N, field) [as alias], ...`: simple
    * moving average over the N-row trailing window in the declared sort
    * order; NULL until the window is full (the OpenSearch convention).
    * The sort clause is REQUIRED here (upstream makes it optional and
    * falls back to arrival order, which a distributed scan does not
    * define — same determinism stance as the absent `dedup`). Sums ride
    * DECIMAL(38,6) with one conversion to double before the division.
    *
    * An ordered-series operator is inherently sequential: the window
    * has no partition, so Spark evaluates it on one task. That is the
    * operator's nature, not a plan defect — dashboards run trendline
    * over bucketed stats output (a bounded series), never a raw fact
    * table; at scale the pipeline shape is `stats ... by span | trendline`.
    */
  private def trendlineCommand(df: DataFrame, p: String): DataFrame = {
    val m = "(?is)^sort\\s+([+-]?)\\s*([A-Za-z_][A-Za-z0-9_.]*)\\s+(.*)$".r
    p.trim match {
      case m(sign, sortField, rest) =>
        val ord = if (sign == "-") col(sortField).desc else col(sortField).asc
        val base = org.apache.spark.sql.expressions.Window.orderBy(ord)
        splitTop(rest).foldLeft(df) { (acc, clause) =>
          val sm =
            "(?i)^sma\\s*\\(\\s*(\\d+)\\s*,\\s*([A-Za-z_][A-Za-z0-9_.]*)\\s*\\)(?:\\s+as\\s+([A-Za-z_][A-Za-z0-9_]*))?$".r
          clause.trim match {
            case sm(nS, field, alias) =>
              val n = nS.toInt
              require(n > 0, s"sma window must be positive: '$clause'")
              val w = base.rowsBetween(-(n - 1), 0)
              val smaC = when(
                count(lit(1)).over(w) === n,
                (sum(col(field).cast("decimal(38,6)")).over(w).cast("double") / n)
              )
              acc.withColumn(Option(alias).getOrElse(s"${field}_trendline"), smaC)
            case other => throw new IllegalArgumentException(s"trendline expects sma(N, field) [as alias]: '$other'")
          }
        }
      case _ =>
        throw new IllegalArgumentException(
          s"trendline requires an explicit sort: trendline sort [+|-]field sma(N, field) [as alias], got '$p'"
        )
    }
  }

  /** `fillnull with <literal> in f1, f2` / `fillnull using f1 = <expr>,
    * ...`: null replacement, one codegen'd coalesce projection.
    */
  private def fillnullCommand(df: DataFrame, p: String): DataFrame = {
    val withM = "(?is)^with\\s+(.+?)\\s+in\\s+(.+)$".r
    val usingM = "(?is)^using\\s+(.+)$".r
    p.trim match {
      case withM(valS, fieldsS) =>
        val v = new Expr(valS.trim).parseArith()
        splitIdents(fieldsS).foldLeft(df)((acc, f) => acc.withColumn(f, coalesce(col(f), v)))
      case usingM(assigns) =>
        splitTop(assigns).foldLeft(df) { (acc, a) =>
          val eq = a.indexOf('=')
          require(eq > 0, s"fillnull using expects field = value: '$a'")
          val f = a.take(eq).trim
          acc.withColumn(f, coalesce(col(f), new Expr(a.drop(eq + 1)).parseArith()))
        }
      case other =>
        throw new IllegalArgumentException(s"fillnull expects 'with <value> in <fields>' or 'using f = v, ...': '$other'")
    }
  }

  /** `top`/`rare N field [by group]`: value frequencies, most (least)
    * frequent first. Grouped form ranks per group with the bounded-heap
    * TopKPerKey operator — never a windowed row_number sort.
    */
  private def topRare(df: DataFrame, p: String, asc: Boolean): DataFrame = {
    val m = "(?i)^(\\d+)\\s+([A-Za-z_][A-Za-z0-9_.]*)(?:\\s+by\\s+([A-Za-z_][A-Za-z0-9_.]*))?$".r
    p.trim match {
      case m(nS, field, group) =>
        val n = nS.toInt
        Option(group) match {
          case None =>
            df.groupBy(col(field))
              .agg(count(lit(1)).as("count"))
              .orderBy(if (asc) col("count").asc else col("count").desc, col(field).asc)
              .limit(n)
          case Some(g) =>
            val counts = df.groupBy(col(g), col(field)).agg(count(lit(1)).as("count"))
            graft.plans.TopKPerKey
              .perKey(counts, Seq(g), Seq(("count", asc), (field, true)), n)
              .drop("rank")
        }
      case other => throw new IllegalArgumentException(s"top/rare expects 'N field [by group]': '$other'")
    }
  }

  /** Predicate/arithmetic parser (QueryString's house recursive-descent
    * style). Precedence: or < and < not < comparison < additive <
    * multiplicative < unary. Literals: numbers, 'single-quoted' strings.
    * `like(f, 'pat')` is SQL LIKE (%/_ wildcards).
    */
  private final class Expr(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s(i) else '\u0000'
    private def peekWord: String = {
      ws()
      val j = i
      var k = i
      while (k < s.length && (s(k).isLetter || s(k) == '_')) k += 1
      val w = s.substring(j, k)
      w
    }
    private def eatWord(w: String): Boolean = {
      ws()
      if (peekWord.equalsIgnoreCase(w)) { i += w.length; true } else false
    }

    def parsePredicate(): Column = {
      val e = orExpr()
      ws()
      require(i == s.length, s"trailing input in predicate at offset $i: '${s.drop(i)}'")
      e
    }

    def parseArith(): Column = {
      val e = additive()
      ws()
      require(i == s.length, s"trailing input in expression at offset $i: '${s.drop(i)}'")
      e
    }

    private def orExpr(): Column = {
      var l = andExpr()
      while (eatWord("or")) l = l.or(andExpr())
      l
    }

    private def andExpr(): Column = {
      var l = notExpr()
      while (eatWord("and")) l = l.and(notExpr())
      l
    }

    private def notExpr(): Column =
      if (eatWord("not")) !notExpr()
      else comparison()

    private def comparison(): Column = {
      ws()
      if (peekWord.equalsIgnoreCase("like")) {
        val save = i
        i += 4
        ws()
        if (peek == '(') {
          i += 1
          val f = ident()
          ws(); require(peek == ',', s"like(f, 'pat') expects a comma at offset $i"); i += 1
          val pat = stringLit()
          ws(); require(peek == ')', s"like(f, 'pat') expects ')' at offset $i"); i += 1
          return col(f).like(pat)
        } else i = save
      }
      if (peek == '(') {
        // parenthesized boolean group (distinguished from arithmetic
        // parens by attempting the boolean parse first; if a comparison
        // or arithmetic operator FOLLOWS the closing paren, the group
        // was an arithmetic operand — backtrack and reparse as one)
        val save = i
        i += 1
        try {
          val inner = orExpr()
          ws()
          require(peek == ')', s"expected ')' at offset $i")
          i += 1
          ws()
          if ("=!<>+-*/".contains(peek)) i = save
          else return inner
        } catch { case _: IllegalArgumentException => i = save }
      }
      val l = additive()
      ws()
      if (peekWord.equalsIgnoreCase("in")) {
        i += 2
        ws()
        require(peek == '(', s"in expects a literal list at offset $i")
        i += 1
        val vals = scala.collection.mutable.ArrayBuffer[Any]()
        var done = false
        while (!done) {
          ws()
          if (peek == '\'') vals += stringLit()
          else if (peek.isDigit || peek == '-') {
            val neg = peek == '-'
            if (neg) i += 1
            vals += (number() match {
              case d: Double => if (neg) -d else d
              case l0: Long => if (neg) -l0 else l0
            })
          } else throw new IllegalArgumentException(s"in list expects literals at offset $i")
          ws()
          if (peek == ',') i += 1
          else { require(peek == ')', s"in list expects ')' at offset $i"); i += 1; done = true }
        }
        return l.isin(vals.toSeq: _*)
      }
      val op =
        if (peek == '!' && i + 1 < s.length && s(i + 1) == '=') { i += 2; "!=" }
        else if (peek == '>' && i + 1 < s.length && s(i + 1) == '=') { i += 2; ">=" }
        else if (peek == '<' && i + 1 < s.length && s(i + 1) == '=') { i += 2; "<=" }
        else if (peek == '>') { i += 1; ">" }
        else if (peek == '<') { i += 1; "<" }
        else if (peek == '=') { i += 1; "=" }
        else return l
      val r = additive()
      op match {
        case "=" => l === r
        case "!=" => l =!= r
        case ">" => l > r
        case ">=" => l >= r
        case "<" => l < r
        case "<=" => l <= r
      }
    }

    private def additive(): Column = {
      var l = multiplicative()
      ws()
      while (peek == '+' || peek == '-') {
        val op = peek; i += 1
        val r = multiplicative()
        l = if (op == '+') l + r else l - r
        ws()
      }
      l
    }

    private def multiplicative(): Column = {
      var l = unary()
      ws()
      while (peek == '*' || peek == '/') {
        val op = peek; i += 1
        val r = unary()
        l = if (op == '*') l * r else l / r
        ws()
      }
      l
    }

    private def unary(): Column = {
      ws()
      if (peek == '-') { i += 1; negate(unary()) }
      else if (peek == '(') {
        i += 1
        val e = additive()
        ws()
        require(peek == ')', s"expected ')' at offset $i")
        i += 1
        e
      } else if (peek == '\'') lit(stringLit())
      else if (peek.isDigit) lit(number())
      else {
        val id = ident()
        require(id.nonEmpty, s"expected an expression at offset $i: '${s.drop(i)}'")
        col(id)
      }
    }

    private def negate(c: Column): Column = lit(0) - c

    private def ident(): String = {
      ws()
      val j = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i += 1
      s.substring(j, i)
    }

    private def number(): Any = {
      val j = i
      while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
      val t = s.substring(j, i)
      if (t.contains('.')) t.toDouble else t.toLong
    }

    private def stringLit(): String = {
      ws()
      require(peek == '\'', s"expected a string literal at offset $i")
      i += 1
      val j = i
      while (i < s.length && s(i) != '\'') i += 1
      require(i < s.length, "unterminated string literal")
      val v = s.substring(j, i)
      i += 1
      v
    }
  }
}
