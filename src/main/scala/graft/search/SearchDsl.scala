package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OpenSearch query-DSL semantics re-expressed as Catalyst `Column`
  * combinators (reference DASHBOARD_GUIDE.md "Dev Tools" queries and
  * Discover filters, e.g. `status:ACTIVE AND card_type:DEBIT`,
  * `range: {amount: {gte: 100}}`, `match: {status: "ACTIVE"}`).
  *
  * Everything stays declarative so Catalyst pushes the predicates into the
  * parquet scan (visible as PushedFilters in `.explain`): at 100 TB a
  * filter that reaches the reader skips row groups via min/max stats
  * instead of materializing rows.
  */
object SearchDsl {

  /** Whitespace analyzer: lowercase + split on spaces, as OpenSearch's
    * default analyzer would tokenize the synthetic corpus.
    */
  def analyze(text: Column): Column = split(lower(text), " ")

  /** Harman's S-stemmer over one lowercase token column — three suffix
    * rules, each a literal test + literal rewrite, all codegen'd string
    * expressions (no UDF). The DuckDB oracle runs the same CASE chain
    * term for term, and [[Analyzer.sStem]] is the JVM twin applied to
    * query terms; AnalyzerSpec pins all three in lockstep.
    */
  def sStem(t: Column): Column =
    when(
      length(t) > 3 && t.endsWith("ies") && !t.endsWith("eies") && !t.endsWith("aies"),
      regexp_replace(t, "ies$", "y")
    ).when(
      length(t) > 3 && t.endsWith("es") && !t.endsWith("aes") && !t.endsWith("ees") && !t.endsWith("oes"),
      regexp_replace(t, "es$", "e")
    ).when(
      length(t) > 2 && t.endsWith("s") && !t.endsWith("us") && !t.endsWith("ss"),
      regexp_replace(t, "s$", "")
    ).otherwise(t)

  /** The configurable token-filter chain ([[Analyzer]]): whitespace
    * tokenize + lowercase (the standard base), then each declared
    * [[TokenFilter]] IN ORDER — stopword removal, S-stemming, edge_ngram
    * prefix expansion — each stage a codegen'd higher-order array
    * expression over the previous stage's tokens, so the analyzed
    * column stays inside whole-stage codegen exactly like [[analyze]].
    * Order matters and is honored: `[s_stem, stop]` tests stopwords
    * against STEMMED tokens, `[stop, s_stem]` against raw ones —
    * mirroring [[Analyzer.normalizeAll]] stage for stage.
    */
  def analyzeWith(text: Column, a: Analyzer): Column =
    // r18: one compiled eval ([[AnalyzeChainExpr]]) instead of the
    // stage-per-stage interpreted HOF pipeline — bit-identical tokens
    // (AnalyzeChainSpec pins native ≡ HOF on fuzzed corpora; the HOF
    // form below stays as the spec's reference implementation).
    org.apache.spark.sql.graft.ColumnBridge.column(
      AnalyzeChainExpr(org.apache.spark.sql.graft.ColumnBridge.expression(text), a.filters))

  /** The retired interpreted-HOF chain — reference implementation for
    * AnalyzeChainSpec's native≡HOF equivalence drills only.
    */
  private[graft] def analyzeWithHof(text: Column, a: Analyzer): Column =
    a.filters.foldLeft(analyze(text)) {
      case (toks, TokenFilter.Stop(words)) => filter(toks, t => !t.isInCollection(words))
      case (toks, TokenFilter.SStem)       => transform(toks, t => sStem(t))
      case (toks, TokenFilter.EdgeNgram(mn, mx)) =>
        flatten(transform(toks, t => edgeNgrams(t, mn, mx)))
    }

  /** One token's edge n-grams: its minGram..min(maxGram, length)
    * prefixes, as a codegen'd array expression (a token shorter than
    * minGram emits an empty array). Shared by the [[analyzeWith]]
    * edge_ngram stage and the indexed completion suggester's posting
    * build ([[Fuzzy.completionIndex]]).
    */
  def edgeNgrams(tok: Column, minGram: Int, maxGram: Int): Column =
    transform(
      filter(sequence(lit(minGram), lit(maxGram)), n => n <= length(tok)),
      n => tok.substr(lit(1), n)
    )

  /** One token through the chain's SCALAR form: the transformed token,
    * or null when a stop stage (at its declared position) drops it.
    * Powers the positional phrase path, which needs a per-original-token
    * verdict; expansion stages (edge_ngram) have no scalar form and are
    * rejected there.
    */
  private def tokenThrough(a: Analyzer, tok: Column): Column =
    a.filters.foldLeft(tok) {
      case (cur, TokenFilter.Stop(words)) =>
        when(cur.isInCollection(words), lit(null).cast("string")).otherwise(cur)
      case (cur, TokenFilter.SStem) => sStem(cur)
      case (_, TokenFilter.EdgeNgram(_, _)) =>
        throw new IllegalArgumentException("positional phrase match is undefined under an edge_ngram chain")
    }

  /** `match` under a configured analyzer: the query terms pass through
    * the QUERY-side chain (`searchA`, the mapping's search_analyzer when
    * declared, else the index chain); the column side analyzes with the
    * index chain. A query whose every term is removed by the chain
    * analyzes to zero tokens and matches no documents (score 0
    * everywhere — OpenSearch's MatchNoDocsQuery), not an error.
    */
  def matchScoreWith(text: Column, a: Analyzer, queryTerms: Seq[String], searchA: Analyzer): Column = {
    val terms = searchA.normalizeTerms(queryTerms)
    // r18: one compiled chain evaluation per row ([[ChainTermHits]])
    // instead of one interpreted analyzeWith per TERM; empty-terms and
    // NULL-text semantics match the HOF form (lit(0) / NULL sum).
    if (terms.isEmpty) lit(0)
    else
      org.apache.spark.sql.graft.ColumnBridge
        .column(ChainTermHits(org.apache.spark.sql.graft.ColumnBridge.expression(text), a.filters, terms))
  }

  /** Retired per-term HOF form — AnalyzeChainSpec reference only. */
  private[graft] def matchScoreWithHof(text: Column, a: Analyzer, queryTerms: Seq[String], searchA: Analyzer): Column = {
    val terms = searchA.normalizeTerms(queryTerms)
    terms
      .map(t => array_contains(analyzeWithHof(text, a), t).cast("int"))
      .reduceOption(_ + _)
      .getOrElse(lit(0))
  }

  def matchScoreWith(text: Column, a: Analyzer, queryTerms: Seq[String]): Column =
    matchScoreWith(text, a, queryTerms, a)

  /** `term` query: exact filter-context match. */
  def term(field: Column, value: Any): Column = field === lit(value)

  /** `terms` query: field in (values...). */
  def terms(field: Column, values: Seq[Any]): Column = field.isin(values: _*)

  /** `range` query with optional bounds (gte/lte). */
  def range(field: Column, gte: Option[Any] = None, lte: Option[Any] = None): Column =
    Seq(gte.map(v => field >= lit(v)), lte.map(v => field <= lit(v))).flatten
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** `wildcard` query: `*` → `%`, `?` → `_` (SQL LIKE) — with LIKE's own
    * metacharacters escaped FIRST, so a literal `_` or `%` in the pattern
    * stays literal (OpenSearch treats only `*` and `?` as wildcards; the
    * unescaped form let pattern `a_b` match value `a%b` — found by the
    * JsonDslFuzzSpec differential drill). Spark LIKE's default escape
    * char is `\`, and LikeSimplification still rewrites escape-free
    * patterns (`re*` → StartsWith), so plain prefixes keep their fast
    * path.
    */
  def wildcard(field: Column, pattern: String): Column =
    field.like(
      pattern
        .replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("*", "%")
        .replace("?", "_")
    )

  /** `match` query (OR operator): at least one analyzed query term occurs.
    * Returns the per-row number of matching terms — a deterministic stand-in
    * for the relevance score; filter on `> 0` for match semantics.
    */
  def matchScore(text: Column, queryTerms: Seq[String]): Column =
    queryTerms
      .map(t => array_contains(analyze(text), t.toLowerCase).cast("int"))
      .reduce(_ + _)

  /** `bool` query: must (AND), must_not (NOT), filter (AND, no score).
    *
    * must_not wraps each clause as `NOT coalesce(clause, false)`: under SQL
    * three-valued logic a NULL field makes the bare negation NULL and drops
    * the row, whereas OpenSearch must_not KEEPS documents where the clause
    * does not match (missing field). must/filter need no coalesce — NULL
    * means "did not match" and AND-drops the row on both engines.
    */
  def bool(must: Seq[Column] = Nil, mustNot: Seq[Column] = Nil, filter: Seq[Column] = Nil): Column =
    ((must ++ filter).map(c => c) ++ mustNot.map(c => !coalesce(c, lit(false))))
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** `should` clauses contribute to the score (minimum_should_match=0).
    * `when(c,1).otherwise(0)` already counts a NULL clause (missing field)
    * as 0 = "not matched", matching OpenSearch.
    */
  def shouldScore(should: Seq[Column]): Column =
    should.map(c => when(c, 1).otherwise(0)).reduceOption(_ + _).getOrElse(lit(0))

  /** Multi-index pattern (`*transaction*`): union of per-entity frames that
    * were projected to a common (idx, doc) shape by the caller.
    */
  def multiIndex(frames: Seq[DataFrame]): DataFrame = frames.reduce(_ unionByName _)

  /** `match_phrase`: the analyzed terms occur adjacently in order.
    * Token-boundary containment on the space-joined token stream.
    */
  def matchPhrase(text: Column, phrase: String): Column =
    concat(lit(" "), lower(text), lit(" ")).contains(" " + phrase.toLowerCase + " ")

  /** `match_phrase` under a configured analyzer chain, with ES-exact
    * POSITION GAPS: the stop filter removes tokens but PRESERVES the
    * survivors' position increments (Lucene's
    * enablePositionIncrements), on BOTH the document and the query
    * phrase. A query "tables the parts" (stop drops `the`, stems leave
    * table@0, part@2) therefore matches any document where `part`
    * sits exactly two positions after `table` — whatever the middle
    * token is (the well-known Lucene behavior: the gap is positional,
    * not lexical), and does NOT match an adjacent "table part". The
    * doc side keeps (original position, raw token) pairs and stems at
    * compare time; everything is codegen'd HOF array expressions — no
    * UDF, and the DuckDB oracle replays the identical chain (its
    * 1-based lambda index cancels in the position DIFFERENCES).
    */
  def matchPhraseWith(text: Column, a: Analyzer, phrase: String): Column = {
    val kept: Seq[(String, Int)] = phrase.toLowerCase
      .split("\\s+").toSeq.filter(_.nonEmpty).zipWithIndex
      .flatMap { case (t, i) => a.normalizeTerm(t).map(nt => (nt, i)) }
    if (kept.isEmpty) lit(false) // all-stopword phrase → zero hits (MatchNoDocsQuery), not an error
    else
      // r18: the positional verdict as one compiled eval
      // ([[PhraseChainMatch]]) — the interpreted transform/filter/
      // exists pipeline below (kept as the spec reference) cost ~0.9 s
      // of search_match_phrase_stemmed's 1.2 s at sf0.1.
      org.apache.spark.sql.graft.ColumnBridge.column(
        PhraseChainMatch(org.apache.spark.sql.graft.ColumnBridge.expression(text), a.filters, kept))
  }

  /** Retired interpreted positional form — AnalyzeChainSpec reference. */
  private[graft] def matchPhraseWithHof(text: Column, a: Analyzer, phrase: String): Column = {
    val kept: Seq[(String, Int)] = phrase.toLowerCase
      .split("\\s+").toSeq.filter(_.nonEmpty).zipWithIndex
      .flatMap { case (t, i) => a.normalizeTerm(t).map(nt => (nt, i)) }
    if (kept.isEmpty) lit(false)
    else {
      // Doc side: each original token keeps its ORIGINAL position and
      // runs through the chain's scalar form (null = dropped by a stop
      // stage at its declared point) — so gaps left by stopwords stay
      // positional, whatever order the chain declares its stages in.
      val paired = transform(analyze(text), (t, i) => struct(i.as("pos"), tokenThrough(a, t).as("tok")))
      val posed = filter(paired, s => s.getField("tok").isNotNull)
      def positions(term: String): Column =
        transform(filter(posed, s => s.getField("tok") === lit(term)), s => s.getField("pos"))
      val (t0, o0) = kept.head
      // Let-binding idiom: every term's position array rides the
      // transform's ARGUMENT (a 1-element struct array), so the
      // analyzer chain runs ONCE per row. Referencing positions(tj)
      // free inside the exists lambda would re-run the whole per-token
      // stem chain for EVERY candidate position x — the same
      // re-evaluation-inside-a-lambda trap as the CollapseProject ×
      // Generate finding (SURVEY §5 r11), one level down.
      val ctx = array(struct(kept.zipWithIndex.map { case ((t, _), j) =>
        positions(t).as(s"p$j")
      }: _*))
      element_at(
        transform(
          ctx,
          c =>
            exists(
              c.getField("p0"),
              x =>
                kept.tail.zipWithIndex
                  .map { case ((_, oj), j) =>
                    array_contains(c.getField(s"p${j + 1}"), x + lit(oj - o0))
                  }
                  .foldLeft(lit(true))(_ && _)
            )
        ),
        1
      )
    }
  }

  /** `prefix` query over analyzed tokens: some token starts with `p`. */
  def prefixQuery(text: Column, p: String): Column =
    exists(analyze(text), t => t.startsWith(p.toLowerCase))

  /** `bool.should` with `minimum_should_match`. */
  def minimumShouldMatch(should: Seq[Column], minimum: Int): Column =
    shouldScore(should) >= minimum

  /** Runtime ("scripted") field: OpenSearch computes these per query from a
    * painless script; in Spark it is just a Column expression, codegen'd
    * into the scan.
    */
  def scriptedField(expr: Column): Column = expr

  /** Object/nested field access on a JSON document column (the Debezium
    * payloads and OpenSearch documents are JSON objects; `props.k` becomes
    * a JSON-path extraction that stays inside the scan projection).
    */
  def jsonField(doc: Column, path: String): Column = get_json_object(doc, "$." + path)

  /** Discover search-box syntax (`status:ACTIVE AND card_type:DEBIT`,
    * `amount > 1000`) compiled to a filter predicate — see
    * [[QueryString]] for the grammar.
    */
  def parseQueryString(df: DataFrame, q: String, defaultField: Option[String] = None): Column =
    QueryString.parse(df, q, defaultField)

  /** `span_first`: position (1-based) of the term's first occurrence in
    * the analyzed token stream, 0 when absent — filter on
    * `between 1 and end` for span_first semantics. array_position is a
    * codegen'd whole-row expression: the position check never explodes
    * the token stream.
    */
  def spanFirstPos(text: Column, term: String): Column =
    coalesce(array_position(analyze(text), term.toLowerCase), lit(0L))

  /** `distance_feature` query: score decays with distance from an origin
    * as boost·pivot/(pivot+dist) — the OpenSearch hyperbola, shared by
    * the date and numeric forms (caller supplies `dist` in the field's
    * native units, e.g. seconds for dates).
    */
  def distanceFeature(dist: Column, pivot: Double, boost: Double): Column =
    lit(boost) * lit(pivot) / (lit(pivot) + dist)

  /** function_score `gauss` decay:
    * exp(ln(decay)/scale² · max(0, |x−origin|−offset)²) — 1.0 within
    * `offset` of the origin, exactly `decay` at offset+scale. Pure
    * codegen'd double math; no UDF.
    */
  def gaussDecay(x: Column, origin: Double, scale: Double, offset: Double, decay: Double): Column = {
    val d = greatest(abs(x - lit(origin)) - lit(offset), lit(0.0))
    exp(lit(math.log(decay) / (scale * scale)) * d * d)
  }

  /** `random_score` with seed + field: OpenSearch hashes (seed, field) so
    * the jitter is deterministic and reproducible. Same md5-prefix
    * uniform as the sampling operators — stable across runs, partition
    * layouts, and engines; uniform in [0, 1).
    */
  def randomScore(id: Column, seed: Int): Column =
    graft.functions.Md5PrefixLong
      .md5PrefixLong(concat(lit(seed.toString + ":"), id.cast("string")), 8)
      .cast("double") / lit(4294967296.0)
}
