package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The percolator's INDEX tier: stored queries as DATA, selected per
  * document through a term→query posting table before any predicate
  * runs. Reference surface: the "reverse search" alerting flow the
  * dashboards guide drives off the CDC stream (srosio/
  * postgres-opensearch-cdc DASHBOARD_GUIDE.md — threshold/match alerts
  * over incoming rows), at registry sizes the compiled tier cannot
  * reach.
  *
  * The repo ships percolate in three tiers:
  *   1. [[JsonDsl.percolate]] — every stored JSON body compiles into one
  *      when-array over the doc scan. Full query-DSL power, but the PLAN
  *      grows with the registry: fine to ~10³ stored queries, and the
  *      driver-side compile + codegen wall is real at 10⁴ (measured in
  *      PercolateSpec's bound test lineage).
  *   2. The flat queries-as-data interpreter (`search_percolate`): a
  *      broadcast registry crossed against the scan — plan size O(1),
  *      but every doc still evaluates EVERY stored query: work is
  *      O(docs × queries).
  *   3. THIS tier: OpenSearch's actual percolator design. Each stored
  *      query contributes posting rows (term → query_id); a document is
  *      only ever tested against the queries whose posting terms it
  *      CONTAINS. Work is O(docs × avg matching postings) — candidate-
  *      bound, not registry-bound — so 10⁵–10⁷ stored queries cost what
  *      their true selectivity costs, never a 10⁵-wide cross product.
  *
  * Query model (queries-as-data rows, one per stored query):
  *   - `terms`: the analyzed token set of a `match` clause on ONE text
  *     field (the percolator mapping's field, named at percolate time);
  *   - `conj`:  false = OR semantics (OpenSearch `match` default —
  *     ANY term present matches), true = AND (`operator: "and"` /
  *     bool.must of single-term matches — ALL terms present);
  *   - `rgt` / `rlte`: optional numeric range filter bounds over one
  *     caller-named numeric column (`range` clause conjoined in
  *     bool.filter). NULL = unbounded.
  * This is the data form of the JSON bodies the compiled tier accepts;
  * PercolateSpec proves row-for-row equality against
  * [[JsonDsl.percolate]] on the rendered bodies.
  *
  * Candidate selection is CONSERVATIVE by construction:
  *   - OR queries post EVERY term — candidacy ⟺ term overlap ⟺ the
  *     match predicate itself, so verification adds only the range
  *     bounds;
  *   - AND queries post ONE anchor term (the longest token — the static
  *     proxy for rarity when corpus statistics are unavailable at
  *     registry-build time; OpenSearch uses min-doc-freq, and a
  *     deployment with a maintained term-stats table would pick the
  *     rarest the same way). Candidacy is then a superset; the verifier
  *     re-checks ALL terms with a forall over the doc's token set.
  *   - term-less queries (pure range) are UNINDEXABLE here and post the
  *     reserved empty term against every doc's implicit empty token —
  *     callers route them to the flat tier instead (require below).
  *
  * Scale shape at 100 TB: the posting table is registry-sized (rows =
  * Σ terms per query — millions of rows for 10⁶ queries, a SMALL frame
  * by fact standards); the doc side explodes to (doc, distinct term)
  * rows carrying the doc's token set — the same text-scan cost every
  * search-index maintenance pass already pays; the candidate join is
  * term-keyed (AQE broadcasts registry-sized postings) and the spec
  * join query_id-keyed, and a row-local first-posted-term ownership
  * test replaces any distinct — so the WHOLE operator is one stateless
  * join chain. No stage's work carries the docs × queries product, no
  * driver-side plan growth (10⁵ queries compile to the SAME plan as
  * 10), and the identical plan runs over a STREAMING doc side as a
  * stream-static join (append mode, no watermark, no state store).
  */
object Percolate {

  /** A registry frame + its term posting table. `specs` columns:
    * query_id LONG, terms ARRAY<STRING>, conj BOOLEAN, rgt DOUBLE
    * (nullable), rlte DOUBLE (nullable). `posting`: term STRING,
    * query_id LONG.
    */
  final case class PercolateIndex(specs: DataFrame, posting: DataFrame) {
    // Computed once per index handle (r19, ADVICE item): the universe is
    // a pure function of the registry, so a long-lived index — including
    // a streaming query that (re)starts against it — pays the collect
    // once instead of per percolate() call.
    @transient private[search] lazy val universe: Option[Array[String]] =
      postedUniverse(posting, "term")
  }

  /** Build the posting table from a queries-as-data registry frame.
    * Driver-free: one registry-sized pass; OR queries explode all
    * terms, AND queries keep the longest-token anchor.
    */
  def buildIndex(specs: DataFrame): PercolateIndex = {
    val required = Seq("query_id", "terms", "conj", "rgt", "rlte")
    require(
      required.forall(specs.columns.contains),
      s"specs needs columns $required, got ${specs.columns.toSeq}"
    )
    // A term-less (pure-range) query would post nothing and silently
    // never match — refuse it here; the flat tier evaluates those.
    // NULL-safe: a NULL terms array makes size(filter(...)) yield NULL
    // (never === 0), which would slip past the guard, post nothing, and
    // silently never match — exactly the failure this require prevents.
    val termless =
      specs
        .filter(col("terms").isNull || size(filter(col("terms"), t => t.isNotNull && length(t) > 0)) === 0)
        .limit(1)
        .count()
    require(termless == 0,
      "term-less stored queries are not indexable (no posting term) — route them to the flat tier")
    val anchor =
      expr("array_sort(terms, (a, b) -> CASE WHEN length(a) > length(b) THEN -1 " +
        "WHEN length(a) < length(b) THEN 1 WHEN a < b THEN -1 WHEN a > b THEN 1 ELSE 0 END)[0]")
    // `_posted` rides the specs frame: the exact term set this query
    // posted, in a FIXED order — percolate's row-local first-match
    // dedup keys off it (only the first posted term present in a doc
    // emits the pair, so multi-term overlaps never need a distinct).
    val specsAug = specs.withColumn(
      "_posted",
      array_distinct(filter(
        when(col("conj"), array(anchor)).otherwise(col("terms")),
        t => t.isNotNull && length(t) > 0
      ))
    )
    val posting = specsAug
      .select(col("query_id"), explode(col("_posted")).as("term"))
      .distinct()
    PercolateIndex(specsAug, posting)
  }

  /** Distinct posted-term universe of a registry, collected driver-side
    * when the registry is small enough to inline as a scan-time
    * prefilter literal (r18). The doc-side explode then emits only the
    * tokens that can possibly join the posting table — the generate's
    * output (each row of which copies the doc's full token arrays for
    * ownership/verification) drops from every-token-of-every-doc to
    * hit-tokens-only, and docs with zero posted terms vanish before the
    * join. Registry-sized driver work, same class as the build guards.
    * Above the cap the literal would grow the plan with the registry —
    * exactly what the tier's O(1)-plan contract forbids — so big
    * registries keep the pure join shape (the prefilter is an
    * optimization, never a semantic change: exploded tokens outside the
    * universe could never survive the inner posting join anyway).
    */
  private def postedUniverse(posting: DataFrame, termCol: String): Option[Array[String]] = {
    val cap = 4096
    // Null guard (r19, ADVICE item): buildIndex filters null/empty terms
    // today, but a null reaching getString would NPE — filter explicitly
    // rather than lean on the builder invariant.
    val rows = posting.select(col(termCol)).filter(col(termCol).isNotNull).distinct().limit(cap + 1).collect()
    if (rows.length > cap) None else Some(rows.map(_.getString(0)).sorted)
  }

  private def prefilterToks(toks: Column, universe: Option[Array[String]]): Column =
    universe.map(u => array_intersect(toks, typedlit(u.toSeq))).getOrElse(toks)

  /** Percolate `docs` through the index: (doc id, query_id) match pairs.
    * `textCol` is the percolator field (analyzed with the house
    * whitespace analyzer — [[SearchDsl.analyze]] parity); `rangeCol`
    * names the numeric column the registry's range bounds address.
    *
    * ONE join chain, no distinct, no join back to the doc side: the
    * doc's token set and range value ride THROUGH the exploded term
    * rows, and a multi-term overlap of the same (doc, query) pair
    * dedups ROW-LOCALLY — only the query's FIRST posted term present
    * in the doc (array_intersect preserves `_posted` order) emits the
    * pair. That keeps the operator STATELESS and stream-safe: with a
    * streaming doc side this is a pure stream-static join pipeline —
    * append mode, no watermark, no state store
    * ([[graft.streaming.PercolateStream.alertsIndexed]]).
    */
  def percolate(
      index: PercolateIndex,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rangeCol: String
  ): DataFrame = {
    val universe = index.universe
    docs
      .select(
        col(idCol).as("_pid"),
        array_distinct(SearchDsl.analyze(col(textCol))).as("_toks"),
        col(rangeCol).cast("double").as("_rv")
      )
      // `_hits` (the doc's posted-universe tokens) is what candidacy and
      // ownership actually consume — exploding and owning off it keeps
      // the generate's per-row payload to the small hit set (the full
      // `_toks` still rides for 'and' verification).
      .withColumn("_hits", prefilterToks(col("_toks"), universe))
      .select(col("_pid"), col("_toks"), col("_hits"), col("_rv"), explode(col("_hits")).as("term"))
      // Registry frames broadcast EXPLICITLY: at 10⁶ rules the posting/
      // specs frames (~tens of MB) fall out of the 10 MB auto-broadcast
      // threshold, and a sort-merge fallback would shuffle the candidate
      // volume — and re-shuffle the static side EVERY micro-batch on the
      // streaming path (measured: a 10⁶-rule registry stalled a 45 s
      // window before the hint; candidate-bound after). Registry frames
      // are metadata-sized by the tier's own design; a 10⁷⁺-rule
      // deployment partitions the registry before it outgrows broadcast.
      .join(broadcast(index.posting), Seq("term"))
      .join(broadcast(index.specs), Seq("query_id"))
      .filter {
        import org.apache.spark.sql.graft.ColumnBridge
        // cheap range bounds first, then first-posted-term ownership
        // (exactly one exploded row per matching (doc, query) survives
        // — compiled [[graft.functions.FirstPresentEquals]] over the
        // small `_hits` set, which contains exactly the posted-universe
        // tokens ownership can ever select), then verification: AND
        // re-checks every term — over the SAME filtered
        // non-null/non-empty set posting used, so a registry with stray
        // ""/null tokens keeps tier equivalence with the compiled tier;
        // OR candidacy is the predicate. Verification reads the FULL
        // _toks ('and' queries re-check non-posted terms) as a compiled
        // eval ([[graft.functions.AllCleanTermsIn]]) instead of the
        // interpreted filter+forall HOFs — same row set (r18).
        (col("rgt").isNull || col("_rv") > col("rgt")) &&
          (col("rlte").isNull || col("_rv") <= col("rlte")) &&
          ColumnBridge.column(graft.functions.FirstPresentEquals(
            ColumnBridge.expression(col("_posted")),
            ColumnBridge.expression(col("_hits")),
            ColumnBridge.expression(col("term")))) &&
          (!col("conj") || ColumnBridge.column(
            graft.functions.AllCleanTermsIn(
              ColumnBridge.expression(col("terms")),
              ColumnBridge.expression(col("_toks"))
            )))
      }
      .select(col("_pid").as(idCol), col("query_id"))
  }

  /** The candidate set alone (pre-verification) — exposed so the
    * superset contract is testable exactly as stated.
    */
  def candidates(
      index: PercolateIndex,
      docs: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame =
    docs
      .select(col(idCol).as("_pid"), explode(array_distinct(SearchDsl.analyze(col(textCol)))).as("term"))
      .join(broadcast(index.posting), Seq("term"))
      .select(col("_pid").as(idCol), col("query_id"))
      .distinct()

  // ───────────────────────────────────────────────────────────────────
  // RICH query model (r14): the indexed tier grows from "one match on
  // one field (+ one range)" to OpenSearch's bool.must-of-clauses form —
  // multi-field terms, `operator: and` matches, and match_phrase — while
  // keeping every structural property of the flat model: candidate-
  // superset selection, row-local first-posted-term dedup (no distinct),
  // one stateless join chain, plan O(1) in registry size, stream-static
  // safe.
  //
  // Registry row shape (queries-as-data):
  //   query_id LONG,
  //   clauses  ARRAY<STRUCT<field: STRING, kind: STRING,
  //                         terms: ARRAY<STRING>>>,
  //   rgt/rlte DOUBLE (nullable — the bool.filter range, as before).
  // kinds: 'or'     = match default (ANY term present on `field`);
  //        'and'    = match operator:and (ALL terms present);
  //        'phrase' = match_phrase (terms ADJACENT IN ORDER under the
  //                   house whitespace analyzer — verified positionally
  //                   against the field's full in-order token array).
  // Query semantics = bool.must over the clauses (ALL must hold), so:
  //   - candidacy = ANY clause's anchors present (each conjunct alone
  //     bounds the true match set from above — posting EVERY conjunct's
  //     anchors keeps the superset while letting rare-anchored clauses
  //     prune);
  //   - 'or' clauses post every term (their anchors ARE the predicate),
  //     'and'/'phrase' clauses post the longest term (the static rarity
  //     proxy, as in the flat tier).
  // NEGATION (bool.must_not, r14): kinds 'not_or' / 'not_and' /
  // 'not_phrase' — the clause holds when its positive form does NOT.
  // Negative clauses post NOTHING (a negation can't anchor candidacy —
  // it's true of almost every doc), so a query needs ≥1 positive clause
  // to be indexable (build-time guard); verification then applies the
  // negations. Candidacy stays a superset: must_not only removes
  // matches from what the positive anchors select.
  // Posting keys are field-qualified (`field<NUL>term`) so a term on
  // `source` never creates candidacy for a `text` clause.
  // ───────────────────────────────────────────────────────────────────

  /** Rich registry + field-qualified posting table. `posting` columns:
    * pterm STRING ("field<NUL>term"), query_id LONG.
    */
  final case class RichIndex(specs: DataFrame, posting: DataFrame) {
    @transient private[search] lazy val universe: Option[Array[String]] =
      postedUniverse(posting, "pterm")
  }

  private val FieldSep = "\u0000"

  /** Longest clean term of a clause — comparator form of the flat
    * tier's anchor sort, usable on nested lambda variables.
    */
  private def anchorOf(terms: Column): Column =
    array_sort(
      terms,
      (a, b) =>
        when(length(a) > length(b), -1)
          .when(length(a) < length(b), 1)
          .when(a < b, -1)
          .when(a > b, 1)
          .otherwise(0)
    ).getItem(0)

  private def cleanTerms(terms: Column): Column =
    filter(terms, t => t.isNotNull && length(t) > 0)

  /** Build the field-qualified posting table from a rich registry.
    * Driver-free except the two build-time validity guards (both
    * LIMIT-1 probes, registry-sized at worst).
    */
  def buildIndexRich(specs: DataFrame): RichIndex = {
    val required = Seq("query_id", "clauses", "rgt", "rlte")
    require(
      required.forall(specs.columns.contains),
      s"specs needs columns $required, got ${specs.columns.toSeq}"
    )
    // Clause-less queries and term-less clauses would post nothing and
    // silently never match — refuse at build time (NULL-safe, as in the
    // flat tier's guard). Unknown kinds would verify as 'phrase' by the
    // otherwise-branch — refuse those too. A query with ONLY negative
    // clauses has no anchor to post (its candidacy would be "almost
    // every doc") — not indexable, route it to the flat tier. should_*
    // kinds (r16, minimum_should_match=1 semantics: ≥1 should clause
    // must hold) ARE anchoring: every should clause posts, so candidacy
    // covers "any should matched".
    val positiveKinds = Seq("or", "and", "phrase", "should_or", "should_and", "should_phrase")
    val allKinds = positiveKinds ++ Seq("not_or", "not_and", "not_phrase")
    val bad = specs
      .filter(
        col("clauses").isNull || size(col("clauses")) === 0 ||
          exists(col("clauses"), c => size(cleanTerms(c.getField("terms"))) === 0) ||
          exists(col("clauses"), c => !c.getField("kind").isin(allKinds.map(lit): _*)) ||
          !exists(col("clauses"), c => c.getField("kind").isin(positiveKinds.map(lit): _*)) ||
          // a null/empty token INSIDE a phrase has positional meaning the
          // analyzed-token verifier cannot reproduce — require clean.
          // (A must-anchored rule may carry shoulds; a should-only rule
          // posts EVERY should clause; a rule mixing zero musts with only
          // not_* + should_* anchors on the shoulds alone, which is sound
          // — so no extra structural rule is needed beyond the above.)
          exists(
            col("clauses"),
            c =>
              c.getField("kind").isin("phrase", "not_phrase", "should_phrase") &&
                size(cleanTerms(c.getField("terms"))) =!= size(c.getField("terms"))
          )
      )
      .limit(1)
      .count()
    require(bad == 0,
      "rich registry rows must have ≥1 POSITIVE clause, every clause ≥1 non-empty term " +
        "(phrase clauses: ALL terms non-empty), kind ∈ {or,and,phrase,should_*,not_or,not_and,not_phrase}")
    val postedOf = (c: Column) => {
      val clean = cleanTerms(c.getField("terms"))
      transform(
        when(c.getField("kind").isin("or", "should_or"), clean)
          .when(c.getField("kind").isin("and", "phrase", "should_and", "should_phrase"), array(anchorOf(clean)))
          // negative clauses anchor nothing
          .otherwise(array().cast("array<string>")),
        t => concat(c.getField("field"), lit(FieldSep), t)
      )
    }
    val specsAug = specs.withColumn(
      "_posted",
      array_distinct(flatten(transform(col("clauses"), postedOf)))
    )
    val posting = specsAug
      .select(col("query_id"), explode(col("_posted")).as("pterm"))
      .distinct()
    RichIndex(specsAug, posting)
  }

  /** The doc side's field-qualified DISTINCT token set over the named
    * text fields — the candidacy key space.
    */
  private def docCompositeToks(textFields: Seq[String]): Column =
    array_distinct(flatten(array(textFields.map { f =>
      transform(
        array_distinct(SearchDsl.analyze(col(f))),
        t => concat(lit(f), lit(FieldSep), t)
      )
    }: _*)))

  /** Positional phrase verification: the phrase's terms occur adjacently
    * in order somewhere in the field's full (in-order, duplicates kept)
    * token array. Pure nested-HOF codegen — no UDF. The candidate
    * positions are pre-filtered to FIRST-TERM hits, so the inner
    * per-position conjunction (and its sequence allocation) runs only on
    * the few true anchors, not every position of every candidate row;
    * `when` guards the short-doc case so `sequence` never runs
    * descending, and the single-term branch short-circuits before the
    * (then-descending) inner sequence(2, 1) could be touched.
    */
  private def phraseOk(toks: Column, terms: Column): Column = {
    val n = size(terms)
    val m = size(toks)
    when(
      m >= n,
      exists(
        filter(sequence(lit(1), m - n + lit(1)), i => element_at(toks, i) === element_at(terms, 1)),
        i =>
          (n === lit(1)) ||
            forall(sequence(lit(2), n), j => element_at(toks, i + j - lit(1)) === element_at(terms, j))
      )
    ).otherwise(lit(false))
  }

  /** One clause's verification predicate over the post-join row, which
    * carries each field's full token array as `_tk_<field>`. Dispatch on
    * the clause's field is a plan-time fold over the KNOWN field list —
    * the attribute references are materialized join outputs, so the
    * analyzer chain runs once per doc row, never once per lambda
    * iteration (the matchPhraseWith let-binding discipline).
    */
  private def clauseOk(c: Column, textFields: Seq[String]): Column = {
    def checkOn(toks: Column): Column = {
      val clean = cleanTerms(c.getField("terms"))
      val kind = c.getField("kind")
      when(kind.isin("or", "should_or"), exists(clean, t => array_contains(toks, t)))
        .when(kind.isin("and", "should_and"), forall(clean, t => array_contains(toks, t)))
        .when(kind.isin("phrase", "should_phrase"), phraseOk(toks, clean))
        // negations: the clause holds when its positive form does NOT
        .when(kind === "not_or", !exists(clean, t => array_contains(toks, t)))
        .when(kind === "not_and", !forall(clean, t => array_contains(toks, t)))
        .otherwise(!phraseOk(toks, clean))
    }
    textFields.foldRight(lit(false)) { (f, els) =>
      when(c.getField("field") === f, checkOn(col(s"_tk_$f"))).otherwise(els)
    }
  }

  /** Percolate `docs` through a rich index: (doc id, query_id) pairs.
    * Same one-join-chain shape as the flat tier — explode the doc's
    * field-qualified token set, posting join, spec join, then row-local
    * first-posted-term ownership + full bool.must verification. Stateless
    * and stream-safe for the same reasons
    * ([[graft.streaming.PercolateStream.alertsIndexedRich]]).
    */
  def percolateRich(
      index: RichIndex,
      docs: DataFrame,
      idCol: String,
      textFields: Seq[String],
      rangeCol: String
  ): DataFrame = {
    val universe = index.universe
    val tokCols = textFields.map(f => SearchDsl.analyze(col(f)).as(s"_tk_$f"))
    docs
      .select(
        Seq(
          col(idCol).as("_pid"),
          docCompositeToks(textFields).as("_ctoks"),
          col(rangeCol).cast("double").as("_rv")
        ) ++ tokCols: _*
      )
      // `_hits` = the doc's posted-universe composite tokens: candidacy
      // and ownership consume only these, so the generate's per-row
      // payload shrinks to the hit set (per-field token arrays still
      // ride for verification).
      .withColumn("_hits", prefilterToks(col("_ctoks"), universe))
      .drop("_ctoks")
      .withColumn("pterm", explode(col("_hits")))
      // registry broadcast: same rationale as the flat tier's percolate
      .join(broadcast(index.posting), Seq("pterm"))
      .join(broadcast(index.specs), Seq("query_id"))
      .filter {
        // evaluation order matters: the constant-time range bounds and
        // the compiled first-posted-term ownership prune BEFORE the
        // per-clause verification ever runs — And short-circuits
        // left-to-right. Verification (must all hold; should_* group
        // holds when ≥1 does, minimum_should_match=1) runs as ONE
        // native compiled eval ([[graft.functions.RichClausesOk]])
        // instead of the interpreted forall/exists/phrase HOF tree it
        // replaces — the HOF tree cost ~37 µs per candidate row
        // (~1.1 s of this key's 1.6 s at sf0.1); PercolateSpec's
        // tier-equality and the fuzz drills pin the exact row-set
        // equivalence.
        import org.apache.spark.sql.graft.ColumnBridge
        (col("rgt").isNull || col("_rv") > col("rgt")) &&
          (col("rlte").isNull || col("_rv") <= col("rlte")) &&
          ColumnBridge.column(graft.functions.FirstPresentEquals(
            ColumnBridge.expression(col("_posted")),
            ColumnBridge.expression(col("_hits")),
            ColumnBridge.expression(col("pterm")))) &&
          ColumnBridge.column(graft.functions.RichClausesOk(
            ColumnBridge.expression(col("clauses")),
            textFields,
            textFields.map(f => ColumnBridge.expression(col(s"_tk_$f")))
          ))
      }
      .select(col("_pid").as(idCol), col("query_id"))
  }

  /** Rich candidate set (pre-verification) — the testable superset. */
  def candidatesRich(
      index: RichIndex,
      docs: DataFrame,
      idCol: String,
      textFields: Seq[String]
  ): DataFrame =
    docs
      .select(col(idCol).as("_pid"), explode(docCompositeToks(textFields)).as("pterm"))
      .join(broadcast(index.posting), Seq("pterm"))
      .select(col("_pid").as(idCol), col("query_id"))
      .distinct()

  /** Compile a JSON-body rule registry (the wire form users actually
    * store — the same bodies [[JsonDsl.percolate]] compiles into a
    * projection) into rich queries-as-data rows for [[buildIndexRich]]:
    * the bridge that lets a JSON registry run at posting-table scale
    * instead of the compiled tier's ~10³ plan ceiling.
    *
    * Accepted query shapes (the indexable subset — anything else
    * fail-fasts so a rule never silently degrades):
    *   - `match` {field: "terms"} → 'or' clause; {field: {"query": …,
    *     "operator": "and"}} → 'and' clause;
    *   - `match_phrase` {field: "…"} → 'phrase' clause;
    *   - `bool` with `must` (array or single) of the above, plus an
    *     optional `filter` of ONE `range` on `rangeField` with gt/lte
    *     bounds (the rich model's range slots).
    * Fields must be in `textFields` (the fields percolate-time will
    * tokenize); query text analyzes with the house whitespace-lower
    * analyzer, matching [[SearchDsl.analyze]] on the doc side.
    *
    * Registry parsing is driver-side (a registry is metadata-sized —
    * 10⁶ rules parse in seconds and the posting build is distributed);
    * the percolate itself never touches the driver.
    */
  def compileJsonRegistry(
      spark: org.apache.spark.sql.SparkSession,
      bodies: Seq[(Long, String)],
      textFields: Seq[String],
      rangeField: String
  ): DataFrame = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def analyzed(s: String): Seq[String] = s.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    def clauseOf(node: com.fasterxml.jackson.databind.JsonNode): (String, String, Seq[String]) = {
      require(node.isObject && node.size == 1, s"clause must have exactly one query type: $node")
      val qt = node.fieldNames().next()
      val body = node.get(qt)
      require(body.isObject && body.size == 1, s"$qt must name exactly one field: $body")
      val field = body.fieldNames().next()
      require(textFields.contains(field), s"$qt on '$field' — not a percolate text field $textFields")
      val v = body.get(field)
      qt match {
        case "match" =>
          if (v.isObject) {
            val q = v.get("query")
            require(q != null, s"match on '$field' needs a query")
            val and = Option(v.get("operator")).exists(_.asText == "and")
            (field, if (and) "and" else "or", analyzed(q.asText))
          } else (field, "or", analyzed(v.asText))
        case "match_phrase" =>
          require(!v.isObject, s"match_phrase on '$field' takes a plain string here")
          (field, "phrase", analyzed(v.asText))
        case other =>
          throw new IllegalArgumentException(
            s"query type '$other' is not indexable — route this rule to the compiled tier")
      }
    }
    val rows = bodies.map { case (id, body) =>
      val root0 = mapper.readTree(body)
      val root = if (root0.has("query")) root0.get("query") else root0
      require(root.isObject && root.size == 1, s"rule $id: body must have exactly one top-level query")
      val qt = root.fieldNames().next()
      val (clauses, rgt, rlte) = qt match {
        case "bool" =>
          val b = root.get("bool")
          val extra =
            b.fieldNames().asScala.toSet -- Set("must", "must_not", "filter", "should", "minimum_should_match")
          require(extra.isEmpty, s"rule $id: unsupported bool sections $extra")
          val must = Option(b.get("must")).map { m =>
            (if (m.isArray) m.elements().asScala.toSeq else Seq(m)).map(clauseOf)
          }.getOrElse(Seq.empty)
          val shouldRaw = Option(b.get("should")).map { m =>
            (if (m.isArray) m.elements().asScala.toSeq else Seq(m)).map(clauseOf)
          }.getOrElse(Seq.empty)
          val msm = Option(b.get("minimum_should_match")).map(_.asInt)
          require(msm.isEmpty || shouldRaw.nonEmpty,
            s"rule $id: minimum_should_match without should clauses")
          // Upstream semantics (and JsonDsl.compileQuery's, verbatim):
          // msm defaults to 1 only when the bool has NO must/filter
          // context, else 0. msm=0 makes should scoring-only — the
          // percolator emits matches, not scores, so those clauses
          // compile away (a semantic no-op for the match set). msm=1 is
          // indexable (r16): every should clause posts, candidacy covers
          // "any should matched", verification requires ≥1 should to
          // hold. msm≥2 stays fail-fast (k-of-n candidacy can't anchor
          // on single terms).
          val effMsm = msm.getOrElse(
            if (must.isEmpty && b.get("filter") == null && shouldRaw.nonEmpty) 1 else 0)
          require(effMsm <= 1,
            s"rule $id: minimum_should_match=$effMsm is not indexable (only 0/1) — route to the compiled tier")
          val should =
            if (shouldRaw.isEmpty || effMsm == 0) Seq.empty
            else shouldRaw.map { case (f, k, ts) => (f, "should_" + k, ts) }
          require(must.nonEmpty || should.nonEmpty,
            s"rule $id: bool without must or qualifying should clauses is not indexable " +
              "(negations cannot anchor candidacy)")
          val mustNot = Option(b.get("must_not")).map { m =>
            (if (m.isArray) m.elements().asScala.toSeq else Seq(m))
              .map(clauseOf)
              .map { case (f, k, ts) => (f, "not_" + k, ts) }
          }.getOrElse(Seq.empty)
          val all = must ++ should ++ mustNot
          // Multi-range conjuncts (r16): several gt/lte ranges on the
          // range field fold exactly to (max gt, min lte) — candidacy
          // still anchors on the term legs, the folded bounds verify.
          val (g, l) = Option(b.get("filter")).map { f =>
            val fs = if (f.isArray) f.elements().asScala.toSeq else Seq(f)
            require(fs.nonEmpty && fs.forall(_.has("range")),
              s"rule $id: filter legs must all be range clauses")
            val bs = fs.map { leg =>
              val r = leg.get("range")
              require(r.size == 1 && r.has(rangeField), s"rule $id: range must address '$rangeField'")
              val bounds = r.get(rangeField)
              val extraB = bounds.fieldNames().asScala.toSet -- Set("gt", "lte")
              require(extraB.isEmpty, s"rule $id: only gt/lte range bounds are indexable, got $extraB")
              (Option(bounds.get("gt")).map(_.asDouble), Option(bounds.get("lte")).map(_.asDouble))
            }
            (bs.flatMap(_._1).reduceOption(math.max(_: Double, _: Double)),
              bs.flatMap(_._2).reduceOption(math.min(_: Double, _: Double)))
          }.getOrElse((Option.empty[Double], Option.empty[Double]))
          (all, g, l)
        case "match" | "match_phrase" =>
          (Seq(clauseOf(root)), Option.empty[Double], Option.empty[Double])
        case other =>
          throw new IllegalArgumentException(
            s"rule $id: query type '$other' is not indexable — route to the compiled tier")
      }
      (id, clauses, rgt, rlte)
    }
    import spark.implicits._
    rows
      .toDF("query_id", "clauses", "rgt", "rlte")
      .withColumn(
        "clauses",
        expr("transform(clauses, c -> struct(c._1 AS field, c._2 AS kind, c._3 AS terms))")
      )
  }

  /** Render one rich registry row as the JSON body the compiled tier
    * accepts — bool.must of match / match-operator-and / match_phrase
    * clauses plus the range filter. The equality bridge for the rich
    * tier's PercolateSpec contract.
    */
  def asJsonBodyRich(
      clauses: Seq[(String, String, Seq[String])],
      rgt: Option[Double],
      rlte: Option[Double],
      rangeField: String
  ): String = {
    val (neg, rest) = clauses.partition(_._2.startsWith("not_"))
    val (should, pos) = rest.partition(_._2.startsWith("should_"))
    val musts = pos.flatMap {
      case (f, "or", terms)     => Seq(s"""{"match": {"$f": "${terms.mkString(" ")}"}}""")
      case (f, "and", terms)    => terms.map(t => s"""{"match": {"$f": "$t"}}""")
      case (f, "phrase", terms) => Seq(s"""{"match_phrase": {"$f": "${terms.mkString(" ")}"}}""")
      case (_, k, _)            => throw new IllegalArgumentException(s"unknown clause kind '$k'")
    }
    val shoulds = should.map {
      case (f, "should_or", terms) => s"""{"match": {"$f": "${terms.mkString(" ")}"}}"""
      case (f, "should_and", terms) =>
        s"""{"match": {"$f": {"query": "${terms.mkString(" ")}", "operator": "and"}}}"""
      case (f, "should_phrase", terms) => s"""{"match_phrase": {"$f": "${terms.mkString(" ")}"}}"""
      case (_, k, _)                   => throw new IllegalArgumentException(s"unknown clause kind '$k'")
    }
    val mustNots = neg.flatMap {
      case (f, "not_or", terms)     => Seq(s"""{"match": {"$f": "${terms.mkString(" ")}"}}""")
      case (f, "not_and", terms)    => Seq(s"""{"match": {"$f": {"query": "${terms.mkString(" ")}", "operator": "and"}}}""")
      case (f, "not_phrase", terms) => Seq(s"""{"match_phrase": {"$f": "${terms.mkString(" ")}"}}""")
      case (_, k, _)                => throw new IllegalArgumentException(s"unknown clause kind '$k'")
    }
    val mustNotClause =
      if (mustNots.isEmpty) "" else s""", "must_not": [${mustNots.mkString(", ")}]"""
    val shouldClause =
      if (shoulds.isEmpty) ""
      else s""", "should": [${shoulds.mkString(", ")}], "minimum_should_match": 1"""
    val rangeParts = rgt.map(v => s""""gt": $v""").toSeq ++ rlte.map(v => s""""lte": $v""").toSeq
    val filterClause =
      if (rangeParts.isEmpty) ""
      else s""", "filter": [{"range": {"$rangeField": {${rangeParts.mkString(", ")}}}}]"""
    s"""{"query": {"bool": {"must": [${musts.mkString(", ")}]$shouldClause$mustNotClause$filterClause}}}"""
  }

  /** Render one registry row as the JSON body the compiled tier
    * ([[JsonDsl.percolate]]) accepts — the equality bridge PercolateSpec
    * drives: indexed results ≡ compiled results on the same registry.
    */
  def asJsonBody(
      terms: Seq[String],
      conj: Boolean,
      rgt: Option[Double],
      rlte: Option[Double],
      textField: String,
      rangeField: String
  ): String = {
    val matchClauses =
      if (conj) terms.map(t => s"""{"match": {"$textField": "$t"}}""")
      else Seq(s"""{"match": {"$textField": "${terms.mkString(" ")}"}}""")
    val rangeParts = rgt.map(v => s""""gt": $v""").toSeq ++ rlte.map(v => s""""lte": $v""").toSeq
    val filterClause =
      if (rangeParts.isEmpty) ""
      else s""", "filter": [{"range": {"$rangeField": {${rangeParts.mkString(", ")}}}}]"""
    s"""{"query": {"bool": {"must": [${matchClauses.mkString(", ")}]$filterClause}}}"""
  }
}
