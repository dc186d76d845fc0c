package graft.search

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The reference's actual wire format: OpenSearch JSON request bodies
  * (DASHBOARD_GUIDE.md:96-112 Dev Tools queries, e.g.
  * `{"query": {"match": {"status": "ACTIVE"}}, "size": 10}` and
  * `{"query": {"range": {"amount": {"gte": 100}}}}`), compiled onto the
  * [[SearchDsl]]/[[Aggs]] combinators — so a JSON body and the equivalent
  * structured query produce the IDENTICAL Catalyst plan (asserted in
  * JsonDslSpec), and everything participates in pushdown.
  *
  * Query clauses: match, match_phrase, term, terms, range
  * (gt/gte/lt/lte), bool (must/filter/must_not/should +
  * minimum_should_match), wildcard, prefix, exists, match_all,
  * query_string, multi_match, ids (on an `_id` column), fuzzy, regexp
  * (anchored, per OpenSearch), terms_set, span_near (two span_terms,
  * slop + in_order), knn (with a `filter` pre-filter sub-clause),
  * function_score (field_value_factor form: the inner query filters,
  * boost × modifier(factor × field) ranks — ln1p/log1p/sqrt/square),
  * constant_score (filter context + fixed boost as _score), dis_max
  * (constant_score sub-queries fused as best + tie_breaker × rest in
  * one pass per row).
  * `f.keyword` resolves to the base column with exact semantics (the
  * dynamic multi-field convention). `collapse` keeps the top hit per
  * group under the body's sort via the bounded-heap operator. Deep
  * paging: `search_after` in the body, or [[scroll]] for the
  * scroll-API shape (cursor pages emulated over search_after).
  * Aggregations: terms (+ metric sub-aggregations), date_histogram
  * (+ metric sub-aggregations sum/avg/min/max/value_count), stats,
  * cardinality, histogram, range, filters, adjacency_matrix,
  * auto_date_histogram, boxplot, median_absolute_deviation,
  * string_stats, percentiles, and top-level single metrics
  * (avg/sum/min/max/value_count). Pipeline sub-aggregations under
  * date_histogram: cumulative_sum / derivative / moving_avg (window
  * over the bucket table) and bucket_selector (the HAVING of the
  * bucket world — filters buckets by a `params.<var> <op> <number>`
  * script over sibling metrics). Hits shaping: sort,
  * size, _source, search_after (deep paging: a lexicographic tuple
  * predicate over the sort keys — a pushdown-able filter, never an
  * offset skip), highlight (per-field snippet columns around the first
  * query-term occurrence, null for hits the term does not literally
  * contain — OpenSearch omits those highlights).
  *
  * The [[IndexMapping]] decides analyzed-vs-exact per field (a `match` on
  * a `text` field tests analyzed terms; on a `keyword` field it is exact
  * equality) — OpenSearch's own mapping-driven behavior.
  */
object JsonDsl {

  private val mapper = new ObjectMapper()

  /** Execute a JSON request body against a frame: filter by `query`, then
    * either the (single) `aggs` aggregation or the sort/size/_source hits
    * shaping.
    */
  /** Execute a search request body. Every request-shaped failure —
    * malformed JSON, unknown clauses, wrong value shapes, AND fields
    * that don't exist in the frame's schema (Spark's analysis error,
    * translated) — surfaces as IllegalArgumentException: the single
    * error class the `_validate` path and callers rely on, the 400
    * response of the wire protocol.
    */
  /** `relations` names the OTHER frames a body may reference: the child/
    * parent side of has_child/has_parent (where the `join` object in the
    * clause carries the key pair the join-field mapping would hold in
    * OpenSearch) and the lookup index of the terms-lookup form.
    */
  def parse(
      df: DataFrame,
      body: String,
      mapping: IndexMapping = IndexMapping.empty,
      relations: Map[String, DataFrame] = Map.empty
  ): DataFrame =
    try {
      val (df2, body2) = applyRequestPipeline(df, body, mapping)
      parseImpl(withRuntimeFields(df2, body2), body2, mapping, relations)
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(s"request references unknown schema elements: ${e.getMessage}", e)
    }

  /** Request-level `search_pipeline` processors: rewrite the REQUEST
    * before the search runs. `filter_query` ANDs an extra query onto the
    * body — the processor OpenSearch ships for tenant scoping / soft
    * deletes — so here it becomes one more predicate on the scan, fused
    * with the body's own query by Catalyst (both push down together;
    * the pipeline costs zero extra passes). Phase-results processors
    * (the hybrid normalization-processor) are NOT handled here — they
    * belong to the hybrid execution path — and their presence alongside
    * request_processors is rejected explicitly rather than silently
    * dropped. Malformed JSON falls through untouched: parseImpl owns
    * that diagnosis.
    */
  private def applyRequestPipeline(df: DataFrame, body: String, mapping: IndexMapping): (DataFrame, String) = {
    val root = try mapper.readTree(body) catch { case _: Exception => return (df, body) }
    if (root == null || !root.isObject || !root.hasNonNull("search_pipeline")) return (df, body)
    val sp = root.get("search_pipeline")
    if (!sp.isObject || !sp.hasNonNull("request_processors")) return (df, body)
    require(
      !sp.hasNonNull("phase_results_processors"),
      "request_processors cannot be combined with phase_results_processors in one inline pipeline"
    )
    val procs = sp.get("request_processors").elements().asScala.toSeq
    val out = procs.foldLeft(df) { (acc, p) =>
      require(p.isObject && p.size == 1, s"a request processor must hold exactly one type: $p")
      p.fieldNames().next() match {
        case "filter_query" =>
          val q = req(p.get("filter_query"), "query", "filter_query processor")
          acc.filter(compileQuery(acc, q, mapping))
        case other =>
          throw new IllegalArgumentException(s"unsupported request processor '$other' (supported: filter_query)")
      }
    }
    val rest = root.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
    rest.remove("search_pipeline")
    (out, mapper.writeValueAsString(rest))
  }

  /** `runtime_mappings`: computed fields declared in the request and
    * usable anywhere a stored field is (query, sort, _source). The
    * script's arithmetic subset compiles to a codegen'd expression
    * ([[ScriptExpr]]), so a runtime field costs one projection — no
    * per-hit interpretation. Malformed JSON falls through untouched:
    * parseImpl owns that diagnosis.
    */
  private def withRuntimeFields(df: DataFrame, body: String): DataFrame = {
    val root = try mapper.readTree(body) catch { case _: Exception => return df }
    if (root == null || !root.isObject) return df
    Option(root.get("runtime_mappings")).fold(df) { rm =>
      require(rm.isObject, s"runtime_mappings must be an object: $rm")
      rm.fields().asScala.foldLeft(df) { (acc, e) =>
        val script = req(e.getValue, "script", s"runtime field '${e.getKey}'").asText
        acc.withColumn(e.getKey, ScriptExpr.compile(script))
      }
    }
  }

  private def parseImpl(
      df: DataFrame,
      body: String,
      mapping: IndexMapping,
      relations: Map[String, DataFrame] = Map.empty
  ): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"request body must be a JSON object: $body")
    val known =
      Set(
        "query",
        "aggs",
        "aggregations",
        "sort",
        "size",
        "_source",
        "search_after",
        "highlight",
        "collapse",
        "runtime_mappings",
        "rescore",
        "suggest",
        "script_fields"
      )
    root.fieldNames().asScala.foreach(n => require(known(n), s"unsupported request element '$n'"))
    // Mutually-exclusive elements are rejected BEFORE any agg-family
    // early return: a body combining script_fields with e.g. a global /
    // parent / children agg used to slip past the later guard (those
    // handlers return first) and silently drop the script_fields.
    require(
      root.get("script_fields") == null || (root.get("aggs") == null && root.get("aggregations") == null),
      "script_fields with aggs is unsupported"
    )
    // _search suggest block: term (edit-distance spell correction over
    // the corpus vocabulary) and completion (prefix leaders) suggesters —
    // each compiles to the structured entries' vocabulary plans.
    Option(root.get("suggest")) match {
      case Some(sg) =>
        require(
          root.get("query") == null && root.get("aggs") == null && root.get("aggregations") == null,
          "suggest with query/aggs is unsupported"
        )
        require(sg.isObject && sg.size == 1, s"exactly one named suggester is supported: $sg")
        val spec = sg.elements().asScala.next()
        return compileSuggest(df, spec)
      case None => ()
    }
    // The knn query (the OpenSearch vector-search plugin's clause) is a
    // top-k ranking, not a predicate: score the frame, order by _score
    // (the body's sort entries break ties), keep k. One scan +
    // TakeOrderedAndProject — the brute-force ANN plan.
    Option(root.get("query")).filter(q => q.isObject && q.size == 1 && q.fieldNames().next() == "knn") match {
      case Some(q) =>
        require(root.get("aggs") == null && root.get("aggregations") == null, "knn with aggs is unsupported")
        val body = q.get("knn")
        val f = singleField(body)
        val spec = body.get(f)
        val vec = req(spec, "vector", "knn").elements().asScala.toSeq.map(_.asDouble)
        val kOpt = Option(spec.get("k")).map(_.asInt)
        val minScore = Option(spec.get("min_score")).map(_.asDouble)
        require(kOpt.isDefined || minScore.isDefined, "knn needs k or min_score")
        // knn.filter — OpenSearch's filtered vector search: the filter
        // applies BEFORE scoring (an efficient pre-filter with exact
        // recall over the surviving subset), never a post-filter of the
        // top k that could return < k or miss qualifying neighbors.
        val base = Option(spec.get("filter"))
          .map(fn => df.filter(compileQuery(df, fn, mapping)))
          .getOrElse(df)
        val scored = base.withColumn(
          "_score",
          round(graft.functions.VectorFns.cosine(col(f), array(vec.map(lit): _*)), 6)
        )
        val bodySort = Option(root.get("sort")).map(compileSort)
        val order = col("_score").desc +: bodySort.getOrElse(Nil)
        // min_score = radius search (every vector at least that close —
        // a filter + bounded result sort, no arbitrary k cutoff); with k
        // it additionally truncates, per the OpenSearch contract.
        val inRange = minScore.fold(scored)(ms => scored.filter(col("_score") >= ms))
        val ranked = inRange.orderBy(order: _*)
        val top = kOpt.fold(ranked)(k => ranked.limit(k))
        // knn is a top-k RETRIEVAL operator: selection is always
        // score-driven; an explicit top-level sort re-orders the
        // PRESENTATION of the k nearest (the wire API contract — sort
        // replaces relevance ordering of the hit list, it never changes
        // which k hits come back). _score desc stays as the
        // deterministic trailing tiebreak.
        val presented = bodySort match {
          case Some(s) => top.orderBy((s :+ col("_score").desc): _*)
          case None    => top
        }
        return Option(root.get("_source")) match {
          case Some(src) => presented.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None      => presented
        }
      case None => ()
    }
    // function_score (field_value_factor form): the inner query filters,
    // the score is a pure projection over a numeric field —
    // boost × modifier(factor × field) — then rank by _score. Score-time
    // work never touches non-matching rows (filter first), and the whole
    // thing is one codegen'd scan + TakeOrderedAndProject when sized.
    Option(root.get("query")).filter(q =>
      q.isObject && q.size == 1 && q.fieldNames().next() == "function_score"
    ) match {
      case Some(q) =>
        require(root.get("aggs") == null && root.get("aggregations") == null, "function_score with aggs is unsupported")
        val body = q.get("function_score")
        // Two scoring forms: field_value_factor (Lucene's modifier
        // family — ln* natural log, log* base 10) and the gauss decay
        // function ({"gauss": {field: {origin, scale, offset, decay}}}),
        // both pure codegen'd projections — see SearchDsl.gaussDecay.
        val modified =
          if (body.has("random_score")) {
            // random_score(seed): deterministic uniform jitter from
            // md5(seed:id) — reproducible across runs, partition layouts,
            // and engines (the property OpenSearch's seeded variant
            // promises). `field` names the id column (the _id stand-in,
            // same convention as has_child's join object).
            val rs = body.get("random_score")
            val seed = req(rs, "seed", "random_score").asInt
            val idField = req(rs, "field", "random_score").asText
            SearchDsl.randomScore(col(idField), seed)
          } else if (body.has("gauss")) {
            val g = body.get("gauss")
            val fname = g.fieldNames().next()
            val spec = g.get(fname)
            SearchDsl.gaussDecay(
              col(fname),
              req(spec, "origin", "gauss").asDouble,
              req(spec, "scale", "gauss").asDouble,
              Option(spec.get("offset")).map(_.asDouble).getOrElse(0.0),
              Option(spec.get("decay")).map(_.asDouble).getOrElse(0.5)
            )
          } else {
            val fvf = req(body, "field_value_factor", "function_score")
            val field = col(req(fvf, "field", "field_value_factor").asText)
            val factor = Option(fvf.get("factor")).map(_.asDouble).getOrElse(1.0)
            val raw = lit(factor) * field
            Option(fvf.get("modifier")).map(_.asText).getOrElse("none") match {
              case "none"   => raw
              case "ln1p"   => log(lit(1.0) + raw)
              case "log1p"  => log10(lit(1.0) + raw)
              case "sqrt"   => sqrt(raw)
              case "square" => raw * raw
              case m        => throw new IllegalArgumentException(s"unsupported field_value_factor modifier '$m'")
            }
          }
        val boost = Option(body.get("boost")).map(_.asDouble).getOrElse(1.0)
        val base = Option(body.get("query"))
          .map(fn => df.filter(compileQuery(df, fn, mapping)))
          .getOrElse(df)
        val scored = base.withColumn("_score", round(lit(boost) * modified, 6))
        // An explicit top-level sort REPLACES relevance ordering (the
        // wire API contract: size truncation follows the sort, not the
        // score); _score desc applies only when no sort is given, and
        // rides as the deterministic trailing tiebreak otherwise.
        val order = Option(root.get("sort")).map(compileSort) match {
          case Some(s) => s :+ col("_score").desc
          case None    => Seq(col("_score").desc)
        }
        val ranked = scored.orderBy(order: _*)
        val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
        return Option(root.get("_source")) match {
          case Some(src) => top.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None      => top
        }
      case None => ()
    }
    // constant_score at the top level: filter context plus a fixed boost
    // as _score — zero relevance computation, the cheapest scored query.
    Option(root.get("query")).filter(q =>
      q.isObject && q.size == 1 && q.fieldNames().next() == "constant_score"
    ) match {
      case Some(q) =>
        require(root.get("aggs") == null && root.get("aggregations") == null, "constant_score with aggs is unsupported")
        val body = q.get("constant_score")
        val boost = Option(body.get("boost")).map(_.asDouble).getOrElse(1.0)
        val scored = df
          .filter(compileQuery(df, req(body, "filter", "constant_score"), mapping))
          .withColumn("_score", lit(boost))
        // the score is constant, so the body's sort (not _score) orders
        val ranked = Option(root.get("sort")).map(s => scored.orderBy(compileSort(s): _*)).getOrElse(scored)
        val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
        return Option(root.get("_source")) match {
          case Some(src) => top.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None      => top
        }
      case None => ()
    }
    // script_score at the top level: the inner query filters, then the
    // script (the runtime-field arithmetic subset — ScriptExpr) REPLACES
    // relevance as _score. One codegen'd projection per surviving row;
    // score-time work never touches non-matching rows.
    Option(root.get("query")).filter(q =>
      q.isObject && q.size == 1 && q.fieldNames().next() == "script_score"
    ) match {
      case Some(q) =>
        require(root.get("aggs") == null && root.get("aggregations") == null, "script_score with aggs is unsupported")
        val body = q.get("script_score")
        val scriptNode = req(body, "script", "script_score")
        val src = if (scriptNode.isTextual) scriptNode.asText else req(scriptNode, "source", "script_score").asText
        val base = Option(body.get("query"))
          .map(fn => df.filter(compileQuery(df, fn, mapping)))
          .getOrElse(df)
        val scored = base.withColumn("_score", round(ScriptExpr.compile(src).cast("double"), 6))
        // Explicit sort replaces relevance ordering (see function_score).
        val order = Option(root.get("sort")).map(compileSort) match {
          case Some(s) => s :+ col("_score").desc
          case None    => Seq(col("_score").desc)
        }
        val ranked = scored.orderBy(order: _*)
        val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
        return Option(root.get("_source")) match {
          case Some(src2) => top.select(src2.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None       => top
        }
      case None => ()
    }
    // combined_fields at the top level: term-centric BM25F scoring — the
    // query terms score against a single virtual field whose tf is the
    // weighted sum over the listed fields (`f^w` boost syntax). Stats are
    // ONE corpus aggregate broadcast back; scoring is a projection
    // (Bm25.combinedFieldsScored).
    Option(root.get("query")).filter(q =>
      q.isObject && q.size == 1 && q.fieldNames().next() == "combined_fields"
    ) match {
      case Some(q) =>
        require(
          root.get("aggs") == null && root.get("aggregations") == null,
          "combined_fields with aggs is unsupported"
        )
        val body = q.get("combined_fields")
        val terms = req(body, "query", "combined_fields").asText.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
        require(terms.nonEmpty, "combined_fields needs at least one query term")
        val fields = req(body, "fields", "combined_fields").elements().asScala.toSeq.map { fn =>
          fn.asText.split("\\^") match {
            case Array(f)    => f -> 1.0
            case Array(f, w) => f -> w.toDouble
            case _           => throw new IllegalArgumentException(s"bad combined_fields field spec: ${fn.asText}")
          }
        }
        require(fields.nonEmpty, "combined_fields needs at least one field")
        val scored = Bm25.combinedFieldsScored(df, fields, terms)
        // Explicit sort replaces relevance ordering (see function_score).
        val order = Option(root.get("sort")).map(compileSort) match {
          case Some(s) => s :+ col("_score").desc
          case None    => Seq(col("_score").desc)
        }
        val ranked = scored.orderBy(order: _*)
        val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
        return Option(root.get("_source")) match {
          case Some(src) => top.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None      => top
        }
      case None => ()
    }
    // pinned at the top level: curated _ids surface first IN LIST ORDER,
    // organic matches follow under the body's sort — one scan, the tier
    // is array_position into the pinned list (the structured
    // search_pinned plan), never per-id union branches.
    Option(root.get("query")).filter(q =>
      q.isObject && q.size == 1 && q.fieldNames().next() == "pinned"
    ) match {
      case Some(q) =>
        require(root.get("aggs") == null && root.get("aggregations") == null, "pinned with aggs is unsupported")
        val body = q.get("pinned")
        val ids = req(body, "ids", "pinned").elements().asScala.toSeq.map(_.asLong)
        require(ids.nonEmpty, "pinned needs at least one id")
        val organic = compileQuery(df, req(body, "organic", "pinned"), mapping)
        val pin = coalesce(array_position(array(ids.map(lit): _*), col("_id")), lit(0L))
        val matched = df
          .withColumn("_pin", pin)
          .filter(col("_pin") > 0 || coalesce(organic, lit(false)))
          .withColumn("_tier", when(col("_pin") > 0, col("_pin")).otherwise(lit(Long.MaxValue)))
        val order = col("_tier").asc +: Option(root.get("sort")).map(compileSort).getOrElse(Seq(col("_id").asc))
        val ranked = matched.orderBy(order: _*)
        val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
        return Option(root.get("_source")) match {
          case Some(src) => top.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None      => top.drop("_pin", "_tier")
        }
      case None => ()
    }
    // dis_max at the top level: per-clause scores (constant_score
    // sub-queries: a predicate + boost each), fused as best + tie_breaker
    // × (sum of the rest) — all clauses evaluate in ONE pass over each
    // row (no per-clause scans, no self-joins), then rank by _score.
    Option(root.get("query")).filter(q =>
      q.isObject && q.size == 1 && q.fieldNames().next() == "dis_max"
    ) match {
      case Some(q) =>
        require(root.get("aggs") == null && root.get("aggregations") == null, "dis_max with aggs is unsupported")
        val body = q.get("dis_max")
        val tie = Option(body.get("tie_breaker")).map(_.asDouble).getOrElse(0.0)
        val clauses = req(body, "queries", "dis_max").elements().asScala.toSeq.map { c =>
          require(
            c.isObject && c.size == 1 && c.fieldNames().next() == "constant_score",
            s"dis_max supports constant_score sub-queries, got: $c"
          )
          val cs = c.get("constant_score")
          val boost = Option(cs.get("boost")).map(_.asDouble).getOrElse(1.0)
          when(compileQuery(df, req(cs, "filter", "constant_score"), mapping), boost).otherwise(0.0)
        }
        require(clauses.nonEmpty, "dis_max needs at least one clause")
        val withS = clauses.zipWithIndex.foldLeft(df) { case (acc, (c, i)) => acc.withColumn(s"_s$i", c) }
        val sCols = clauses.indices.map(i => col(s"_s$i"))
        val total = sCols.reduce(_ + _)
        val best = if (sCols.size == 1) sCols.head else greatest(sCols: _*)
        val scored = withS
          .filter(total > 0)
          .withColumn("_score", round(best + lit(tie) * (total - best), 6))
        val order = col("_score").desc +: Option(root.get("sort")).map(compileSort).getOrElse(Nil)
        val ranked = scored.orderBy(order: _*)
        val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
        return Option(root.get("_source")) match {
          case Some(src) => top.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None      => top
        }
      case None => ()
    }
    // boosting at the top level: positive matches kept, negative matches
    // DEMOTED by negative_boost rather than excluded — one scan, the
    // score is a conditional projection (the structured search_boosting
    // plan).
    Option(root.get("query")).filter(q =>
      q.isObject && q.size == 1 && q.fieldNames().next() == "boosting"
    ) match {
      case Some(q) =>
        require(root.get("aggs") == null && root.get("aggregations") == null, "boosting with aggs is unsupported")
        val body = q.get("boosting")
        val pos = compileQuery(df, req(body, "positive", "boosting"), mapping)
        val neg = compileQuery(df, req(body, "negative", "boosting"), mapping)
        val nb = Option(body.get("negative_boost")).map(_.asDouble).getOrElse(0.5)
        val scored = df
          .filter(pos)
          .withColumn("_score", when(coalesce(neg, lit(false)), lit(nb)).otherwise(lit(1.0)))
        val order = col("_score").desc +: Option(root.get("sort")).map(compileSort).getOrElse(Nil)
        val ranked = scored.orderBy(order: _*)
        val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
        return Option(root.get("_source")) match {
          case Some(src) => top.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None      => top
        }
      case None => ()
    }
    // bool whose should-clauses are ALL scoring clauses (rank_feature /
    // distance_feature): must/filter/must_not gate the hit set, _score is
    // the SUM of the should scores (OpenSearch's additive should
    // contribution) — one scan, every score a pure projection.
    Option(root.get("query")).filter { q =>
      q.isObject && q.size == 1 && q.fieldNames().next() == "bool" && {
        val sh = clauseList(q.get("bool"), "should")
        sh.nonEmpty && sh.forall(c =>
          c.isObject && c.size == 1 &&
            Set("rank_feature", "distance_feature")(c.fieldNames().next())
        )
      }
    } match {
      case Some(q) =>
        require(
          root.get("aggs") == null && root.get("aggregations") == null,
          "scoring bool with aggs is unsupported"
        )
        val b = q.get("bool")
        val must = (clauseList(b, "must") ++ clauseList(b, "filter")).map(compileQuery(df, _, mapping))
        val mustNot = clauseList(b, "must_not").map(compileQuery(df, _, mapping))
        val scores = clauseList(b, "should").map(compileScoringClause)
        val scored = df
          .filter(SearchDsl.bool(must, mustNot, Nil))
          .withColumn("_score", round(scores.reduce(_ + _), 6))
        val order = col("_score").desc +: Option(root.get("sort")).map(compileSort).getOrElse(Nil)
        val ranked = scored.orderBy(order: _*)
        val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
        return Option(root.get("_source")) match {
          case Some(src) => top.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None      => top
        }
      case None => ()
    }
    // has_child / has_parent at the top level: the other side of the
    // relation comes from `relations`; the clause's `join` object names
    // the key pair (standing in for OpenSearch's join-field mapping).
    // Both compile to a LEFT SEMI join — never fan-out + distinct repair.
    Option(root.get("query")).filter(q =>
      q.isObject && q.size == 1 &&
        Set("has_child", "has_parent")(q.fieldNames().next())
    ) match {
      case Some(q) =>
        val kind = q.fieldNames().next()
        require(root.get("aggs") == null && root.get("aggregations") == null, s"$kind with aggs is unsupported")
        val body = q.get(kind)
        val relName = req(body, if (kind == "has_child") "type" else "parent_type", kind).asText
        val other = relations.getOrElse(
          relName,
          throw new IllegalArgumentException(s"$kind references unknown relation '$relName' — pass it in `relations`")
        )
        val join = req(body, "join", kind)
        val parentKey = req(join, "parent", s"$kind.join").asText
        val childKey = req(join, "child", s"$kind.join").asText
        val otherMatches = other.filter(compileQuery(other, req(body, "query", kind), mapping))
        val (dfKey, otherKey) =
          if (kind == "has_child") (parentKey, childKey) else (childKey, parentKey)
        val hits = df.join(otherMatches.select(col(otherKey)), col(dfKey) === col(otherKey), "left_semi")
        val ranked = Option(root.get("sort")).map(s => hits.orderBy(compileSort(s): _*)).getOrElse(hits)
        val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
        return Option(root.get("_source")) match {
          case Some(src) => top.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
          case None      => top
        }
      case None => ()
    }
    // terms lookup (the index/id/path form): the term list comes from a
    // row of ANOTHER frame, not the request body. The lookup row's
    // analyzed tokens become a broadcast join onto the corpus token
    // stream — one scan, no driver round-trip, no O(terms) OR-chain.
    Option(root.get("query")).filter { q =>
      q.isObject && q.size == 1 && q.fieldNames().next() == "terms" && {
        val b = q.get("terms")
        b.isObject && b.size == 1 && b.get(b.fieldNames().next()).isObject
      }
    } match {
      case Some(q) =>
        require(root.get("aggs") == null && root.get("aggregations") == null, "terms lookup with aggs is unsupported")
        val body = q.get("terms")
        val f = singleField(body)
        val spec = body.get(f)
        val idx = req(spec, "index", "terms lookup").asText
        val id = req(spec, "id", "terms lookup").asLong
        val path = req(spec, "path", "terms lookup").asText
        val minLen = Option(spec.get("min_term_length")).map(_.asInt).getOrElse(1)
        val lookup = relations.getOrElse(
          idx,
          throw new IllegalArgumentException(s"terms lookup references unknown index '$idx' — pass it in `relations`")
        )
        val lookupTerms = lookup
          .filter(col("_id") === id)
          .select(explode(array_distinct(SearchDsl.analyze(col(path)))).as("_term"))
          .filter(length(col("_term")) >= minLen)
        val src = Option(root.get("_source")).map(_.elements().asScala.toSeq.map(_.asText)).getOrElse {
          throw new IllegalArgumentException("terms lookup requires _source (the hit columns to return)")
        }
        val hits = df
          .withColumn("_term", explode(array_distinct(SearchDsl.analyze(col(f)))))
          .join(broadcast(lookupTerms), "_term")
          .select(src.map(col): _*)
          .distinct()
        return Option(root.get("sort")).map(s => hits.orderBy(compileSort(s): _*)).getOrElse(hits)
      case None => ()
    }
    // rescore: cheap first phase ranks the corpus under the body's sort
    // and keeps window_size rows; the rescore_query (match form: score =
    // number of its distinct analyzed terms present) touches ONLY that
    // window, then hits re-rank by (_score desc, first-phase sort) — the
    // OpenSearch two-phase cost model.
    if (root.get("rescore") != null) {
      val rs = root.get("rescore")
      val window = Option(rs.get("window_size")).map(_.asInt).getOrElse(10)
      val rq = req(req(rs, "query", "rescore"), "rescore_query", "rescore")
      require(
        rq.isObject && rq.size == 1 && rq.fieldNames().next() == "match",
        s"rescore supports a match rescore_query, got: $rq"
      )
      val (f, v) = fieldAndValue(rq.get("match"), "query")
      val terms = v.asText.toLowerCase.split("\\s+").toSeq.distinct
      val pred = Option(root.get("query")).map(compileQuery(df, _, mapping)).getOrElse(lit(true))
      val sortCols = Option(root.get("sort")).map(compileSort).getOrElse {
        throw new IllegalArgumentException("rescore requires a deterministic first-phase sort")
      }
      val first = df.filter(pred).orderBy(sortCols: _*).limit(window)
      val scored = first.withColumn(
        "_score",
        size(array_intersect(array_distinct(SearchDsl.analyze(col(f))), array(terms.map(lit): _*)))
      )
      val ranked = scored.orderBy(col("_score").desc +: sortCols: _*)
      val top = Option(root.get("size")).map(_.asInt).fold(ranked)(k => ranked.limit(k))
      return Option(root.get("_source")) match {
        case Some(src) => top.select(src.elements().asScala.map(e => col(e.asText)).toSeq: _*)
        case None      => top
      }
    }
    // significant_terms: the query is the FOREGROUND set, the whole index
    // the background — the frame must reach the aggregation UNFILTERED,
    // with the query as a condition column (one pass computes both sides'
    // counts; filtering first would lose the background).
    Option(root.get("aggs"))
      .orElse(Option(root.get("aggregations")))
      .filter(a =>
        a.isObject && a.size == 1 &&
          a.elements().asScala.toSeq.headOption.exists(s => s.has("significant_terms") || s.has("significant_text"))
      ) match {
      case Some(a) =>
        val spec0 = a.elements().asScala.next()
        val fg = Option(root.get("query")).map(q => compileQuery(df, q, mapping)).getOrElse(lit(true))
        if (spec0.has("significant_text")) {
          val spec = spec0.get("significant_text")
          val f = col(req(spec, "field", "significant_text").asText)
          return Aggs.significantText(df, f, fg, Option(spec.get("size")).map(_.asInt).getOrElse(10))
        }
        val spec = spec0.get("significant_terms")
        val f = col(req(spec, "field", "significant_terms").asText)
        return Aggs.significantTerms(df, f, fg)
      case None => ()
    }
    // global agg: a bucket scoped to ALL documents alongside the query's
    // own hits — the frame must reach this point UNFILTERED (the global
    // side escapes the query), so both aggregates are built here and meet
    // in a 1-row broadcast cross join. Metrics use the exact-decimal avg
    // (sum(decimal)/count) so the result is partition-order-proof.
    Option(root.get("aggs"))
      .orElse(Option(root.get("aggregations")))
      .filter(a => a.isObject && a.elements().asScala.exists(_.has("global"))) match {
      case Some(a) =>
        require(
          a.size == 2,
          "global is supported as exactly one hit-scoped metric sibling + the global agg"
        )
        val entries = a.fields().asScala.toSeq
        val (gEntries, hitEntries) = entries.partition(_.getValue.has("global"))
        val gSub = Option(gEntries.head.getValue.get("aggs"))
          .orElse(Option(gEntries.head.getValue.get("aggregations")))
          .getOrElse(throw new IllegalArgumentException("global needs metric sub-aggregations"))
        val hits = Option(root.get("query")).map(q => df.filter(compileQuery(df, q, mapping))).getOrElse(df)
        val hitRow = hits.agg(count(lit(1)).as("n_hits"), hitEntries.map(decimalAvgMetric): _*)
        val allRow =
          df.agg(count(lit(1)).as("n_total"), gSub.fields().asScala.toSeq.map(decimalAvgMetric): _*)
        return hitRow.crossJoin(broadcast(allRow))
      case None => ()
    }
    // parent agg under terms: from CHILD docs, buckets carry PARENT-side
    // metrics with each parent counted once per bucket — distinct
    // (bucket, child-key) pairs first, so the join input is one row per
    // parent per bucket, then the keyed join + hash agg. The parent
    // frame comes from `relations` by type; join keys from the clause's
    // `join` object (the has_child precedent).
    Option(root.get("aggs"))
      .orElse(Option(root.get("aggregations")))
      .filter { a =>
        a.isObject && a.size == 1 && {
          val spec = a.elements().asScala.next()
          val sub = Option(spec.get("aggs")).orElse(Option(spec.get("aggregations")))
          spec.has("terms") && sub.exists(sa =>
            sa.isObject && sa.size == 1 && sa.elements().asScala.next().has("parent")
          )
        }
      } match {
      case Some(a) =>
        val spec = a.elements().asScala.next()
        val termsField = req(spec.get("terms"), "field", "terms").asText
        val parentSpec = Option(spec.get("aggs")).orElse(Option(spec.get("aggregations"))).get
          .elements().asScala.next()
        val pr = parentSpec.get("parent")
        val typ = req(pr, "type", "parent").asText
        val join = req(pr, "join", "parent")
        val pk = req(join, "parent", "parent join").asText
        val ck = req(join, "child", "parent join").asText
        val parentFrame = relations.getOrElse(
          typ,
          throw new IllegalArgumentException(s"parent type '$typ' has no bound relation frame")
        )
        val metrics = Option(parentSpec.get("aggs"))
          .orElse(Option(parentSpec.get("aggregations")))
          .map(_.fields().asScala.toSeq.map(decimalAvgMetric))
          .getOrElse(Nil)
        val base = Option(root.get("query")).map(q => df.filter(compileQuery(df, q, mapping))).getOrElse(df)
        val pairs = base.select(col(termsField).as("key"), col(ck)).distinct()
        return pairs
          .join(parentFrame, col(ck) === col(pk))
          .groupBy("key")
          .agg(count(lit(1)).as("parent_count"), metrics: _*)
          .orderBy("key")
      case None => ()
    }
    // children agg under terms: parent buckets with child-doc metrics —
    // the has_child query family's aggregation face. The child frame
    // comes from `relations` by the clause's `type`; the `join` object
    // names the key pair (standing in for the join-field mapping, the
    // has_child precedent). Join + hash agg with map-side partials.
    Option(root.get("aggs"))
      .orElse(Option(root.get("aggregations")))
      .filter { a =>
        a.isObject && a.size == 1 && {
          val spec = a.elements().asScala.next()
          val sub = Option(spec.get("aggs")).orElse(Option(spec.get("aggregations")))
          spec.has("terms") && sub.exists(sa =>
            sa.isObject && sa.size == 1 && sa.elements().asScala.next().has("children")
          )
        }
      } match {
      case Some(a) =>
        val spec = a.elements().asScala.next()
        val termsField = req(spec.get("terms"), "field", "terms").asText
        val childSpec = Option(spec.get("aggs")).orElse(Option(spec.get("aggregations"))).get
          .elements().asScala.next()
        val ch = childSpec.get("children")
        val typ = req(ch, "type", "children").asText
        val join = req(ch, "join", "children")
        val pk = req(join, "parent", "children join").asText
        val ck = req(join, "child", "children join").asText
        val child = relations.getOrElse(
          typ,
          throw new IllegalArgumentException(s"children type '$typ' has no bound relation frame")
        )
        val metrics = Option(childSpec.get("aggs"))
          .orElse(Option(childSpec.get("aggregations")))
          .map(metricColumns)
          .getOrElse(Seq(count(lit(1)).as("doc_count")))
        val base = Option(root.get("query")).map(q => df.filter(compileQuery(df, q, mapping))).getOrElse(df)
        return base
          .join(child, col(pk) === col(ck))
          .groupBy(col(termsField).as("key"))
          .agg(metrics.head, metrics.tail: _*)
          .orderBy("key")
      case None => ()
    }
    val filtered0 = Option(root.get("query")) match {
      case Some(q) => df.filter(compileQuery(df, q, mapping))
      case None    => df
    }
    // script_fields: response-shaping computed fields over the hits — the
    // same compiled arithmetic subset as runtime_mappings (ScriptExpr), a
    // pure projection Catalyst places after the top-k when the sort does
    // not reference it.
    val filtered = Option(root.get("script_fields")).fold(filtered0) { sf =>
      require(sf.isObject, s"script_fields must be an object: $sf")
      require(
        root.get("aggs") == null && root.get("aggregations") == null,
        "script_fields with aggs is unsupported"
      )
      sf.fields().asScala.foldLeft(filtered0) { (acc, e) =>
        val scriptNode = req(e.getValue, "script", s"script_field '${e.getKey}'")
        val src =
          if (scriptNode.isTextual) scriptNode.asText
          else req(scriptNode, "source", s"script_field '${e.getKey}'").asText
        acc.withColumn(e.getKey, ScriptExpr.compile(src))
      }
    }
    Option(root.get("aggs")).orElse(Option(root.get("aggregations"))) match {
      case Some(aggs) => compileAggs(filtered, aggs, mapping)
      case None =>
        // search_after: the live-after-this-cursor rows, expressed as a
        // lexicographic predicate over the sort keys. A filter (not an
        // offset) — it prunes at the scan and costs the same for page
        // 1000 as for page 1, which is why OpenSearch deprecated
        // from+size deep paging in its favor.
        val paged = Option(root.get("search_after")) match {
          case Some(after) =>
            val specs = sortSpecs(req(root, "sort", "search_after"))
            val vals = after.elements().asScala.toSeq.map(scalarValue)
            require(
              vals.length == specs.length,
              s"search_after needs one value per sort key (${specs.length}), got ${vals.length}"
            )
            filtered.filter(afterPredicate(specs, vals))
          case None => filtered
        }
        // collapse: one top hit per group under the body's sort, via the
        // bounded-heap TopKPerKey operator (k=1 per key — at most one row
        // per group per partition reaches the shuffle, never a window
        // sort of the whole hit set).
        val collapsed = Option(root.get("collapse")) match {
          case Some(c) =>
            val f = req(c, "field", "collapse").asText
            val specs = sortSpecs(req(root, "sort", "collapse (requires sort)"))
            graft.plans.TopKPerKey.perKey(paged, Seq(f), specs, 1).drop("rank")
          case None => paged
        }
        val sorted = Option(root.get("sort")) match {
          case Some(s) => collapsed.orderBy(compileSort(s): _*)
          case None    => collapsed
        }
        val sized = Option(root.get("size")).map(n => sorted.limit(n.asInt)).getOrElse(sorted)
        val hlCols = Option(root.get("highlight")).toSeq.flatMap { h =>
          compileHighlight(h, Option(root.get("query")))
        }
        Option(root.get("_source")) match {
          case Some(src) =>
            sized.select(src.elements().asScala.map(e => col(e.asText)).toSeq ++ hlCols: _*)
          case None =>
            if (hlCols.isEmpty) sized else sized.select(col("*") +: hlCols: _*)
        }
    }
  }

  /** OpenSearch `_msearch`: an ndjson stream of alternating header and
    * body lines, executed as ONE batch. Every search that targets the
    * same index compiles into a single conditional-count pass over that
    * index — N searches cost one scan per DISTINCT index, never N scans.
    * (Hit counting is the dashboard's msearch workload; a full-hits
    * msearch is just [[parse]] per body.) Returns one row per search:
    * (search ordinal, hit count), in request order.
    */
  /** knn against a prebuilt IVF index — the wire face of the
    * vector-search SCALE path. The in-band knn handler scores every row
    * (exact recall; the right baseline, the wrong corpus-scale plan);
    * with `"method": {"name": "ivf", "nprobe": N}` only the probed
    * cells' vectors are scored. The index rides in as an argument (the
    * `relations` precedent: a wire request names resources, the runtime
    * binds them); the body's field must name the index's vector column.
    */
  /** Shared indexed-knn body parse: (vector, k, method node). The body's
    * field must name the index's vector column; `filter` is rejected
    * (the exact in-band knn handler owns pre-filtering).
    */
  private def knnSpec(body: String, vecCol: String): (Seq[Float], Int, JsonNode) = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"knn body must be a JSON object: $body")
    val q = req(root, "query", "knn")
    require(q.isObject && q.size == 1 && q.fieldNames().next() == "knn", s"expected a knn query: $q")
    val knn = q.get("knn")
    val f = singleField(knn)
    require(f == vecCol, s"knn field '$f' must name the index's vector column '$vecCol'")
    val spec = knn.get(f)
    val vec = req(spec, "vector", "knn").elements().asScala.toSeq.map(_.floatValue)
    val k = req(spec, "k", "knn").asInt
    require(spec.get("filter") == null, "indexed knn does not support filter (use the exact knn handler)")
    (vec, k, req(spec, "method", "indexed knn"))
  }

  def knnIvf(
      index: graft.operators.Similarity.IvfIndex,
      idCol: String,
      vecCol: String,
      body: String
  ): DataFrame = {
    val (vec, k, method) = knnSpec(body, vecCol)
    require(req(method, "name", "knn method").asText == "ivf", s"unsupported knn method: $method")
    require(method.get("encoder") == null, s"flat ivf expected (no encoder): $method")
    val nProbe = Option(method.get("nprobe")).map(_.asInt).getOrElse(4)
    graft.operators.Similarity.scoreAgainstIvf(index, idCol, vecCol, vec, k, nProbe)
  }

  /** knn against a prebuilt IVF-PQ index — the wire face of the
    * compressed scale path, spelled exactly as OpenSearch's faiss
    * method does it: `"method": {"name": "ivf", "encoder": {"name":
    * "pq"}, "nprobe": N}`. Same body grammar as [[knnIvf]]; the encoder
    * object selects the product-quantized codes, so candidate ranking
    * reads 8-byte codes instead of raw vectors and the deterministic
    * top window exact-rescores (the PqIndex contract).
    */
  def knnPq(
      index: graft.operators.Similarity.PqIndex,
      idCol: String,
      vecCol: String,
      body: String
  ): DataFrame = {
    val (vec, k, method) = knnSpec(body, vecCol)
    require(req(method, "name", "knn method").asText == "ivf", s"unsupported knn method: $method")
    val enc = req(method, "encoder", "ivf-pq method")
    require(req(enc, "name", "knn encoder").asText == "pq", s"unsupported knn encoder: $enc")
    val nProbe = Option(method.get("nprobe")).map(_.asInt).getOrElse(4)
    graft.operators.Similarity.scoreAgainstPq(index, idCol, vecCol, vec, k, nProbe)
  }

  /** knn against a prebuilt neighbor graph — the wire face of the
    * HNSW-style beam-search path (`"method": {"name": "hnsw"}`), the
    * second indexed-knn engine next to [[knnIvf]]'s IVF. `ef_search`
    * maps onto the beam width (the OpenSearch hnsw search parameter);
    * `rounds` bounds the descent (the fixed-iteration Spark shape —
    * job count known before the query runs). The index AND its base
    * vectors ride in as arguments (the `relations` precedent: a wire
    * request names resources, the runtime binds them); the body's field
    * must name the index's vector column. Output is the same
    * (id, cos) shape as the IVF wire path, scores exact.
    */
  def knnGraph(
      index: graft.operators.Similarity.GraphIndex,
      emb: org.apache.spark.sql.DataFrame,
      idCol: String,
      vecCol: String,
      body: String
  ): DataFrame = {
    val (vec, k, method) = knnSpec(body, vecCol)
    require(req(method, "name", "knn method").asText == "hnsw", s"unsupported knn method: $method")
    val beam = Option(method.get("ef_search")).map(_.asInt).getOrElse(16)
    val rounds = Option(method.get("rounds")).map(_.asInt).getOrElse(3)
    graft.operators.Similarity
      .graphSearch(index, emb, idCol, vecCol, vec, k, beam, rounds)
      .select(col("id").as(idCol), col("cos"))
  }

  /** The SQL plugin's `_plugins/_sql` endpoint: a read-only SQL
    * statement over one index, executed by Spark's own SQL compiler
    * against a temp view of the frame — the full Catalyst path
    * (pushdown, codegen, AQE), not an interpreter. Read-only is
    * enforced STRUCTURALLY (the parsed plan must not contain a command
    * or insert node — a prefix check alone would admit
    * `WITH t AS (...) INSERT ...`), and the temp view registers in a
    * fresh child session (`newSession()` — own temp-view registry), so
    * concurrent requests with the same view name can't race and the
    * endpoint can't read unrelated session temp views.
    */
  def sqlQuery(df: DataFrame, table: String, body: String): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"_sql body must be a JSON object: $body")
    val stmt = req(root, "query", "_sql").asText.trim
    require(stmt.toLowerCase.startsWith("select") || stmt.toLowerCase.startsWith("with"),
      s"_sql accepts read-only SELECT statements, got: $stmt")
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    val parsed = bridge.parsePlan(df.sparkSession, stmt)
    val writeNode = parsed.collectFirst {
      case c: org.apache.spark.sql.catalyst.plans.logical.Command              => c.nodeName
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement  => i.nodeName
    }
    require(writeNode.isEmpty, s"_sql accepts read-only SELECT statements; statement contains ${writeNode.get}")
    val scoped = df.sparkSession.newSession()
    bridge.ofRows(scoped, bridge.analyzedPlan(df)).createOrReplaceTempView(table)
    scoped.sql(stmt)
  }

  /** The `_analyze` API: run the analyzer over the request's text and
    * return the token stream as (position, token) rows — the same
    * [[SearchDsl.analyze]] chain every text query compiles against, so
    * what this endpoint shows is exactly what the index matches on.
    * Pure expression work over a 1-row frame; no table is touched.
    */
  def analyzeText(spark: org.apache.spark.sql.SparkSession, body: String): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"_analyze body must be a JSON object: $body")
    require(root.get("field") == null, "_analyze with 'field' needs the index mapping — use the (spark, body, mapping) overload")
    val analyzer = Option(root.get("analyzer")).map(_.asText).getOrElse("standard")
    require(analyzer == "standard", s"unsupported analyzer '$analyzer'")
    // Custom filter chain (the _analyze `filter` array): lowercase is
    // the always-on base; `stop` (with its stopwords list), `s_stem`
    // and `edge_ngram` compose IN REQUEST ORDER onto the same
    // [[Analyzer]] chain every text query compiles against — what this
    // endpoint shows IS what the index matches on.
    val filters = Option(root.get("filter")).map(_.elements().asScala.toSeq).getOrElse(Nil)
    val stages: Seq[TokenFilter] = filters.flatMap { fn =>
      val ftype = if (fn.isTextual) fn.asText else req(fn, "type", "_analyze filter").asText
      ftype match {
        case "lowercase" => None
        case "s_stem"    => Some(TokenFilter.SStem)
        case "stop" =>
          require(fn.isObject && fn.get("stopwords") != null, "stop filter needs a stopwords list")
          Some(TokenFilter.Stop(fn.get("stopwords").elements().asScala.map(_.asText).toSeq))
        case "edge_ngram" =>
          require(fn.isObject, "edge_ngram filter needs min_gram/max_gram")
          Some(
            TokenFilter.EdgeNgram(
              Option(fn.get("min_gram")).map(_.asInt).getOrElse(1),
              Option(fn.get("max_gram")).map(_.asInt).getOrElse(2)
            )
          )
        case other => throw new IllegalArgumentException(s"unsupported token filter '$other'")
      }
    }
    val chain = Analyzer(if (stages.isEmpty) "standard" else "custom", stages)
    val text = req(root, "text", "_analyze").asText
    spark
      .range(1)
      .select(posexplode(SearchDsl.analyzeWith(lit(text), chain)))
      .select(col("pos").cast("long").as("position"), col("col").as("token"))
      .orderBy("position")
  }

  /** `_analyze` with a `field` element: the analyzer resolves from the
    * index MAPPING (the OpenSearch behavior — what you see is exactly
    * what that field's queries match on), instead of an inline filter
    * chain. `{"field": "text", "text": "..."}` → the field's declared
    * [[Analyzer]] (standard when unbound).
    */
  def analyzeText(
      spark: org.apache.spark.sql.SparkSession,
      body: String,
      mapping: IndexMapping
  ): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"_analyze body must be a JSON object: $body")
    val field = req(root, "field", "_analyze").asText
    require(root.get("analyzer") == null && root.get("filter") == null,
      "_analyze takes either 'field' (mapping-resolved) or an explicit analyzer/filter chain, not both")
    val chain = mapping.analyzerFor(field)
    val text = req(root, "text", "_analyze").asText
    spark
      .range(1)
      .select(posexplode(SearchDsl.analyzeWith(lit(text), chain)))
      .select(col("pos").cast("long").as("position"), col("col").as("token"))
      .orderBy("position")
  }

  /** The `_field_caps` API: per-field capabilities derived from the
    * frame's schema + the index mapping — text fields are searchable but
    * not aggregatable, everything else both (the OpenSearch defaults).
    * Schema metadata only; no data is read.
    */
  def fieldCaps(df: DataFrame, mapping: IndexMapping = IndexMapping.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.schema.fields
      .map { f =>
        val t = f.dataType match {
          case org.apache.spark.sql.types.StringType => mapping.fieldType(f.name)
          case org.apache.spark.sql.types.LongType => "long"
          case org.apache.spark.sql.types.IntegerType => "integer"
          case org.apache.spark.sql.types.DoubleType => "double"
          case org.apache.spark.sql.types.FloatType => "float"
          case org.apache.spark.sql.types.BooleanType => "boolean"
          case org.apache.spark.sql.types.DateType => "date"
          case _: org.apache.spark.sql.types.DecimalType => "double"
          case dt if dt.typeName.startsWith("timestamp") => "date"
          case dt => dt.typeName
        }
        (f.name, t, true, t != "text")
      }
      .toSeq
      .sortBy(_._1)
      .toDF("field", "type", "searchable", "aggregatable")
  }

  /** The `_validate/query?explain=true` API: compile-check a query body
    * without executing it. Returns (valid, explanation-or-error): a valid
    * query yields the compiled Catalyst predicate's description (the
    * "rewritten query" of the real API), an invalid one the compile
    * error. Nothing touches the data — validation is pure plan work.
    */
  def validate(
      df: DataFrame,
      body: String,
      mapping: IndexMapping = IndexMapping.empty
  ): (Boolean, String) =
    try {
      val root = mapper.readTree(body)
      require(root != null && root.isObject, s"body must be a JSON object: $body")
      val pred = Option(root.get("query")).map(q => compileQuery(df, q, mapping)).getOrElse(lit(true))
      // Resolve the predicate against the frame's schema (analysis only,
      // no execution) so a query on a nonexistent field is invalid here
      // exactly as it would throw from parse() — the two paths must agree
      // on what a 400-class body is.
      df.filter(pred).queryExecution.analyzed
      (true, pred.toString)
    } catch {
      case e: Exception => (false, String.valueOf(e.getMessage))
    }

  /** The `_count` API: a query body evaluated for its hit count only —
    * no fetch phase, no sort, no source filtering; one filtered
    * count(*) aggregate whose predicate pushes into the scan.
    */
  def countOnly(df: DataFrame, body: String, mapping: IndexMapping = IndexMapping.empty): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => throw new IllegalArgumentException(s"malformed _count body: ${e.getMessage}") }
    val pred = Option(root.get("query")).map(q => compileQuery(df, q, mapping)).getOrElse(lit(true))
    df.filter(pred).agg(count(lit(1)).as("count"))
  }

  /** Point-in-time search: `{"pit": {"id": ...}, ...}` — the OpenSearch
    * PIT contract (a search against a snapshot handle sees the index
    * frozen at PIT creation, however many writes land afterwards)
    * realized the way an append-only changelog world can make it EXACT:
    * the pit id IS the creation timestamp, and the frozen index is the
    * latest-state reduction over events at or before it. Searching two
    * different pit ids over the same growing changelog is time travel;
    * the reference's upsert-only index can only answer "now".
    *
    * Plan: the `ts <= pit` filter pushes into the changelog scan
    * (partition-pruning on a date-partitioned changelog at scale), then
    * ONE map-side-combining `max_by` per key (CdcBatch.latestState —
    * never a window sort), then the remaining body compiles through
    * [[parse]] exactly as a plain search over the materialized state.
    *
    * `seqCols` orders writes within a key (lexicographic struct, e.g.
    * (ts, event_id)); `payloadCols` are the materialized state columns.
    */
  def pitSearch(
      changelog: DataFrame,
      keyCol: String,
      seqCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      body: String,
      mapping: IndexMapping = IndexMapping.empty
  ): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => throw new IllegalArgumentException(s"malformed pit search body: ${e.getMessage}") }
    require(root != null && root.isObject, s"request body must be a JSON object: $body")
    val pit = req(root, "pit", "pit search")
    val pitId = req(pit, "id", "pit").asText
    val state = graft.cdc.CdcBatch.latestState(
      changelog.filter(col(tsCol) <= lit(pitId).cast("timestamp")),
      keyCol,
      struct(seqCols.map(col): _*),
      payloadCols.map(col): _*
    )
    val rest = root.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    rest.remove("pit")
    parse(state, mapper.writeValueAsString(rest), mapping)
  }

  /** The `_mget` API: fetch many documents by id in ONE request —
    * response in REQUEST ORDER (`seq`), every requested id present with
    * a `found` flag (missing ids come back found=false with null
    * source fields, exactly the wire contract; the `ids` QUERY merely
    * filters and would drop them). Optional top-level `_source` selects
    * the returned fields.
    *
    * Plan: the request ids filter the corpus first (an IN predicate
    * that pushes into the parquet scan — the corpus is never read
    * wholesale for a point-lookup batch), and the surviving
    * request-sized frame left-joins the request list, which AQE
    * broadcasts. At 100 TB with an id-bucketed layout the IN prune
    * touches only the buckets holding the requested ids.
    */
  def mget(df: DataFrame, idCol: String, body: String): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => throw new IllegalArgumentException(s"malformed _mget body: ${e.getMessage}") }
    require(root != null && root.hasNonNull("docs"), "_mget requires a \"docs\" array")
    val docs = root.get("docs").elements().asScala.toSeq
    require(docs.nonEmpty, "_mget docs must be non-empty")
    val ids: Seq[Any] = docs.map { d =>
      val n = req(d, "_id", "_mget doc")
      if (n.isIntegralNumber) n.asLong else n.asText
    }
    val sourceCols: Seq[String] = Option(root.get("_source")) match {
      case Some(srcN) => srcN.elements().asScala.map(_.asText).toSeq
      case None => df.columns.filterNot(_ == idCol).toSeq
    }
    val spark = df.sparkSession
    import spark.implicits._
    val reqFrame = ids.zipWithIndex
      .map { case (id, i) => (i + 1L, String.valueOf(id)) }
      .toDF("seq", "_id_s")
    val hits = df
      .filter(col(idCol).isin(ids: _*))
      .select((col(idCol).cast("string").as("_hit_id") +: sourceCols.map(col)): _*)
    reqFrame
      .join(hits, col("_id_s") === col("_hit_id"), "left")
      .select(
        (Seq(
          col("seq"),
          col("_id_s").as("_id"),
          col("_hit_id").isNotNull.as("found")
        ) ++ sourceCols.map(col)): _*
      )
      .orderBy("seq")
  }

  /** The `_bulk` API's per-operation result ledger: the ndjson body's
    * index/create/update/delete actions applied IN ORDER against the
    * current corpus, one (seq, action, _id, result) row per action with
    * OpenSearch's result/error vocabulary — index → created/updated,
    * create → created or `version_conflict` on an existing doc, update →
    * updated or `document_missing` (no upsert), delete → deleted or
    * `not_found`. Within one bulk, later actions see earlier ones'
    * effects (delete-then-create creates; the sequential contract).
    *
    * The sequential fold has a CLOSED FORM — presence before action k is
    * decided by the last non-`update` action on that id (index/create →
    * present, delete → absent; updates never change presence because a
    * bare update cannot create), else by base-corpus membership. So the
    * plan is: one IN-pruned corpus scan for membership of the touched
    * ids (pushes to the parquet scan; the corpus is never read
    * wholesale), then a window over the REQUEST-SIZED action frame —
    * data-side work is O(touched ids), driver holds only the parsed
    * body, exactly the wire protocol's own cost model.
    */
  def bulkLedger(df: DataFrame, idCol: String, ndjson: String): DataFrame = {
    val actions = Set("index", "create", "update", "delete")
    val lines = ndjson.split("\n").map(_.trim).filter(_.nonEmpty)
    val ops = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    var i = 0
    while (i < lines.length) {
      val node =
        try mapper.readTree(lines(i))
        catch { case e: Exception => throw new IllegalArgumentException(s"malformed _bulk line ${i + 1}: ${e.getMessage}") }
      require(node != null && node.isObject && node.size == 1, s"_bulk line ${i + 1} must hold one action: ${lines(i)}")
      val action = node.fieldNames().next()
      require(actions.contains(action), s"unknown _bulk action '$action' at line ${i + 1}")
      val idN = req(node.get(action), "_id", s"_bulk $action")
      val id = if (idN.isIntegralNumber) idN.asLong.toString else idN.asText
      ops += ((ops.size + 1L, action, id))
      if (action != "delete") {
        require(i + 1 < lines.length, s"_bulk $action at line ${i + 1} is missing its source line")
        val src =
          try mapper.readTree(lines(i + 1))
          catch { case e: Exception => throw new IllegalArgumentException(s"malformed _bulk source line ${i + 2}: ${e.getMessage}") }
        require(
          src != null && src.isObject && !(src.size == 1 && actions.contains(src.fieldNames().next())),
          s"_bulk $action at line ${i + 1} must be followed by a document source line"
        )
        i += 2
      } else i += 1
    }
    require(ops.nonEmpty, "_bulk body holds no actions")
    val spark = df.sparkSession
    import spark.implicits._
    val opFrame = ops.toSeq.toDF("seq", "action", "_id")
    val touched = ops.map(_._3).distinct.toSeq
    val present = df
      .filter(col(idCol).cast("string").isin(touched: _*))
      .select(col(idCol).cast("string").as("_id"))
      .distinct()
      .withColumn("base_present", lit(true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id"))
      .orderBy(col("seq"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    opFrame
      .join(present, Seq("_id"), "left")
      .withColumn(
        "_before",
        coalesce(
          last(
            when(col("action") === "delete", lit(false))
              .when(col("action") =!= "update", lit(true)),
            ignoreNulls = true
          ).over(w),
          coalesce(col("base_present"), lit(false))
        )
      )
      .select(
        col("seq"),
        col("action"),
        col("_id"),
        when(col("action") === "index", when(col("_before"), "updated").otherwise("created"))
          .when(col("action") === "create", when(col("_before"), "version_conflict").otherwise("created"))
          .when(col("action") === "update", when(col("_before"), "updated").otherwise("document_missing"))
          .otherwise(when(col("_before"), "deleted").otherwise("not_found"))
          .as("result")
      )
      .orderBy("seq")
  }

  /** The `_terms_enum` API (POST /{index}/_terms_enum): enumerate
    * INDEXED terms of one field that start with `string`,
    * lexicographically ascending, at most `size` (default 10) — the
    * low-latency term-discovery endpoint behind keyword autocomplete
    * UIs. For a `text` field the indexed terms are the field's INDEX
    * analyzer output (the same token stream match compiles against);
    * for `keyword` fields the raw stored values. `case_insensitive`
    * relaxes only the prefix test — terms come back as indexed, exactly
    * like the real API. An optional `search_after` term resumes the
    * enumeration strictly after a previous page's last term.
    *
    * Scale shape: prefix filter BEFORE the distinct (on keyword fields
    * it pushes into the parquet scan as a StartsWith), map-side partial
    * distinct on the term stream, then a bounded TakeOrdered — the
    * vocabulary is never collected or globally sorted.
    */
  def termsEnum(df: DataFrame, body: String, mapping: IndexMapping = IndexMapping.empty): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => throw new IllegalArgumentException(s"malformed _terms_enum body: ${e.getMessage}") }
    require(root != null && root.hasNonNull("field"), "_terms_enum requires a \"field\"")
    val field = root.get("field").asText
    require(df.columns.contains(field), s"unknown field: $field")
    val prefix = Option(root.get("string")).map(_.asText).getOrElse("")
    val size = Option(root.get("size")).map(_.asInt).getOrElse(10)
    val ci = Option(root.get("case_insensitive")).exists(_.asBoolean)
    val after = Option(root.get("search_after")).map(_.asText)
    val terms =
      if (mapping.isText(field))
        df.select(explode(SearchDsl.analyzeWith(col(field), mapping.analyzerFor(field))).as("term"))
      else df.select(col(field).cast("string").as("term"))
    val prefixPred =
      if (prefix.isEmpty) lit(true)
      else if (ci) lower(col("term")).startsWith(prefix.toLowerCase)
      else col("term").startsWith(prefix)
    val afterPred = after.map(col("term") > _).getOrElse(lit(true))
    terms
      .filter(col("term").isNotNull && prefixPred && afterPred)
      .distinct()
      .orderBy("term")
      .limit(size)
      .select(col("term").as("terms"))
  }

  /** The update/reindex script subset: one or more semicolon-separated
    * `ctx._source.<field> = <arithmetic>` statements, where the RHS is
    * the same arithmetic grammar runtime fields use ([[ScriptExpr]] —
    * codegen'd, no per-row interpretation) and may reference other
    * fields as `ctx._source.<g>` or bare `<g>`. Statements apply in
    * order, later ones seeing earlier assignments (the painless
    * sequential contract). An assignment to an EXISTING column casts
    * back to the column's stored type — `_update_by_query` mutates
    * documents in place, it never changes the index mapping.
    */
  private def applyCtxScript(df: DataFrame, source: String): DataFrame = {
    val assign = """^ctx\._source\.(\w+)\s*=\s*(.+)$""".r
    val stmts = source.split(";").map(_.trim).filter(_.nonEmpty)
    require(stmts.nonEmpty, "update script holds no statements")
    stmts.foldLeft(df) { (acc, st) =>
      st match {
        case assign(f, rhs) =>
          val rhsCol = ScriptExpr.compile(rhs.replace("ctx._source.", ""))
          val casted =
            if (acc.columns.contains(f)) rhsCol.cast(acc.schema(f).dataType) else rhsCol
          acc.withColumn(f, casted)
        case _ =>
          throw new IllegalArgumentException(
            s"unsupported update script statement '$st' (want: ctx._source.<field> = <arithmetic>)")
      }
    }
  }

  /** The `_update_by_query` API's WIRE form: apply a script to every
    * document the query matches (the persisted-store executor with
    * Column predicates and atomic swap is [[graft.sinks.IndexOps]] —
    * this is the request-body compiler that produces what that executor
    * writes). The emitted frame is the POST-UPDATE state of the
    * matched documents (its `count()` is the wire response's `updated`);
    * unmatched documents are untouched and not re-emitted, exactly the
    * write amplification the real API pays — only matching docs are
    * re-indexed.
    *
    * Scale shape: one scan — the query predicate pushes into the parquet
    * scan where pushable, and the script is a codegen'd projection over
    * the survivors. No shuffle, no driver state; at 100 TB this is a
    * map-only job whose output volume is the match count.
    */
  def updateByQuery(
      df: DataFrame,
      body: String,
      mapping: IndexMapping = IndexMapping.empty
  ): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => throw new IllegalArgumentException(s"malformed _update_by_query body: ${e.getMessage}") }
    require(root != null && root.isObject, "_update_by_query body must be an object")
    val pred = Option(root.get("query")).map(compileQuery(df, _, mapping)).getOrElse(lit(true))
    val script = req(req(root, "script", "_update_by_query"), "source", "_update_by_query script").asText
    try applyCtxScript(df.filter(pred), script)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(s"request references unknown schema elements: ${e.getMessage}", e)
    }
  }

  /** The `_delete_by_query` API's result ledger: `deleted` (docs the
    * query matched — the wire response field), `remaining`, `total`.
    * One conditional-count scan; a NULL predicate (e.g. a range over a
    * null field) matches nothing, per query semantics.
    */
  def deleteByQuery(
      df: DataFrame,
      body: String,
      mapping: IndexMapping = IndexMapping.empty
  ): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => throw new IllegalArgumentException(s"malformed _delete_by_query body: ${e.getMessage}") }
    require(root != null && root.hasNonNull("query"), "_delete_by_query requires a \"query\"")
    val matched = coalesce(compileQuery(df, root.get("query"), mapping), lit(false))
    try df.agg(
      count(when(matched, 1)).as("deleted"),
      count(when(!matched, 1)).as("remaining"),
      count(lit(1)).as("total")
    )
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(s"request references unknown schema elements: ${e.getMessage}", e)
    }
  }

  /** The `_reindex` API: copy `source.index` into `dest.index`, with the
    * three request-side transforms the real endpoint supports — a
    * `source.query` filter, a `source._source` column selection, and an
    * optional `script` over each copied doc. The emitted frame IS the
    * dest index content (`idCol` always survives projection: a reindexed
    * doc keeps its `_id`).
    *
    * Scale shape: filter + prune push into the source scan (only the
    * selected columns are read), script is a codegen'd projection —
    * a map-only copy whose cost is the surviving bytes, never a shuffle.
    */
  def reindex(
      df: DataFrame,
      idCol: String,
      body: String,
      mapping: IndexMapping = IndexMapping.empty
  ): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => throw new IllegalArgumentException(s"malformed _reindex body: ${e.getMessage}") }
    require(root != null && root.hasNonNull("source"), "_reindex requires a \"source\"")
    val src = root.get("source")
    require(src.hasNonNull("index"), "_reindex source requires an \"index\"")
    require(root.hasNonNull("dest") && root.get("dest").hasNonNull("index"), "_reindex requires a \"dest.index\"")
    val pred = Option(src.get("query")).map(compileQuery(df, _, mapping)).getOrElse(lit(true))
    val filtered = df.filter(pred)
    val projected = Option(src.get("_source")) match {
      case Some(cs) =>
        val names = cs.elements().asScala.map(_.asText).toSeq
        filtered.select((idCol +: names.filterNot(_ == idCol)).map(col): _*)
      case None => filtered
    }
    try Option(root.get("script"))
      .map(s => applyCtxScript(projected, req(s, "source", "_reindex script").asText))
      .getOrElse(projected)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(s"request references unknown schema elements: ${e.getMessage}", e)
    }
  }

  def msearchCounts(
      resolve: String => DataFrame,
      ndjson: String,
      defaultIndex: String,
      mapping: IndexMapping = IndexMapping.empty
  ): DataFrame = {
    val lines = ndjson.split("\n").map(_.trim).filter(_.nonEmpty)
    require(
      lines.length >= 2 && lines.length % 2 == 0,
      s"_msearch needs alternating header/body lines, got ${lines.length} non-empty lines"
    )
    def parseLine(s: String): JsonNode =
      try mapper.readTree(s)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"_msearch line is not valid JSON: $s (${e.getMessage})")
      }
    val searches = lines
      .grouped(2)
      .zipWithIndex
      .map { case (Array(h, b), i) =>
        val header = parseLine(h)
        require(header.isObject, s"_msearch header must be a JSON object: $h")
        val idx = Option(header.get("index")).map(_.asText).getOrElse(defaultIndex)
        val body = parseLine(b)
        require(body.isObject, s"_msearch body must be a JSON object: $b")
        (i, idx, req(body, "query", s"_msearch body ${i}"))
      }
      .toSeq
    searches
      .groupBy(_._2)
      .toSeq
      .sortBy(_._1)
      .map { case (idx, ss) =>
        val df = resolve(idx)
        val counts = ss.map { case (i, _, q) =>
          sum(when(compileQuery(df, q, mapping), 1L).otherwise(0L)).as(s"_s$i")
        }
        val wide = df.agg(counts.head, counts.tail: _*)
        wide.select(
          explode(
            array(ss.map { case (i, _, _) => struct(lit(i).as("search"), col(s"_s$i").as("hits")) }: _*)
          ).as("r")
        ).select("r.*")
      }
      .reduce(_ unionByName _)
      .orderBy("search")
  }

  /** OpenSearch `scroll` emulation for a batch engine: the cursor a
    * scroll client holds as `scroll_id` is here the previous page's last
    * sort-key tuple, re-injected as `search_after` — so every page is an
    * independent cursor-predicate query costing O(page) scan output, not
    * O(offset), and pages stay consistent because the underlying frame is
    * immutable (what the scroll context's point-in-time snapshot buys on
    * a live cluster, for free). Returns page `page` (0-based). The body
    * must carry `sort` (with unique tie-breakers) and `size`; `_source`
    * is applied only to the returned page — intermediate pages need the
    * sort columns for the cursor.
    */
  def scroll(df: DataFrame, body: String, mapping: IndexMapping = IndexMapping.empty, page: Int = 0): DataFrame = {
    require(page >= 0, s"page must be >= 0, got $page")
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"request body must be a JSON object: $body")
    val specs = sortSpecs(req(root, "sort", "scroll"))
    req(root, "size", "scroll")
    // Sliced scroll: {"slice": {"id": i, "max": n}} partitions the scroll
    // into n independent streams readable in parallel. OpenSearch slices
    // on the _id hash; with integer ids the transparent equivalent is
    // id-modulo on the primary sort field — deterministic, disjoint,
    // exhaustive, and reproducible by the SQL oracle.
    val sliced = Option(root.get("slice")).fold(df) { sl =>
      val sid = req(sl, "id", "slice").asInt
      val smax = req(sl, "max", "slice").asInt
      require(smax > 0 && sid >= 0 && sid < smax, s"slice needs 0 <= id < max: $sl")
      df.filter(pmod(col(specs.head._1), lit(smax)) === lit(sid))
    }
    var cursor: Option[Seq[Any]] = None
    def bodyFor(cur: Option[Seq[Any]], keepSource: Boolean): String = {
      val b = root.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
      b.remove("slice")
      if (!keepSource) b.remove("_source")
      cur.foreach { vals =>
        val arr = b.putArray("search_after")
        vals.foreach {
          case null                       => arr.addNull()
          case v: java.lang.Long          => arr.add(v.longValue())
          case v: java.lang.Integer       => arr.add(v.intValue())
          case v: java.lang.Double        => arr.add(v.doubleValue())
          case v: java.math.BigDecimal    => arr.add(v)
          case v: java.lang.Boolean       => arr.add(v.booleanValue())
          case v                          => arr.add(String.valueOf(v))
        }
        ()
      }
      mapper.writeValueAsString(b)
    }
    for (p <- 0 until page) {
      val rows = parse(sliced, bodyFor(cursor, keepSource = false), mapping).collect()
      require(rows.nonEmpty, s"scroll exhausted at page $p")
      val last = rows.last
      cursor = Some(specs.map { case (f, _) => last.getAs[Any](f) })
    }
    parse(sliced, bodyFor(cursor, keepSource = true), mapping)
  }

  /** Percolate registry over JSON request bodies: each stored query's
    * `query` clause compiles once (driver-side, O(#stored)) into the same
    * codegen'd predicate [[parse]] would apply forward, and ONE scan of
    * the document stream evaluates all of them — `when(pred, id)` per
    * stored query, `array_compact` + `explode` emitting a (doc, query_id)
    * row per match. The registry is bounded plan metadata, never a join
    * input, so the doc side streams at any scale — the OpenSearch
    * percolator model (queries live compiled in memory, docs flow past).
    */
  def percolate(df: DataFrame, stored: Seq[(Long, String)], mapping: IndexMapping = IndexMapping.empty): DataFrame = {
    require(stored.nonEmpty, "percolate registry is empty")
    val preds = stored.map { case (id, body) =>
      val root =
        try mapper.readTree(body)
        catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            throw new IllegalArgumentException(s"stored query $id is not valid JSON: ${e.getMessage}")
        }
      require(root != null && root.isObject, s"stored query $id must be a JSON object: $body")
      when(compileQuery(df, req(root, "query", s"stored query $id"), mapping), lit(id))
    }
    df.withColumn("query_id", explode(array_compact(array(preds: _*))))
  }

  /** OpenSearch `hybrid` query — the wire format of rank-space hybrid
    * search: one lexical sub-query (a `match` clause, scored BM25
    * against the posting artifact) and one `knn` sub-query (exact
    * cosine, honoring `knn.filter`), fused by reciprocal-rank fusion
    * Σ 1/(60 + rank) — the rrf processor's default constant; rank-space
    * fusion needs no normalization across incomparable score scales.
    * Each leg is its own bounded top-k (the rank windows see ≤ k rows),
    * and the fusion join is k×k-bounded.
    */
  def hybrid(
      index: Bm25.Bm25Index,
      vecs: DataFrame,
      idCol: String,
      body: String,
      mapping: IndexMapping = IndexMapping.empty
  ): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"request body must be a JSON object: $body")
    val (lexS, vecS, k, _) = hybridLegParse(index, vecs, idCol, root, mapping)
    val w = org.apache.spark.sql.expressions.Window
    val lex = lexS
      .withColumn("lex_rank", row_number().over(w.orderBy(col("score").desc, col("id"))))
      .select(col("id"), col("lex_rank"))
    val vecLeg = vecS
      .withColumn("vec_rank", row_number().over(w.orderBy(col("cos").desc, col("id"))))
      .select(col("id"), col("vec_rank"))
    lex
      .join(vecLeg, Seq("id"), "full_outer")
      .select(
        col("id"),
        round(
          coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)),
          6
        ).as("rrf_score")
      )
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(k)
  }

  /** Shared leg computation for the hybrid fusions: parse the hybrid
    * body, run each sub-query as its own bounded top-k, and return
    * (lex top-k (id, score), knn top-k (id, cos), size, lexDeclaredFirst
    * — the declared sub-query order binds combination weights).
    */
  private def hybridLegParse(
      index: Bm25.Bm25Index,
      vecs: DataFrame,
      idCol: String,
      root: com.fasterxml.jackson.databind.JsonNode,
      mapping: IndexMapping
  ): (DataFrame, DataFrame, Int, Boolean) = {
    val q = req(root, "query", "hybrid")
    require(q.isObject && q.size == 1 && q.fieldNames().next() == "hybrid", s"expected a hybrid query: $q")
    val subs = req(q.get("hybrid"), "queries", "hybrid").elements().asScala.toSeq
    val k = Option(root.get("size")).map(_.asInt).getOrElse(10)
    val (knnSubs, lexSubs) = subs.partition(s => s.fieldNames().next() == "knn")
    require(
      knnSubs.size == 1 && lexSubs.size == 1,
      s"hybrid needs exactly one lexical and one knn sub-query, got ${subs.map(_.fieldNames().next())}"
    )
    require(lexSubs.head.fieldNames().next() == "match", "the lexical leg must be a match clause")
    val (_, v) = fieldAndValue(lexSubs.head.get("match"), "query")
    val terms = v.asText.toLowerCase.split("\\s+").toSeq
    val lex = Bm25.scoreAgainstIndex(index, terms, k)
    val knnBody = knnSubs.head.get("knn")
    val vf = singleField(knnBody)
    val spec = knnBody.get(vf)
    val vec = req(spec, "vector", "knn").elements().asScala.toSeq.map(_.asDouble)
    val kk = req(spec, "k", "knn").asInt
    val base = Option(spec.get("filter"))
      .map(fn => vecs.filter(compileQuery(vecs, fn, mapping)))
      .getOrElse(vecs)
    val vecLeg = base
      .select(
        col(idCol).as("id"),
        round(graft.functions.VectorFns.cosine(col(vf), array(vec.map(lit): _*)), 6).as("cos")
      )
      .orderBy(col("cos").desc, col("id"))
      .limit(kk)
    (lex, vecLeg, k, subs.head.fieldNames().next() != "knn")
  }

  /** OpenSearch SCORE-space hybrid search via a request-level
    * `search_pipeline` with a `normalization-processor` — the default
    * hybrid-search configuration (min_max normalization per sub-query,
    * weighted arithmetic-mean combination), the score-space sibling of
    * the rank-space [[hybrid]] RRF.
    *
    * Semantics (deterministic, oracle-replayed): each leg's scores are
    * min-max normalized over ITS retrieved top-k set — `(s−min)/(max−min)`,
    * a single-valued leg normalizes to 1.0; a document missing from a
    * leg contributes 0 with that leg's weight still in the denominator
    * (`(wₗ·nₗ + wᵥ·nᵥ)/(wₗ+wᵥ)`), so both-leg hits outrank single-leg
    * hits — the behavior the processor exists to produce. Weights bind
    * to the DECLARED sub-query order. The per-leg min/max are 1-row
    * aggregates riding a broadcast; everything else is the bounded
    * k×k fusion join.
    */
  def hybridNormalized(
      index: Bm25.Bm25Index,
      vecs: DataFrame,
      idCol: String,
      body: String,
      mapping: IndexMapping = IndexMapping.empty
  ): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"request body must be a JSON object: $body")
    val (lexS, vecS, k, lexFirst) = hybridLegParse(index, vecs, idCol, root, mapping)
    val procs = Option(root.get("search_pipeline"))
      .flatMap(p => Option(p.get("phase_results_processors")))
      .map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    require(
      procs.size == 1 && procs.head.has("normalization-processor"),
      "expected one normalization-processor in search_pipeline.phase_results_processors"
    )
    val np = procs.head.get("normalization-processor")
    val normT = Option(np.get("normalization")).flatMap(n => Option(n.get("technique"))).map(_.asText).getOrElse("min_max")
    require(normT == "min_max", s"unsupported normalization technique '$normT' (supported: min_max)")
    val combNode = Option(np.get("combination"))
    val combT = combNode.flatMap(c => Option(c.get("technique"))).map(_.asText).getOrElse("arithmetic_mean")
    require(combT == "arithmetic_mean", s"unsupported combination technique '$combT' (supported: arithmetic_mean)")
    val weights = combNode
      .flatMap(c => Option(c.get("parameters")))
      .flatMap(p => Option(p.get("weights")))
      .map(_.elements().asScala.toSeq.map(_.asDouble))
      .getOrElse(Seq(0.5, 0.5))
    require(weights.size == 2 && weights.forall(_ > 0), s"weights must be 2 positive numbers: $weights")
    val (wLex, wVec) = if (lexFirst) (weights(0), weights(1)) else (weights(1), weights(0))
    def mmNorm(df: DataFrame, scoreCol: String, out: String): DataFrame = {
      val mm = df.agg(min(col(scoreCol)).as("_mn"), max(col(scoreCol)).as("_mx"))
      df.crossJoin(broadcast(mm))
        .select(
          col("id"),
          when(col("_mx") === col("_mn"), lit(1.0))
            .otherwise((col(scoreCol) - col("_mn")) / (col("_mx") - col("_mn")))
            .as(out)
        )
    }
    mmNorm(lexS, "score", "lex_n")
      .join(mmNorm(vecS, "cos", "vec_n"), Seq("id"), "full_outer")
      .select(
        col("id"),
        round(
          (coalesce(col("lex_n"), lit(0.0)) * wLex + coalesce(col("vec_n"), lit(0.0)) * wVec) / (wLex + wVec),
          6
        ).as("hybrid_score")
      )
      .orderBy(col("hybrid_score").desc, col("id"))
      .limit(k)
  }

  /** OpenSearch `neural_sparse` query from the wire format:
    * `{"query": {"neural_sparse": {"<field>": {"query_text": ...}}}, "size": k}`.
    * The learned sparse encoder is stood in for by the deterministic
    * statistical encoder documented on [[Bm25.neuralSparseScored]]
    * (doc side ln(1+tf), query side BM25 idf — dot product over shared
    * terms, no length normalization); `query_text` analyzes with the
    * standard chain, exactly the terms the doc-side index analyzed with.
    * The clause scores against the prebuilt posting artifact — the same
    * term-keyed index BM25 serves from, because a sparse dot product IS
    * an inverted-index scan (that equivalence is why neural-sparse
    * retrieval deploys on Lucene unchanged).
    */
  def neuralSparse(index: Bm25.Bm25Index, body: String): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"request body must be a JSON object: $body")
    val q = req(root, "query", "neural_sparse request")
    require(
      q.isObject && q.size == 1 && q.fieldNames().next() == "neural_sparse",
      s"expected a neural_sparse query: $q"
    )
    val clause = q.get("neural_sparse")
    val f = singleField(clause)
    val spec = clause.get(f)
    val text = req(spec, "query_text", "neural_sparse").asText
    val k = Option(root.get("size")).map(_.asInt).getOrElse(10)
    val terms = text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "neural_sparse query_text analyzed to zero terms")
    Bm25.neuralSparseScored(index, terms, k)
  }

  /** OpenSearch `_rank_eval`: ranking evaluation of search requests
    * against explicit graded ratings. Each request carries the knn body
    * shape (the engine's ranking story under evaluation — vector
    * search, including a `filter` sub-clause); `ratings` is the judged
    * (_id, rating) list; `metric` is one of OpenSearch's three
    * (`precision` / `mean_reciprocal_rank` / `dcg`, with `k`,
    * `relevant_rating_threshold`, `normalize`). One row per request:
    * (request_id, metric_score), request-id ordered.
    *
    * Plan per request: the same scan + TakeOrderedAndProject top-k the
    * knn clause compiles to, left-joined to the tiny broadcast ratings
    * table, then a 1-row aggregate; the cross-request union is
    * O(#requests) rows. The ideal DCG is a pure function of the
    * request's own ratings list, so it folds driver-side into a literal
    * (OpenSearch derives it from the ratings the same way) — no second
    * pass over the data. log2 spelled ln(x)/ln(2) (the
    * search_rank_eval convention) so oracle expression trees match.
    */
  def rankEval(df: DataFrame, idCol: String, body: String, mapping: IndexMapping = IndexMapping.empty): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"request body is not valid JSON: ${e.getMessage}")
      }
    require(root != null && root.isObject, s"request body must be a JSON object: $body")
    val metric = req(root, "metric", "_rank_eval")
    require(metric.isObject && metric.size == 1, s"metric must have exactly one key: $metric")
    val mName = metric.fieldNames().next()
    require(
      Set("precision", "mean_reciprocal_rank", "dcg")(mName),
      s"unsupported _rank_eval metric '$mName'"
    )
    val mSpec = metric.get(mName)
    val k = Option(mSpec.get("k")).map(_.asInt).getOrElse(10)
    val threshold = Option(mSpec.get("relevant_rating_threshold")).map(_.asInt).getOrElse(1)
    val normalize = Option(mSpec.get("normalize")).exists(_.asBoolean)
    val requests = req(root, "requests", "_rank_eval").elements().asScala.toSeq
    require(requests.nonEmpty, "_rank_eval needs at least one request")
    val perRequest = requests.map { r =>
      val reqId = req(r, "id", "_rank_eval request").asText
      val ratings = req(r, "ratings", s"request $reqId")
        .elements()
        .asScala
        .toSeq
        .map(e => (req(e, "_id", "rating").asLong, req(e, "rating", "rating").asInt))
      val q = req(req(r, "request", s"request $reqId"), "query", s"request $reqId")
      require(
        q.isObject && q.size == 1 && q.fieldNames().next() == "knn",
        s"_rank_eval request '$reqId' must be a knn query (the ranking under evaluation)"
      )
      val knnBody = q.get("knn")
      val f = singleField(knnBody)
      val spec = knnBody.get(f)
      val vec = req(spec, "vector", "knn").elements().asScala.toSeq.map(_.asDouble)
      val base = Option(spec.get("filter"))
        .map(fn => df.filter(compileQuery(df, fn, mapping)))
        .getOrElse(df)
      val top = base
        .withColumn("_score", round(graft.functions.VectorFns.cosine(col(f), array(vec.map(lit): _*)), 6))
        .orderBy(col("_score").desc, col(idCol))
        .limit(k)
        .withColumn(
          "rank",
          row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("_score").desc, col(idCol))
          )
        )
      val ratingDf = df.sparkSession.createDataFrame(ratings).toDF(idCol, "_rating")
      val judged = top
        .join(broadcast(ratingDf), Seq(idCol), "left")
        .select(col("rank"), coalesce(col("_rating"), lit(0)).as("_rating"))
      val rel = col("_rating") >= threshold
      val score = mName match {
        case "precision" =>
          round(sum(when(rel, 1).otherwise(0)) / lit(k.toDouble), 6)
        case "mean_reciprocal_rank" =>
          round(coalesce(max(when(rel, lit(1.0) / col("rank"))), lit(0.0)), 6)
        case "dcg" =>
          val dcg = coalesce(sum((pow(lit(2.0), col("_rating")) - 1.0) / (log(col("rank") + 1) / log(lit(2.0)))), lit(0.0))
          if (!normalize) round(dcg, 6)
          else {
            val ideal = ratings
              .map(_._2)
              .filter(_ >= threshold)
              .sorted(Ordering[Int].reverse)
              .take(k)
              .zipWithIndex
              .map { case (g, i) => (math.pow(2.0, g) - 1.0) / (math.log(i + 2.0) / math.log(2.0)) }
              .sum
            if (ideal == 0.0) lit(0.0) else round(dcg / lit(ideal), 6)
          }
      }
      judged.agg(score.as("metric_score")).select(lit(reqId).as("request_id"), col("metric_score"))
    }
    perRequest.reduce(_.union(_)).orderBy("request_id")
  }

  /** `_search/template`: mustache-lite rendering — `{{param}}`
    * placeholders in the `source` (a string body, the portable template
    * form) substituted from `params`, then delegated to [[parse]]. The
    * substitution is driver-side string work on a request-sized payload;
    * nothing about the compiled plan differs from the direct body.
    */
  def parseTemplate(df: DataFrame, body: String, mapping: IndexMapping = IndexMapping.empty): DataFrame = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => throw new IllegalArgumentException(s"malformed template: ${e.getMessage}") }
    val src = req(root, "source", "search_template")
    val raw = if (src.isTextual) src.asText else src.toString
    val rendered = Option(root.get("params")).fold(raw) { p =>
      p.fields().asScala.foldLeft(raw) { case (acc, e) =>
        val v = if (e.getValue.isTextual) e.getValue.asText else e.getValue.toString
        acc.replace("{{" + e.getKey + "}}", v)
      }
    }
    require(!rendered.contains("{{"), s"unbound template parameter in: $rendered")
    parse(df, rendered, mapping)
  }

  /** Compile just the `query` clause to a predicate (the `_count` /
    * filter-context path).
    */
  def compileQuery(df: DataFrame, node: JsonNode, mapping: IndexMapping): Column = {
    require(node.isObject && node.size == 1, s"a query clause must have exactly one key, got: $node")
    val name = node.fieldNames().next()
    val body = node.get(name)
    name match {
      case "match_all"  => lit(true)
      case "match_none" => lit(false)
      // wrapper: a base64-encoded query body, decoded and compiled
      // recursively — the escape hatch clients use to smuggle a raw query
      // through request builders that only accept strings.
      case "wrapper" =>
        val encoded = (if (body.isObject) body.get("query") else body).asText
        val decoded = new String(
          java.util.Base64.getDecoder.decode(encoded),
          java.nio.charset.StandardCharsets.UTF_8
        )
        compileQuery(df, mapper.readTree(decoded), mapping)
      case "match" =>
        val (f, v) = fieldAndValue(body, "query")
        // Strict options: an UNSUPPORTED option must fail loudly, never
        // be dropped — a silently-ignored option hands back wrong results
        // under a correct-looking query (the silent-degradation class the
        // percolator tier-equality contract caught on `operator`).
        // `boost` is accepted and inert: it cannot change a filter-
        // context hit set.
        if (body.get(f).isObject) {
          val extraOpts =
            body.get(f).fieldNames().asScala.toSet -- Set("query", "operator", "boost", "fuzziness")
          require(extraOpts.isEmpty,
            s"match on '$f': unsupported options $extraOpts (minimum_should_match → bool.should)")
        }
        if (mapping.isText(f)) {
          // `operator: "and"` (the object form) switches OR-of-terms to
          // AND-of-terms — with synonym expansion staying per-token
          // (each ORIGINAL token must match via ANY of its expansions:
          // and-of-ors, the Lucene synonym-graph semantics). Previously
          // the object form silently dropped the operator — found by
          // the percolator's indexed≡compiled tier-equality contract.
          val opts = Option(body.get(f)).filter(_.isObject)
          val andOp = opts.flatMap(o => Option(o.get("operator"))).exists(_.asText.equalsIgnoreCase("and"))
          // `fuzziness` (int or "AUTO" — OpenSearch's length ladder:
          // 0 for <3 chars, 1 for 3–5, 2 past that): each query token
          // matches when ANY analyzed doc token is within its edit
          // distance. Standard-analyzer only, and incompatible with a
          // declared synonym expansion (both rewrite the token — their
          // composition order is not well-defined here; loud, not
          // silent).
          val fuzzNode = opts.flatMap(o => Option(o.get("fuzziness")))
          val a = mapping.analyzerFor(f)
          val sa = mapping.searchAnalyzerFor(f)
          def scoreOf(terms: Seq[String]): Column =
            // A declared per-field analyzer chain applies symmetrically
            // (column analyzes with the filters, query terms through the
            // JVM twin) — unless the mapping declares a search_analyzer,
            // which takes the query side (the autocomplete asymmetry).
            if (a == Analyzer.standard && sa == Analyzer.standard) SearchDsl.matchScore(col(f), terms)
            else SearchDsl.matchScoreWith(col(f), a, terms, sa)
          val tokens = v.asText.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
          def fuzzOf(t: String): Int = fuzzNode.get.asText match {
            case "AUTO" => if (t.length < 3) 0 else if (t.length <= 5) 1 else 2
            case n      => n.toInt
          }
          def tokenPred(t: String): Column = fuzzNode match {
            case None => scoreOf(mapping.expand(t).distinct) > 0
            case Some(_) =>
              require(a == Analyzer.standard && sa == Analyzer.standard,
                s"match fuzziness on '$f' requires the standard analyzer")
              require(mapping.expand(t) == Seq(t),
                s"match fuzziness is incompatible with a declared synonym expansion of '$t'")
              val d = fuzzOf(t)
              if (d == 0) scoreOf(Seq(t)) > 0
              else exists(SearchDsl.analyze(col(f)), dt => levenshtein(dt, lit(t)) <= d)
          }
          if (andOp || fuzzNode.isDefined) {
            val preds = tokens.map(tokenPred)
            if (andOp) preds.reduceOption(_ && _).getOrElse(lit(false))
            else preds.reduceOption(_ || _).getOrElse(lit(false))
          } else scoreOf(tokens.flatMap(mapping.expand).distinct) > 0
        } else col(keywordField(df, f)) === lit(scalarValue(v))
      case "match_phrase" =>
        val (f, v) = fieldAndValue(body, "query")
        // strict options: slop would silently widen to adjacency-only —
        // fail loudly (span_near carries slop semantics); boost is inert
        if (body.get(f).isObject) {
          val extraOpts = body.get(f).fieldNames().asScala.toSet -- Set("query", "boost")
          require(extraOpts.isEmpty,
            s"match_phrase on '$f': unsupported options $extraOpts (slop → span_near)")
        }
        if (mapping.isText(f)) {
          val a = mapping.analyzerFor(f)
          // A declared analyzer switches to the positional form (stop
          // gaps preserved, ES-exact); the standard chain keeps the
          // adjacency fast path.
          if (a == Analyzer.standard) SearchDsl.matchPhrase(col(f), v.asText)
          else SearchDsl.matchPhraseWith(col(f), a, v.asText)
        } else col(keywordField(df, f)) === lit(scalarValue(v))
      case "term" =>
        val (f, v) = fieldAndValue(body, "value")
        // strict options: case_insensitive would silently keep
        // case-SENSITIVE equality; boost is inert in filter context
        strictOpts(body, f, "term", Set("value", "boost"))
        SearchDsl.term(col(keywordField(df, f)), scalarValue(v))
      case "terms" =>
        val f = singleField(body)
        SearchDsl.terms(col(f), body.get(f).elements().asScala.map(scalarValue).toSeq)
      case "range" =>
        val f = singleField(body)
        val b = body.get(f)
        // strict options: a silently-dropped format/relation shifts range
        // semantics without any visible failure; boost is inert in filter
        // context. time_zone IS implemented: endpoints are wall-clock
        // datetimes in the given zone, converted to their UTC instants
        // once (constant-folded literals — the comparison still reaches
        // the scan as a pushable predicate).
        val extraOpts = b.fieldNames().asScala.toSet -- Set("gte", "gt", "lte", "lt", "boost", "time_zone")
        require(extraOpts.isEmpty, s"range on '$f': unsupported options $extraOpts")
        val rangeTz = Option(b.get("time_zone")).map(_.asText)
        def endpoint(v: JsonNode): Column =
          rangeTz.map(z => to_utc_timestamp(lit(v.asText).cast("timestamp"), z)).getOrElse(lit(scalarValue(v)))
        val ops: Seq[(String, Column => Column)] = Seq(
          "gte" -> (v => col(f) >= v),
          "gt" -> (v => col(f) > v),
          "lte" -> (v => col(f) <= v),
          "lt" -> (v => col(f) < v)
        )
        val conds = ops.flatMap { case (k, op) => Option(b.get(k)).map(v => op(endpoint(v))) }
        require(conds.nonEmpty, s"range on '$f' needs at least one of gte/gt/lte/lt")
        conds.reduce(_ && _)
      case "exists" => col(req(body, "field", "exists").asText).isNotNull
      case "nested" =>
        // nested field semantics: ONE element must satisfy the whole
        // inner clause — `exists` over the array-of-struct column, a
        // codegen'd per-row loop with no join or explode. `inner_hits`
        // is accepted here (it shapes the response, not the hit set);
        // the inner-hit rows themselves come from [[innerHits]].
        val path = req(body, "path", "nested").asText
        val pred = compileNestedPred(path, req(body, "query", "nested"))
        exists(col(path), pred)
      case "simple_query_string" =>
        // the fault-tolerant syntax, compiled by SimpleQuery; matches if
        // ANY listed field satisfies the parsed expression.
        val q = req(body, "query", "simple_query_string").asText
        val fields = req(body, "fields", "simple_query_string").elements().asScala.toSeq.map(_.asText)
        require(fields.nonEmpty, s"simple_query_string needs at least one field: $body")
        val andDefault =
          Option(body.get("default_operator")).exists(_.asText.equalsIgnoreCase("and"))
        fields.map(f => SimpleQuery.parse(col(f), q, andDefault)).reduce(_ || _)
      case "multi_match" =>
        // best_fields in filter context: the clause matches if ANY listed
        // field matches — analyzed on text fields, exact on keyword.
        // `operator: "and"` applies PER FIELD (OpenSearch best_fields
        // semantics: some one field must contain ALL the terms).
        val q = req(body, "query", "multi_match").asText
        val fields = req(body, "fields", "multi_match").elements().asScala.toSeq.map(_.asText)
        require(fields.nonEmpty, s"multi_match needs at least one field: $body")
        // strict options: only best_fields is implemented — most_fields/
        // phrase/cross_fields change semantics and must not silently
        // degrade to best_fields
        val extraOpts = body.fieldNames().asScala.toSet -- Set("query", "fields", "operator", "type", "boost")
        require(extraOpts.isEmpty, s"multi_match: unsupported options $extraOpts")
        require(
          Option(body.get("type")).forall(_.asText == "best_fields"),
          s"multi_match type '${body.get("type")}' is not best_fields — other types change semantics"
        )
        val andOp = Option(body.get("operator")).exists(_.asText.equalsIgnoreCase("and"))
        fields
          .map { f =>
            if (mapping.isText(f)) {
              // per-field analyzer, like the match clause: each listed
              // field analyzes (and normalizes the query terms) with
              // ITS declared chain
              val a = mapping.analyzerFor(f)
              val sa = mapping.searchAnalyzerFor(f)
              def scoreOf(terms: Seq[String]): Column =
                if (a == Analyzer.standard && sa == Analyzer.standard) SearchDsl.matchScore(col(f), terms)
                else SearchDsl.matchScoreWith(col(f), a, terms, sa)
              val tokens = q.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
              if (andOp)
                tokens.map(t => scoreOf(Seq(t)) > 0).reduceOption(_ && _).getOrElse(lit(false))
              else scoreOf(tokens) > 0
            } else col(f) === lit(q)
          }
          .reduce(_ || _)
      case "ids" =>
        // The consumer indexes documents under `_id` (the reference PUTs
        // /{index}/_doc/{id}); callers expose their key column as `_id`.
        val vals = req(body, "values", "ids").elements().asScala.toSeq.map(scalarValue)
        require(vals.nonEmpty, s"ids needs at least one value: $body")
        col("_id").isin(vals: _*)
      case "fuzzy" =>
        val (f, v) = fieldAndValue(body, "value")
        strictOpts(body, f, "fuzzy", Set("value", "fuzziness", "boost"))
        val fuzz = Option(body.get(f))
          .filter(_.isObject)
          .flatMap(o => Option(o.get("fuzziness")))
          .map(_.asInt)
          .getOrElse(2)
        // Predicate form: per-token edit distance inside the scan. The
        // sublinear scale path (levenshtein over the distinct VOCABULARY,
        // then a semi-join) is search.Fuzzy — use it when the query is a
        // whole-frame operator rather than one bool clause.
        if (mapping.isText(f))
          exists(SearchDsl.analyze(col(f)), t => levenshtein(t, lit(v.asText.toLowerCase)) <= fuzz)
        else levenshtein(col(f), lit(v.asText)) <= fuzz
      case "wildcard" =>
        val (f, v) = fieldAndValue(body, "value")
        strictOpts(body, f, "wildcard", Set("value", "boost"))
        SearchDsl.wildcard(col(f), v.asText)
      case "regexp" =>
        // OpenSearch regexp is ANCHORED (the pattern must match the whole
        // value / whole analyzed term) — wrap before compiling to rlike,
        // whose contract is substring search.
        val (f, v) = fieldAndValue(body, "value")
        // flags would silently change the dialect; boost inert
        strictOpts(body, f, "regexp", Set("value", "boost"))
        val anchored = "^(?:" + v.asText + ")$"
        if (mapping.isText(f)) exists(SearchDsl.analyze(col(f)), t => t.rlike(anchored))
        else col(f).rlike(anchored)
      case "prefix" =>
        val (f, v) = fieldAndValue(body, "value")
        strictOpts(body, f, "prefix", Set("value", "boost"))
        if (mapping.isText(f)) SearchDsl.prefixQuery(col(f), v.asText)
        else col(f).startsWith(v.asText)
      case "bool" =>
        val must = clauseList(body, "must").map(compileQuery(df, _, mapping))
        val filter = clauseList(body, "filter").map(compileQuery(df, _, mapping))
        val mustNot = clauseList(body, "must_not").map(compileQuery(df, _, mapping))
        val should = clauseList(body, "should").map(compileQuery(df, _, mapping))
        // OpenSearch default: should becomes REQUIRED (msm=1) only when
        // there is no must/filter context.
        val msm = Option(body.get("minimum_should_match"))
          .map(_.asInt)
          .getOrElse(if (must.isEmpty && filter.isEmpty && should.nonEmpty) 1 else 0)
        val base = SearchDsl.bool(must, mustNot, filter)
        if (should.nonEmpty && msm > 0) base && SearchDsl.minimumShouldMatch(should, msm)
        else base
      case "query_string" =>
        QueryString.compile(
          req(body, "query", "query_string").asText,
          df.schema,
          Option(body.get("default_field")).map(_.asText)
        )
      case "more_like_this" =>
        // The free-text `like` form: its analyzed terms become an
        // msm-gated match over the listed fields. The doc-id form (top
        // discriminative terms of a stored doc) is the whole-frame
        // operator Bm25.moreLikeThis, not a bool clause.
        val fields = req(body, "fields", "more_like_this").elements().asScala.toSeq.map(_.asText)
        require(fields.nonEmpty, s"more_like_this needs at least one field: $body")
        val likeTerms =
          req(body, "like", "more_like_this").asText.toLowerCase.split("\\s+").toSeq.distinct
        val msm = Option(body.get("minimum_should_match")).map(_.asInt).getOrElse(1)
        fields
          .map { f =>
            size(array_intersect(array_distinct(SearchDsl.analyze(col(f))), array(likeTerms.map(lit): _*))) >= msm
          }
          .reduce(_ || _)
      case "geo_distance" =>
        // geo_distance against a struct geo field (lat/lon subfields):
        // equirectangular distance with a fixed mid-latitude scale — only
        // IEEE correctly-rounded ops (*, +, sqrt), so engines agree
        // bit-for-bit; haversine's sin/cos/atan2 are not correctly-rounded
        // and could flip boundary rows.
        val distText = req(body, "distance", "geo_distance").asText
        require(distText.endsWith("km"), s"geo_distance supports 'NNNkm' distances, got '$distText'")
        val radius = distText.stripSuffix("km").toDouble
        val f = body
          .fieldNames()
          .asScala
          .filterNot(_ == "distance")
          .nextOption()
          .getOrElse(throw new IllegalArgumentException(s"geo_distance needs a location field: $body"))
        val c = body.get(f)
        val dlat = col(f).getField("lat") - lit(req(c, "lat", "geo_distance").asDouble)
        val dlon = (col(f).getField("lon") - lit(req(c, "lon", "geo_distance").asDouble)) * lit(0.7071067811865476)
        sqrt(dlat * dlat + dlon * dlon) * lit(111.195) <= lit(radius)
      case "geo_polygon" =>
        val f = singleField(body)
        val spec = body.get(f)
        val pts = req(spec, "points", "geo_polygon").elements().asScala.toSeq.map { p =>
          (req(p, "lat", "geo_polygon point").asDouble, req(p, "lon", "geo_polygon point").asDouble)
        }
        Aggs.pointInPolygon(col(f).getField("lat"), col(f).getField("lon"), pts)
      case "geo_bounding_box" =>
        val f = singleField(body)
        val b = body.get(f)
        val tl = req(b, "top_left", "geo_bounding_box")
        val br = req(b, "bottom_right", "geo_bounding_box")
        col(f).getField("lat") <= lit(req(tl, "lat", "geo_bounding_box").asDouble) &&
        col(f).getField("lat") >= lit(req(br, "lat", "geo_bounding_box").asDouble) &&
        col(f).getField("lon") >= lit(req(tl, "lon", "geo_bounding_box").asDouble) &&
        col(f).getField("lon") <= lit(req(br, "lon", "geo_bounding_box").asDouble)
      case "terms_set" =>
        // At least minimum_should_match of the terms present — ONE
        // array_intersect per row (no explode); analyzed on text-mapped
        // fields, whole-value membership on keyword.
        val f = singleField(body)
        val spec = body.get(f)
        val termVals =
          req(spec, "terms", s"terms_set on '$f'").elements().asScala.toSeq.map(_.asText)
        require(termVals.nonEmpty, s"terms_set on '$f' needs at least one term")
        val msm = Option(spec.get("minimum_should_match")).map(_.asInt).getOrElse(1)
        if (mapping.isText(f)) {
          val arr = array(termVals.map(t => lit(t.toLowerCase)): _*)
          size(array_intersect(array_distinct(SearchDsl.analyze(col(f))), arr)) >= msm
        } else
          size(array_intersect(array(col(f)), array(termVals.map(lit): _*))) >= msm
      // match_phrase_prefix: the phrase's last term is a PREFIX. With a
      // whitespace analyzer the phrase test IS an anchored regex — one
      // linear scan of the text per row. (An element_at-per-position HOF
      // re-embeds the tokenizing split at every access: O(len²) work per
      // row, measured 10× slower — the regex form is the scalable one.)
      case "match_phrase_prefix" =>
        val (f, v) = fieldAndValue(body, "query")
        val terms = v.asText.toLowerCase.split("\\s+").toSeq
        require(terms.nonEmpty, "match_phrase_prefix needs at least one term")
        val pattern = "(^|\\s)" + terms.map(java.util.regex.Pattern.quote).mkString("\\s+")
        lower(col(f)).rlike(pattern)
      // intervals, all_of(ordered) over two interval sources — each a
      // match (single term) or an any_of of matches; max_gaps counts
      // positions BETWEEN matches (absent = unbounded).
      case "intervals" =>
        val f = singleField(body)
        val spec = body.get(f).get("all_of")
        require(spec != null && spec.isObject, s"intervals supports the all_of form, got: ${body.get(f)}")
        require(Option(spec.get("ordered")).exists(_.asBoolean), "intervals all_of needs ordered: true")
        val parts = req(spec, "intervals", "intervals all_of").elements().asScala.toSeq
        require(parts.size == 2, s"intervals all_of supports exactly two sources, got ${parts.size}")
        val maxGaps = Option(spec.get("max_gaps")).map(_.asInt)
        def termsOf(n: JsonNode): Seq[String] = {
          val kind = n.fieldNames().next()
          kind match {
            case "match" => Seq(req(n.get("match"), "query", "intervals match").asText.toLowerCase)
            case "any_of" =>
              req(n.get("any_of"), "intervals", "intervals any_of").elements().asScala.toSeq.flatMap(termsOf)
            case other => throw new IllegalArgumentException(s"unsupported intervals source '$other'")
          }
        }
        val toks = graft.functions.TextFns.tokens(col(f))
        def positions(ts: Seq[String]) =
          filter(
            transform(toks, (t, i) => when(ts.map(x => t === lit(x)).reduce(_ || _), i).otherwise(lit(-1))),
            x => x >= 0
          )
        val pa = positions(termsOf(parts(0)))
        val pb = positions(termsOf(parts(1)))
        exists(pa, a => exists(pb, b => b > a && maxGaps.fold(lit(true))(g => (b - a - 1) <= g)))
      case "span_near" =>
        // Two span clauses within `slop` token positions — the
        // token-position HOF shape (per-row array work, no self-join).
        // Clauses are span_term or span_multi (a multi-term matcher —
        // prefix — as a span); in_order=true requires the second clause
        // after the first, in_order=false accepts either direction.
        val clauses = clauseList(body, "clauses")
        require(clauses.size == 2, s"span_near supports exactly two span clauses, got ${clauses.size}")
        val parts = clauses.map(spanClauseMatcher)
        val f = parts.head._1
        require(parts.forall(_._1 == f), s"span_near clauses must share one field: ${parts.map(_._1)}")
        val slop = Option(body.get("slop")).map(_.asInt).getOrElse(0)
        val inOrder = Option(body.get("in_order")).exists(_.asBoolean)
        val toks = graft.functions.TextFns.tokens(col(f))
        def positions(pred: Column => Column) =
          filter(transform(toks, (t, i) => when(pred(t), i).otherwise(lit(-1))), x => x >= 0)
        val pa = positions(parts(0)._2)
        val pb = positions(parts(1)._2)
        if (inOrder) exists(pa, a => exists(pb, b => b > a && b - a <= slop))
        else exists(pa, a => exists(pb, b => b =!= a && abs(b - a) <= slop))
      // span_multi standalone: a multi-term matcher (prefix) as a span —
      // the degenerate any-position case is an exists over the tokens.
      case "span_multi" =>
        val (f, pred) = spanMultiMatcher(body)
        exists(graft.functions.TextFns.tokens(col(f)), pred)
      // span_term standalone: the term occurs as an analyzed token — the
      // degenerate one-position span, composable under span_or.
      case "span_term" =>
        val (f, v) = fieldAndValue(body, "value")
        array_contains(graft.functions.TextFns.tokens(col(f)), v.asText.toLowerCase)
      // span_or: any sub-span matches — compile each clause (span_term /
      // span_near / nested span_or) and OR the predicates; still one
      // per-row pass, no per-clause scans.
      case "span_or" =>
        val cs = clauseList(body, "clauses")
        require(cs.nonEmpty, "span_or needs at least one clause")
        cs.map(c => compileQuery(df, c, mapping)).reduce(_ || _)
      // span_first: the match must begin within the first `end` token
      // positions — whole-row position probe, no explode.
      case "span_first" =>
        val (f, term) = spanTermOf(req(body, "match", "span_first"), "span_first.match")
        val end = req(body, "end", "span_first").asInt
        SearchDsl.spanFirstPos(col(f), term).between(1, end)
      // span_not: an include-term occurrence with NO exclude-term within
      // pre positions before / post after it.
      case "span_not" =>
        val (fi, ti) = spanTermOf(req(body, "include", "span_not"), "span_not.include")
        val (fe, te) = spanTermOf(req(body, "exclude", "span_not"), "span_not.exclude")
        require(fi == fe, s"span_not include/exclude must share one field: $fi vs $fe")
        val pre = Option(body.get("pre")).map(_.asInt).getOrElse(0)
        val post = Option(body.get("post")).map(_.asInt).getOrElse(0)
        val pi = tokenPositions(fi, ti)
        val pe = tokenPositions(fe, te)
        exists(pi, i => !exists(pe, e => e >= i - lit(pre) && e <= i + lit(post)))
      // span_within: a little span strictly enclosed by a big ordered
      // span_near span; span_containing is its dual (big spans that
      // enclose a little occurrence). Both are the token-position HOF
      // shape — per-row array work, no self-join.
      case "span_within" | "span_containing" =>
        val (fl, tl) = spanTermOf(req(body, "little", name), s"$name.little")
        val bigNode = req(body, "big", name)
        require(
          bigNode.isObject && bigNode.size == 1 && bigNode.fieldNames().next() == "span_near",
          s"$name big clause must be span_near: $bigNode"
        )
        val (fb, ta, tb, slop) = spanNearParts(bigNode.get("span_near"))
        require(fl == fb, s"$name little/big must share one field: $fl vs $fb")
        val pp = tokenPositions(fl, tl)
        val pa = tokenPositions(fb, ta)
        val pb = tokenPositions(fb, tb)
        if (name == "span_within")
          exists(pp, p => exists(pa, a => exists(pb, b => b > a && b - a <= lit(slop) && p > a && p < b)))
        else
          exists(pa, a => exists(pb, b => b > a && b - a <= lit(slop) && exists(pp, p => p > a && p < b)))
      // match_bool_prefix: every term a full analyzed token except the
      // LAST, which matches as a prefix; terms join under OR (the
      // default operator), all in one per-row pass.
      case "match_bool_prefix" =>
        val (f, v) = fieldAndValue(body, "query")
        val terms = v.asText.toLowerCase.split("\\s+").toSeq
        require(terms.nonEmpty, "match_bool_prefix needs at least one term")
        val toks = graft.functions.TextFns.tokens(col(f))
        val full = terms.init.map(t => array_contains(toks, t))
        val pre = exists(toks, t => t.startsWith(terms.last))
        (full :+ pre).reduce(_ || _)
      case other => throw new IllegalArgumentException(s"unsupported query clause '$other'")
    }
  }

  // ── Aggregations ──────────────────────────────────────────────────────

  private val siblingPipelineTypes =
    Set("stats_bucket", "avg_bucket", "min_bucket", "max_bucket", "sum_bucket", "percentiles_bucket",
      "extended_stats_bucket", "change_point")

  private def compileAggs(df: DataFrame, aggs: JsonNode, mapping: IndexMapping): DataFrame = {
    // Sibling pipeline form: two top-level aggs where the second reads
    // the first's buckets via buckets_path "<base>><metric>" — the
    // stats_bucket/avg_bucket family. The bucket frame is the (tiny)
    // intermediate; the sibling's one-row stats are the response.
    if (aggs.isObject && aggs.size == 2) {
      val names = aggs.fieldNames().asScala.toSeq
      names.find { n =>
        val v = aggs.get(n)
        v.isObject && v.size >= 1 && siblingPipelineTypes(v.fieldNames().next())
      } match {
        case Some(sib) =>
          val baseName = names.filterNot(_ == sib).head
          val sibType = aggs.get(sib).fieldNames().next()
          val spec = aggs.get(sib).get(sibType)
          val path = req(spec, "buckets_path", s"sibling '$sib' ($sibType)").asText
          val parts = path.split(">")
          require(
            parts.length == 2 && parts(0) == baseName,
            s"sibling buckets_path must be '$baseName><metric>': $path"
          )
          val single = mapper.createObjectNode()
          single.set[JsonNode](baseName, aggs.get(baseName))
          val buckets = compileAggs(df, single, mapping)
          val metric = if (parts(1) == "_count") col("doc_count") else col(parts(1))
          require(
            parts(1) == "_count" || buckets.columns.contains(parts(1)),
            s"buckets_path metric '${parts(1)}' is not produced by '$baseName'"
          )
          return sibType match {
            case "stats_bucket" =>
              // order-proof: exact decimal sum, avg = sum/count (the
              // bucket metrics are already 2dp-rounded)
              buckets.agg(
                count(lit(1)).as("count"),
                round(min(metric), 2).as("min"),
                round(max(metric), 2).as("max"),
                round(sum(metric.cast("decimal(18,2)")).cast("double") / count(lit(1)), 6).as("avg"),
                sum(metric.cast("decimal(18,2)")).cast("double").as("sum")
              )
            // max_bucket reports WHICH bucket holds the max (keys + value
            // in OpenSearch's response): argmax via a 1-row broadcast max
            // joined back on equality, never a sort of the bucket table.
            case "max_bucket" =>
              buckets
                .crossJoin(broadcast(buckets.agg(max(metric).as("_mx"))))
                .filter(metric === col("_mx"))
                .select(col("bucket"), metric)
                .orderBy("bucket")
            // extended_stats_bucket: moments of the bucket metric from
            // exact decimal sums in a fixed double tree (population
            // variance E[x²]−E[x]², OpenSearch's convention) — var_pop's
            // partition-order double accumulation would not be
            // engine-stable.
            case "extended_stats_bucket" =>
              val dec = metric.cast("decimal(18,2)")
              val n = count(lit(1))
              val s = sum(dec).cast("double")
              val ss = sum(dec * dec).cast("double")
              // ss sits near 1e19 — past double's exact-integer range, so
              // the two engines' decimal→double conversions can differ by
              // ulps and the variance cancellation amplifies that to ~1e1
              // absolute. The big moments round at absolute precision far
              // above ulp noise (relative ~1e-13) instead of the 6-dp
              // convention; std (back at data magnitude) rounds normally.
              buckets.agg(
                n.as("count"),
                round(min(metric), 2).as("min"),
                round(max(metric), 2).as("max"),
                round(s / n, 6).as("avg"),
                s.as("sum"),
                round(ss, -6).as("sum_of_squares"),
                round((ss - s * s / n) / n, -4).as("variance"),
                round(sqrt((ss - s * s / n) / n), 4).as("std_deviation")
              )
            // percentiles_bucket: the exact interpolated ladder over the
            // bucket METRIC values (~tens of rows).
            case "percentiles_bucket" =>
              val ps = Option(spec.get("percents"))
                .map(_.elements().asScala.toSeq.map(_.asDouble))
                .getOrElse(Seq(25.0, 50.0, 75.0))
              Aggs.percentiles(buckets, metric, ps.map(p => percentileName(p) -> p / 100.0))
            // change_point: the split of the bucket series maximizing
            // |mean(left) − mean(right)| — prefix decimal sums via one
            // window over the bucket table + a 1-row broadcast total;
            // emitted row = last bucket of the left segment.
            case "change_point" =>
              val w = org.apache.spark.sql.expressions.Window
                .orderBy("bucket")
                .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                  org.apache.spark.sql.expressions.Window.currentRow)
              val dec = metric.cast("decimal(18,2)")
              buckets
                .select(col("bucket"), sum(dec).over(w).as("_cum"), count(lit(1)).over(w).as("_k"))
                .crossJoin(broadcast(buckets.agg(sum(dec).as("_tot"), count(lit(1)).as("_n"))))
                .filter(col("_k") < col("_n"))
                .select(
                  col("bucket"),
                  round(col("_cum").cast("double") / col("_k"), 6).as("left_mean"),
                  round((col("_tot") - col("_cum")).cast("double") / (col("_n") - col("_k")), 6).as("right_mean")
                )
                .withColumn("delta", round(abs(col("left_mean") - col("right_mean")), 6))
                .orderBy(col("delta").desc, col("bucket"))
                .limit(1)
            case _ => Aggs.bucketStats(buckets, metric)
          }
        case None => ()
      }
    }
    require(
      aggs.isObject && aggs.size == 1,
      s"exactly one top-level aggregation is supported per request, got: $aggs"
    )
    val aggName = aggs.fieldNames().next()
    val spec = aggs.get(aggName)
    val subAggs = Option(spec.get("aggs")).orElse(Option(spec.get("aggregations")))
    val typeName = spec
      .fieldNames()
      .asScala
      .filterNot(n => n == "aggs" || n == "aggregations")
      .nextOption()
      .getOrElse(throw new IllegalArgumentException(s"aggregation '$aggName' has no type key: $spec"))
    val body = spec.get(typeName)
    // `missing:` value substitution (the per-agg OpenSearch option): docs
    // WITHOUT the field take the given value instead of bucketing nowhere
    // — a coalesce BEFORE bucketing, so it composes with the family's
    // null-key rule (the substituted docs are no longer null-keyed) and
    // with order/size/metrics unchanged. Applied wherever `field` is
    // read, matching OpenSearch's support across the terms/histogram
    // bucket aggs and field-based metrics.
    val missingSub =
      if (body != null && body.isObject) Option(body.get("missing")).map(m => lit(scalarValue(m)))
      else None
    def field = {
      val f0 = col(req(body, "field", s"aggregation '$typeName'").asText)
      missingSub.map(ms => coalesce(f0, ms)).getOrElse(f0)
    }
    typeName match {
      // missing: the docs whose field is NULL, as one bucket with
      // optional exact-decimal avg sub-metrics — an IsNull filter that
      // reaches the scan, then a 1-row aggregate.
      case "missing" =>
        val metrics = subAggs.map(_.fields().asScala.toSeq.map(decimalAvgMetric)).getOrElse(Nil)
        df.filter(field.isNull).agg(count(lit(1)).as("doc_count"), metrics: _*)
      // filter agg: a named single-filter bucket with metric sub-aggs —
      // the predicate pushes to the scan; one pass, one bucket row.
      case "filter" =>
        val metrics = subAggs.map(_.fields().asScala.toSeq.map(decimalAvgMetric)).getOrElse(Nil)
        df.filter(compileQuery(df, body, mapping)).agg(count(lit(1)).as("doc_count"), metrics: _*)
      // nested agg: metrics over ALL nested elements. The metrics form
      // accumulates per-row partials (size + a decimal HOF fold) — the
      // element table is never exploded. The terms+reverse_nested form
      // buckets elements and counts DISTINCT parent docs per bucket;
      // reverse_nested's `id_field` names the parent id column (the _id
      // stand-in, the diversified_sampler precedent).
      case "nested" =>
        val path = req(body, "path", "nested aggregation").asText
        val sub = subAggs.getOrElse(
          throw new IllegalArgumentException("nested aggregation needs sub-aggregations")
        )
        val subEntries = sub.fields().asScala.toSeq
        def elementField(full: String): String = {
          require(
            full.startsWith(path + "."),
            s"nested sub-aggregation fields must be $path-prefixed, got: $full"
          )
          full.stripPrefix(path + ".")
        }
        subEntries match {
          case Seq(t) if t.getValue.has("terms") =>
            val termsField = elementField(req(t.getValue.get("terms"), "field", "nested terms").asText)
            val rnSub = Option(t.getValue.get("aggs")).orElse(Option(t.getValue.get("aggregations")))
              .getOrElse(throw new IllegalArgumentException("nested terms expects a reverse_nested sub-agg"))
            val rnEntry = rnSub.elements().asScala.next()
            require(rnEntry.has("reverse_nested"), s"nested terms supports a reverse_nested sub-agg, got: $rnEntry")
            val idField = req(rnEntry.get("reverse_nested"), "id_field", "reverse_nested").asText
            df.select(col(idField), explode(col(path)).as("_e"))
              .groupBy(col(s"_e.$termsField").as("key"))
              .agg(count(lit(1)).as("doc_count"), countDistinct(col(idField)).as("parent_count"))
              .orderBy("key")
          case Seq(m) if m.getValue.has("avg") =>
            val f = elementField(req(m.getValue.get("avg"), "field", "nested avg").asText)
            Nested.nestedAgg(df, path, f, m.getKey)
          case other =>
            throw new IllegalArgumentException(
              s"nested aggregation supports one avg metric or terms+reverse_nested, got: $other"
            )
        }
      // matrix_stats: pairwise covariance/correlation of the fields list
      // from one exact-decimal moment scan (Aggs.matrixStats).
      case "matrix_stats" =>
        val fs = req(body, "fields", "matrix_stats").elements().asScala.toSeq.map(_.asText)
        Aggs.matrixStats(df, fs)
      // diversified_sampler: a deterministic md5-ordered sample capped at
      // max_docs_per_value docs per diversity value (bounded TopKPerKey
      // heaps, the quota-sampling exec), feeding its terms sub-agg.
      // `id_field` names the id column — the _id stand-in, the has_child
      // join-object precedent.
      // sampler (plain): the deterministic md5-ordered first shard_size
      // docs feeding a terms sub-agg — a bounded TakeOrderedAndProject,
      // never a full sort. `id_field` as in diversified_sampler.
      case "sampler" =>
        val idField = req(body, "id_field", "sampler").asText
        val shardSize = Option(body.get("shard_size")).map(_.asInt).getOrElse(100)
        val sub = subAggs.getOrElse(throw new IllegalArgumentException("sampler needs a terms sub-aggregation"))
        require(
          sub.isObject && sub.size == 1 && sub.elements().asScala.next().has("terms"),
          s"sampler supports exactly one terms sub-aggregation, got: $sub"
        )
        val termsField = req(sub.elements().asScala.next().get("terms"), "field", "sampler terms").asText
        df.withColumn("_h", md5(col(idField).cast("string")))
          .orderBy(col("_h").asc, col(idField).asc)
          .limit(shardSize)
          .groupBy(col(termsField).as("key"))
          .agg(count(lit(1)).as("doc_count"))
          .orderBy(col("doc_count").desc, col("key"))
      case "diversified_sampler" =>
        val divField = req(body, "field", "diversified_sampler").asText
        val idField = req(body, "id_field", "diversified_sampler").asText
        val cap = Option(body.get("max_docs_per_value"))
          .orElse(Option(body.get("shard_size")))
          .map(_.asInt)
          .getOrElse(100)
        val sub = subAggs.getOrElse(
          throw new IllegalArgumentException("diversified_sampler needs a terms sub-aggregation")
        )
        require(
          sub.isObject && sub.size == 1 && sub.elements().asScala.next().has("terms"),
          s"diversified_sampler supports exactly one terms sub-aggregation, got: $sub"
        )
        val termsField =
          req(sub.elements().asScala.next().get("terms"), "field", "diversified_sampler terms").asText
        val d = df.withColumn("_h", md5(col(idField).cast("string")))
        Aggs
          .topHits(d, col(divField), cap, Seq(col("_h").asc, col(idField).asc))
          .groupBy(col(termsField).as("key"))
          .agg(count(lit(1)).as("doc_count"))
          .orderBy(col("doc_count").desc, col("key"))
      case "terms" if body.has("order") =>
        // Explicit bucket order: {"order": {"<sub-metric>|_key|_count": "asc|desc"}}
        val size = Option(body.get("size")).map(_.asInt).getOrElse(10)
        val minDc = Option(body.get("min_doc_count")).map(_.asLong).getOrElse(1L)
        val o = body.get("order")
        require(o.isObject && o.size == 1, s"terms order must have exactly one key: $o")
        val key = o.fieldNames().next()
        val asc = o.get(key).asText != "desc"
        val metrics = subAggs.map(sa => sa.fields().asScala.toSeq.map(roundedMetric)).getOrElse(Nil)
        val metricNames = subAggs.map(sa => sa.fieldNames().asScala.toSeq).getOrElse(Nil)
        require(
          key == "_key" || key == "_count" || metricNames.contains(key),
          s"terms order by '$key' needs a matching metric sub-aggregation, have: $metricNames"
        )
        Aggs.termsAggOrdered(df, field, size, metrics, key, asc, minDc)
      case "terms" =>
        val size = Option(body.get("size")).map(_.asInt).getOrElse(10)
        // min_doc_count: buckets below the floor drop BEFORE size
        // truncation (a pruned bucket frees a slot) — a bucket-table
        // HAVING. Supported on the count/metric paths; the structural
        // sub-agg paths (top_hits/geo_line/geo_bounds/rich) reject it
        // loudly rather than silently ignoring (strict-options rule).
        val minDc = Option(body.get("min_doc_count")).map(_.asLong).getOrElse(1L)
        def requireNoMinDc(who: String): Unit =
          require(minDc == 1L, s"terms min_doc_count is unsupported with a $who sub-aggregation")
        subAggs match {
          // top_hits sub-aggregation: top-k DOCUMENTS per bucket, executed
          // by the bounded-heap TopKPerKey operator (rank column, no
          // window sort). Covers every bucket; the terms size is a
          // bucket-count cap and must be left default here.
          case Some(sa)
              if sa.size == 1 && sa.elements().asScala.toSeq.headOption.exists(_.has("top_hits")) =>
            require(body.get("size") == null, "terms size with a top_hits sub-aggregation is unsupported")
            requireNoMinDc("top_hits")
            val th = sa.elements().asScala.next().get("top_hits")
            val k = req(th, "size", "top_hits").asInt
            val ordering = compileSort(req(th, "sort", "top_hits"))
            Aggs.topHits(df, field, k, ordering)
          // geo_line sub-aggregation: per bucket, the track of points
          // ordered by the sort field, capped at `size` — per-group state
          // bounded by the TopKPerKey heaps, never collect-then-slice.
          // Coordinates print through decimal(6,2) for fixed-point text.
          case Some(sa)
              if sa.size == 1 && sa.elements().asScala.toSeq.headOption.exists(_.has("geo_line")) =>
            requireNoMinDc("geo_line")
            val gl = sa.elements().asScala.next().get("geo_line")
            val pf = req(req(gl, "point", "geo_line"), "field", "geo_line point").asText
            val sortF = req(req(gl, "sort", "geo_line"), "field", "geo_line sort").asText
            val tiebreak = Option(gl.get("tie_breaker")).map(_.asText)
            val k = Option(gl.get("size")).map(_.asInt).getOrElse(10)
            val groupName = req(body, "field", "terms").asText
            val pt = concat(
              col(pf).getField("lat").cast("decimal(6,2)").cast("string"),
              lit(","),
              col(pf).getField("lon").cast("decimal(6,2)").cast("string")
            ).as("pt")
            val sortCols = (Seq(sortF) ++ tiebreak.toSeq).map(_ -> true)
            // group by the coalesced `field`, not the raw column, so the
            // `missing:` substitution applies here like every other
            // terms path (advice r15: the raw-column grouping silently
            // dropped substituted docs).
            val pts =
              df.select(field.as(groupName) +: ((Seq(sortF) ++ tiebreak.toSeq).map(col) :+ pt): _*)
            graft.plans.TopKPerKey
              .perKey(pts, Seq(groupName), sortCols, k)
              .groupBy(groupName)
              .agg(concat_ws(" ", expr("transform(array_sort(collect_list(struct(rank, pt))), x -> x.pt)"))
                .as("line"))
              .orderBy(groupName)
          // geo_bounds sub-aggregation: per-bucket bounding box over a
          // struct geo field — four extrema + count in one hash agg.
          case Some(sa)
              if sa.size == 1 && sa.elements().asScala.toSeq.headOption.exists(_.has("geo_bounds")) =>
            requireNoMinDc("geo_bounds")
            val gb = sa.elements().asScala.next().get("geo_bounds")
            val pf = req(gb, "field", "geo_bounds").asText
            val groupName = req(body, "field", "terms").asText
            // terms rule: a NULL group key buckets nowhere — but the key
            // is the coalesced `field`, so `missing:` substitution
            // applies before the null test (advice r15).
            df.filter(field.isNotNull)
              .groupBy(field.as(groupName))
              .agg(
                max(col(pf).getField("lat")).as("top"),
                min(col(pf).getField("lat")).as("bottom"),
                min(col(pf).getField("lon")).as("left"),
                max(col(pf).getField("lon")).as("right"),
                count(lit(1)).as("doc_count")
              )
              .orderBy(groupName)
          // Rich metric sub-aggs (percentiles/boxplot/extended_stats/
          // cardinality — the full top-level metric set under buckets):
          // one hash agg carries every metric's aggregate columns, the
          // post projection runs on the bucket table.
          case Some(sa)
              if sa.fields().asScala.exists(e =>
                e.getValue.isObject && richMetricTypes(e.getValue.fieldNames().next())) =>
            requireNoMinDc("rich-metric")
            val (aggCols, postCols) = sa.fields().asScala.toSeq.map(richMetric).unzip
            df.groupBy(field.as("key"))
              .agg(count(lit(1)).as("doc_count"), aggCols.flatten: _*)
              .select(col("key") +: col("doc_count") +: postCols.flatten: _*)
              .orderBy(col("doc_count").desc, col("key").asc)
              .limit(size)
          case Some(sa) => Aggs.termsAggWith(df, field, size, sa.fields().asScala.toSeq.map(roundedMetric), minDc)
          case None     => Aggs.termsAgg(df, field, size, minDc)
        }
      case "date_histogram" =>
        val interval =
          Option(body.get("calendar_interval")).orElse(Option(body.get("interval"))).map(_.asText)
        require(interval.isDefined, "date_histogram needs calendar_interval")
        // time_zone: bucket boundaries are WALL-CLOCK in the given zone
        // (a non-UTC org's "daily" dashboard). The field shifts to local
        // time BEFORE truncation (from_utc_timestamp; DST-aware, so a
        // 23/25-hour day truncates at its real local midnight), every
        // downstream path buckets on local wall time, and the emitted
        // key converts BACK to the UTC instant of the local bucket start
        // (OpenSearch's epoch-millis key) at the very end. The end
        // conversion is order-preserving, so pipeline windows /
        // bucket_sort over the local table are unaffected.
        val dhTz = Option(body.get("time_zone")).map(_.asText)
        // offset: shift bucket BOUNDARIES by a duration ("+6h" — the
        // "day starts at 6am" dashboard knob): truncate (ts − offset),
        // emit (bucket + offset). Composes with time_zone in OpenSearch's
        // order — offset applies on the (local) wall clock, the key then
        // converts back to a UTC instant.
        val dhOff = Option(body.get("offset")).map(_.asText).map { o =>
          val m = """^([+-]?)(\d+)(s|m|h|d)$""".r
          o match {
            case m(sign, n, u) =>
              val unit = u match {
                case "s" => "SECOND"
                case "m" => "MINUTE"
                case "h" => "HOUR"
                case "d" => "DAY"
              }
              val iv = expr(s"INTERVAL '$n' $unit")
              if (sign == "-") (-1, iv) else (1, iv)
            case _ => throw new IllegalArgumentException(s"date_histogram offset '$o' (want e.g. \"+6h\", \"-30m\")")
          }
        }
        val fieldLoc0 = dhTz.map(z => from_utc_timestamp(field, z)).getOrElse(field)
        val fieldLoc = dhOff.fold(fieldLoc0) { case (sg, iv) => if (sg > 0) fieldLoc0 - iv else fieldLoc0 + iv }
        def unlocalize(out: DataFrame): DataFrame = {
          val shifted = dhOff.fold(out) { case (sg, iv) =>
            out.withColumn("bucket", if (sg > 0) col("bucket") + iv else col("bucket") - iv)
          }
          dhTz.map(z => shifted.withColumn("bucket", to_utc_timestamp(col("bucket"), z))).getOrElse(shifted)
        }
        // Pipeline sub-aggregations (the Kibana time-series toolkit:
        // cumulative_sum / derivative / moving_avg over a sibling metric
        // or _count) run over the BUCKET table — tens of rows — so the
        // unpartitioned window is bounded, never the fact table.
        val pipelineTypes =
          Set("cumulative_sum", "derivative", "moving_avg", "serial_diff", "moving_fn", "normalize",
            "bucket_script", "moving_percentiles")
        val entries = subAggs.map(_.fields().asScala.toSeq).getOrElse(Nil)
        // cumulative_cardinality is NOT a cumsum of per-bucket
        // cardinalities (buckets share keys): delegate the whole request
        // to the scalable first-appearance plan — each key's first bucket,
        // first-appearances per bucket, running sum over the tiny bucket
        // table. Never a distinct-over-window of the fact scan.
        entries.find(e => e.getValue.isObject && e.getValue.fieldNames().next() == "cumulative_cardinality") match {
          case Some(cum) =>
            val path = req(cum.getValue.get("cumulative_cardinality"), "buckets_path", "cumulative_cardinality").asText
            val card = entries.find(e => e.getKey == path)
            require(
              card.exists(e => e.getValue.isObject && e.getValue.fieldNames().next() == "cardinality"),
              s"cumulative_cardinality buckets_path '$path' must name a sibling cardinality sub-aggregation"
            )
            require(entries.size == 2, "cumulative_cardinality supports exactly the cardinality sibling + itself")
            val keyField = col(req(card.get.getValue.get("cardinality"), "field", "cardinality").asText)
            // "approx": true → the sketch tier: per-bucket HLL sketches
            // unioned cumulatively; the exact tier's per-key shuffle
            // becomes a bucket-keyed sketch aggregate (§5 audit rule —
            // sketch-tier THROUGHOUT, no Expand anywhere).
            val approx = Option(cum.getValue.get("cumulative_cardinality").get("approx")).exists(_.asBoolean)
            return unlocalize {
              if (approx) Aggs.cumulativeCardinalityApprox(df, fieldLoc, keyField, interval.get)
              else Aggs.cumulativeCardinality(df, fieldLoc, keyField, interval.get)
            }
          case None => ()
        }
        // rate sub-agg: per-day rate of a monthly decimal sum — delegates
        // to the shared dateHistogramRate plan (month-granular; the unit
        // division is calendar-aware day counting).
        entries.find(e => e.getValue.isObject && e.getValue.fieldNames().next() == "rate") match {
          case Some(r) =>
            require(interval.get == "month", s"rate sub-agg requires calendar_interval=month, got ${interval.get}")
            require(entries.size == 1, "rate must be the only sub-aggregation")
            val vf = col(req(r.getValue.get("rate"), "field", "rate").asText)
            return unlocalize(Aggs.dateHistogramRate(df, fieldLoc, vf.cast("decimal(12,2)")))
          case None => ()
        }
        // min_doc_count=0: empty buckets surface as zero rows — the spine
        // comes from the (tiny) bucket table's own bounds, never a second
        // fact scan (Aggs.dateHistogramFilled).
        if (Option(body.get("min_doc_count")).exists(_.asInt == 0)) {
          require(
            entries.size == 1 && entries.head.getValue.isObject,
            "min_doc_count=0 supports exactly one metric sub-aggregation"
          )
          return unlocalize(Aggs.dateHistogramFilled(df, fieldLoc, interval.get, roundedMetric(entries.head)))
        }
        // bucket_selector is the HAVING of the bucket world: it filters
        // the (tiny) bucket table by a script over sibling metrics and
        // emits no column of its own, per OpenSearch.
        val (selectorEntries, nonSelector) =
          entries.partition(e => e.getValue.isObject && e.getValue.fieldNames().next() == "bucket_selector")
        // bucket_sort re-ranks + truncates the bucket table by a metric —
        // applied LAST (after pipelines), a bounded TakeOrdered.
        val (sortEntries, nonSort) =
          nonSelector.partition(e => e.getValue.isObject && e.getValue.fieldNames().next() == "bucket_sort")
        val (pipeEntries, metricEntries) =
          nonSort.partition(e => e.getValue.isObject && pipelineTypes(e.getValue.fieldNames().next()))
        // Rich metric sub-aggs under the histogram (percentiles/boxplot/
        // extended_stats/cardinality): same one-hash-agg compilation as
        // the terms branch. Pipelines COMPOSE with them — a dotted
        // buckets_path ("price.50", OpenSearch's percentile-metric
        // syntax) selects one column of a multi-column sibling, and the
        // pipeline window then runs over the bucket table exactly as it
        // does over single-column metrics.
        val base0 =
          if (metricEntries.exists(e => richMetricTypes(e.getValue.fieldNames().next()))) {
            val (aggCols, postCols) = metricEntries.map(richMetric).unzip
            df.groupBy(date_trunc(interval.get, fieldLoc).as("bucket"))
              .agg(count(lit(1)).as("doc_count"), aggCols.flatten: _*)
              .select(col("bucket") +: col("doc_count") +: postCols.flatten: _*)
              .orderBy("bucket")
          } else {
            // Metric sub-aggs here follow the house money convention: `sum`
            // accumulates in exact DECIMAL (partition-order-proof — a double
            // sum's last-ulp wobble vs the oracle's is a hash mismatch) and
            // every metric rounds to the oracle's precision (sum/min/max 2,
            // avg 6), because pipeline columns derive from these values.
            val metricsCols = subAggs.toSeq.flatMap { a =>
              val pruned = a.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
              (pipeEntries ++ selectorEntries ++ sortEntries).foreach(e => pruned.remove(e.getKey))
              if (pruned.size == 0) Nil
              else
                pruned.fields().asScala.toSeq.map { e =>
                  val name = e.getKey
                  require(e.getValue.isObject && e.getValue.size == 1, s"metric '$name' must have exactly one type")
                  val mType = e.getValue.fieldNames().next()
                  val f = col(req(e.getValue.get(mType), "field", s"metric '$name' ($mType)").asText)
                  val c = mType match {
                    case "sum" => round(sum(f.cast("decimal(12,2)")).cast("double"), 2)
                    case _     => roundedMetricOf(mType, f)
                  }
                  c.as(name)
                }
            }
            Aggs.dateHistogram(df, fieldLoc, interval.get, metricsCols)
          }
        // The addressable metric columns of the bucket table — plain
        // metric names for single-column metrics, expanded names
        // (price_p50, box_q2, stats_std …) for rich ones. selectors,
        // sorts and pipelines all validate against this set.
        val metricNames = base0.columns.toSet - "bucket" - "doc_count"
        // buckets_path resolution: "_count" → doc_count; a plain sibling
        // name → its column; "name.50" / "name>50" / "name.p50" (the
        // OpenSearch dotted form into a percentiles metric) → name_p50;
        // "name.q2"-style suffixes address boxplot/extended_stats parts.
        def resolveBucketsPath(p: String, who: String): String = {
          if (p == "_count") "doc_count"
          else if (metricNames(p)) p
          else {
            val dotted = p.split("[.>]", 2) match {
              case Array(a, b0) =>
                val b = if (b0.endsWith(".0")) b0.dropRight(2) else b0
                // fractional percents ("price.99.9") must land on the
                // percentileName spelling (p99_9), not a literal dot
                val suffix = if (b.nonEmpty && b.head.isDigit) "p" + b.replace('.', '_') else b
                Some(s"${a}_$suffix")
              case _ => None
            }
            dotted.filter(metricNames).getOrElse(
              throw new IllegalArgumentException(
                s"$who buckets_path '$p' does not name a sibling metric, a rich-metric column, or _count"))
          }
        }
        val base = selectorEntries.foldLeft(base0) { (acc, e) =>
          acc.filter(bucketSelector(e.getValue.get("bucket_selector"), metricNames))
        }
        def applyBucketSort(in: DataFrame): DataFrame = sortEntries.foldLeft(in) { (acc, e) =>
          val spec = e.getValue.get("bucket_sort")
          val sortCols = req(spec, "sort", "bucket_sort").elements().asScala.toSeq.map { s0 =>
            require(s0.isObject && s0.size == 1, s"bucket_sort sort entries must have exactly one key: $s0")
            val f = s0.fieldNames().next()
            val v = s0.get(f)
            val desc = (if (v.isObject) req(v, "order", "bucket_sort sort").asText else v.asText) == "desc"
            require(f == "_key" || f == "bucket" || metricNames(f), s"bucket_sort sorts on unknown column '$f'")
            val c = if (f == "_key") col("bucket") else col(f)
            if (desc) c.desc else c.asc
          }
          val sorted0 = acc.orderBy(sortCols: _*)
          Option(spec.get("size")).map(n => sorted0.limit(n.asInt)).getOrElse(sorted0)
        }
        if (pipeEntries.isEmpty) unlocalize(applyBucketSort(base))
        else {
          val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
          val unbounded = w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow
          )
          val pipeCols = pipeEntries.map { e =>
            val name = e.getKey
            val pType = e.getValue.fieldNames().next()
            val spec = e.getValue.get(pType)
            // bucket_script's buckets_path is an OBJECT (var -> metric);
            // every other pipeline names a single sibling metric — or one
            // COLUMN of a rich sibling via the dotted form (price.50).
            val pathName =
              if (pType == "bucket_script") "_count"
              else req(spec, "buckets_path", s"pipeline '$name' ($pType)").asText
            val resolvedName = resolveBucketsPath(pathName, s"pipeline '$name' ($pType)")
            val src = col(resolvedName)
            pType match {
              case "cumulative_sum" => round(sum(src).over(unbounded), 2).as(name)
              case "derivative"     => round(src - lag(src, 1).over(w), 2).as(name)
              case "moving_avg" =>
                val win = Option(spec.get("window")).map(_.asInt).getOrElse(5)
                require(win > 0, s"moving_avg window must be positive: $win")
                round(avg(src).over(w.rowsBetween(-(win - 1), org.apache.spark.sql.expressions.Window.currentRow)), 6)
                  .as(name)
              // serial_diff at `lag`: the seasonal differencing pipeline.
              case "serial_diff" =>
                val l = Option(spec.get("lag")).map(_.asInt).getOrElse(1)
                require(l > 0, s"serial_diff lag must be positive: $l")
                round(src - lag(src, l).over(w), 2).as(name)
              // moving_fn, MovingFunctions.{max,min,sum,ewma} script forms —
              // the windowed reduction over trailing `window` buckets.
              case "moving_fn" =>
                val win = Option(spec.get("window")).map(_.asInt).getOrElse(5)
                require(win > 0, s"moving_fn window must be positive: $win")
                val script = req(spec, "script", "moving_fn").asText
                val w3 = w.rowsBetween(-(win - 1), org.apache.spark.sql.expressions.Window.currentRow)
                script match {
                  case s if s.contains("MovingFunctions.max") => round(max(src).over(w3), 2).as(name)
                  case s if s.contains("MovingFunctions.min") => round(min(src).over(w3), 2).as(name)
                  case s if s.contains("MovingFunctions.sum") => round(sum(src).over(w3), 2).as(name)
                  case s if s.contains("MovingFunctions.ewma") =>
                    // EWMA is a RECURSION — no window frame expresses it.
                    // Collect the trailing values per row (the bucket table
                    // is tens of rows) and left-fold: seed = first element,
                    // acc·(1−α) + y·α — the same fold DuckDB's list_reduce
                    // runs, so both engines produce bit-identical doubles.
                    val alpha = """ewma\(values,\s*([0-9.]+)\)""".r
                      .findFirstMatchIn(s)
                      .map(_.group(1).toDouble)
                      .getOrElse(throw new IllegalArgumentException(
                        s"ewma script must be MovingFunctions.ewma(values, <alpha>): $s"))
                    val arr = collect_list(src.cast("double")).over(w3)
                    round(
                      aggregate(
                        slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
                        element_at(arr, 1),
                        (acc, y) => y * lit(alpha) + acc * lit(1 - alpha)
                      ),
                      6
                    ).as(name)
                  case s =>
                    throw new IllegalArgumentException(
                      s"unsupported moving_fn script '$s' (supported: MovingFunctions.max/min/sum/ewma)"
                    )
                }
              // moving_percentiles: exact interpolated percentile of the
              // sibling metric over the trailing window (one pipeline
              // entry per percent — each emits one column).
              case "moving_percentiles" =>
                val win = Option(spec.get("window")).map(_.asInt).getOrElse(5)
                require(win > 0, s"moving_percentiles window must be positive: $win")
                val p = Option(spec.get("percent"))
                  .map(_.asDouble)
                  .orElse(Option(spec.get("percents")).flatMap { ps =>
                    val l = ps.elements().asScala.toSeq
                    if (l.size == 1) Some(l.head.asDouble) else None
                  })
                  .getOrElse(throw new IllegalArgumentException(
                    "moving_percentiles needs a single 'percent' (one pipeline entry per column)"))
                val wp = w.rowsBetween(-(win - 1), org.apache.spark.sql.expressions.Window.currentRow)
                round(expr(s"percentile($resolvedName, ${p / 100.0})").over(wp), 6).as(name)
              // bucket_script: per-bucket arithmetic over sibling metrics
              // (params.<a> <op> params.<b>) — runs over the bucket table.
              case "bucket_script" =>
                val paths = req(spec, "buckets_path", "bucket_script")
                require(paths.isObject, s"bucket_script buckets_path must be an object: $paths")
                val vars = paths.fields().asScala.map(en => en.getKey -> en.getValue.asText).toMap
                def ref(v: String): Column = {
                  val p = vars.getOrElse(v, throw new IllegalArgumentException(
                    s"bucket_script script variable '$v' is not in buckets_path"))
                  col(resolveBucketsPath(p, "bucket_script")).cast("double")
                }
                val script = req(spec, "script", "bucket_script").asText
                val pat = """^\s*params\.(\w+)\s*([*/+-])\s*params\.(\w+)\s*$""".r
                script match {
                  case pat(a, op, b) =>
                    val e = op match {
                      case "/" => ref(a) / ref(b)
                      case "*" => ref(a) * ref(b)
                      case "+" => ref(a) + ref(b)
                      case "-" => ref(a) - ref(b)
                    }
                    round(e, 6).as(name)
                  case _ =>
                    throw new IllegalArgumentException(
                      s"unsupported bucket_script '$script' (want: params.<a> <op> params.<b>)")
                }
              // normalize, percent_of_sum: each bucket's share of the
              // metric total — the total is a full-frame window over the
              // tiny bucket table, never the fact scan.
              case "normalize" =>
                val method = req(spec, "method", "normalize").asText
                require(method == "percent_of_sum", s"unsupported normalize method '$method'")
                val full = w.rowsBetween(
                  org.apache.spark.sql.expressions.Window.unboundedPreceding,
                  org.apache.spark.sql.expressions.Window.unboundedFollowing
                )
                round(src / sum(src).over(full) * 100.0, 6).as(name)
            }
          }
          // derivative with `unit`: OpenSearch emits a second
          // `normalized_value` = diff / x-axis distance in `unit`s. For
          // calendar buckets the distance is the real day gap between
          // bucket starts (months are 28-31 days — a constant divisor
          // would be wrong for 'day'), so the divisor is datediff over
          // the same 1-lag window the diff itself uses.
          val normCols = pipeEntries.flatMap { e =>
            val pType = e.getValue.fieldNames().next()
            val spec = e.getValue.get(pType)
            if (pType == "derivative" && spec.hasNonNull("unit")) {
              val unit = spec.get("unit").asText
              require(unit == "day" || unit == "1d", s"derivative unit '$unit' unsupported (day/1d)")
              val pathName = req(spec, "buckets_path", "derivative").asText
              val src = col(resolveBucketsPath(pathName, "derivative (unit)"))
              Seq(
                round(
                  (src - lag(src, 1).over(w)) /
                    datediff(col("bucket"), lag(col("bucket"), 1).over(w)),
                  6
                ).as(s"${e.getKey}_normalized"))
            } else Nil
          }
          unlocalize(applyBucketSort(base.select(col("*") +: (pipeCols ++ normCols): _*).orderBy("bucket")))
        }
      case "stats"          => Aggs.stats(df, field)
      case "extended_stats" => Aggs.extendedStats(df, field)
      case "cardinality" => Aggs.cardinality(df, Seq(aggName -> field))
      case "histogram" =>
        // metric sub-aggs ride the same hash aggregate (previously they
        // were silently dropped here — the degradation class the
        // strict-options rule bans)
        val metrics = subAggs.map(sa => sa.fields().asScala.toSeq.map(roundedMetric)).getOrElse(Nil)
        // min_doc_count ≥ 1 is a bucket HAVING (r17 strict-options fix:
        // previously read nowhere here — silently unfiltered); 0 means
        // OpenSearch's empty-bucket fill, which the numeric histogram
        // doesn't implement — reject, don't no-op.
        val histMinDc = Option(body.get("min_doc_count")).map(_.asLong).getOrElse(1L)
        require(
          histMinDc >= 1L,
          "histogram min_doc_count=0 (empty-bucket fill) is unsupported — occupied buckets only"
        )
        Aggs.histogramWith(
          df,
          field,
          req(body, "interval", "histogram").asDouble,
          metrics,
          Option(body.get("offset")).map(_.asDouble).getOrElse(0.0),
          histMinDc
        )
      case "range" =>
        val ranges = req(body, "ranges", "range aggregation").elements().asScala.toSeq.map { r =>
          val from = Option(r.get("from")).map(_.asDouble)
          val to = Option(r.get("to")).map(_.asDouble)
          val key = Option(r.get("key"))
            .map(_.asText)
            .getOrElse(s"${from.map(_.toString).getOrElse("*")}-${to.map(_.toString).getOrElse("*")}")
          (key, from, to)
        }
        // metric sub-aggs ride the same hash aggregate (r17 — previously
        // silently dropped here, the histogram fix's twin)
        Aggs.rangeAgg(df, field, ranges, subAggs.map(sa => sa.fields().asScala.toSeq.map(roundedMetric)).getOrElse(Nil))
      case "date_range" =>
        val ranges = req(body, "ranges", "date_range aggregation").elements().asScala.toSeq.map { r =>
          val from = Option(r.get("from")).map(_.asText)
          val to = Option(r.get("to")).map(_.asText)
          val key = Option(r.get("key"))
            .map(_.asText)
            .getOrElse(s"${from.getOrElse("*")}-${to.getOrElse("*")}")
          (key, from, to)
        }
        Aggs.dateRangeAgg(
          df,
          field,
          ranges,
          Option(body.get("time_zone")).map(_.asText),
          subAggs.map(sa => sa.fields().asScala.toSeq.map(roundedMetric)).getOrElse(Nil)
        )
      case "top_metrics" =>
        val ms = req(body, "metrics", "top_metrics")
        val metricList = (if (ms.isArray) ms.elements().asScala.toSeq else Seq(ms)).map { m =>
          val f = req(m, "field", "top_metrics metric").asText
          f -> col(f)
        }
        val sortSpec = req(body, "sort", "top_metrics")
        require(sortSpec.isObject && sortSpec.size == 1, s"top_metrics sort must have exactly one key: $sortSpec")
        val sortField = sortSpec.fieldNames().next()
        Aggs.topMetrics(df, metricList, col(sortField), sortSpec.get(sortField).asText == "desc")
      case "rare_terms" =>
        Aggs.rareTerms(df, field, Option(body.get("max_doc_count")).map(_.asLong).getOrElse(1L))
      case "composite" =>
        val sources = req(body, "sources", "composite").elements().asScala.toSeq.map { s =>
          val n = singleField(s)
          val t = s.get(n)
          val terms = req(t, "terms", s"composite source '$n'")
          // missing_bucket/order would change bucket membership or walk
          // order — unimplemented options must fail, not silently skew.
          strictOpts(t, "terms", s"composite source '$n'", Set("field"))
          (n, col(req(terms, "field", s"composite source '$n'").asText))
        }
        val after = Option(body.get("after"))
          .map(a => sources.map { case (n, _) => req(a, n, "composite after").asText })
        Aggs.compositePage(
          df,
          sources.map(_._2),
          after,
          Option(body.get("size")).map(_.asInt).getOrElse(10)
        )
      case "adjacency_matrix" =>
        val specs = req(body, "filters", "adjacency_matrix aggregation")
        val conds = specs.fields().asScala.toSeq.map(e => e.getKey -> compileQuery(df, e.getValue, mapping))
        require(conds.nonEmpty, s"adjacency_matrix needs at least one named filter: $body")
        Aggs.adjacencyMatrix(df, conds)
      case "auto_date_histogram" =>
        Aggs.autoDateHistogram(df, field, Option(body.get("buckets")).map(_.asInt).getOrElse(10))
      case "boxplot"                   => Aggs.boxplot(df, field)
      case "median_absolute_deviation" => Aggs.medianAbsoluteDeviation(df, field)
      case "string_stats"              => Aggs.stringStats(df, field)
      case "filters" =>
        // Named filter buckets in ONE pass (conditional counts), not one
        // scan per filter. other_bucket adds the complement column in the
        // same conditional aggregation.
        val specs = req(body, "filters", "filters aggregation")
        val conds = specs.fields().asScala.toSeq.map(e => e.getKey -> compileQuery(df, e.getValue, mapping))
        require(conds.nonEmpty, s"filters aggregation needs at least one named filter: $body")
        if (Option(body.get("other_bucket")).exists(_.asBoolean)) {
          val noneMatch = conds.map { case (_, c) => !c }.reduce(_ && _)
          val cols = conds.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) } :+
            sum(when(noneMatch, 1L).otherwise(0L)).as("other_bucket")
          df.agg(cols.head, cols.tail: _*)
        } else Aggs.filteredCounts(df, conds)
      case "percentiles" =>
        val ps = Option(body.get("percents"))
          .map(_.elements().asScala.toSeq.map(_.asDouble))
          .getOrElse(Seq(50.0, 90.0, 99.0))
        Aggs.percentiles(df, field, ps.map(p => percentileName(p) -> p / 100.0))
      // percentile_ranks: the inverse of percentiles — the fraction of
      // docs at or below each given value; columns named pr_<value>.
      case "percentile_ranks" =>
        val vs = req(body, "values", "percentile_ranks").elements().asScala.toSeq.map(_.asDouble)
        require(vs.nonEmpty, "percentile_ranks needs at least one value")
        val cols = vs.map { v =>
          val nm = if (v == math.rint(v)) s"pr_${v.toLong}" else s"pr_$v".replace('.', '_')
          round(avg((field <= lit(v)).cast("double")), 6).as(nm)
        }
        df.agg(cols.head, cols.tail: _*)
      // multi_terms: compound bucket key (k0..kn), top-size by count.
      case "multi_terms" =>
        val fs = req(body, "terms", "multi_terms")
          .elements()
          .asScala
          .toSeq
          .map(t => col(req(t, "field", "multi_terms term").asText))
        require(fs.size >= 2, s"multi_terms needs at least two fields")
        Aggs.multiTerms(df, fs, Option(body.get("size")).map(_.asInt).getOrElse(10))
      // weighted_avg: sum(value·weight)/sum(weight), both sums exact
      // decimal (the house money convention) so engines agree.
      case "weighted_avg" =>
        val vf = col(req(req(body, "value", "weighted_avg"), "field", "weighted_avg.value").asText)
        val wf = col(req(req(body, "weight", "weighted_avg"), "field", "weighted_avg.weight").asText)
        Aggs.weightedAvg(df, vf.cast("decimal(12,2)"), wf.cast("decimal(12,2)"))
      case "geohash_grid" =>
        // Geohash density cells over a struct field carrying the integer
        // hundredth-degree grid (la100/lo100) every geo entry derives;
        // Aggs.geohash is the shared encoder and honors the request's
        // "precision" (default 5, the OpenSearch default).
        val f = req(body, "field", "geohash_grid").asText
        val size = Option(body.get("size")).map(_.asInt).getOrElse(20)
        val precision = Option(body.get("precision")).map(_.asInt).getOrElse(5)
        // missing points bucket nowhere (family rule)
        df.filter(col(f).isNotNull).groupBy(
          Aggs.geohash(col(f).getField("la100"), col(f).getField("lo100"), precision).as("geohash")
        ).agg(count(lit(1)).as("doc_count"))
          .orderBy(col("doc_count").desc, col("geohash"))
          .limit(size)
      case "geotile_grid" =>
        // Degree-grid density cells over a struct geo field (precision =
        // cell size in degrees here; OpenSearch's zoom levels are a
        // power-of-two reparameterization of the same floor-binning).
        val f = req(body, "field", "geotile_grid").asText
        val cell = Option(body.get("precision")).map(_.asDouble).getOrElse(15.0)
        // missing points bucket nowhere (family rule)
        df.filter(col(f).isNotNull).groupBy(
          floor(col(f).getField("lat") / cell).cast("long").as("cell_y"),
          floor(col(f).getField("lon") / cell).cast("long").as("cell_x")
        ).agg(count(lit(1)).as("doc_count"))
          .orderBy(col("doc_count").desc, col("cell_y"), col("cell_x"))
          .limit(Option(body.get("size")).map(_.asInt).getOrElse(10))
      case "geo_centroid" =>
        val f = req(body, "field", "geo_centroid").asText
        // docs missing the point are excluded from count AND sums (the
        // metric-agg form of the null rule: the decimal sums skip NULLs
        // by themselves, so count(*) would be a wrong denominator)
        df.filter(col(f).isNotNull).agg(
          round(sum(col(f).getField("lat").cast("decimal(9,2)")).cast("double") / count(lit(1)), 6)
            .as("centroid_lat"),
          round(sum(col(f).getField("lon").cast("decimal(9,2)")).cast("double") / count(lit(1)), 6)
            .as("centroid_lon"),
          count(lit(1)).as("doc_count")
        )
      case "scripted_metric" =>
        Aggs.scriptedMetric(
          df,
          req(body, "map_script", "scripted_metric").asText,
          req(body, "reduce_script", "scripted_metric").asText
        )
      case "t_test" =>
        // Welch's unpaired t_test: two filter-defined populations of one
        // field, exact-decimal moments in one conditional scan (Aggs.tTest).
        def side(key: String): (Column, Column) = {
          val s = req(body, key, "t_test")
          (col(req(s, "field", s"t_test '$key'").asText), compileQuery(df, req(s, "filter", s"t_test '$key'"), mapping))
        }
        val (fa, condA) = side("a")
        val (fb, condB) = side("b")
        require(
          fa.toString == fb.toString,
          s"t_test sides must aggregate the same field, got $fa / $fb"
        )
        Aggs.tTest(df, fa, condA, condB)
      case "avg" | "sum" | "min" | "max" | "value_count" =>
        // Top-level single-metric aggregation: one row named after the agg.
        df.agg(roundedMetricOf(typeName, field).as(aggName))
      // categorize_text (log-pattern grouping, the deterministic core):
      // bucket by the leading-trigram signature of the analyzed text.
      case "categorize_text" =>
        val size = Option(body.get("size")).map(_.asInt).getOrElse(10)
        // missing texts bucket nowhere — concat_ws never returns NULL, so
        // without the filter every null doc lands in a phantom "" pattern
        df.filter(field.isNotNull)
          .select(concat_ws(" ", slice(SearchDsl.analyze(field), 1, 3)).as("pattern"))
          .groupBy("pattern")
          .agg(count(lit(1)).as("doc_count"))
          .orderBy(col("doc_count").desc, col("pattern"))
          .limit(size)
      case "variable_width_histogram" =>
        Aggs.variableWidthHistogram(df, field, Option(body.get("buckets")).map(_.asInt).getOrElse(10))
      // ip_prefix: dotted-quad string → 32-bit value with integer
      // arithmetic, mask to the prefix, re-render the network — one
      // projection + one hash agg. An optional cardinality sub-agg adds
      // an exact distinct count per prefix.
      case "ip_prefix" =>
        val len = Option(body.get("prefix_length")).map(_.asInt).getOrElse(16)
        val size = Option(body.get("size")).map(_.asInt).getOrElse(20)
        // strict options: is_ipv6 would silently change the address space
        val extraOpts =
          body.fieldNames().asScala.toSet -- Set("field", "prefix_length", "size", "is_ipv6")
        require(extraOpts.isEmpty, s"ip_prefix: unsupported options $extraOpts")
        require(
          !Option(body.get("is_ipv6")).exists(_.asBoolean),
          "ip_prefix supports is_ipv6=false only (the engine's address model is 32-bit)"
        )
        val extra = subAggs.toSeq.flatMap(_.fields().asScala.toSeq).map { e =>
          val t = e.getValue.fieldNames().next()
          require(t == "cardinality", s"ip_prefix sub-aggregation must be cardinality, got '$t'")
          countDistinct(col(req(e.getValue.get("cardinality"), "field", "cardinality").asText)).as(e.getKey)
        }
        Aggs.ipPrefixAgg(df, ipNum(field), len, size, extra)
      // ip_range: labeled ranges over the 32-bit address value — the
      // standard rangeAgg plan (one CASE projection, k-row hash agg).
      case "ip_range" =>
        def ipToNum(s: String): Double =
          s.split("\\.").foldLeft(0L)((a, o) => a * 256 + o.toLong).toDouble
        val ranges = req(body, "ranges", "ip_range").elements().asScala.toSeq.map { r =>
          val from = Option(r.get("from")).map(n => ipToNum(n.asText))
          val to = Option(r.get("to")).map(n => ipToNum(n.asText))
          val key = Option(r.get("key"))
            .map(_.asText)
            .getOrElse(s"${from.map(_.toString).getOrElse("*")}-${to.map(_.toString).getOrElse("*")}")
          (key, from, to)
        }
        // One projection computes the address value; rangeAgg's CASE
        // references the materialized column, not the 4-way split, per
        // range bound.
        Aggs.rangeAgg(df.withColumn("_ipnum", ipNum(field).cast("double")), col("_ipnum"), ranges)
      // geo_distance AGGREGATION (ring buckets around an origin) — the
      // same fixed-factor equirectangular km metric as the structured
      // rings entry; bucketing is a per-row when-chain projection into a
      // ≤k-row hash agg. Ring keys follow OpenSearch "*-1000.0" naming.
      case "geo_distance" =>
        val f = req(body, "field", "geo_distance aggregation").asText
        val origin = req(body, "origin", "geo_distance aggregation")
        val olat = req(origin, "lat", "geo_distance origin").asDouble
        val olon = req(origin, "lon", "geo_distance origin").asDouble
        val ranges = req(body, "ranges", "geo_distance aggregation").elements().asScala.toSeq.map { r =>
          (Option(r.get("from")).map(_.asDouble), Option(r.get("to")).map(_.asDouble))
        }
        require(ranges.nonEmpty, "geo_distance aggregation needs at least one range")
        val dlat = col(f).getField("lat") - lit(olat)
        val dlon = (col(f).getField("lon") - lit(olon)) * lit(0.7071067811865476)
        val dist = sqrt(dlat * dlat + dlon * dlon) * lit(111.195)
        val ringCol = ranges.foldRight(lit(null).cast("string")) { case ((from, to), acc) =>
          val cond = (from.map(b => dist >= lit(b)) ++ to.map(b => dist < lit(b)))
            .reduceOption(_ && _)
            .getOrElse(lit(true))
          val label = s"${from.map(_.toString).getOrElse("*")}-${to.map(_.toString).getOrElse("*")}"
          when(cond, lit(label)).otherwise(acc)
        }
        df.withColumn("ring", ringCol)
          .filter(col("ring").isNotNull)
          .groupBy("ring")
          .agg(count(lit(1)).as("doc_count"))
          .orderBy("ring")
      // frequent_item_sets (pair tier): market-basket pairs over
      // `basket.fields`-keyed transactions of DISTINCT items. The
      // self-join fans out C(|basket|,2) pairs per basket — bounded by
      // the item vocabulary, not the event count.
      case "frequent_item_sets" =>
        val itemFields = req(body, "fields", "frequent_item_sets").elements().asScala.toSeq
        require(itemFields.size == 1, "frequent_item_sets supports one item field (pair tier)")
        val item = req(itemFields.head, "field", "frequent_item_sets field").asText
        val basketCols = Option(body.get("basket"))
          .map(b => req(b, "fields", "frequent_item_sets basket").elements().asScala.toSeq.map(_.asText))
          .getOrElse(throw new IllegalArgumentException(
            "frequent_item_sets needs basket.fields (the transaction key)"))
        require(basketCols.nonEmpty, "frequent_item_sets basket.fields is empty")
        val minSize = Option(body.get("minimum_set_size")).map(_.asInt).getOrElse(2)
        require(minSize == 2, s"pair tier: minimum_set_size must be 2, got $minSize")
        val size = Option(body.get("size")).map(_.asInt).getOrElse(10)
        val baskets = df.select(basketCols.map(col) :+ col(item): _*).distinct()
        val nBaskets = baskets.select(basketCols.map(col): _*).distinct().agg(count(lit(1)).as("_n"))
        baskets
          .as("a")
          .join(baskets.as("b"), basketCols)
          .filter(col(s"a.$item") < col(s"b.$item"))
          .groupBy(col(s"a.$item").as("item1"), col(s"b.$item").as("item2"))
          .agg(count(lit(1)).as("pair_count"))
          .crossJoin(broadcast(nBaskets))
          .select(
            col("item1"),
            col("item2"),
            col("pair_count"),
            round(col("pair_count") / col("_n"), 6).as("support")
          )
          .orderBy(col("pair_count").desc, col("item1"), col("item2"))
          .limit(size)
      case other => throw new IllegalArgumentException(s"unsupported aggregation '$other'")
    }
  }

  /** One named suggester: `term` → [[Fuzzy.suggest]] (vocabulary +
    * bounded edit distance, frequency-ranked), `completion` → prefix
    * leaders over the analyzed tokens. Both are corpus-vocabulary plans:
    * the suggestion table is |vocab|-scale, never per-document state.
    */
  private def compileSuggest(df: DataFrame, spec: JsonNode): DataFrame =
    if (spec.has("term")) {
      val t = spec.get("term")
      val field = req(t, "field", "term suggester").asText
      val text = req(spec, "text", "term suggester").asText
      val maxEdits = Option(t.get("max_edits")).map(_.asInt).getOrElse(2)
      val size = Option(t.get("size")).map(_.asInt).getOrElse(5)
      Fuzzy.suggest(df, field, text, maxEdits, size)
    } else if (spec.has("completion")) {
      val c = spec.get("completion")
      val field = req(c, "field", "completion suggester").asText
      val prefix = req(spec, "prefix", "completion suggester").asText
      val size = Option(c.get("size")).map(_.asInt).getOrElse(5)
      df.select(explode(SearchDsl.analyze(col(field))).as("tok"))
        .filter(col("tok").startsWith(prefix))
        .groupBy("tok")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok"))
        .limit(size)
        .select(col("tok").as("suggestion"), col("freq"))
    } else if (spec.has("phrase")) {
      // phrase suggester: per-position vocabulary corrections composed
      // into candidate phrases, ranked by corpus bigram frequency with
      // unigram backoff (Fuzzy.suggestPhrase — two-term phrases).
      val p = spec.get("phrase")
      val field = req(p, "field", "phrase suggester").asText
      val text = req(spec, "text", "phrase suggester").asText
      val terms = text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      val maxEdits = Option(p.get("max_errors")).map(_.asInt).getOrElse(2)
      val size = Option(p.get("size")).map(_.asInt).getOrElse(5)
      Fuzzy.suggestPhrase(df, field, terms, maxEdits, size)
    } else
      throw new IllegalArgumentException(s"unsupported suggester (want term, phrase, or completion): $spec")

  /** 32-bit numeric value of a dotted-quad IPv4 string column — integer
    * arithmetic over ONE split + a HOF fold, so every engine
    * materializes the identical long. Four getItem references would
    * re-embed the regex split per octet (measured 6× slower end-to-end
    * in the wire ip_range twin).
    */
  private def ipNum(ip: Column): Column =
    aggregate(split(ip, "\\."), lit(0L), (acc, o) => acc * 256L + o.cast("long"))

  private def percentileName(p: Double): String =
    if (p == p.floor) s"p${p.toInt}" else s"p${p.toString.replace('.', '_')}"

  /** Rounded metric conventions (match the DuckDB oracle hashing): money
    * sums/extrema → 2 dp; ratios (avg) → 6 dp; counts exact. The
    * date_histogram sub-metric path keeps raw metrics for plan parity with
    * direct [[Aggs.dateHistogram]] callers.
    */
  private def roundedMetricOf(mType: String, f: Column): Column = mType match {
    case "sum"         => round(sum(f), 2)
    case "avg"         => round(avg(f), 6)
    case "min"         => round(min(f), 2)
    case "max"         => round(max(f), 2)
    case "value_count" => count(f)
    case other         => throw new IllegalArgumentException(s"unsupported metric aggregation '$other'")
  }

  /** Metric sub-aggregation types that expand to MORE than one output
    * column (percentiles/boxplot/extended_stats) or need a dedicated
    * aggregate (cardinality) — OpenSearch allows the full metric set
    * under any bucketing agg, so the wire executor's under-bucket set
    * matches the top-level set.
    */
  private val richMetricTypes: Set[String] = Set("percentiles", "boxplot", "extended_stats", "cardinality")

  /** One metric sub-aggregation entry → (aggregate columns, post-agg
    * projections). ALL of a request's metrics — however many columns
    * they expand to — ride ONE hash aggregate over the fact scan
    * (grouped percentiles is an array-percentile per group, never a
    * second scan, a join, or k independent percentile buffers), and the
    * post projection runs on the bucket table. Naming: percentiles emit
    * `<name>_p<percent>`, boxplot `<name>_{min,q1,q2,q3,max}`,
    * extended_stats `<name>_{count,sum,avg,variance,std}` (POPULATION
    * semantics, derived from exact decimal moments in a fixed double
    * tree — one convention across the extended_stats family).
    *
    * Sketch tier: `"approx": true` inside a percentiles/boxplot spec
    * selects grouped `approx_percentile` (GK sketch, accuracy 10000) —
    * the blessed 100 TB path. Exact grouped `percentile()` buffers one
    * bucket's ENTIRE value set in one aggregation buffer, so a hot
    * `terms` key (10⁹ rows behind one group at 100 TB) is the same
    * unbounded-buffer hazard the top-level twins retired; the sketch
    * keeps every group's buffer O(accuracy) and mergeable map-side.
    * Same output columns, same one-hash-agg plan; per-bucket rank-band
    * replica contracts in ReplicaSpec.
    */
  private def richMetric(e: java.util.Map.Entry[String, JsonNode]): (Seq[Column], Seq[Column]) = {
    val name = e.getKey
    require(e.getValue.isObject && e.getValue.size == 1, s"metric '$name' must have exactly one type")
    val mType = e.getValue.fieldNames().next()
    val spec = e.getValue.get(mType)
    // strict-options rule: the rich tier's sketch/decimal pipelines don't
    // implement the per-metric missing substitution — reject loudly
    // rather than compute the unsubstituted answer under the option's name
    require(
      spec.get("missing") == null,
      s"metric '$name' ($mType): per-metric 'missing' is unsupported on the $mType tier"
    )
    val f = col(req(spec, "field", s"metric '$name' ($mType)").asText)
    val approx = Option(spec.get("approx")).exists(_.asBoolean)
    // Grouped sketch accuracy 2000 (rank error ≤ 5e-4): the per-GROUP
    // buffer is accuracy-sized and every bucket pays it in each partial,
    // so the top-level twins' 10000 would multiply across buckets for
    // precision far beyond the asserted 0.005 rank band (and beyond
    // OpenSearch's own tdigest default). Measured: the monthly-spine
    // twin at 10000 cost 3.3 s isolated at sf0.1; 2000 keeps the
    // ReplicaSpec band with 10× margin at a fraction of the merge work.
    def ranks(ps: Seq[Double]): Column =
      if (approx) approx_percentile(f, lit(ps.toArray), lit(2000))
      else graft.functions.ExactPercentileAgg.exactPercentile(f, ps)
    mType match {
      case "percentiles" =>
        val ps = Option(spec.get("percents"))
          .map(_.elements().asScala.toSeq.map(_.asDouble))
          .getOrElse(Seq(50.0, 90.0, 99.0)) // the top-level percentiles handler's default set
        val arr = ranks(ps.map(_ / 100.0)).as(s"_${name}_ps")
        val posts = ps.zipWithIndex.map { case (p, i) =>
          round(element_at(col(s"_${name}_ps"), i + 1), 6).as(s"${name}_${percentileName(p)}")
        }
        (Seq(arr), posts)
      case "boxplot" =>
        val aggs = Seq(
          round(min(f), 2).as(s"_${name}_min"),
          ranks(Seq(0.25, 0.5, 0.75)).as(s"_${name}_qs"),
          round(max(f), 2).as(s"_${name}_max")
        )
        val posts = Seq(
          col(s"_${name}_min").as(s"${name}_min"),
          round(element_at(col(s"_${name}_qs"), 1), 6).as(s"${name}_q1"),
          round(element_at(col(s"_${name}_qs"), 2), 6).as(s"${name}_q2"),
          round(element_at(col(s"_${name}_qs"), 3), 6).as(s"${name}_q3"),
          col(s"_${name}_max").as(s"${name}_max")
        )
        (aggs, posts)
      case "cardinality" =>
        // "approx": true → HLL++ (the sketch OpenSearch itself runs):
        // no distinct-expand, no second shuffle, bounded registers —
        // the coherent pairing for a sketch-tier request (an exact
        // count_distinct alongside grouped approx_percentile would
        // reintroduce the expand + re-shuffle the sketch tier avoids).
        if (approx) (Seq(approx_count_distinct(f).as(name)), Seq(col(name)))
        else (Seq(count_distinct(f).as(name)), Seq(col(name)))
      case "extended_stats" =>
        // exact decimal moments (2dp money → 4dp squares, decimal sums
        // exact) → fixed double tree: both engines agree bitwise.
        val d = f.cast("decimal(12,2)")
        val aggs = Seq(
          count(f).as(s"_${name}_n"),
          sum(d).as(s"_${name}_s"),
          sum(d * d).as(s"_${name}_ss")
        )
        val n = col(s"_${name}_n")
        val s = col(s"_${name}_s").cast("double")
        val ss = col(s"_${name}_ss").cast("double")
        val variance = (ss - s * s / n) / n
        val posts = Seq(
          n.as(s"${name}_count"),
          round(s, 2).as(s"${name}_sum"),
          round(s / n, 6).as(s"${name}_avg"),
          // variance magnitudes (money²) put a 6dp quantum BELOW the
          // double ulp — engine-divergent noise; 2dp stays ≫ ulp.
          round(variance, 2).as(s"${name}_variance"),
          round(sqrt(variance), 6).as(s"${name}_std")
        )
        (aggs, posts)
      case "sum" =>
        // exact-decimal accumulation (partition-order-proof) — the same
        // guarantee the non-rich date_histogram metric path gives, kept
        // when a plain sum rides next to a rich metric.
        (Seq(round(sum(f.cast("decimal(12,2)")).cast("double"), 2).as(name)), Seq(col(name)))
      case single =>
        (Seq(roundedMetricOf(single, f).as(name)), Seq(col(name)))
    }
  }

  /** The exact-decimal avg metric (sum(decimal)/count, round 6) — the
    * partition-order-proof form used wherever the oracle compares a
    * money-field mean (global / missing / parent handlers). Only `avg`
    * is accepted: the callers' contract is means over 2dp-exact fields.
    */
  private def decimalAvgMetric(e: java.util.Map.Entry[String, JsonNode]): Column = {
    require(
      e.getValue.isObject && e.getValue.size == 1 && e.getValue.has("avg"),
      s"only avg metrics are supported here, got: ${e.getValue}"
    )
    // strict-options rule: the decimal pipeline doesn't substitute —
    // reject rather than silently ignore the option
    require(
      e.getValue.get("avg").get("missing") == null,
      s"metric '${e.getKey}': per-metric 'missing' is unsupported on the decimal-avg tier"
    )
    val f = col(req(e.getValue.get("avg"), "field", s"metric '${e.getKey}'").asText)
    round(sum(f.cast("decimal(12,2)")).cast("double") / count(lit(1)), 6).as(e.getKey)
  }

  /** The metric's value source: `field`, with the per-METRIC `missing:`
    * substitution applied when present (OpenSearch: a metric-level
    * missing treats docs without the field as the given value — distinct
    * from the bucket-level missing, which substitutes the GROUP key).
    * r17 strict-options fix: this key was read nowhere on the simple
    * metric path, so `"avg": {"field": f, "missing": v}` silently
    * computed the plain avg — exactly the silently-no-op class the
    * AggsFuzzSpec sweep now hunts.
    */
  private def metricSource(spec: JsonNode, who: String): Column = {
    val f = col(req(spec, "field", who).asText)
    Option(spec.get("missing")).map(m => coalesce(f, lit(scalarValue(m)))).getOrElse(f)
  }

  private def roundedMetric(e: java.util.Map.Entry[String, JsonNode]): Column = {
    val name = e.getKey
    require(e.getValue.isObject && e.getValue.size == 1, s"metric '$name' must have exactly one type")
    val mType = e.getValue.fieldNames().next()
    val f = metricSource(e.getValue.get(mType), s"metric '$name' ($mType)")
    roundedMetricOf(mType, f).as(name)
  }

  /** Metric sub-aggregations nested under a bucketing agg: each compiles
    * to an aliased aggregate column fed to the bucket builder.
    */
  private def metricColumns(aggs: JsonNode): Seq[Column] =
    aggs.fields().asScala.toSeq.map { e =>
      val name = e.getKey
      require(e.getValue.isObject && e.getValue.size == 1, s"metric '$name' must have exactly one type")
      val mType = e.getValue.fieldNames().next()
      val f = metricSource(e.getValue.get(mType), s"metric '$name' ($mType)")
      val c = mType match {
        case "sum"         => sum(f)
        case "avg"         => avg(f)
        case "min"         => min(f)
        case "max"         => max(f)
        case "value_count" => count(f)
        case other         => throw new IllegalArgumentException(s"unsupported metric aggregation '$other'")
      }
      c.as(name)
    }

  // ── Hits shaping ──────────────────────────────────────────────────────

  /** Sort entries as (field, ascending) pairs — shared by the orderBy
    * compiler and the search_after cursor predicate.
    */
  private def sortSpecs(sort: JsonNode): Seq[(String, Boolean)] = {
    val entries = if (sort.isArray) sort.elements().asScala.toSeq else Seq(sort)
    entries.map {
      case s if s.isTextual => (s.asText, true)
      case s if s.isObject && s.size == 1 =>
        val f = s.fieldNames().next()
        val spec = s.get(f)
        val order =
          if (spec.isTextual) spec.asText
          else Option(spec.get("order")).map(_.asText).getOrElse("asc")
        (f, order != "desc")
      case s => throw new IllegalArgumentException(s"unsupported sort entry: $s")
    }
  }

  private def compileSort(sort: JsonNode): Seq[Column] = {
    val entries = if (sort.isArray) sort.elements().asScala.toSeq else Seq(sort)
    entries.map {
      // _script sort: the compiled arithmetic subset as the sort key — a
      // pure projection under TakeOrderedAndProject, never a UDF
      // comparator. Not valid as a search_after/collapse cursor key
      // (sortSpecs still rejects it there: a cursor needs a stored
      // field to build the seek predicate from).
      case s if s.isObject && s.size == 1 && s.fieldNames().next() == "_script" =>
        val spec = s.get("_script")
        val scriptNode = req(spec, "script", "_script sort")
        val src =
          if (scriptNode.isTextual) scriptNode.asText
          else req(scriptNode, "source", "_script sort").asText
        val c = ScriptExpr.compile(src)
        if (Option(spec.get("order")).map(_.asText).contains("desc")) c.desc else c.asc
      case s =>
        val Seq((f, asc)) = sortSpecs(s)
        if (asc) col(f).asc else col(f).desc
    }
  }

  /** Compile a `bucket_selector` script into a bucket-table predicate.
    * The script grammar is constrained to `params.<var> <op> <number>`
    * (the overwhelmingly common form); `buckets_path` maps each script
    * variable onto a sibling metric name or `_count`.
    */
  private def bucketSelector(spec: JsonNode, metricNames: Set[String]): Column = {
    val paths = req(spec, "buckets_path", "bucket_selector")
    require(paths.isObject, s"bucket_selector buckets_path must be an object: $paths")
    val vars = paths.fields().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    val script = req(spec, "script", "bucket_selector").asText
    val pattern = """^\s*params\.(\w+)\s*(>=|<=|==|!=|>|<)\s*(-?\d+(?:\.\d+)?)\s*$""".r
    script match {
      case pattern(v, op, num) =>
        val path = vars.getOrElse(
          v,
          throw new IllegalArgumentException(s"bucket_selector script variable '$v' is not in buckets_path")
        )
        require(
          path == "_count" || metricNames(path),
          s"bucket_selector buckets_path '$path' does not name a sibling metric or _count"
        )
        val c = if (path == "_count") col("doc_count") else col(path)
        val n = lit(num.toDouble)
        op match {
          case ">"  => c > n
          case ">=" => c >= n
          case "<"  => c < n
          case "<=" => c <= n
          case "==" => c === n
          case "!=" => c =!= n
        }
      case _ =>
        throw new IllegalArgumentException(
          s"unsupported bucket_selector script '$script' (want: params.<var> <op> <number>)"
        )
    }
  }

  /** Rows strictly after the cursor in the sort order: the standard
    * lexicographic-tuple expansion
    * `(k1 after v1) OR (k1 = v1 AND k2 after v2) OR ...` — each leg is a
    * plain comparison Catalyst can push into the scan.
    */
  private def afterPredicate(specs: Seq[(String, Boolean)], vals: Seq[Any]): Column =
    specs.indices
      .map { i =>
        val ties = (0 until i).map(j => col(specs(j)._1) === lit(vals(j)))
        val (f, asc) = specs(i)
        val cmp = if (asc) col(f) > lit(vals(i)) else col(f) < lit(vals(i))
        (ties :+ cmp).reduce(_ && _)
      }
      .reduce(_ || _)

  /** One snippet column per highlighted field: a window of `fragment_size`
    * chars starting shortly before the first occurrence of the field's
    * (first) query term; null when the term does not literally occur —
    * OpenSearch omits the highlight for such hits.
    */
  private def compileHighlight(h: JsonNode, query: Option[JsonNode]): Seq[Column] = {
    val fields = req(h, "fields", "highlight")
    fields.fields().asScala.toSeq.map { e =>
      val f = e.getKey
      val fragSize = Option(e.getValue.get("fragment_size")).map(_.asInt).getOrElse(100)
      val terms = query.toSeq.flatMap(queryTerms(_, f))
      require(terms.nonEmpty, s"highlight on '$f' needs a match/match_phrase/term clause on '$f'")
      val pos = locate(terms.head, col(f))
      when(pos > 0, col(f).substr(greatest(pos - 15, lit(1)), lit(fragSize)))
        .as(s"${f}_highlight")
    }
  }

  /** The literal term(s) the query applies to field `f` — what highlight
    * marks up. Walks bool trees; match contributes its first analyzed
    * token, match_phrase/term/prefix their literal value.
    */
  private def queryTerms(node: JsonNode, f: String): Seq[String] = {
    val name = node.fieldNames().next()
    val body = node.get(name)
    name match {
      case "match" if body.has(f) =>
        val (_, v) = fieldAndValue(body, "query")
        v.asText.split("\\s+").toSeq.take(1)
      case "match_phrase" | "term" | "prefix" if body.has(f) =>
        val (_, v) = fieldAndValue(body, if (name == "match_phrase") "query" else "value")
        Seq(v.asText)
      case "bool" =>
        Seq("must", "filter", "should").flatMap(k => clauseList(body, k).flatMap(queryTerms(_, f)))
      case _ => Nil
    }
  }

  // ── JSON helpers ──────────────────────────────────────────────────────

  /** OpenSearch's dynamic multi-field convention: `f.keyword` is the
    * exact (un-analyzed) sub-field a text field grows automatically.
    * When the frame has no literal `f.keyword` column but does carry
    * `f`, resolve to the base column — the mapping already yields
    * keyword (exact) semantics for the suffixed name, so only the
    * column reference needs rewriting.
    */
  private def keywordField(df: DataFrame, f: String): String =
    if (
      f.endsWith(".keyword") && !df.columns.contains(f) &&
      df.columns.contains(f.stripSuffix(".keyword"))
    ) f.stripSuffix(".keyword")
    else f

  private def singleField(body: JsonNode): String = {
    require(body.isObject && body.size == 1, s"clause body must have exactly one field, got: $body")
    body.fieldNames().next()
  }

  /** `{field: value}` or the long form `{field: {<valueKey>: value}}`. */
  private def fieldAndValue(body: JsonNode, valueKey: String): (String, JsonNode) = {
    val f = singleField(body)
    val v = body.get(f)
    if (v.isObject) (f, req(v, valueKey, s"clause on '$f'")) else (f, v)
  }

  /** Strict clause options (r14 rule): an option this engine does not
    * implement must FAIL, never be silently dropped — a dropped option
    * hands back wrong results under a correct-looking query.
    */
  private def strictOpts(body: JsonNode, f: String, clause: String, allowed: Set[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val v = body.get(f)
    if (v != null && v.isObject) {
      val extra = v.fieldNames().asScala.toSet -- allowed
      require(extra.isEmpty, s"$clause on '$f': unsupported options $extra")
    }
  }

  /** Required-key access: a malformed body is an IllegalArgumentException
    * naming the offending JSON, never a raw NPE.
    */
  private def req(node: JsonNode, key: String, ctx: String): JsonNode = {
    val v = if (node == null) null else node.get(key)
    if (v == null) throw new IllegalArgumentException(s"$ctx requires '$key': $node")
    v
  }

  private def scalarValue(v: JsonNode): Any =
    if (v.isIntegralNumber) v.asLong
    else if (v.isNumber) v.asDouble
    else if (v.isBoolean) v.asBoolean
    else v.asText

  /** `{"span_term": {field: value}}` → (field, lowercased term). */
  /** A span clause → (field, per-token predicate): span_term (equality)
    * or span_multi (a multi-term matcher — prefix — as a span). The
    * predicate drops into the token-position HOF, so a span_multi costs
    * the same per-row pass as a span_term.
    */
  private def spanClauseMatcher(c: JsonNode): (String, Column => Column) = {
    require(c != null && c.isObject && c.size == 1, s"span clause must have exactly one type: $c")
    c.fieldNames().next() match {
      case "span_term" =>
        val (f, v) = fieldAndValue(c.get("span_term"), "value")
        (f, (t: Column) => t === lit(v.asText.toLowerCase))
      case "span_multi" => spanMultiMatcher(c.get("span_multi"))
      case other => throw new IllegalArgumentException(s"unsupported span clause '$other': $c")
    }
  }

  private def spanMultiMatcher(body: JsonNode): (String, Column => Column) = {
    val m = req(body, "match", "span_multi")
    require(
      m.isObject && m.size == 1 && m.fieldNames().next() == "prefix",
      s"span_multi supports a prefix matcher, got: $m"
    )
    val (f, v) = fieldAndValue(m.get("prefix"), "value")
    (f, (t: Column) => t.startsWith(lit(v.asText.toLowerCase)))
  }

  private def spanTermOf(node: JsonNode, ctx: String): (String, String) = {
    require(
      node.isObject && node.size == 1 && node.fieldNames().next() == "span_term",
      s"$ctx must be a span_term clause: $node"
    )
    val (f, v) = fieldAndValue(node.get("span_term"), "value")
    (f, v.asText.toLowerCase)
  }

  /** A two-span_term span_near body → (field, termA, termB, slop). */
  private def spanNearParts(body: JsonNode): (String, String, String, Int) = {
    val clauses = clauseList(body, "clauses")
    require(clauses.size == 2, s"span_near supports exactly two span_term clauses, got ${clauses.size}")
    val terms = clauses.map(spanTermOf(_, "span_near clause"))
    val f = terms.head._1
    require(terms.forall(_._1 == f), s"span_near clauses must share one field: ${terms.map(_._1)}")
    (f, terms(0)._2, terms(1)._2, Option(body.get("slop")).map(_.asInt).getOrElse(0))
  }

  /** 0-based positions of `term` among the field's analyzed tokens —
    * one compiled eval (r18, [[graft.functions.TokenPositions]]) in
    * place of the interpreted two-pass transform+filter HOF.
    */
  private def tokenPositions(f: String, term: String): Column =
    graft.functions.TokenPositions.positionsOf(graft.functions.TextFns.tokens(col(f)), term)

  /** Scoring clauses usable in a bool `should` (additive _score):
    * rank_feature (saturation form: boost·f/(f+pivot)) and
    * distance_feature (boost·pivot/(pivot+|field−origin|), ISO-8601
    * origin + `Nd`/`Nh`/`Ns` pivot over a timestamp field). Both are
    * pure projections — score-time work is one codegen'd expression.
    */
  private def compileScoringClause(node: JsonNode): Column = {
    require(node.isObject && node.size == 1, s"a scoring clause must have exactly one key, got: $node")
    val name = node.fieldNames().next()
    val body = node.get(name)
    name match {
      case "rank_feature" =>
        val f = col(req(body, "field", "rank_feature").asText)
        val pivot = req(req(body, "saturation", "rank_feature"), "pivot", "rank_feature.saturation").asDouble
        val boost = Option(body.get("boost")).map(_.asDouble).getOrElse(1.0)
        lit(boost) * f / (f + lit(pivot))
      case "distance_feature" =>
        val f = col(req(body, "field", "distance_feature").asText)
        val origin = java.time.Instant.parse(req(body, "origin", "distance_feature").asText).getEpochSecond
        val pivotText = req(body, "pivot", "distance_feature").asText
        val pivotSecs = pivotText.last match {
          case 'd' => pivotText.dropRight(1).toDouble * 86400
          case 'h' => pivotText.dropRight(1).toDouble * 3600
          case 's' => pivotText.dropRight(1).toDouble
          case u   => throw new IllegalArgumentException(s"unsupported distance_feature pivot unit '$u' (use d/h/s)")
        }
        val boost = Option(body.get("boost")).map(_.asDouble).getOrElse(1.0)
        SearchDsl.distanceFeature(abs(unix_timestamp(f) - lit(origin)).cast("double"), pivotSecs, boost)
      case other =>
        throw new IllegalArgumentException(s"unsupported scoring clause '$other' (supported: rank_feature, distance_feature)")
    }
  }

  /** Accept both OpenSearch forms: a single clause object or an array. */
  private def clauseList(body: JsonNode, key: String): Seq[JsonNode] =
    Option(body.get(key)).toSeq.flatMap { n =>
      if (n.isArray) n.elements().asScala.toSeq else Seq(n)
    }

  /** Compile a query clause into a per-ELEMENT predicate for a `nested`
    * context: fields are `path.`-prefixed in the request (OpenSearch's
    * convention) and resolve against the lambda element, so the whole
    * clause holds on one element at a time — the nested-vs-object
    * distinction. The supported subset (bool/term/terms/range/exists/
    * match_all) is the filter-context surface; scoring clauses inside
    * nested are rejected loudly.
    */
  private def compileNestedPred(path: String, node: JsonNode): Column => Column = {
    require(node.isObject && node.size == 1, s"a query clause must have exactly one key, got: $node")
    val name = node.fieldNames().next()
    val body = node.get(name)
    def fieldOf(x: Column, f: String): Column = {
      require(
        f == path || f.startsWith(path + "."),
        s"nested query field '$f' must be under path '$path'"
      )
      f.stripPrefix(path).stripPrefix(".").split('.').filter(_.nonEmpty).foldLeft(x)(_.getField(_))
    }
    name match {
      case "match_all" => _ => lit(true)
      case "term" =>
        val (f, v) = fieldAndValue(body, "value")
        x => fieldOf(x, f) === lit(scalarValue(v))
      case "terms" =>
        val f = singleField(body)
        val vs = body.get(f).elements().asScala.map(scalarValue).toSeq
        require(vs.nonEmpty, s"terms on '$f' needs at least one value")
        x => vs.map(v => fieldOf(x, f) === lit(v)).reduce(_ || _)
      case "range" =>
        val f = singleField(body)
        val b = body.get(f)
        val ops: Seq[(String, (Column, Column) => Column)] = Seq(
          "gte" -> (_ >= _),
          "gt" -> (_ > _),
          "lte" -> (_ <= _),
          "lt" -> (_ < _)
        )
        val conds = ops.flatMap { case (k, op) => Option(b.get(k)).map(v => (c: Column) => op(c, lit(scalarValue(v)))) }
        require(conds.nonEmpty, s"range on '$f' needs at least one of gte/gt/lte/lt")
        x => conds.map(_(fieldOf(x, f))).reduce(_ && _)
      case "exists" =>
        val f = req(body, "field", "exists").asText
        x => fieldOf(x, f).isNotNull
      case "bool" =>
        val must = (clauseList(body, "must") ++ clauseList(body, "filter")).map(compileNestedPred(path, _))
        val mustNot = clauseList(body, "must_not").map(compileNestedPred(path, _))
        val should = clauseList(body, "should").map(compileNestedPred(path, _))
        x => {
          val m = must.map(_(x))
          val mn = mustNot.map(p => !coalesce(p(x), lit(false)))
          val sh =
            if (should.nonEmpty && must.isEmpty) Seq(should.map(_(x)).reduce(_ || _))
            else Nil
          (m ++ mn ++ sh).reduceOption(_ && _).getOrElse(lit(true))
        }
      case other =>
        throw new IllegalArgumentException(
          s"unsupported clause '$other' inside nested (supported: bool, term, terms, range, exists, match_all)"
        )
    }
  }

  /** The `inner_hits` section of a nested search, relationally: one row
    * per MATCHING element of each matching document — the parent's
    * `_source` columns followed by the element's fields, flattened. The
    * plan is filter (the nested predicate) → per-row `filter` HOF (the
    * surviving elements) → explode — element extraction never shuffles,
    * and the explode multiplies only matched rows by their matched-element
    * count, exactly the response payload OpenSearch would build.
    */
  def innerHits(df: DataFrame, body: String, mapping: IndexMapping = IndexMapping.empty): DataFrame = {
    val root = mapper.readTree(body)
    require(root != null && root.isObject, s"request body must be a JSON object: $body")
    val qnode = req(root, "query", "inner_hits request")
    require(
      qnode.isObject && qnode.size == 1 && qnode.fieldNames().next() == "nested",
      s"innerHits requires a top-level nested query, got: $qnode"
    )
    val nbody = qnode.get("nested")
    require(nbody.get("inner_hits") != null, "innerHits requires the nested clause to request inner_hits")
    val path = req(nbody, "path", "nested").asText
    val pred = compileNestedPred(path, req(nbody, "query", "nested"))
    val src = Option(root.get("_source")).toSeq.flatMap(_.elements().asScala.toSeq.map(_.asText))
    val exploded = df
      .filter(exists(col(path), pred))
      .withColumn("_inner_hit", explode(filter(col(path), pred)))
    val out = exploded.select(src.map(col) :+ col("_inner_hit.*"): _*)
    Option(root.get("sort")).map(s => out.orderBy(compileSort(s): _*)).getOrElse(out)
  }
}
