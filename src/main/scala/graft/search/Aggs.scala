package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OpenSearch aggregation semantics (reference DASHBOARD_GUIDE.md
  * visualizations: terms / date_histogram / stats / cardinality /
  * percentiles / filtered counts) as declarative Spark aggregations.
  *
  * All of these are hash aggregations with map-side partial aggregation —
  * one shuffle of (group, partial-state), never a sort of the fact table —
  * which is the plan shape that survives a 100× scale-up.
  */
object Aggs {

  /** Geohash cell key at precision 5 from INTEGER hundredth-degree
    * coordinates (la100 = (lat+90)·100 ∈ [0,18000), lo100 = (lon+180)·100
    * ∈ [0,36000)) — the geohash_grid aggregation's bucket key. The whole
    * computation is integer arithmetic (quantize to 12 lat / 13 lon bits,
    * interleave lon-first, base32 the 25-bit word), so an independent SQL
    * reimplementation lands on identical strings: bit k of lon carries
    * weight 4^k and bit k of lat weight 2·4^k in the interleaved word.
    * GeohashSpec checks it against the textbook bisection encoder.
    */
  def geohash5(la100: Column, lo100: Column): Column = geohash(la100, lo100, 5)

  /** Geohash cell key at arbitrary `precision` (1–9 characters). Same
    * integer derivation as [[geohash5]]: the 5p-bit word interleaves
    * lon-first from the MSB, so for odd totals lon bit k carries weight
    * 4^k (lat 2·4^k) and for even totals the weights swap — position
    * 5p−1 is always lon's top bit. All operands stay < 2^53, so the
    * double-floor division is the exact integer division throughout.
    * Precisions above ~7 subdivide finer than the hundredth-degree grid
    * (cells become singletons), which stays well-defined: the quantizer
    * is still exact, buckets just stop merging points.
    */
  def geohash(la100: Column, lo100: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 9, s"geohash precision out of range [1,9]: $precision")
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    // exact for operands < 2^53: the quotient's floor is the integer div
    def idiv(c: Column, d: Long): Column = floor(c / d).cast("long")
    val total = 5 * precision
    val lonBits = (total + 1) / 2 // lon leads the interleave
    val latBits = total / 2
    val lat = idiv(la100 * (1L << latBits), 18000L)
    val lon = idiv(lo100 * (1L << lonBits), 36000L)
    def spread(c: Column, bits: Int, mult: Long): Column =
      (0 until bits)
        .map(k => (idiv(c, 1L << k) % 2) * lit(mult * (1L << (2 * k))))
        .reduce(_ + _)
    val (lonW, latW) = if (total % 2 == 1) (1L, 2L) else (2L, 1L)
    val n = spread(lon, lonBits, lonW) + spread(lat, latBits, latW)
    concat((0 until precision).map { i =>
      val idx = (idiv(n, 1L << (5 * (precision - 1 - i))) % 32).cast("int")
      lit(alpha).substr(idx + 1, lit(1))
    }: _*)
  }

  /** `ip_prefix` aggregation: bucket by the /N subnet of a 32-bit
    * address value — the CIDR cousin of [[rangeAgg]]'s labeled ranges.
    * Pure integer math (mask = bitwiseAND, octets by shift), one hash
    * agg over the subnet keys; bucket key is the dotted network address
    * with the "/N" suffix, top-`size` by doc count (prefix asc as the
    * tie-break). Optional `metrics` ride the same hash aggregate (the
    * wire face passes its cardinality sub-agg here). Missing addresses
    * bucket nowhere, as across the bucketing family. This is the ONE
    * implementation both the structured entry and the wire executor
    * compile to — the twins cannot drift.
    */
  def ipPrefixAgg(
      df: DataFrame,
      ipnum: Column,
      prefixLen: Int,
      size: Int = 20,
      metrics: Seq[Column] = Nil
  ): DataFrame = {
    require(prefixLen >= 0 && prefixLen <= 32, s"ip_prefix prefix_length out of range [0,32]: $prefixLen")
    val mask = if (prefixLen == 0) 0L else (0xffffffffL << (32 - prefixLen)) & 0xffffffffL
    // Materialize the masked network value ONCE per row: the octet
    // re-rendering references it four times.
    val masked = df.filter(ipnum.isNotNull).withColumn("_net", ipnum.bitwiseAND(lit(mask)))
    def octet(sh: Int) = pmod(shiftright(col("_net"), sh), lit(256L))
    val prefix =
      concat(concat_ws(".", octet(24), octet(16), octet(8), pmod(col("_net"), lit(256L))), lit(s"/$prefixLen"))
        .as("prefix")
    masked
      .groupBy(prefix)
      .agg(count(lit(1)).as("doc_count"), metrics: _*)
      .orderBy(col("doc_count").desc, col("prefix"))
      .limit(size)
  }

  /** Point-in-polygon by ray casting (the pnpoly crossing test) — the
    * geo_polygon query's predicate. Edges unroll at compile time into
    * one codegen'd expression (the polygon is request metadata, never
    * data), so membership is a per-row arithmetic test with no join.
    * Horizontal edges contribute no crossing (the strict/non-strict `>`
    * pair makes their condition false before the division can matter),
    * and the evaluation order matches the SQL oracle's term-for-term so
    * both engines run identical IEEE arithmetic.
    */
  def pointInPolygon(lat: Column, lon: Column, pts: Seq[(Double, Double)]): Column = {
    require(pts.size >= 3, s"a polygon needs at least 3 vertices, got ${pts.size}")
    val crossings = pts.indices
      .map { i =>
        val (lat1, lon1) = pts(i)
        val (lat2, lon2) = pts((i + 1) % pts.size)
        when(
          (lit(lat1) > lat) =!= (lit(lat2) > lat) &&
            lon < lit(lon2 - lon1) * (lat - lit(lat1)) / lit(lat2 - lat1) + lit(lon1),
          1
        ).otherwise(0)
      }
      .reduce(_ + _)
    crossings % 2 === 1
  }

  /** `terms` aggregation: top-`size` buckets by doc count (desc), key asc as
    * the deterministic tie-break (OpenSearch's own tie-break).
    */
  def termsAgg(df: DataFrame, field: Column, size: Int, minDocCount: Long = 1L): DataFrame =
    // min_doc_count: buckets below the floor are dropped BEFORE the
    // size truncation (OpenSearch — a pruned bucket frees a size slot).
    // A bucket-table-sized HAVING, evaluated map-side-combined.
    df.filter(field.isNotNull)
      .groupBy(field.as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .filter(col("doc_count") >= minDocCount)
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(size)

  /** `terms` aggregation with metric sub-aggregations: same bucketing and
    * ordering as [[termsAgg]], plus aliased per-bucket metrics.
    *
    * Docs MISSING the bucket field belong to NO bucket (OpenSearch: a
    * missing value simply isn't counted; the `missing` agg exists to
    * count those docs explicitly) — a bare GROUP BY would instead emit
    * a NULL-key bucket OpenSearch never has. The IsNotNull filter is a
    * pushable scan predicate, found by the AggsFuzzSpec differential
    * drill.
    */
  def termsAggWith(
      df: DataFrame,
      field: Column,
      size: Int,
      metrics: Seq[Column],
      minDocCount: Long = 1L
  ): DataFrame =
    df.filter(field.isNotNull)
      .groupBy(field.as("key"))
      .agg(count(lit(1)).as("doc_count"), metrics: _*)
      .filter(col("doc_count") >= minDocCount)
      .orderBy(col("doc_count").desc, col("key").asc)
      .limit(size)

  /** `terms` aggregation ordered by something other than the default
    * doc_count-desc: a named metric sub-aggregation, `_key`, or `_count`
    * (Kibana's "order by metric"). Same one-pass bucketing — only the
    * final (bucket-table-sized) sort differs.
    */
  def termsAggOrdered(
      df: DataFrame,
      field: Column,
      size: Int,
      metrics: Seq[Column],
      orderKey: String,
      asc: Boolean,
      minDocCount: Long = 1L
  ): DataFrame = {
    val agged = df
      .filter(field.isNotNull)
      .groupBy(field.as("key"))
      .agg(count(lit(1)).as("doc_count"), metrics: _*)
      .filter(col("doc_count") >= minDocCount)
    val oc = orderKey match {
      case "_key"   => col("key")
      case "_count" => col("doc_count")
      case named    => col(named)
    }
    agged.orderBy(if (asc) oc.asc else oc.desc, col("key").asc).limit(size)
  }

  /** `date_range` aggregation: explicit [from, to) buckets over a
    * timestamp field, keyed by label — the calendar cousin of [[rangeAgg]].
    */
  def dateRangeAgg(
      df: DataFrame,
      field: Column,
      ranges: Seq[(String, Option[String], Option[String])],
      timeZone: Option[String] = None,
      metrics: Seq[Column] = Nil
  ): DataFrame = {
    // time_zone: the from/to strings are WALL-CLOCK datetimes in the
    // given zone — each boundary converts to its UTC instant once
    // (constant-folded), the scan-side comparison is unchanged.
    def bound(s: String): Column = {
      val t = lit(s).cast("timestamp")
      timeZone.map(z => to_utc_timestamp(t, z)).getOrElse(t)
    }
    val bucket = ranges.foldLeft(when(lit(false), "")) { case (acc, (label, from, to)) =>
      val conds = Seq(
        from.map(f => field >= bound(f)),
        to.map(t => field < bound(t))
      ).flatten
      acc.when(conds.reduceOption(_ && _).getOrElse(lit(true)), label)
    }
    // metric sub-aggs ride the same hash aggregate (r17, the rangeAgg
    // fix's twin) — keep the source columns in scope
    df.withColumn("_range_bucket", bucket)
      .filter(col("_range_bucket").isNotNull)
      .groupBy(col("_range_bucket").as("bucket"))
      .agg(count(lit(1)).as("doc_count"), metrics: _*)
      .orderBy("bucket")
  }

  /** `top_metrics` aggregation: the metric values carried by the row
    * ranked FIRST by the sort field — a single max_by/min_by hash
    * aggregate (one row out, map-side partials), never a global sort or
    * window.
    */
  def topMetrics(df: DataFrame, metrics: Seq[(String, Column)], sort: Column, descending: Boolean): DataFrame = {
    val picked = metrics.map { case (name, m) =>
      (if (descending) max_by(m, sort) else min_by(m, sort)).as(name)
    }
    val sortOut = (if (descending) max(sort) else min(sort)).as("sort_value")
    df.agg(picked.head, picked.tail :+ sortOut: _*)
  }

  /** `date_histogram` with calendar interval + metric sub-aggregations. */
  def dateHistogram(df: DataFrame, ts: Column, interval: String, metrics: Seq[Column]): DataFrame =
    // missing timestamps bucket nowhere (OpenSearch; the NULL-key-bucket
    // SQL trap the AggsFuzzSpec drill caught on terms/histogram)
    df.filter(ts.isNotNull)
      .groupBy(date_trunc(interval, ts).as("bucket"))
      .agg(count(lit(1)).as("doc_count"), metrics: _*)
      .orderBy("bucket")

  /** [[dateHistogram]] with OpenSearch `time_zone` semantics: bucket
    * boundaries sit on the ZONE's wall clock (a non-UTC org's "daily"
    * dashboard), the emitted key is the UTC instant of the local bucket
    * start. DST-aware — from/to_utc_timestamp apply the zone's rules, so
    * a 23/25-hour day truncates at its real local midnight (pinned by
    * TimeZoneSpec's DST-boundary fixture).
    */
  def dateHistogramTz(df: DataFrame, ts: Column, interval: String, tz: String, metrics: Seq[Column]): DataFrame =
    dateHistogram(df, from_utc_timestamp(ts, tz), interval, metrics)
      .withColumn("bucket", to_utc_timestamp(col("bucket"), tz))

  /** `date_histogram` with `min_doc_count: 0` + `extended_bounds`
    * semantics: empty calendar buckets appear with zero counts. The bucket
    * spine is generated from the filtered data's own min/max month — a
    * two-row scalar aggregate exploded into one row per month (months are
    * O(years), so the spine is driver-scale even when the data is not) —
    * then left-joined by the real buckets.
    */
  def dateHistogramFilled(df: DataFrame, ts: Column, interval: String, metric: Column): DataFrame = {
    // The metric's name comes from ITS OWN alias (not positional column
    // lookup, which breaks the moment a second metric is added).
    val metricName = org.apache.spark.sql.graft.ColumnBridge
      .aliasName(metric)
      .getOrElse(
        throw new IllegalArgumentException(
          s"""dateHistogramFilled needs an aliased metric (metric.as("name")), got: $metric"""
        )
      )
    val buckets = df
      .filter(ts.isNotNull) // missing timestamps bucket nowhere (family rule)
      .groupBy(date_trunc(interval, ts).as("bucket"))
      .agg(count(lit(1)).as("doc_count"), metric)
    // Zero-fill in the metric's OWN type: a bigint sum stays bigint, a
    // decimal stays decimal — no silent widening to double.
    val metricType = buckets.schema(metricName).dataType
    // Spine bounds come from the (tiny) bucket table, not a second scan of
    // the fact table.
    val spine = buckets
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr(s"interval 1 $interval"))).as("bucket"))
    spine
      .join(buckets, Seq("bucket"), "left")
      .select(
        col("bucket"),
        coalesce(col("doc_count"), lit(0L)).as("doc_count"),
        coalesce(col(metricName), lit(0).cast(metricType)).as(metricName)
      )
      .orderBy("bucket")
  }

  /** `collapse`: one top document per key (the search-result field
    * collapse). A single max_by hash aggregation — map-side partials, no
    * window, no sort; `ordering` is a column (typically a struct) whose
    * natural ordering picks the winner.
    */
  def collapse(df: DataFrame, key: String, docCols: Seq[String], ordering: Column): DataFrame =
    df.groupBy(col(key))
      .agg(max_by(struct(docCols.map(col): _*), ordering).as("_doc"))
      .select(col(key) +: docCols.map(n => col(s"_doc.$n").as(n)): _*)

  /** `rare_terms` aggregation: the long-tail complement of `terms` —
    * buckets whose doc count is at most `maxCount`, rarest first.
    */
  def rareTerms(df: DataFrame, field: Column, maxCount: Long): DataFrame =
    df.filter(field.isNotNull) // missing-field docs bucket nowhere (family rule)
      .groupBy(field.as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .filter(col("doc_count") <= maxCount)
      .orderBy(col("doc_count").asc, col("key").asc)

  /** `multi_terms` aggregation: top-`size` buckets over a composite key,
    * by doc count desc (keys asc as the tie-break). A doc missing ANY
    * key value buckets nowhere — OpenSearch's multi_terms requires
    * every source value present (same family rule as terms/composite).
    */
  def multiTerms(df: DataFrame, fields: Seq[Column], size: Int): DataFrame = {
    val keyed = fields.zipWithIndex.map { case (f, i) => f.as(s"k$i") }
    df.filter(fields.map(_.isNotNull).reduce(_ && _))
      .groupBy(keyed: _*)
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc +: keyed.indices.map(i => col(s"k$i").asc): _*)
      .limit(size)
  }

  /** `weighted_avg` aggregation: sum(value·weight)/sum(weight). Sums are
    * cast to double AFTER aggregation so decimal operands stay exact
    * through the sum (partition-order-independent) and the quotient is
    * bit-identical on any engine.
    */
  def weightedAvg(df: DataFrame, value: Column, weight: Column): DataFrame =
    // Docs missing either side are ignored (OpenSearch default without
    // a `missing` parameter): sum(value·weight) skips a NULL product by
    // itself, but sum(weight) would still count a null-VALUE doc's
    // weight — a silently deflated average on sparse data.
    df.filter(value.isNotNull && weight.isNotNull)
      .agg(
        round(sum(value * weight).cast("double") / sum(weight).cast("double"), 6).as("weighted_avg")
      )

  /** Sibling pipeline aggregations over a bucketed frame: avg/max/min/sum
    * of a per-bucket metric (`avg_bucket` & co. — one row of bucket-level
    * stats computed from the tiny bucket table, not the fact table).
    */
  def bucketStats(buckets: DataFrame, metric: Column): DataFrame = {
    // exact DECIMAL sum, one double division (the stats_bucket pattern):
    // a plain double avg's partition-order accumulation differs from the
    // oracle's by ulps, which at bucket-sum magnitudes (4.7e9 at
    // sf1-scale, ulp ≈ 1e-6) survives the 6dp round — the r15 sf1
    // full-registry gate caught exactly that on avg_bucket.
    val s = sum(metric.cast("decimal(18,2)")).cast("double")
    buckets.agg(
      round(s / count(lit(1)), 6).as("avg_bucket"),
      round(min(metric), 2).as("min_bucket"),
      round(max(metric), 2).as("max_bucket"),
      round(s, 2).as("sum_bucket")
    )
  }

  /** `variable_width_histogram`: OpenSearch computes this agg
    * approximately (streaming 1-D clustering); here the cluster seeds are
    * EXACT interpolated quantiles at (2i+1)/2k and each value joins its
    * nearest seed (ties to the lower seed — array_position finds the first
    * minimum). Deterministic, engine-portable, and oracle-checkable — a
    * strictly stronger contract than the reference's best-effort buckets.
    * One stats pass (seed quantiles, 1-row broadcast) + one assignment
    * scan into a k-row hash agg.
    */
  def variableWidthHistogram(df: DataFrame, field: Column, k: Int): DataFrame = {
    val ps = (0 until k).map(i => (2 * i + 1).toDouble / (2 * k))
    // ONE array-percentile aggregate: k separate percentile() instances
    // would each buffer the whole column (measured 2.7x slower at sf0.1).
    val seeds = df.agg(graft.functions.ExactPercentileAgg.exactPercentile(field, ps).as("_seeds"))
    // null values bucket nowhere (family rule) — and would otherwise
    // produce a NULL nearest-seed position, i.e. a phantom bucket.
    df.filter(field.isNotNull)
      .crossJoin(broadcast(seeds))
      .withColumn("_d", transform(col("_seeds"), s => abs(field - s)))
      .withColumn("bucket", array_position(col("_d"), array_min(col("_d"))))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("doc_count"),
        round(min(field), 2).as("min_v"),
        round(max(field), 2).as("max_v"),
        round(sum(field.cast("decimal(12,2)")).cast("double") / count(lit(1)), 6).as("centroid")
      )
      .orderBy("bucket")
  }

  /** `stats` aggregation: count/min/max/avg/sum of a numeric field. */
  def stats(df: DataFrame, field: Column): DataFrame =
    df.agg(
      count(field).as("cnt"),
      round(min(field), 2).as("min_v"),
      round(max(field), 2).as("max_v"),
      round(avg(field), 2).as("avg_v"),
      // Exact decimal sum (r19): a raw double sum at corpus scale drifts
      // with accumulation order — at sf1 (6M rows, Σ ≈ 3.2e11) both
      // engines' parallel double sums jitter by ±0.05, so the 2dp hash
      // diverges run to run (the r15 extendedStats magnitude rule; min/
      // max/avg magnitudes are ulp-safe and stay double).
      round(sum(field.cast("decimal(18,2)")).cast("double"), 2).as("sum_v")
    )

  /** `extended_stats` aggregation: stats plus sum-of-squares, variance and
    * standard deviation (POPULATION semantics, E[x²]−E[x]² — OpenSearch's
    * convention; one family-wide convention with extended_stats_bucket
    * and the grouped rich-metric path).
    *
    * Float determinism: `var_samp`/`stddev_samp` accumulate in
    * engine-specific orders, and at sum-of-squares magnitudes the noise
    * crosses any rounding quantum — so every moment here is DERIVED from
    * exact decimal sums (2dp-exact money → squares 4dp-exact, decimal
    * sums exact) cast to double: both engines then execute the identical
    * correctly-rounded IEEE expression tree and agree bitwise before the
    * final round.
    */
  def extendedStats(df: DataFrame, field: Column): DataFrame = {
    val d = field.cast("decimal(12,2)")
    val n = col("cnt")
    val s = col("_s").cast("double")
    val sq = col("_sq").cast("double")
    df.agg(
      count(field).as("cnt"),
      round(min(field), 2).as("min_v"),
      round(max(field), 2).as("max_v"),
      sum(d).as("_s"),
      sum(d * d).as("_sq")
    ).select(
      n,
      col("min_v"),
      col("max_v"),
      round(s / n, 6).as("avg_v"),
      round(s, 2).as("sum_v"),
      // sum_sq sits past double's exact-integer range once the corpus
      // grows (1.25e17 at sf1-scale, ulp ≈ 16): the engines' exact-
      // decimal→double conversions differ by ulps there, and the
      // variance cancellation amplifies them — the sf1 full-registry
      // gate caught both (r15). sum_sq is therefore emitted as the
      // EXACT 4dp decimal rendered as fixed-point text (the
      // decimal(6,2)-string precedent): full resolution at ANY
      // magnitude, no absolute-rounding floor that zeroes small fields
      // and no double-conversion ulp exposure at big ones.
      col("_sq").cast("decimal(38,4)").cast("string").as("sum_sq"),
      // variance scale is gated on the EXACT decimal magnitude (both
      // engines branch on the same exact value): below 1e9 the
      // cancellation error is ≤ ~2·ulp(1e9)/n ≈ 1e-7/n — 6dp is safe
      // and keeps resolution for small-variance fields; above it the
      // family's 2dp money² convention holds (error ~ulp(sum_sq)/n,
      // relative to the data, not the corpus).
      when(col("_sq") < lit(1e9), round((sq - s * s / n) / n, 6))
        .otherwise(round((sq - s * s / n) / n, 2))
        .as("variance"),
      round(sqrt((sq - s * s / n) / n), 6).as("std_dev")
    )
  }

  /** `cardinality` aggregation. Exact variant (count distinct) for the
    * oracle; `approxCardinality` is the HLL++ scale path OpenSearch actually
    * uses (one pass, constant memory, no exact-distinct shuffle).
    */
  def cardinality(df: DataFrame, fields: Seq[(String, Column)]): DataFrame =
    df.agg(
      countDistinct(fields.head._2).as(fields.head._1),
      fields.tail.map { case (n, c) => countDistinct(c).as(n) }: _*
    )

  def approxCardinality(df: DataFrame, fields: Seq[(String, Column)]): DataFrame =
    df.agg(
      approx_count_distinct(fields.head._2).as(fields.head._1),
      fields.tail.map { case (n, c) => approx_count_distinct(c).as(n) }: _*
    )

  /** `percentiles` aggregation (linear interpolation, matching both
    * OpenSearch TDigest asymptotically and DuckDB quantile_cont exactly at
    * verification scale). `approxPercentiles` is the sketch-based path for
    * 100 TB (no global sort).
    */
  /** ONE array-percentile aggregate: k separate percentile() instances
    * each buffer the full value set independently (k× the memory traffic
    * and merge work — a cost the count-pruning bench hid until the r11
    * methodology fix). The array form sorts once and reads k ranks.
    */
  def percentiles(df: DataFrame, field: Column, ps: Seq[(String, Double)]): DataFrame =
    df.agg(graft.functions.ExactPercentileAgg.exactPercentile(field, ps.map(_._2)).as("_ps"))
      .select(ps.zipWithIndex.map { case ((n, _), i) => round(element_at(col("_ps"), i + 1), 6).as(n) }: _*)

  def approxPercentiles(df: DataFrame, field: Column, ps: Seq[(String, Double)]): DataFrame =
    df.agg(approx_percentile(field, lit(ps.map(_._2).toArray), lit(10000)).as("_ps"))
      .select(ps.zipWithIndex.map { case ((n, _), i) => round(element_at(col("_ps"), i + 1), 2).as(n) }: _*)

  // ── Sketch tier (the blessed 100 TB percentile paths — SURVEY §5) ──────
  // percentile() is exact but buffers EVERY value of the column in one
  // final aggregation buffer — a single-reducer/driver-memory killer at
  // 100×. approx_percentile (Greenwald-Khanna sketch, accuracy 10000 →
  // rank error ≤ 1e-4) keeps the buffer BOUNDED at O(accuracy) per
  // partition and MERGEABLE map-side, so the shuffle carries sketches,
  // not values. Each *_approx twin below mirrors its exact counterpart's
  // output schema; ReplicaSpec pins the sketch within tolerance of the
  // exact twin (the search_cardinality_approx precedent). The exact
  // entries stay for the hash gate; these are the deployment paths.

  /** Sketch twin of [[boxplot]]: min/max stay exact (bounded selections);
    * the three quartiles come from ONE mergeable sketch.
    */
  def approxBoxplot(df: DataFrame, field: Column): DataFrame =
    df.agg(
        round(min(field), 2).as("min_v"),
        approx_percentile(field, lit(Array(0.25, 0.5, 0.75)), lit(10000)).as("_qs"),
        round(max(field), 2).as("max_v")
      )
      .select(
        col("min_v"),
        round(element_at(col("_qs"), 1), 6).as("q1"),
        round(element_at(col("_qs"), 2), 6).as("q2"),
        round(element_at(col("_qs"), 3), 6).as("q3"),
        col("max_v")
      )

  /** Sketch twin of [[medianAbsoluteDeviation]]: both medians ride the
    * bounded sketch; the 1-row inner median still broadcasts back onto
    * the scan (two passes, zero unbounded buffers).
    */
  def approxMedianAbsoluteDeviation(df: DataFrame, field: Column): DataFrame = {
    val med = df.agg(approx_percentile(field, lit(0.5), lit(10000)).as("_med"))
    df.select(field.as("_x"))
      .crossJoin(broadcast(med))
      .agg(round(approx_percentile(abs(col("_x") - col("_med")), lit(0.5), lit(10000)), 6).as("mad"))
  }

  /** Sketch twin of [[variableWidthHistogram]]: seeds from the mergeable
    * sketch instead of the exact buffer; assignment scan identical.
    * Skewed/low-cardinality data can make sketch ranks COLLIDE (several
    * target ranks resolving to one value) — duplicate seeds would then
    * silently swallow buckets via ties in array_position, so seeds are
    * deduplicated first: the output has AT MOST k buckets, each nonempty,
    * still partitioning the table.
    */
  def approxVariableWidthHistogram(df: DataFrame, field: Column, k: Int): DataFrame = {
    val ps = (0 until k).map(i => (2 * i + 1).toDouble / (2 * k))
    val seeds = df.agg(
      array_distinct(approx_percentile(field, lit(ps.toArray), lit(10000))).as("_seeds"))
    df.crossJoin(broadcast(seeds))
      .withColumn("_d", transform(col("_seeds"), s => abs(field - s)))
      .withColumn("bucket", array_position(col("_d"), array_min(col("_d"))))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("doc_count"),
        round(min(field), 2).as("min_v"),
        round(max(field), 2).as("max_v"),
        round(sum(field.cast("decimal(12,2)")).cast("double") / count(lit(1)), 6).as("centroid")
      )
      .orderBy("bucket")
  }

  /** Filter-context conditional counts (the "Active vs Pending" metric
    * visualization): one pass, no join of separate filtered scans.
    */
  /** scripted_metric, Spark-first: the map script is a Catalyst SQL
    * expression over the document's fields (the engine's native
    * "painless") and the combine/reduce phase one of sum/avg/min/max/
    * count — exactly what Spark's map-side partial + final aggregation
    * already is, so the "script" runs codegen'd inside the scan instead
    * of interpreted per document. Sums ride an exact 4dp decimal (map
    * outputs here are money expressions), extrema are selections — both
    * engine-stable.
    */
  def scriptedMetric(df: DataFrame, mapScript: String, reduceScript: String): DataFrame = {
    val m = expr(mapScript)
    reduceScript match {
      case "sum"   => df.agg(round(sum(m.cast("decimal(18,4)")).cast("double"), 2).as("value"))
      case "avg"   => df.agg(round(sum(m.cast("decimal(18,4)")).cast("double") / count(m), 6).as("value"))
      case "min"   => df.agg(round(min(m), 6).as("value"))
      case "max"   => df.agg(round(max(m), 6).as("value"))
      case "count" => df.agg(count(m).as("value"))
      case other =>
        throw new IllegalArgumentException(s"unsupported reduce_script '$other' (sum/avg/min/max/count)")
    }
  }

  /** Welch's unpaired t_test between two filter-defined populations of
    * `value`, from EXACT decimal moments in ONE conditional-agg scan;
    * the statistic derives in a fixed double expression tree (+,*,/,sqrt
    * are IEEE correctly-rounded, so engines agree bit-for-bit —
    * var_samp's partition-order double accumulation would not).
    */
  /** matrix_stats: pairwise covariance/correlation of `fields` from ONE
    * scan of exact decimal moments (n, Σx, Σx², Σxy per pair), the
    * statistics derived in a fixed double expression tree and unpivoted
    * into (field_x, field_y) rows — never per-pair covar_samp/corr aggs
    * (partition-order double accumulation) nor per-pair scans. The moment
    * row is a single tuple however many fields ride along, so the agg
    * shuffles O(fields²) doubles, not data.
    */
  def matrixStats(df: DataFrame, fields: Seq[String]): DataFrame = {
    require(fields.size >= 2, s"matrix_stats needs at least two fields, got: $fields")
    // Docs missing ANY field are excluded from the whole matrix (the
    // OpenSearch default): the cross-product sums skip NULL pairs on
    // their own, but `n` would still count the row — a silently wrong
    // covariance denominator on sparse data.
    val sel = df
      .filter(fields.map(col(_).isNotNull).reduce(_ && _))
      .select(fields.map(f => col(f).cast("decimal(12,2)").as(f)): _*)
    val sums = fields.map(f => sum(col(f)).cast("double").as(s"_s_$f"))
    val cross = for { i <- fields.indices; j <- i until fields.size }
      yield sum(col(fields(i)) * col(fields(j))).cast("double").as(s"_x_${i}_$j")
    val m = sel.agg(count(lit(1)).as("n"), (sums ++ cross): _*)
    val pairs = for { i <- fields.indices; j <- (i + 1) until fields.size } yield {
      val sx = col(s"_s_${fields(i)}")
      val sy = col(s"_s_${fields(j)}")
      val sxx = col(s"_x_${i}_$i")
      val syy = col(s"_x_${j}_$j")
      val sxy = col(s"_x_${i}_$j")
      struct(
        lit(fields(i)).as("field_x"),
        lit(fields(j)).as("field_y"),
        round((sxy - sx * sy / col("n")) / (col("n") - lit(1)), 6).as("covariance"),
        round(
          (col("n") * sxy - sx * sy) /
            (sqrt(col("n") * sxx - sx * sx) * sqrt(col("n") * syy - sy * sy)),
          6
        ).as("correlation")
      )
    }
    m.select(explode(array(pairs: _*)).as("_r"))
      .select(col("_r.field_x"), col("_r.field_y"), col("_r.covariance"), col("_r.correlation"))
      .orderBy("field_x", "field_y")
  }

  def tTest(df: DataFrame, value: Column, condA: Column, condB: Column): DataFrame = {
    val v = value.cast("decimal(12,2)")
    // Docs missing the value are ignored (family rule, metric form):
    // the sums already skip NULLs, so without this filter the group
    // COUNTS would include rows the sums exclude — silently deflating
    // both means and inflating both variances on sparse data.
    val df2 = df.filter(value.isNotNull)
    val agg = df2.agg(
      sum(when(condA, 1L).otherwise(0L)).as("n1"),
      sum(when(condA, v)).cast("double").as("s1"),
      sum(when(condA, v * v)).cast("double").as("ss1"),
      sum(when(condB, 1L).otherwise(0L)).as("n2"),
      sum(when(condB, v)).cast("double").as("s2"),
      sum(when(condB, v * v)).cast("double").as("ss2")
    )
    val (n1, s1, ss1) = (col("n1"), col("s1"), col("ss1"))
    val (n2, s2, ss2) = (col("n2"), col("s2"), col("ss2"))
    agg.select(
      round(
        (s1 / n1 - s2 / n2) /
          sqrt(((ss1 - s1 * s1 / n1) / (n1 - lit(1))) / n1 + ((ss2 - s2 * s2 / n2) / (n2 - lit(1))) / n2),
        6
      ).as("t_stat"),
      round(s1 / n1, 6).as("mean_a"),
      round(s2 / n2, 6).as("mean_b")
    )
  }

  def filteredCounts(df: DataFrame, conds: Seq[(String, Column)]): DataFrame =
    df.agg(
      count(lit(1)).as("n_total"),
      conds.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }: _*
    )

  /** Top-N sorted "data table" (Recent Transactions): global top-N via
    * per-partition top-N + single reduce — Spark's TakeOrderedAndProject,
    * not a full sort.
    */
  def topN(df: DataFrame, n: Int, ordering: Seq[Column]): DataFrame =
    df.orderBy(ordering: _*).limit(n)

  /** `histogram` aggregation: fixed-width numeric buckets. */
  def histogram(df: DataFrame, field: Column, width: Double): DataFrame =
    histogramWith(df, field, width, Nil)

  /** Numeric histogram with metric sub-aggregations — OpenSearch allows
    * the full metric set under any bucketing agg, and the wire executor
    * previously DROPPED sub-metrics under histogram silently (the
    * degradation class the strict-options rule bans; found by the
    * AggsFuzzSpec drill). Missing-field docs bucket nowhere, as in
    * [[termsAggWith]].
    */
  def histogramWith(
      df: DataFrame,
      field: Column,
      width: Double,
      metrics: Seq[Column],
      offset: Double = 0.0,
      minDocCount: Long = 1L
  ): DataFrame = {
    // offset shifts bucket boundaries: key = floor((x − o) / w)·w + o
    // (the OpenSearch histogram option; 0 keeps the plain grid).
    // min_doc_count: a bucket-table HAVING, like the terms path (r17 —
    // the option was previously read nowhere on histogram, so a request
    // carrying it silently got the unfiltered buckets; found by the
    // AggsFuzzSpec strict-options sweep). The engine's bucket shape is
    // the SQL group — only occupied buckets exist — so the default is 1
    // and 0 (OpenSearch's empty-bucket fill) is rejected loudly upstream.
    val buckets = df
      .filter(field.isNotNull)
      .groupBy((floor((field - offset) / width) * width + offset).as("bucket"))
      .agg(count(lit(1)).as("doc_count"), metrics: _*)
    (if (minDocCount > 1L) buckets.filter(col("doc_count") >= minDocCount) else buckets)
      .orderBy("bucket")
  }

  /** `range` aggregation: explicit [from, to) buckets keyed by label.
    * Metric sub-aggregations ride the same hash aggregate (r17 — they
    * were silently dropped here, the same degradation class the
    * histogram fix retired in r14; found by the AggsFuzzSpec
    * strict-options sweep), so the source columns stay in scope.
    */
  def rangeAgg(
      df: DataFrame,
      field: Column,
      ranges: Seq[(String, Option[Double], Option[Double])],
      metrics: Seq[Column] = Nil
  ): DataFrame = {
    val bucket = ranges.foldLeft(when(lit(false), "")) { case (acc, (label, from, to)) =>
      val cond = Seq(from.map(field >= _), to.map(field < _)).flatten.reduceOption(_ && _).getOrElse(lit(true))
      acc.when(cond, label)
    }
    df.withColumn("_range_bucket", bucket)
      .filter(col("_range_bucket").isNotNull)
      .groupBy(col("_range_bucket").as("bucket"))
      .agg(count(lit(1)).as("doc_count"), metrics: _*)
      .orderBy("bucket")
  }

  /** `top_hits` sub-aggregation: the top `k` documents per bucket by
    * `ordering`, executed by the [[graft.plans.TopKPerKey]] operator —
    * bounded per-key heaps with a map-side partial phase (the shuffle
    * carries at most k rows per key per partition). A window
    * `row_number` would instead hash the ENTIRE table into #buckets
    * partitions and sort each — the classic straggler at scale. Output =
    * the input columns plus an int `rank` (1-based within the bucket).
    * `bucket` and `ordering` must be plain columns (optionally
    * `.asc`/`.desc`); project expressions first.
    */
  def topHits(df: DataFrame, bucket: Column, k: Int, ordering: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.sortSpec
    // missing-key docs bucket nowhere (the terms family rule — top_hits
    // rides a terms bucketing, so a NULL key must not form a group)
    graft.plans.TopKPerKey.perKey(df.filter(bucket.isNotNull), Seq(sortSpec(bucket)._1), ordering.map(sortSpec), k)
  }

  /** `significant_terms`: terms whose foreground frequency exceeds their
    * background frequency (simple percentage-difference scoring, the same
    * shape as OpenSearch's JLH/percentage heuristics). One pass per side +
    * a broadcast of the two scalar totals.
    */
  def significantTerms(df: DataFrame, term: Column, foreground: Column): DataFrame = {
    // Missing-field docs bucket nowhere (family rule: a NULL term never
    // forms a bucket) — but they STAY IN the fg/bg totals: OpenSearch's
    // subset_size/superset_size count all docs in the foreground /
    // background SETS regardless of field presence (the r14 advice
    // finding — summing the null-filtered buckets would dilute scores
    // on sparse data and diverge from the unfiltered count(*) oracle).
    val agg = df
      .filter(term.isNotNull)
      .groupBy(term.as("term"))
      .agg(
        sum(when(foreground, 1L).otherwise(0L)).as("fg_count"),
        count(lit(1)).as("bg_count")
      )
    val totals = df.agg(
      sum(when(foreground, 1L).otherwise(0L)).as("fg_total"),
      count(lit(1)).as("bg_total")
    )
    agg
      .crossJoin(broadcast(totals))
      .select(
        col("term"),
        col("fg_count"),
        col("bg_count"),
        round(
          col("fg_count").cast("double") / col("fg_total") - col("bg_count").cast("double") / col("bg_total"),
          6
        ).as("score")
      )
      .orderBy(col("score").desc, col("term"))
  }

  /** `significant_text`: [[significantTerms]] over the ANALYZED tokens of
    * a text field — which words are over-represented in the foreground
    * set relative to the whole index. Terms are distinct per document
    * (OpenSearch counts documents, not occurrences), so fg/bg counts are
    * doc counts and the totals are doc totals, not token totals — the
    * totals come from a separate narrow count, not from summing the term
    * table. One exploded aggregation; the shuffle carries (term, flag)
    * pairs.
    */
  def significantText(df: DataFrame, text: Column, foreground: Column, size: Int): DataFrame = {
    val toks = df.select(
      foreground.as("_fg"),
      explode(array_distinct(graft.functions.TextFns.tokens(text))).as("term")
    )
    val counts = toks
      .groupBy("term")
      .agg(
        sum(when(col("_fg"), 1L).otherwise(0L)).as("fg_count"),
        count(lit(1)).as("bg_count")
      )
    val totals = df.select(foreground.as("_fg"))
      .agg(sum(when(col("_fg"), 1L).otherwise(0L)).as("fg_total"), count(lit(1)).as("bg_total"))
    counts
      .crossJoin(broadcast(totals))
      .select(
        col("term"),
        col("fg_count"),
        col("bg_count"),
        round(
          col("fg_count").cast("double") / col("fg_total") - col("bg_count").cast("double") / col("bg_total"),
          6
        ).as("score")
      )
      .orderBy(col("score").desc, col("term"))
      .limit(size)
  }

  /** `adjacency_matrix` aggregation: named filters plus their pairwise
    * intersections as buckets, all counted in ONE conditional-sum pass
    * over the data (never one scan per matrix cell), then unpivoted to
    * (key, doc_count) rows. Empty buckets are dropped, as OpenSearch does.
    */
  def adjacencyMatrix(df: DataFrame, filters: Seq[(String, Column)]): DataFrame = {
    val cells: Seq[(String, Column)] =
      filters ++ (for {
        i <- filters.indices
        j <- (i + 1) until filters.size
      } yield (s"${filters(i)._1}&${filters(j)._1}", filters(i)._2 && filters(j)._2))
    val agged = df.agg(
      sum(when(cells.head._2, 1L).otherwise(0L)).as(cells.head._1),
      cells.tail.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }: _*
    )
    val stacked = cells.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    agged
      .selectExpr(s"stack(${cells.size}, $stacked) as (key, doc_count)")
      .filter(col("doc_count") > 0)
      .orderBy("key")
  }

  /** `median_absolute_deviation` aggregation: median(|x − median(x)|), the
    * robust dispersion metric. Two percentile aggregations; the 1-row
    * median broadcasts back onto the scan — no per-row subquery.
    */
  def medianAbsoluteDeviation(df: DataFrame, field: Column): DataFrame = {
    val med = df.agg(graft.functions.ExactPercentileAgg.exactPercentile(field, 0.5).as("_med"))
    df.select(field.as("_x"))
      .crossJoin(broadcast(med))
      .agg(round(graft.functions.ExactPercentileAgg.exactPercentile(abs(col("_x") - col("_med")), 0.5), 6).as("mad"))
  }

  /** `boxplot` aggregation: min / q1 / median / q3 / max (linear
    * interpolation, same convention as [[percentiles]]).
    */
  def boxplot(df: DataFrame, field: Column): DataFrame =
    // one array-percentile buffer for all three quartiles (see percentiles)
    df.agg(
        round(min(field), 2).as("min_v"),
        graft.functions.ExactPercentileAgg.exactPercentile(field, Seq(0.25, 0.5, 0.75)).as("_qs"),
        round(max(field), 2).as("max_v")
      )
      .select(
        col("min_v"),
        round(element_at(col("_qs"), 1), 6).as("q1"),
        round(element_at(col("_qs"), 2), 6).as("q2"),
        round(element_at(col("_qs"), 3), 6).as("q3"),
        col("max_v")
      )

  /** `rate` aggregation under a monthly date_histogram: the bucket's sum
    * normalized to a per-day rate by the bucket's own calendar length (a
    * 31-day month divides by 31) — the normalization is bucket-table
    * math, not fact-table work.
    */
  def dateHistogramRate(df: DataFrame, ts: Column, value: Column): DataFrame =
    df.filter(ts.isNotNull) // missing timestamps bucket nowhere (family rule)
      .groupBy(date_trunc("month", ts).as("bucket"))
      .agg(count(lit(1)).as("doc_count"), sum(value).as("_sum"))
      .select(
        col("bucket"),
        col("doc_count"),
        round(col("_sum").cast("double"), 2).as("month_sum"),
        round(
          col("_sum").cast("double") / datediff(add_months(col("bucket"), 1), col("bucket")),
          6
        ).as("per_day_rate")
      )
      .orderBy("bucket")

  /** `cumulative_cardinality` pipeline aggregation: distinct-keys-so-far
    * per calendar bucket. The scalable form: one aggregation finds each
    * key's FIRST bucket, a second counts first-appearances per bucket,
    * and a running sum over the (tiny) bucket table is the cumulative
    * cardinality — never a distinct-over-window of the fact table.
    */
  def cumulativeCardinality(df: DataFrame, ts: Column, key: Column, interval: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = df
      .select(date_trunc(interval, ts).as("bucket"), key.as("_k"))
      .groupBy("_k")
      .agg(min("bucket").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("new_keys"))
    val spine = df.select(date_trunc(interval, ts).as("bucket")).distinct()
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(firstSeen, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("new_keys"), lit(0L)).as("new_keys"))
      .withColumn("cum_cardinality", sum("new_keys").over(w))
      .orderBy("bucket")
  }

  /** The SKETCH tier of [[cumulativeCardinality]]: per-bucket HLL
    * (Datasketches) sketches, unioned cumulatively. Where the exact
    * plan's first-appearance aggregation still shuffles the full fact
    * table by key, this one's only fact-table pass is a map-side-merged
    * `hll_sketch_agg` groupBy on the BUCKET key (tens of groups), and
    * the cumulative union runs over the tiny bucket table's sketches —
    * the shuffle carries kilobyte sketches, never keys. No distinct,
    * no Expand, anywhere (the §5 audit rule: a sketch-tier request is
    * sketch-tier THROUGHOUT). Estimate error is the HLL default
    * (lgConfigK=12, RSE ≈0.8%); the replica contract bounds it at 5%
    * against the exact twin per bucket and asserts monotonicity.
    */
  def cumulativeCardinalityApprox(df: DataFrame, ts: Column, key: Column, interval: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perBucket = df
      .select(date_trunc(interval, ts).as("bucket"), key.as("_k"))
      .groupBy("bucket")
      .agg(hll_sketch_agg(col("_k")).as("_sk"))
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .select(
        col("bucket"),
        hll_sketch_estimate(col("_sk")).as("bucket_cardinality"),
        hll_sketch_estimate(hll_union_agg(col("_sk")).over(w)).as("cum_cardinality")
      )
      .orderBy("bucket")
  }

  /** `auto_date_histogram`: the smallest calendar interval from the
    * hour → day → month → year ladder that keeps the bucket count at or
    * under `targetBuckets`. The span probe is a 1-row min/max aggregate
    * over a single column; the chosen interval (also emitted, as
    * OpenSearch reports it) then drives a plain date_histogram. Bucket
    * count = boundary crossings between the truncated endpoints + 1,
    * matching SQL date_diff semantics.
    */
  def autoDateHistogram(df: DataFrame, ts: Column, targetBuckets: Int): DataFrame = {
    val row = df.agg(min(ts).cast("timestamp"), max(ts).cast("timestamp")).head()
    val (lo, hi) = (row.getTimestamp(0).toLocalDateTime, row.getTimestamp(1).toLocalDateTime)
    import java.time.temporal.ChronoUnit
    def crossings(unit: String): Long = unit match {
      case "hour"  => ChronoUnit.HOURS.between(lo.truncatedTo(ChronoUnit.HOURS), hi.truncatedTo(ChronoUnit.HOURS))
      case "day"   => ChronoUnit.DAYS.between(lo.toLocalDate, hi.toLocalDate)
      case "month" => ChronoUnit.MONTHS.between(lo.toLocalDate.withDayOfMonth(1), hi.toLocalDate.withDayOfMonth(1))
      case _       => (hi.getYear - lo.getYear).toLong
    }
    val interval = Seq("hour", "day", "month")
      .find(iv => crossings(iv) + 1 <= targetBuckets)
      .getOrElse("year")
    df.filter(ts.isNotNull) // missing timestamps bucket nowhere (family rule)
      .groupBy(date_trunc(interval, ts).as("bucket"))
      .agg(count(lit(1)).as("doc_count"))
      .select(lit(interval).as("interval"), col("bucket"), col("doc_count"))
      .orderBy("bucket")
  }

  /** `string_stats` aggregation: value count, min/max/avg length, and the
    * Shannon entropy of the corpus character distribution. Lengths are
    * one hash aggregation; entropy explodes characters and aggregates
    * (char, count) partials — the shuffle never carries text. Entropy is
    * derived as ln(N) − Σ n·ln(n)/N (one pass over the ~charset-sized
    * count table), in bits.
    */
  def stringStats(df: DataFrame, field: Column): DataFrame = {
    val lens = df.agg(
      count(field).as("cnt"),
      min(length(field)).cast("long").as("min_length"),
      max(length(field)).cast("long").as("max_length"),
      round(avg(length(field)), 6).as("avg_length")
    )
    val charCounts = df
      .select(explode(split(field, "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("ch")
      .agg(count(lit(1)).as("n"))
    val entropy = charCounts
      .agg(((log(sum("n")) - sum(col("n") * log(col("n"))) / sum("n")) / log(lit(2.0))).as("_e"))
      .select(round(col("_e"), 6).as("entropy"))
    lens.crossJoin(broadcast(entropy))
  }

  /** `composite` aggregation page: multi-key buckets in key order, resuming
    * strictly after the `after` cursor — the scalable "paginate all
    * buckets" pattern (each page is one bounded aggregation, no global
    * materialization of the bucket space).
    *
    * Docs with a missing value in ANY source bucket nowhere (the
    * OpenSearch default, missing_bucket=false) — same null-key rule as
    * terms/histogram, and load-bearing here beyond bucket identity: a
    * NULL key emitted into a page would poison the after-cursor
    * (`k > NULL` is never true), silently truncating the walk. The
    * IsNotNull conjunction is pushable to the scan.
    */
  def compositePage(
      df: DataFrame,
      keys: Seq[Column],
      after: Option[Seq[String]],
      size: Int
  ): DataFrame = {
    val named = keys.zipWithIndex.map { case (k, i) => k.as(s"k$i") }
    val grouped = df
      .filter(keys.map(_.isNotNull).reduce(_ && _))
      .groupBy(named: _*)
      .agg(count(lit(1)).as("doc_count"))
    val paged = after match {
      case Some(cursor) =>
        // lexicographic strictly-greater on the key tuple
        val cmp = cursor.zipWithIndex
          .map { case (v, i) =>
            val eqPrefix = (0 until i)
              .map(j => col(s"k$j") === lit(cursor(j)))
              .foldLeft(lit(true))(_ && _)
            eqPrefix && col(s"k$i") > lit(v)
          }
          .reduce(_ || _)
        grouped.filter(cmp)
      case None => grouped
    }
    paged.orderBy(keys.indices.map(i => col(s"k$i")): _*).limit(size)
  }
}
