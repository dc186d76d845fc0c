package graft

import graft.search.{IndexMapping, JsonDsl}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Differential fuzzer for the wire-format AGGREGATION executor —
  * the bucket-side sibling of JsonDslFuzzSpec.
  *
  * Random agg bodies (terms with order/size and metric sub-aggs,
  * numeric histogram, labeled range buckets, optional query filter)
  * run through [[JsonDsl.parse]] and must reproduce an independent
  * evaluator of the documented OpenSearch semantics: doc_count-desc
  * key-asc default order, explicit `order` overrides with key-asc tie
  * break, size truncation AFTER ordering, metric rounding per the
  * house convention (sum/min/max 2dp, avg 6dp), and — the SQL trap —
  * docs MISSING the bucket field belong to NO bucket (a GROUP BY
  * would happily emit a NULL-key bucket OpenSearch never has).
  *
  * doc_count and keys compare exactly; double metrics compare within
  * 1e-9 relative (the engines' accumulation orders differ legally).
  */
class AggsFuzzSpec extends SparkSpec {

  private val tagPool = Vector("red", "blue", "green", "amber", "cyan", "plum", "teal", "rust")

  private case class Doc(id: Long, tag: Option[String], price: Option[Double], qty: Option[Int], ts: Option[Long])

  // epoch-second timestamps inside 2024, so month/day/hour truncations
  // all produce multiple buckets
  private val Epoch2024 = 1704067200L

  private val docs: Vector[Doc] = {
    val rnd = new scala.util.Random(77L)
    Vector.tabulate(300) { i =>
      Doc(
        i.toLong,
        if (rnd.nextInt(8) == 0) None else Some(tagPool(rnd.nextInt(tagPool.size))),
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(10000) / 100.0),
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(50)),
        if (rnd.nextInt(8) == 0) None else Some(Epoch2024 + rnd.nextInt(180) * 86400L + rnd.nextInt(86400))
      )
    }
  }

  private lazy val frame = {
    val s = spark
    import s.implicits._
    docs
      .map(d => (d.id, d.tag.orNull, d.price.map(Double.box).orNull, d.qty.map(Int.box).orNull, d.ts.map(Long.box).orNull))
      .toDF("_id", "tag", "price", "qty", "_epoch")
      .select(
        col("_id"),
        col("tag"),
        col("price").cast("double").as("price"),
        col("qty").cast("int").as("qty"),
        timestamp_seconds(col("_epoch")).as("ts")
      )
      .cache()
  }

  // ── request model ───────────────────────────────────────────────────
  private case class Metric(name: String, mType: String, field: String)
  private sealed trait AggReq
  // `missing`: the per-agg substitution option — null-keyed docs take
  // the given value instead of bucketing nowhere, and the substituted
  // bucket competes in ordering/size like any other (it composes with
  // the family null-key rule, which is why it gets its own fuzz arm).
  // `minDc`: min_doc_count — buckets under the floor drop BEFORE size
  // truncation (a pruned bucket frees a slot)
  private case class TermsAgg(
      size: Int,
      metrics: Seq[Metric],
      order: Option[(String, Boolean)],
      missing: Option[String],
      minDc: Long
  ) extends AggReq
  // `offset` shifts bucket boundaries: key = floor((x − o)/w)·w + o
  private case class HistAgg(interval: Double, metrics: Seq[Metric], missing: Option[Double], offset: Double)
      extends AggReq
  private case class RangeAgg(bounds: Seq[Double]) extends AggReq
  // `tz`: the r15 time_zone option — buckets on the zone's wall clock,
  // keys back as UTC instants of the local bucket starts (the 180-day
  // corpus crosses the 2024-03-10 America/New_York DST gap, so a fixed
  // -05:00 arithmetic fails this arm)
  // `offsetH`: bucket boundaries shifted by whole hours ("+6h"),
  // composing with tz on the wall clock
  private case class DateHist(interval: String, metrics: Seq[Metric], tz: Option[String], offsetH: Int)
      extends AggReq

  private case class Request(filterQty: Option[Int], agg: AggReq)

  private def genMetrics(rnd: scala.util.Random): Seq[Metric] = {
    val types = Vector("sum", "avg", "min", "max", "value_count")
    Seq.tabulate(rnd.nextInt(3)) { i =>
      Metric(s"m$i", types(rnd.nextInt(types.size)), if (rnd.nextBoolean()) "price" else "qty")
    }
  }

  private def gen(rnd: scala.util.Random): Request = {
    val filter = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(40)) else None
    val agg = rnd.nextInt(5) match {
      case 0 | 1 =>
        val metrics = genMetrics(rnd)
        val order =
          if (rnd.nextInt(3) == 0) {
            val keys = Vector("_key", "_count") ++ metrics.filter(_.mType != "value_count").map(_.name)
            Some((keys(rnd.nextInt(keys.size)), rnd.nextBoolean()))
          } else None
        TermsAgg(
          1 + rnd.nextInt(10),
          metrics,
          order,
          if (rnd.nextInt(3) == 0) Some("none") else None,
          if (rnd.nextInt(3) == 0) 1L + rnd.nextInt(40) else 1L
        )
      case 2 =>
        HistAgg(
          Vector(5.0, 10.0, 25.0)(rnd.nextInt(3)),
          genMetrics(rnd),
          if (rnd.nextInt(3) == 0) Some(rnd.nextInt(100).toDouble) else None,
          if (rnd.nextInt(3) == 0) rnd.nextInt(5).toDouble else 0.0
        )
      case 3 =>
        val cuts = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(90) + 5).distinct.sorted.map(_.toDouble)
        RangeAgg(cuts)
      case 4 =>
        val zones = Vector("America/New_York", "Asia/Tokyo", "Europe/Berlin")
        DateHist(
          Vector("month", "day", "hour")(rnd.nextInt(3)),
          genMetrics(rnd),
          if (rnd.nextInt(3) == 0) Some(zones(rnd.nextInt(zones.size))) else None,
          if (rnd.nextInt(3) == 0) 1 + rnd.nextInt(11) else 0
        )
    }
    Request(filter, agg)
  }

  // ── wire rendering ──────────────────────────────────────────────────
  private def metricJson(m: Metric): String = s""""${m.name}": {"${m.mType}": {"field": "${m.field}"}}"""

  private def render(r: Request): String = {
    val queryPart = r.filterQty.map(q => s""""query": {"range": {"qty": {"gte": $q}}}, """).getOrElse("")
    val aggPart = r.agg match {
      case TermsAgg(size, metrics, order, missing, minDc) =>
        val sub = if (metrics.isEmpty) "" else s""", "aggs": {${metrics.map(metricJson).mkString(",")}}"""
        val ord = order.map { case (k, asc) => s""", "order": {"$k": "${if (asc) "asc" else "desc"}"}""" }.getOrElse("")
        val miss = missing.map(v => s""", "missing": "$v"""").getOrElse("")
        val mdc = if (minDc > 1) s""", "min_doc_count": $minDc""" else ""
        s""""buckets": {"terms": {"field": "tag", "size": $size$ord$miss$mdc}$sub}"""
      case HistAgg(interval, metrics, missing, offset) =>
        val sub = if (metrics.isEmpty) "" else s""", "aggs": {${metrics.map(metricJson).mkString(",")}}"""
        val miss = missing.map(v => s""", "missing": $v""").getOrElse("")
        val off = if (offset != 0.0) s""", "offset": $offset""" else ""
        s""""buckets": {"histogram": {"field": "price", "interval": $interval$miss$off}$sub}"""
      case DateHist(interval, metrics, tz, offsetH) =>
        val sub = if (metrics.isEmpty) "" else s""", "aggs": {${metrics.map(metricJson).mkString(",")}}"""
        val tzp = tz.map(z => s""", "time_zone": "$z"""").getOrElse("")
        val off = if (offsetH != 0) s""", "offset": "+${offsetH}h"""" else ""
        s""""buckets": {"date_histogram": {"field": "ts", "calendar_interval": "$interval"$tzp$off}$sub}"""
      case RangeAgg(cuts) =>
        val ranges = (None +: cuts.map(Some(_))).zip(cuts.map(Some(_)) :+ None).map {
          case (from, to) =>
            val f = from.map(v => s""""from": $v""").toSeq ++ to.map(v => s""""to": $v""")
            s"{${f.mkString(",")}}"
        }
        s""""buckets": {"range": {"field": "price", "ranges": [${ranges.mkString(",")}]}}"""
    }
    s"""{$queryPart"aggs": {$aggPart}}"""
  }

  // ── reference evaluator ─────────────────────────────────────────────
  private def round2(v: Double): Double =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def metricVal(m: Metric, group: Seq[Doc]): Option[Double] = {
    val vs = group.flatMap(d => if (m.field == "price") d.price else d.qty.map(_.toDouble))
    m.mType match {
      case "value_count" => Some(vs.size.toDouble)
      case _ if vs.isEmpty => None
      case "sum" => Some(round2(vs.sum))
      case "avg" => Some(round6(vs.sum / vs.size))
      case "min" => Some(round2(vs.min))
      case "max" => Some(round2(vs.max))
    }
  }

  /** (key, doc_count, metric values) rows in the order the engine must emit. */
  private def evalRef(r: Request): Seq[(Any, Long, Seq[Option[Double]])] = {
    val base = r.filterQty.map(q => docs.filter(_.qty.exists(_ >= q))).getOrElse(docs)
    r.agg match {
      case TermsAgg(size, metrics, order, missing, minDc) =>
        val groups = missing match {
          case Some(m) => base.groupBy(d => d.tag.getOrElse(m))
          case None    => base.filter(_.tag.isDefined).groupBy(_.tag.get)
        }
        val rows = groups.toSeq
          .map { case (k, g) => (k, g.size.toLong, metrics.map(metricVal(_, g))) }
          .filter(_._2 >= minDc)
        val ordered = order match {
          case None => rows.sortBy { case (k, n, _) => (-n, k) }
          case Some(("_key", asc)) =>
            val s = rows.sortBy(_._1); if (asc) s else s.reverse
          case Some(("_count", asc)) =>
            if (asc) rows.sortBy { case (k, n, _) => (n, k.toString) }
            else rows.sortBy { case (k, n, _) => (-n, k.toString) }
          case Some((name, asc)) =>
            val idx = metrics.indexWhere(_.name == name)
            // metric order: a bucket's metric can be NULL (every value in
            // the bucket null); the engine contract is SQL ordering —
            // NULLS FIRST ascending, NULLS LAST descending
            rows.sortBy { case (k, _, ms) =>
              val v = ms(idx)
              (if (asc) v.getOrElse(Double.NegativeInfinity) else -v.getOrElse(Double.NegativeInfinity),
               k.toString)
            }
        }
        ordered.take(size)
      case DateHist(interval, metrics, tz, offsetH) =>
        // with time_zone: truncate on the ZONE's wall clock (java.time is
        // the independent DST authority), key = the UTC instant of the
        // local bucket start; `offset` shifts boundaries ON the wall
        // clock — truncate(local − off) + off. NOTE the reference shifts
        // LOCAL time (a plain LocalDateTime minus hours), exactly the
        // engine's order of operations.
        val zone = tz.map(java.time.ZoneId.of).getOrElse(java.time.ZoneOffset.UTC): java.time.ZoneId
        def trunc(epoch: Long): Long = {
          val local = java.time.Instant.ofEpochSecond(epoch).atZone(zone).toLocalDateTime
            .minusHours(offsetH.toLong)
          val t = interval match {
            case "month" => local.toLocalDate.withDayOfMonth(1).atStartOfDay()
            case "day" => local.toLocalDate.atStartOfDay()
            case "hour" => local.truncatedTo(java.time.temporal.ChronoUnit.HOURS)
          }
          t.plusHours(offsetH.toLong).atZone(zone).toEpochSecond
        }
        base
          .filter(_.ts.isDefined)
          .groupBy(d => trunc(d.ts.get))
          .toSeq
          .map { case (k, g) => (k: Any, g.size.toLong, metrics.map(metricVal(_, g))) }
          .sortBy(_._1.asInstanceOf[Long])
      case HistAgg(interval, metrics, missing, offset) =>
        // `missing` substitutes into THIS agg's value source only — the
        // sub-metrics still see the doc's actual (possibly null) field
        // (OpenSearch: missing is per-aggregation, not per-document)
        base
          .flatMap(d =>
            d.price.orElse(missing).map(v => (math.floor((v - offset) / interval) * interval + offset, d)))
          .groupBy(_._1)
          .toSeq
          .map { case (k, g) => (k: Any, g.size.toLong, metrics.map(metricVal(_, g.map(_._2)))) }
          .sortBy(_._1.asInstanceOf[Double])
      case RangeAgg(cuts) =>
        // engine contract (gate-established): EMPTY ranges are absent and
        // buckets sort by label — the SQL-group shape, not OpenSearch's
        // request-order-with-zeros response shape
        val bounds = (None +: cuts.map(Some(_))).zip(cuts.map(Some(_)) :+ None)
        bounds
          .map { case (from, to) =>
            val key = s"${from.map(_.toString).getOrElse("*")}-${to.map(_.toString).getOrElse("*")}"
            val g = base.filter(_.price.exists(p => from.forall(p >= _) && to.forall(p < _)))
            (key: Any, g.size.toLong, Seq.empty[Option[Double]])
          }
          .filter(_._2 > 0)
          .sortBy(_._1.toString)
    }
  }

  // ── the drill ───────────────────────────────────────────────────────
  private def close(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
    case (None, None) => true
    case (Some(x), Some(y)) => math.abs(x - y) <= 1e-9 + 1e-9 * math.abs(x)
    case _ => false
  }

  test("200 random agg bodies: buckets, order, size, metrics == reference") {
    val rnd = new scala.util.Random(0xa66f022L)
    val mapping = IndexMapping(Map("tag" -> "keyword"))
    (1 to 200).foreach { qi =>
      val req = gen(rnd)
      val body = render(req)
      val want = evalRef(req)
      val got: Seq[Row] = JsonDsl.parse(frame, body, mapping).collect().toSeq
      val metricNames = req.agg match {
        case TermsAgg(_, ms, _, _, _) => ms
        case HistAgg(_, ms, _, _) => ms
        case DateHist(_, ms, _, _) => ms
        case _ => Seq.empty
      }
      def rowStr(r: Row) = r.toSeq.mkString("[", ", ", "]")
      assert(
        got.size == want.size,
        s"#$qi bucket count: got ${got.size} want ${want.size}\n  body=$body\n  got=${got.map(rowStr)}\n  want=$want"
      )
      got.zip(want).zipWithIndex.foreach { case ((g, (wk, wn, wms)), bi) =>
        val gk = g.get(0)
        val gn = g.getLong(g.fieldIndex("doc_count"))
        val keyOk = (gk, wk) match {
          case (a: Double, b: Double) => math.abs(a - b) < 1e-9
          case (a: java.sql.Timestamp, b: Long) => a.toInstant.getEpochSecond == b
          case (a, b) => a == b
        }
        assert(
          keyOk && gn == wn,
          s"#$qi bucket $bi: got key=$gk n=$gn want key=$wk n=$wn\n  body=$body\n  got=${got.map(rowStr)}\n  want=$want"
        )
        metricNames.zipWithIndex.foreach { case (m, mi) =>
          val gv = Option(g.get(g.fieldIndex(m.name))).map {
            case d: Double => d
            case l: Long => l.toDouble
            case x => x.toString.toDouble
          }
          assert(
            close(gv, wms(mi)),
            s"#$qi bucket $bi metric ${m.name} (${m.mType}): got $gv want ${wms(mi)}\n  body=$body"
          )
        }
      }
    }
  }

  test("rare/multi/significant terms: null keys bucket nowhere, folds exact") {
    // the rest of the terms family under the same null-key rule the main
    // arm pins for terms/histogram: rare_terms (count-capped, count-asc
    // key-asc order), multi_terms (ALL key values must be present —
    // the composite-source rule), significant_terms (frequency-delta
    // score over a query-defined foreground, with NULL terms out of the
    // buckets AND out of both totals).
    val rnd = new scala.util.Random(0x5197e12L)
    (1 to 10).foreach { ci =>
      // rare_terms
      val cap = 1L + rnd.nextInt(60)
      val gotRare = JsonDsl
        .parse(frame, s"""{"aggs": {"r": {"rare_terms": {"field": "tag", "max_doc_count": $cap}}}}""")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSeq
      val wantRare = docs
        .flatMap(_.tag)
        .groupBy(identity)
        .map { case (t, xs) => (t, xs.size.toLong) }
        .toSeq
        .filter(_._2 <= cap)
        .sortBy { case (t, c) => (c, t) }
      assert(gotRare == wantRare, s"#$ci rare_terms cap=$cap mismatch")

      // multi_terms over (tag, qty): docs missing EITHER bucket nowhere
      val size = 1 + rnd.nextInt(12)
      val gotMulti = JsonDsl
        .parse(
          frame,
          s"""{"aggs": {"m": {"multi_terms": {"terms": [{"field": "tag"}, {"field": "qty"}], "size": $size}}}}"""
        )
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSeq
      val wantMulti = docs
        .collect { case d if d.tag.isDefined && d.qty.isDefined => (d.tag.get, d.qty.get) }
        .groupBy(identity)
        .map { case ((t, q), xs) => (t, q, xs.size.toLong) }
        .toSeq
        .sortBy { case (t, q, c) => (-c, t, q) }
        .take(size)
      assert(gotMulti == wantMulti, s"#$ci multi_terms size=$size mismatch")

      // significant_terms: foreground = qty >= cut; null tags excluded
      // from buckets but COUNTED in fg/bg totals (OpenSearch subset/
      // superset sizes are doc-set sizes, not term-bearing-doc sizes)
      val cut = rnd.nextInt(50)
      val gotSig = JsonDsl
        .parse(
          frame,
          s"""{"query": {"range": {"qty": {"gte": $cut}}},
             | "aggs": {"sig": {"significant_terms": {"field": "tag"}}}}""".stripMargin
        )
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      val tagged = docs.filter(_.tag.isDefined)
      val fgTotal = docs.count(_.qty.exists(_ >= cut))
      val bgTotal = docs.size
      val wantSig = tagged
        .groupBy(_.tag.get)
        .map { case (t, xs) =>
          val fg = xs.count(_.qty.exists(_ >= cut)).toLong
          val bg = xs.size.toLong
          val score = BigDecimal(fg.toDouble / fgTotal - bg.toDouble / bgTotal)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
          (t, fg, bg, score)
        }
        .toSeq
        .sortBy { case (t, _, _, sc) => (-sc, t) }
      assert(gotSig == wantSig, s"#$ci significant_terms cut=$cut mismatch")
    }
  }

  test("metric aggs on sparse fields: weighted_avg / t_test / matrix_stats exclude null docs") {
    // the metric-side form of the null rule: sums skip NULLs on their
    // own, so any agg that pairs a null-skipping sum with a count(*) is
    // silently wrong on sparse data — the count includes rows the sum
    // excluded. Folds replay the engine's exact-decimal convention
    // (2dp-quantized values, exact sums, one double conversion).
    val rnd = new scala.util.Random(0x3e7a1c5L)
    def d2(x: Double): BigDecimal = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 to 8).foreach { ci =>
      // weighted_avg(price, qty): docs missing either side drop
      val gotW = JsonDsl
        .parse(frame, """{"aggs": {"w": {"weighted_avg": {"value": {"field": "price"}, "weight": {"field": "qty"}}}}}""")
        .collect()(0)
        .getDouble(0)
      val both = docs.collect { case d if d.price.isDefined && d.qty.isDefined => (d2(d.price.get), BigDecimal(d.qty.get)) }
      val wantW = r6((both.map { case (v, w) => v * w }.sum / both.map(_._2).sum).toDouble)
      assert(math.abs(gotW - wantW) < 1e-9, s"#$ci weighted_avg: $gotW != $wantW")

      // t_test over price with random qty-defined populations
      val cut = 10 + rnd.nextInt(30)
      val gotT = JsonDsl
        .parse(
          frame,
          s"""{"aggs": {"t": {"t_test": {
             |  "a": {"field": "price", "filter": {"range": {"qty": {"gte": $cut}}}},
             |  "b": {"field": "price", "filter": {"range": {"qty": {"lt": $cut}}}}}}}}""".stripMargin
        )
        .collect()(0)
      val priced = docs.filter(_.price.isDefined)
      def moments(pop: Seq[BigDecimal]): (Long, Double, Double) =
        (pop.size.toLong, pop.sum.toDouble, pop.map(v => v * v).sum.toDouble)
      val (n1, s1, ss1) = moments(priced.filter(_.qty.exists(_ >= cut)).map(d => d2(d.price.get)))
      val (n2, s2, ss2) = moments(priced.filter(_.qty.exists(_ < cut)).map(d => d2(d.price.get)))
      val wantMeanA = r6(s1 / n1)
      val wantMeanB = r6(s2 / n2)
      assert(math.abs(gotT.getDouble(gotT.fieldIndex("mean_a")) - wantMeanA) < 1e-9, s"#$ci t_test mean_a")
      assert(math.abs(gotT.getDouble(gotT.fieldIndex("mean_b")) - wantMeanB) < 1e-9, s"#$ci t_test mean_b")
      val wantT = r6(
        (s1 / n1 - s2 / n2) /
          math.sqrt(((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1 + ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2)
      )
      assert(math.abs(gotT.getDouble(gotT.fieldIndex("t_stat")) - wantT) < 1e-6, s"#$ci t_stat")

      // matrix_stats over (price, qty): docs missing EITHER drop entirely
      val gotM = JsonDsl
        .parse(frame, """{"aggs": {"m": {"matrix_stats": {"fields": ["price", "qty"]}}}}""")
        .collect()(0)
      val pairs = docs.collect { case d if d.price.isDefined && d.qty.isDefined => (d2(d.price.get), BigDecimal(d.qty.get)) }
      val n = pairs.size
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxy = pairs.map { case (x, y) => x * y }.sum.toDouble
      val sxx = pairs.map { case (x, _) => x * x }.sum.toDouble
      val syy = pairs.map { case (_, y) => y * y }.sum.toDouble
      val wantCov = r6((sxy - sx * sy / n) / (n - 1))
      val wantCor = r6((n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
      assert(math.abs(gotM.getDouble(gotM.fieldIndex("covariance")) - wantCov) < 1e-6, s"#$ci covariance")
      assert(math.abs(gotM.getDouble(gotM.fieldIndex("correlation")) - wantCor) < 1e-6, s"#$ci correlation")
    }
  }

  test("geo grids / geo_centroid / categorize_text / top_hits: null docs bucket nowhere") {
    // pins the straggler null fixes on data the oracle gate cannot see
    // (its geo/text columns are null-free): a corpus with null points,
    // null texts and null bucket keys must produce NO null-key buckets,
    // a centroid over only the present points, and no "" pattern.
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(0x9e011cL)
    val pts = Seq.tabulate(120) { i =>
      val hasPt = rnd.nextInt(4) != 0
      (i.toLong,
       if (hasPt) (rnd.nextInt(18000).toLong, rnd.nextInt(36000).toLong, rnd.nextInt(170) - 85.0, rnd.nextInt(350) - 175.0) else null,
       if (rnd.nextInt(4) == 0) null else s"alpha beta gamma delta${i % 7}",
       if (rnd.nextInt(4) == 0) null else s"g${i % 5}")
    }
    val df = pts
      .map { case (id, pt, text, grp) =>
        (id, Option(pt).map(_._1).map(Long.box).orNull, Option(pt).map(_._2).map(Long.box).orNull,
         Option(pt).map(_._3).map(Double.box).orNull, Option(pt).map(_._4).map(Double.box).orNull, text, grp)
      }
      .toDF("id", "la100", "lo100", "lat", "lon", "text", "grp")
      .select(
        col("id"),
        when(col("la100").isNotNull,
          struct(col("la100").as("la100"), col("lo100").as("lo100"), col("lat").as("lat"), col("lon").as("lon")))
          .as("pt"),
        col("text"),
        col("grp")
      )
      .repartition(3)

    val nPts = pts.count(_._2 != null)
    val gh = JsonDsl.parse(df, """{"aggs": {"g": {"geohash_grid": {"field": "pt", "size": 1000}}}}""").collect()
    assert(gh.forall(r => r.getString(0) != null), "geohash_grid emitted a null cell")
    assert(gh.map(_.getLong(1)).sum == nPts, "geohash_grid doc_counts != docs with points")

    val gt = JsonDsl.parse(df, """{"aggs": {"g": {"geotile_grid": {"field": "pt", "size": 1000}}}}""").collect()
    assert(gt.forall(r => !r.isNullAt(0) && !r.isNullAt(1)), "geotile_grid emitted a null cell")
    assert(gt.map(_.getLong(2)).sum == nPts, "geotile_grid doc_counts != docs with points")

    val gc = JsonDsl.parse(df, """{"aggs": {"c": {"geo_centroid": {"field": "pt"}}}}""").collect()(0)
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val present = pts.collect { case (_, pt, _, _) if pt != null => (d2(pt._3), d2(pt._4)) }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gc.getLong(2) == nPts, "geo_centroid counted null points")
    assert(math.abs(gc.getDouble(0) - r6((present.map(_._1).sum / present.size).toDouble)) < 1e-9)
    assert(math.abs(gc.getDouble(1) - r6((present.map(_._2).sum / present.size).toDouble)) < 1e-9)

    val ct = JsonDsl.parse(df, """{"aggs": {"p": {"categorize_text": {"field": "text", "size": 100}}}}""").collect()
    assert(ct.forall(r => r.getString(0) != null && r.getString(0).nonEmpty), "categorize_text kept a null/empty pattern")
    assert(ct.map(_.getLong(1)).sum == pts.count(_._3 != null), "categorize_text counted null texts")

    val th = JsonDsl
      .parse(df, """{"aggs": {"t": {"terms": {"field": "grp"},
                   | "aggs": {"h": {"top_hits": {"size": 2, "sort": [{"id": "asc"}]}}}}}}""".stripMargin)
      .collect()
    assert(th.forall(r => r.get(r.fieldIndex("grp")) != null), "top_hits emitted a null group")
  }

  // ── strict-options sweep (r17 verdict #3) ───────────────────────────
  // Two silently-dropped-option bugs in two rounds (r14: histogram
  // sub-metrics; r15: geo_line `missing:`) were each found by a human
  // reviewer, not the suite. This arm encodes the rule the fixes
  // established: EVERY supported option on a bucket-agg body, exercised
  // on data crafted so it MUST matter, either changes the result or is
  // rejected loudly (IllegalArgumentException). A with/without pair that
  // parses to identical output is exactly a silently-no-op option — the
  // class this arm exists to catch before a reviewer does.
  test("strict options: every bucket-agg option changes output or rejects loudly") {
    val mapping = IndexMapping(Map("tag" -> "keyword"))
    def runOn(data: org.apache.spark.sql.DataFrame, body: String): Either[Throwable, (Seq[String], Seq[String])] =
      try {
        val df = JsonDsl.parse(data, body, mapping)
        // emitted ORDER is part of the contract (order: options reorder
        // without changing the bucket set) — compare rows as emitted
        Right((df.columns.toSeq, df.collect().toSeq.map(_.toString)))
      } catch { case e: IllegalArgumentException => Left(e) }
    def run(body: String): Either[Throwable, (Seq[String], Seq[String])] = runOn(frame, body)
    def probeOn(data: org.apache.spark.sql.DataFrame)(label: String, without: String, withOpt: String): Unit =
      (runOn(data, without), runOn(data, withOpt)) match {
        case (Right(a), Right(b)) =>
          assert(a != b, s"$label: option present but output identical — silently dropped?\nbody: $withOpt\nrows: ${b._2.take(5)}")
        case (Right(_), Left(_)) => () // loud rejection satisfies the rule
        case (Left(e), _) =>
          fail(s"$label: the BASELINE body (no option) must parse, got: ${e.getMessage}")
      }
    def probe(label: String, without: String, withOpt: String): Unit =
      (run(without), run(withOpt)) match {
        case (Right(a), Right(b)) =>
          assert(a != b, s"$label: option present but output identical — silently dropped?\nbody: $withOpt\nrows: ${b._2.take(5)}")
        case (Right(_), Left(_)) => () // loud rejection satisfies the rule
        case (Left(e), _) =>
          fail(s"$label: the BASELINE body (no option) must parse, got: ${e.getMessage}")
      }

    val termsBase = """{"aggs": {"b": {"terms": {"field": "tag"}}}}"""
    probe("terms.size", termsBase, """{"aggs": {"b": {"terms": {"field": "tag", "size": 3}}}}""")
    probe("terms.order._key", termsBase, """{"aggs": {"b": {"terms": {"field": "tag", "order": {"_key": "asc"}}}}}""")
    probe("terms.order._count", termsBase, """{"aggs": {"b": {"terms": {"field": "tag", "order": {"_count": "asc"}}}}}""")
    probe("terms.missing", termsBase, """{"aggs": {"b": {"terms": {"field": "tag", "missing": "zzz"}}}}""")
    probe("terms.min_doc_count", termsBase, """{"aggs": {"b": {"terms": {"field": "tag", "min_doc_count": 40}}}}""")
    probe("terms sub-metric", termsBase,
      """{"aggs": {"b": {"terms": {"field": "tag"}, "aggs": {"m0": {"sum": {"field": "price"}}}}}}""")
    val termsSub = """{"aggs": {"b": {"terms": {"field": "tag"}, "aggs": {"m0": {"avg": {"field": "price"}}}}}}"""
    probe("terms.order.<metric>", termsSub,
      """{"aggs": {"b": {"terms": {"field": "tag", "order": {"m0": "asc"}}, "aggs": {"m0": {"avg": {"field": "price"}}}}}}""")
    probe("terms metric.missing", termsSub,
      """{"aggs": {"b": {"terms": {"field": "tag"}, "aggs": {"m0": {"avg": {"field": "price", "missing": 500}}}}}}""")

    val histBase = """{"aggs": {"b": {"histogram": {"field": "price", "interval": 10}}}}"""
    probe("histogram.offset", histBase, """{"aggs": {"b": {"histogram": {"field": "price", "interval": 10, "offset": 2.5}}}}""")
    probe("histogram.missing", histBase, """{"aggs": {"b": {"histogram": {"field": "price", "interval": 10, "missing": 3.14}}}}""")
    probe("histogram sub-metric", histBase,
      """{"aggs": {"b": {"histogram": {"field": "price", "interval": 10}, "aggs": {"m0": {"sum": {"field": "qty"}}}}}}""")
    probe("histogram.min_doc_count", histBase,
      """{"aggs": {"b": {"histogram": {"field": "price", "interval": 10, "min_doc_count": 20}}}}""")

    val dhBase = """{"aggs": {"b": {"date_histogram": {"field": "ts", "calendar_interval": "day"}}}}"""
    probe("date_histogram.time_zone", dhBase,
      """{"aggs": {"b": {"date_histogram": {"field": "ts", "calendar_interval": "day", "time_zone": "Asia/Tokyo"}}}}""")
    probe("date_histogram.offset", dhBase,
      """{"aggs": {"b": {"date_histogram": {"field": "ts", "calendar_interval": "day", "offset": "+6h"}}}}""")
    probe("date_histogram sub-metric", dhBase,
      """{"aggs": {"b": {"date_histogram": {"field": "ts", "calendar_interval": "day"}, "aggs": {"m0": {"sum": {"field": "price"}}}}}}""")
    probe("date_histogram.min_doc_count=0", // empty-day fill on the 180-day corpus
      """{"aggs": {"b": {"date_histogram": {"field": "ts", "calendar_interval": "day"}, "aggs": {"m0": {"sum": {"field": "price"}}}}}}""",
      """{"aggs": {"b": {"date_histogram": {"field": "ts", "calendar_interval": "day", "min_doc_count": 0}, "aggs": {"m0": {"sum": {"field": "price"}}}}}}""")

    val rangeBase = """{"aggs": {"b": {"range": {"field": "price", "ranges": [{"to": 50}, {"from": 50}]}}}}"""
    probe("range sub-metric", rangeBase,
      """{"aggs": {"b": {"range": {"field": "price", "ranges": [{"to": 50}, {"from": 50}]}, "aggs": {"m0": {"sum": {"field": "qty"}}}}}}""")
    probe("range.keyed", rangeBase,
      """{"aggs": {"b": {"range": {"field": "price", "ranges": [{"key": "low", "to": 50}, {"key": "high", "from": 50}]}}}}""")

    val dateRangeBase =
      """{"aggs": {"b": {"date_range": {"field": "ts", "ranges": [{"to": "2024-04-01"}, {"from": "2024-04-01"}]}}}}"""
    probe("date_range sub-metric", dateRangeBase,
      """{"aggs": {"b": {"date_range": {"field": "ts", "ranges": [{"to": "2024-04-01"}, {"from": "2024-04-01"}]}, "aggs": {"m0": {"sum": {"field": "qty"}}}}}}""")
    // time_zone's reassignment window is the 9 h before each boundary's
    // UTC midnight — the fuzz corpus happens to have no doc there, so
    // this probe crafts one doc INSIDE the window (the option's effect
    // must be certain, not likely, for a silently-dropped check)
    val tzFrame = frame.sparkSession.sql("SELECT CAST('2024-03-31 20:00:00' AS TIMESTAMP) AS ts")
    probeOn(tzFrame)("date_range.time_zone",
      """{"aggs": {"b": {"date_range": {"field": "ts", "ranges": [{"to": "2024-04-01"}, {"from": "2024-04-01"}]}}}}""",
      """{"aggs": {"b": {"date_range": {"field": "ts", "ranges": [{"to": "2024-04-01"}, {"from": "2024-04-01"}], "time_zone": "Asia/Tokyo"}}}}""")
  }
}
