package graft

import graft.search.JsonDsl
import org.apache.spark.sql.DataFrame

/** Generative drill for the scoring faces of the wire API — the score
  * FORMULAS, per document, against independent Scala folds of the
  * documented math:
  *
  *  - function_score / field_value_factor: boost × modifier(factor ×
  *    field) across all modifiers (none/ln1p/log1p/sqrt/square — ln*
  *    natural log, log* base 10), with and without an inner filter;
  *  - function_score / gauss decay: exp(ln(decay)/scale² ·
  *    max(|x − origin| − offset, 0)²);
  *  - function_score / random_score: the seeded md5-prefix uniform —
  *    reproduced independently via MessageDigest (the determinism the
  *    clause promises: same (seed, id) ⇒ same jitter on any engine);
  *  - script_score: random arithmetic expression trees over the
  *    runtime-field grammar (+ − × ÷ unary-neg parens ln abs mod),
  *    evaluated per doc in plain Scala doubles;
  *  - size truncation under relevance ordering: the emitted score
  *    multiset equals the reference top-k multiset (ids at a tied
  *    boundary are legitimately unordered — scores are not).
  */
class ScoringFuzzSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def mkDf(rnd: scala.util.Random, n: Int): (DataFrame, Seq[(Long, Double, Double)]) = {
    val s = spark
    import s.implicits._
    val rows = Seq.tabulate(n)(i => (i.toLong, rnd.nextInt(1000) / 10.0, rnd.nextInt(2000) / 10.0))
    (rows.toDF("id", "f0", "f1").repartition(1 + rnd.nextInt(4)), rows)
  }

  private def collectScores(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("id")), r.getDouble(r.fieldIndex("_score")))).toSeq

  private def assertScores(got: Seq[(Long, Double)], want: Map[Long, Double], ctx: String): Unit = {
    assert(got.map(_._1).toSet == want.keySet, s"$ctx: hit set mismatch")
    got.foreach { case (id, sc) => assert(sc == want(id), s"$ctx: score mismatch for id=$id: $sc != ${want(id)}") }
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, s"$ctx: not ordered by _score desc")
  }

  test("field_value_factor: boost x modifier(factor x field), all modifiers, random filters") {
    val rnd = new scala.util.Random(0xf5c03eL)
    (1 to 12).foreach { ci =>
      val (df, rows) = mkDf(rnd, 40 + rnd.nextInt(80))
      val factor = (1 + rnd.nextInt(40)) / 10.0
      val boost = (1 + rnd.nextInt(30)) / 10.0
      val modifier = Seq("none", "ln1p", "log1p", "sqrt", "square")(rnd.nextInt(5))
      val cut = rnd.nextInt(100)
      val withFilter = rnd.nextBoolean()
      val filterJson = if (withFilter) s""", "query": {"range": {"f1": {"gte": $cut}}}""" else ""
      val body =
        s"""{"query": {"function_score": {
           |  "field_value_factor": {"field": "f0", "factor": $factor, "modifier": "$modifier"},
           |  "boost": $boost$filterJson}}}""".stripMargin
      def mod(raw: Double): Double = modifier match {
        case "none"   => raw
        case "ln1p"   => math.log(1.0 + raw)
        case "log1p"  => math.log10(1.0 + raw)
        case "sqrt"   => math.sqrt(raw)
        case "square" => raw * raw
      }
      val want = rows
        .filter { case (_, _, f1) => !withFilter || f1 >= cut }
        .map { case (id, f0, _) => id -> r6(boost * mod(factor * f0)) }
        .toMap
      assertScores(collectScores(JsonDsl.parse(df, body)), want, s"fvf config $ci ($modifier)")
    }
  }

  test("gauss decay and seeded random_score match independent folds") {
    val rnd = new scala.util.Random(0x9a0551L)
    (1 to 8).foreach { ci =>
      val (df, rows) = mkDf(rnd, 40 + rnd.nextInt(60))
      // gauss
      val origin = rnd.nextInt(100).toDouble
      val scale = (1 + rnd.nextInt(50)).toDouble
      val offset = rnd.nextInt(10).toDouble
      val decay = Seq(0.3, 0.5, 0.7)(rnd.nextInt(3))
      val boost = (1 + rnd.nextInt(20)) / 10.0
      val gBody =
        s"""{"query": {"function_score": {
           |  "gauss": {"f0": {"origin": $origin, "scale": $scale, "offset": $offset, "decay": $decay}},
           |  "boost": $boost}}}""".stripMargin
      val wantG = rows.map { case (id, f0, _) =>
        val d = math.max(math.abs(f0 - origin) - offset, 0.0)
        id -> r6(boost * math.exp(math.log(decay) / (scale * scale) * d * d))
      }.toMap
      assertScores(collectScores(JsonDsl.parse(df, gBody)), wantG, s"gauss config $ci")

      // random_score: md5("seed:id") first 8 hex chars as uint32 / 2^32
      val seed = rnd.nextInt(10000)
      val rBody =
        s"""{"query": {"function_score": {"random_score": {"seed": $seed, "field": "id"}}}}"""
      val md = java.security.MessageDigest.getInstance("MD5")
      val wantR = rows.map { case (id, _, _) =>
        val hex = md.digest(s"$seed:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
        id -> r6(java.lang.Long.parseLong(hex.take(8), 16).toDouble / 4294967296.0)
      }.toMap
      assertScores(collectScores(JsonDsl.parse(df, rBody)), wantR, s"random_score config $ci")
    }
  }

  /** Random expression trees over the script grammar, with guards that
    * keep every subexpression inside both engines' total domain (ln
    * args positive, denominators bounded away from zero).
    */
  private def genScript(rnd: scala.util.Random, depth: Int): (String, (Double, Double) => Double) = {
    if (depth == 0) rnd.nextInt(3) match {
      case 0 => ("f0", (a, _) => a)
      case 1 => ("doc.f1", (_, b) => b)
      case _ =>
        val c = (1 + rnd.nextInt(200)) / 10.0
        (c.toString, (_, _) => c)
    }
    else rnd.nextInt(7) match {
      case 0 =>
        val (ls, lf) = genScript(rnd, depth - 1); val (rs, rf) = genScript(rnd, depth - 1)
        (s"($ls + $rs)", (a, b) => lf(a, b) + rf(a, b))
      case 1 =>
        val (ls, lf) = genScript(rnd, depth - 1); val (rs, rf) = genScript(rnd, depth - 1)
        (s"($ls - $rs)", (a, b) => lf(a, b) - rf(a, b))
      case 2 =>
        val (ls, lf) = genScript(rnd, depth - 1); val (rs, rf) = genScript(rnd, depth - 1)
        (s"($ls * $rs)", (a, b) => lf(a, b) * rf(a, b))
      case 3 =>
        val (ls, lf) = genScript(rnd, depth - 1); val (rs, rf) = genScript(rnd, depth - 1)
        (s"($ls / (abs($rs) + 1))", (a, b) => lf(a, b) / (math.abs(rf(a, b)) + 1))
      case 4 =>
        val (ls, lf) = genScript(rnd, depth - 1)
        (s"ln(abs($ls) + 1)", (a, b) => math.log(math.abs(lf(a, b)) + 1))
      case 5 =>
        val (ls, lf) = genScript(rnd, depth - 1); val (rs, rf) = genScript(rnd, depth - 1)
        (s"mod($ls, (abs($rs) + 1))", (a, b) => lf(a, b) % (math.abs(rf(a, b)) + 1))
      case _ =>
        val (ls, lf) = genScript(rnd, depth - 1)
        (s"(-$ls)", (a, b) => -lf(a, b))
    }
  }

  test("script_score: random arithmetic trees == per-doc Scala fold, bit-exact at 6dp") {
    val rnd = new scala.util.Random(0x5c21b7L)
    (1 to 20).foreach { ci =>
      val (df, rows) = mkDf(rnd, 30 + rnd.nextInt(50))
      val (src, f) = genScript(rnd, 1 + rnd.nextInt(3))
      val body = s"""{"query": {"script_score": {"script": {"source": "$src"}}}}"""
      val want = rows.map { case (id, f0, f1) => id -> r6(f(f0, f1)) }.toMap
      assertScores(collectScores(JsonDsl.parse(df, body)), want, s"script $ci: $src")
    }
  }

  test("size truncation under relevance: emitted score multiset == reference top-k multiset") {
    val rnd = new scala.util.Random(0x70c4e1L)
    (1 to 6).foreach { ci =>
      val (df, rows) = mkDf(rnd, 60 + rnd.nextInt(60))
      val k = 1 + rnd.nextInt(15)
      val body =
        s"""{"query": {"function_score": {
           |  "field_value_factor": {"field": "f0", "modifier": "sqrt"}}}, "size": $k}""".stripMargin
      val got = collectScores(JsonDsl.parse(df, body))
      val wantTop = rows.map { case (_, f0, _) => r6(math.sqrt(f0)) }.sorted.reverse.take(k)
      assert(got.size == math.min(k.toLong, rows.size).toInt, s"config $ci: wrong hit count")
      assert(got.map(_._2).sorted == wantTop.sorted, s"config $ci: top-$k score multiset mismatch")
    }
  }
}
