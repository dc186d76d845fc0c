package graft

import graft.search.{Bm25, JsonDsl}
import org.apache.spark.sql.functions._

/** Generative drill for the two hybrid-search FUSIONS — rank-space RRF
  * and score-space min-max/weighted-mean — against independent Scala
  * folds. The legs themselves are already under their own fuzzers
  * (Bm25FuzzSpec pins the scoring formula, SimilarityFuzzSpec the
  * cosine top-k); what this drill isolates is the fusion machinery:
  * rank assignment inside each leg, the full-outer union of leg hits,
  * missing-leg semantics (RRF: absent term contributes 0; normalized:
  * absent leg contributes 0 while its weight STAYS in the
  * denominator), single-valued-leg normalization to 1.0, and weight
  * binding to the DECLARED sub-query order — the places a fusion
  * silently skews while both legs stay individually correct.
  */
class HybridFuzzSpec extends SparkSpec {

  private val vocab = Vector(
    "spark", "query", "index", "shard", "merge", "vector", "token", "score",
    "filter", "bucket", "stream", "batch", "join", "scan", "sort", "hash"
  )

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("RRF and min-max fusion == reference folds over the engine's own legs, random configs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x4bf1dL)

    (1 to 6).foreach { ci =>
      val n = 40 + rnd.nextInt(60)
      val dim = 8
      val docs = Seq.tabulate(n) { i =>
        (i.toLong, Vector.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val vecs = docs.map { case (id, _) => (id, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)) }
      val docsDf = docs.toDF("doc_id", "text").repartition(1 + rnd.nextInt(4))
      val vecsDf = vecs.toDF("id", "embedding").select(col("id"), col("embedding").cast("array<float>").as("embedding"))
      val index = Bm25.buildIndex(docsDf, "doc_id", "text")

      val terms = Vector.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).distinct
      val qv = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      val k = 3 + rnd.nextInt(10)
      val kk = 3 + rnd.nextInt(10)
      val (wa, wb) = ((1 + rnd.nextInt(9)) / 10.0, (1 + rnd.nextInt(9)) / 10.0)
      val lexFirst = rnd.nextBoolean()
      val legs =
        Seq(
          s"""{"match": {"text": "${terms.mkString(" ")}"}}""",
          s"""{"knn": {"embedding": {"vector": [${qv.map(_.toDouble).mkString(",")}], "k": $kk}}}"""
        )
      val ordered = if (lexFirst) legs else legs.reverse

      // Reference legs: the engine's own lex top-k (independently
      // fuzzed elsewhere) + a Scala cosine fold; ranks by (score desc, id).
      val lexLeg = Bm25
        .scoreAgainstIndex(index, terms.map(_.toLowerCase), k)
        .collect()
        .map(r => (r.getLong(r.fieldIndex("id")), r.getDouble(r.fieldIndex("score"))))
        .sortBy { case (id, sc) => (-sc, id) }
      def cosRef(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { val x = a(i).toDouble; val y = b(i).toDouble; dot += x * y; na += x * x; nb += y * y; i += 1 }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val vecLeg = vecs
        .map { case (id, v) => (id, r6(cosRef(v, qv))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(kk)

      // --- RRF ---
      val rrfBody = s"""{"query": {"hybrid": {"queries": [${ordered.mkString(", ")}]}}, "size": $k}"""
      val gotRrf = JsonDsl
        .hybrid(index, vecsDf, "id", rrfBody)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .toSeq
      val lexRank = lexLeg.zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      val vecRank = vecLeg.zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      val wantRrf = (lexRank.keySet ++ vecRank.keySet).toSeq
        .map { id =>
          (id, r6(lexRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            vecRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)))
        }
        .sortBy { case (id, sc) => (-sc, id) }
        .take(k)
      assert(gotRrf == wantRrf, s"corpus $ci: RRF fusion mismatch (terms=$terms k=$k kk=$kk)")

      // --- min-max / weighted arithmetic mean ---
      val normBody =
        s"""{"query": {"hybrid": {"queries": [${ordered.mkString(", ")}]}}, "size": $k,
           | "search_pipeline": {"phase_results_processors": [{"normalization-processor": {
           |   "normalization": {"technique": "min_max"},
           |   "combination": {"technique": "arithmetic_mean", "parameters": {"weights": [$wa, $wb]}}}}]}}""".stripMargin
      val gotNorm = JsonDsl
        .hybridNormalized(index, vecsDf, "id", normBody)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .toSeq
      def mm(leg: Seq[(Long, Double)]): Map[Long, Double] = {
        if (leg.isEmpty) Map.empty
        else {
          val mn = leg.map(_._2).min
          val mx = leg.map(_._2).max
          leg.map { case (id, sc) => id -> (if (mx == mn) 1.0 else (sc - mn) / (mx - mn)) }.toMap
        }
      }
      val (wLex, wVec) = if (lexFirst) (wa, wb) else (wb, wa)
      val lexN = mm(lexLeg)
      val vecN = mm(vecLeg)
      val wantNorm = (lexN.keySet ++ vecN.keySet).toSeq
        .map { id =>
          (id, r6((lexN.getOrElse(id, 0.0) * wLex + vecN.getOrElse(id, 0.0) * wVec) / (wLex + wVec)))
        }
        .sortBy { case (id, sc) => (-sc, id) }
        .take(k)
      assert(
        gotNorm == wantNorm,
        s"corpus $ci: min-max fusion mismatch (lexFirst=$lexFirst weights=($wa,$wb))"
      )
    }
  }
}
