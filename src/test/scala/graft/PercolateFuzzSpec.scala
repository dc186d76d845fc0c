package graft

import graft.search.{IndexMapping, JsonDsl, Percolate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generative tier-equivalence drill for the percolator.
  *
  * The hand-written tier-equality fixtures already caught one real
  * compiled-tier defect (`match` dropping `operator: "and"`). This spec
  * generalizes them: seeded random registries — every rich clause kind
  * (or / and / phrase and their negations), multi-field, with optional
  * range bounds — percolate random doc batches through BOTH tiers, and
  * both must agree with an independent plain-Scala evaluator pair by
  * pair. Triple agreement: a bug in either tier breaks one leg; a bug
  * in the shared analyzer contract breaks both against the reference.
  *
  * Phrase terms are sampled from real doc bigrams half the time so the
  * positional verifier sees true adjacent hits, not just misses; `and`
  * terms co-sample from one doc so conjunctions actually fire; range
  * bounds straddle the value distribution. Doc values include NULLs
  * (a NULL range value must fail bounded rules and pass unbounded ones
  * in BOTH tiers).
  */
class PercolateFuzzSpec extends SparkSpec {

  private val vocab = Vector(
    "ink", "oak", "silt", "vane", "crag", "fern", "moss", "reed", "shale",
    "tarn", "wisp", "dune", "flux", "grove", "helix", "isle", "knoll"
  )

  private case class PDoc(id: Long, title: String, body: String, value: Option[Double])

  private case class Clause(field: String, kind: String, terms: Seq[String])
  private case class Rule(id: Long, clauses: Seq[Clause], rgt: Option[Double], rlte: Option[Double])

  private def genDocs(rnd: scala.util.Random, n: Int): Vector[PDoc] =
    Vector.tabulate(n) { i =>
      def txt(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      PDoc(
        i.toLong,
        txt(2 + rnd.nextInt(5)),
        txt(3 + rnd.nextInt(8)),
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(1000) / 10.0)
      )
    }

  private def genRules(rnd: scala.util.Random, docs: Vector[PDoc], n: Int): Vector[Rule] = {
    val fields = Vector("title", "body")
    def tokensOf(d: PDoc, f: String) = (if (f == "title") d.title else d.body).split(" ").toVector
    def genTerms(f: String, kind: String): Seq[String] = {
      val fromDoc = rnd.nextBoolean()
      if (kind == "phrase" || kind == "not_phrase") {
        if (fromDoc) {
          // a real window from a real doc: true adjacent hits exist
          val toks = tokensOf(docs(rnd.nextInt(docs.size)), f)
          val len = 1 + rnd.nextInt(math.min(3, toks.size))
          val start = rnd.nextInt(toks.size - len + 1)
          toks.slice(start, start + len)
        } else Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
      } else if (kind == "and" || kind == "not_and") {
        if (fromDoc) {
          // co-sampled from ONE doc so the conjunction can actually fire
          val toks = tokensOf(docs(rnd.nextInt(docs.size)), f)
          Seq.fill(1 + rnd.nextInt(3))(toks(rnd.nextInt(toks.size))).distinct
        } else Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).distinct
      } else Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).distinct
    }
    val posKinds = Vector("or", "and", "phrase")
    val negKinds = Vector("not_or", "not_and", "not_phrase")
    Vector.tabulate(n) { i =>
      val nPos = 1 + rnd.nextInt(2)
      val nNeg = rnd.nextInt(2)
      val clauses =
        Seq.fill(nPos) { val k = posKinds(rnd.nextInt(3)); val f = fields(rnd.nextInt(2)); Clause(f, k, genTerms(f, k)) } ++
          Seq.fill(nNeg) { val k = negKinds(rnd.nextInt(3)); val f = fields(rnd.nextInt(2)); Clause(f, k, genTerms(f, k)) }
      val rgt = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(800) / 10.0) else None
      val rlte = if (rnd.nextInt(3) == 0) Some((200 + rnd.nextInt(800)) / 10.0) else None
      Rule(i.toLong, clauses, rgt, rlte)
    }
  }

  // ── independent evaluator ───────────────────────────────────────────
  private def evalClause(c: Clause, d: PDoc): Boolean = {
    val toks = (if (c.field == "title") d.title else d.body).split(" ").toVector
    def phraseHit: Boolean =
      toks.indices.exists(i =>
        i + c.terms.size <= toks.size && c.terms.indices.forall(j => toks(i + j) == c.terms(j))
      )
    c.kind match {
      case "or" => c.terms.exists(toks.contains)
      case "and" => c.terms.forall(toks.contains)
      case "phrase" => phraseHit
      case "not_or" => !c.terms.exists(toks.contains)
      case "not_and" => !c.terms.forall(toks.contains)
      case "not_phrase" => !phraseHit
    }
  }

  private def evalRule(r: Rule, d: PDoc): Boolean =
    r.clauses.forall(evalClause(_, d)) &&
      r.rgt.forall(g => d.value.exists(_ > g)) &&
      r.rlte.forall(l => d.value.exists(_ <= l))

  private def run(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val docs = genDocs(rnd, 80)
    val rules = genRules(rnd, docs, 60)
    val s = spark
    import s.implicits._

    val docsDf: DataFrame = docs
      .map(d => (d.id, d.title, d.body, d.value.map(Double.box).orNull))
      .toDF("doc_id", "title", "body", "value")
      .select(col("doc_id"), col("title"), col("body"), col("value").cast("double").as("value"))

    // indexed tier
    val specs = rules
      .map(r => (r.id, r.clauses.map(c => (c.field, c.kind, c.terms)), r.rgt.map(Double.box).orNull, r.rlte.map(Double.box).orNull))
      .toDF("query_id", "clauses", "rgt", "rlte")
      .select(
        col("query_id"),
        expr("transform(clauses, c -> struct(c._1 AS field, c._2 AS kind, c._3 AS terms))").as("clauses"),
        col("rgt").cast("double").as("rgt"),
        col("rlte").cast("double").as("rlte")
      )
    val indexed = Percolate
      .percolateRich(Percolate.buildIndexRich(specs), docsDf, "doc_id", Seq("title", "body"), "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    // compiled tier over the SAME registry, rendered to wire bodies
    val bodies = rules.map(r =>
      (r.id, Percolate.asJsonBodyRich(r.clauses.map(c => (c.field, c.kind, c.terms)), r.rgt, r.rlte, "value"))
    )
    val mapping = IndexMapping(Map("title" -> "text", "body" -> "text"))
    val compiled = JsonDsl
      .percolate(docsDf.withColumnRenamed("doc_id", "_id"), bodies, mapping)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("_id")), r.getLong(r.fieldIndex("query_id"))))
      .toSet

    // reference
    val want = (for { r <- rules; d <- docs if evalRule(r, d) } yield (d.id, r.id)).toSet

    def diffMsg(name: String, got: Set[(Long, Long)]): String = {
      val extra = (got -- want).take(3)
      val missing = (want -- got).take(3)
      def show(p: (Long, Long)) = {
        val r = rules(p._2.toInt)
        s"doc=${docs(p._1.toInt)} rule=$r body=${bodies(p._2.toInt)._2}"
      }
      s"$name tier mismatch (seed=$seed): extra=${extra.map(show)} missing=${missing.map(show)}"
    }
    assert(indexed == want, diffMsg("indexed", indexed))
    assert(compiled == want, diffMsg("compiled", compiled))
    assert(want.nonEmpty, s"degenerate draw (seed=$seed): no matches at all — generator broken")
  }

  test("random registries: indexed ≡ compiled ≡ reference (seed 1)") { run(101L) }
  test("random registries: indexed ≡ compiled ≡ reference (seed 2)") { run(202L) }
  test("random registries: indexed ≡ compiled ≡ reference (seed 3)") { run(303L) }
}
