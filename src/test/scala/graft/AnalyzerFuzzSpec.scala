package graft

import graft.search.{Analyzer, SearchDsl, TokenFilter}
import org.apache.spark.sql.functions._

/** Generative parity drill for the analyzer chain: for RANDOM filter
  * chains (stop / s_stem / edge_ngram in random order and multiplicity)
  * the SQL column path ([[SearchDsl.analyzeWith]] — codegen'd HOF
  * expressions) must produce token-for-token the same output as the JVM
  * twin ([[Analyzer.normalizeAll]] per whitespace token) that query
  * compilation uses. That symmetry is load-bearing: index-time and
  * query-time analysis meeting in the middle is what makes match /
  * BM25 / phrase semantics correct under any declared chain —
  * AnalyzerSpec pins three fixtures; this drill pins the space.
  *
  * The token corpus is suffix-adversarial for the S-stemmer's published
  * exception lists (-ies/-eies/-aies, -es/-aes/-ees/-oes, -s/-us/-ss,
  * length boundaries) plus random mutations, and includes tokens
  * shorter than min_gram (must vanish under edge_ngram), stopwords in
  * both PRE- and POST-stem forms (order of stop vs s_stem must matter
  * and match), and empty-string tokens from double spaces.
  */
class AnalyzerFuzzSpec extends SparkSpec {

  private val suffixFamilies = Vector(
    "ladies", "eies", "aies", "babies", "cities", "ties", "ies",
    "boxes", "aes", "trees", "goes", "oboes", "phrases", "tables", "es",
    "cats", "bus", "pass", "us", "ss", "s", "gas", "parts", "tops",
    "a", "ab", "abc", "abcd", "stop", "the", "table", "part", "ladie"
  )

  private def randToken(rnd: scala.util.Random): String =
    if (rnd.nextBoolean()) suffixFamilies(rnd.nextInt(suffixFamilies.size))
    else {
      val base = suffixFamilies(rnd.nextInt(suffixFamilies.size))
      val mutated =
        if (base.nonEmpty && rnd.nextBoolean())
          base.updated(rnd.nextInt(base.length), ('a' + rnd.nextInt(26)).toChar)
        else base + ('a' + rnd.nextInt(26)).toChar
      if (rnd.nextBoolean()) mutated.capitalize else mutated
    }

  private def genChain(rnd: scala.util.Random): Analyzer = {
    val stages = Seq.fill(1 + rnd.nextInt(3)) {
      rnd.nextInt(3) match {
        case 0 => TokenFilter.Stop(Seq.fill(1 + rnd.nextInt(4))(randToken(rnd).toLowerCase).distinct)
        case 1 => TokenFilter.SStem
        case 2 =>
          val mn = 1 + rnd.nextInt(3)
          TokenFilter.EdgeNgram(mn, mn + rnd.nextInt(4))
      }
    }
    Analyzer("fuzz", stages)
  }

  test("40 random chains x 200 texts: SQL column path == JVM twin, token for token") {
    val rnd = new scala.util.Random(0xa11a7eL)
    val texts = Vector.tabulate(200) { _ =>
      val sep = if (rnd.nextInt(10) == 0) "  " else " " // double space → empty token
      Seq.fill(1 + rnd.nextInt(6))(randToken(rnd)).mkString(sep)
    }
    val s = spark
    import s.implicits._
    val frame = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "text").cache()

    (1 to 40).foreach { ci =>
      val a = genChain(rnd)
      val got = frame
        .select(col("i"), SearchDsl.analyzeWith(col("text"), a).as("toks"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[String](1))
        .toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val want = t.toLowerCase.split(" ", -1).toSeq.flatMap(a.normalizeAll)
        assert(
          got(i) == want,
          s"chain #$ci ${a.filters} on <$t>: column path ${got(i)} != twin $want"
        )
      }
    }
  }
}
