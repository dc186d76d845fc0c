package graft

import graft.search.{Analyzer, SearchDsl, TokenFilter}
import org.apache.spark.sql.functions._

/** Native≡HOF equivalence drills for the r18 analyzer-chain kernels:
  * [[graft.search.AnalyzeChainExpr]] / [[graft.search.PhraseChainMatch]] /
  * [[graft.search.ChainTermHits]] against the retired interpreted-HOF
  * forms (kept in SearchDsl as private[graft] references). Corpora carry
  * the hostile shapes: empty strings, repeated/leading/trailing spaces
  * (split keeps empties), stopwords colliding with stems, uppercase,
  * non-ASCII tokens, NULL text, and every chain shape (bare, stop,
  * stem, stop+stem, stem+stop, edge_ngram).
  */
class AnalyzeChainSpec extends SparkSpec {

  private val chains = Seq(
    Analyzer("bare"),
    Analyzer("stop", stopwords = Seq("the", "a", "üb"), stem = false),
    Analyzer("stem", stopwords = Nil, stem = true),
    Analyzer("stopstem", stopwords = Seq("the", "a", "tables"), stem = true),
    Analyzer("stemstop", Seq(TokenFilter.SStem, TokenFilter.Stop(Seq("table", "query")))),
    Analyzer("sayt", Seq(TokenFilter.Stop(Seq("the")), TokenFilter.EdgeNgram(2, 5)))
  )

  private def corpus = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x18cL)
    val vocab = Seq("Tables", "the", "a", "queries", "GLASSES", "pass", "bus", "goes", "tree",
      "ÜBer", "üb", "naïve", "所得", "ies", "es", "s", "x", "eies", "oes", "aies", "")
    val rows: Seq[Option[String]] = Seq(
      None, Some(""), Some(" "), Some("  double  spaces  "), Some("the the the"),
      Some("Tables the queries"), Some("trailing space "), Some(" leading")
    ) ++ Vector.tabulate(120) { _ =>
      Some(Vector.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    rows.toDF("text")
  }

  test("analyzeWith native == HOF, every chain, bit-for-bit token arrays") {
    val df = corpus
    chains.foreach { a =>
      val got = df.select(SearchDsl.analyzeWith(col("text"), a)).collect().map(r =>
        if (r.isNullAt(0)) null else r.getSeq[String](0))
      val want = df.select(SearchDsl.analyzeWithHof(col("text"), a)).collect().map(r =>
        if (r.isNullAt(0)) null else r.getSeq[String](0))
      assert(got.toSeq == want.toSeq, s"chain ${a.name}")
    }
  }

  test("matchScoreWith native == HOF, including NULL text and duplicate query terms") {
    val df = corpus
    val queries = Seq(Seq("tables", "the"), Seq("queries", "queries"), Seq("glasses"),
      Seq("übe", "üb"), Seq("nonexistent"), Seq.empty[String])
    chains.filterNot(_.filters.exists(_.isInstanceOf[TokenFilter.EdgeNgram])).foreach { a =>
      queries.foreach { q =>
        val got = df.select(SearchDsl.matchScoreWith(col("text"), a, q, a)).collect().map(r =>
          if (r.isNullAt(0)) null else r.getInt(0))
        val want = df.select(SearchDsl.matchScoreWithHof(col("text"), a, q, a)).collect().map(r =>
          if (r.isNullAt(0)) null else r.getInt(0))
        assert(got.toSeq == want.toSeq, s"chain ${a.name} q=$q")
      }
    }
    // edge_ngram chains score through the expanded prefixes the same way
    val sayt = chains.last
    val got = df.select(SearchDsl.matchScoreWith(col("text"), sayt, Seq("tab", "qu"), sayt)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0))
    val want = df.select(SearchDsl.matchScoreWithHof(col("text"), sayt, Seq("tab", "qu"), sayt)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == want.toSeq)
  }

  test("matchPhraseWith native == HOF: position gaps, repeats, all-stopword, NULL text") {
    val df = corpus
    val phrases = Seq("tables the queries", "the a", "glasses pass", "tree", "the the",
      "tables queries", "naïve über")
    chains.filterNot(_.filters.exists(_.isInstanceOf[TokenFilter.EdgeNgram])).foreach { a =>
      phrases.foreach { p =>
        val got = df.select(SearchDsl.matchPhraseWith(col("text"), a, p)).collect().map(r =>
          if (r.isNullAt(0)) null else r.getBoolean(0))
        val want = df.select(SearchDsl.matchPhraseWithHof(col("text"), a, p)).collect().map(r =>
          if (r.isNullAt(0)) null else r.getBoolean(0))
        assert(got.toSeq == want.toSeq, s"chain ${a.name} phrase='$p'")
      }
    }
  }
}
