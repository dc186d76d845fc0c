package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat and the hat"),
    (2L, "le chat et la table"),
    (3L, "a1 b2 c3")
  ).toDF("doc_id", "text")

  test("token counts") {
    val out = docs
      .select($"doc_id", TextFns.tokenCount($"text"), TextFns.distinctTokenCount($"text"))
      .as[(Long, Int, Int)]
      .collect()
      .map { case (k, a, b) => k -> ((a, b)) }
      .toMap
    assert(out(1L) == ((5, 4)))
    assert(out(3L) == ((3, 3)))
  }

  test("fingerprint is order- and repeat-insensitive") {
    val fps = Seq((1L, "b a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
      .select(TextFns.fingerprint($"text"))
      .as[String]
      .collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("langPredict scores marker words with declaration-order tie-break") {
    val out = docs.select($"doc_id", TextFns.langPredict($"text")).as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "fr")
    assert(out(3L) == "en") // all scores 0 -> tie -> first lang wins
  }

  test("wordNgrams builds sliding windows; short docs yield empty") {
    val bi = docs.filter($"doc_id" === 1).select(TextFns.wordNgrams($"text", 2)).as[Seq[String]].head()
    assert(bi == Seq("the cat", "cat and", "and the", "the hat"))
    val tri = Seq((1L, "only two")).toDF("doc_id", "text").select(TextFns.wordNgrams($"text", 3)).as[Seq[String]].head()
    assert(tri.isEmpty)
  }

  test("charRatio and stopwordRatio") {
    val r = docs
      .filter($"doc_id" === 3)
      .select(round(TextFns.charRatio($"text", "0-9"), 4), round(TextFns.stopwordRatio($"text"), 4))
      .as[(Double, Double)]
      .head()
    assert(r._1 == 0.375) // 3 digits / 8 chars
    assert(r._2 == 0.0)
  }

  test("rollingHashes: same window -> same hash, deterministic across runs") {
    val h1 = docs.select(TextFns.rollingHashes($"text", 3)).as[Seq[Long]].collect()
    val h2 = docs.select(TextFns.rollingHashes($"text", 3)).as[Seq[Long]].collect()
    assert(h1.toSeq == h2.toSeq)
    assert(h1.head.length == 3) // 5 tokens, window 3
  }

  test("rollingHashes rolling recurrence == direct per-window polynomial (real corpus)") {
    // The kernel slides in O(1) per window (subtract-shift-add); assert
    // every window value equals the DIRECT Horner evaluation of that
    // window — the md5-based contract the DuckDB oracle recomputes.
    import graft.functions.OracleHash
    val w = 5
    val rows = Tables
      .documents(spark, Sf)
      .select($"doc_id", TextFns.tokens($"text").as("_toks"), TextFns.rollingHashesFromTokens(TextFns.tokens($"text"), w).as("kernel"))
      .as[(Long, Seq[String], Seq[Long])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, toks, kernel) =>
      val want =
        if (toks.length < w) Seq.empty[Long]
        else
          (0 to toks.length - w).map { i =>
            toks.slice(i, i + w).foldLeft(0L)((h, t) => (h * OracleHash.RollB + OracleHash.md5ModP(t)) % OracleHash.P)
          }
      assert(kernel == want, s"doc $id: rolling kernel diverges from direct polynomial")
    }
  }

  test("maxBigramCount finds the most repeated bigram; short docs yield 0") {
    val got = Seq(
      (1L, "a b a b a b c"), // "a b" x3
      (2L, "x y z"), // all distinct bigrams -> 1
      (3L, "solo")
    ).toDF("id", "text")
      .select($"id", TextFns.maxBigramCount(TextFns.tokens($"text")))
      .as[(Long, Int)]
      .collect()
      .toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 0))
  }

  test("minhash_agg rejects non-string input at analysis time") {
    GraftFunctions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_agg(i, 8) FROM VALUES (1), (2) AS t(i)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }

  test("slidingChunks: overlap, trailing partials, short docs, exact coverage") {
    val rows = Seq(
      (1L, (1 to 80).map(i => s"t$i").mkString(" ")), // 80 toks → starts 0,24,48,72 → 32,32,32,8
      (2L, "a b c"),                                  // shorter than one window → single chunk
      (3L, (1 to 48).map(i => s"x$i").mkString(" "))  // 48 → starts 0,24 → 32,24
    ).toDF("doc_id", "text")
    val out = rows
      .select(col("doc_id"), explode(TextFns.slidingChunks(col("text"), window = 32, stride = 24)).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), size(col("c.toks")).as("n"), col("c.toks").getItem(0).as("first"))
      .as[(Long, Int, Int, String)]
      .collect()
      .toSeq
      .sorted
    assert(out.map(r => (r._1, r._2, r._3)) == Seq(
      (1L, 0, 32), (1L, 1, 32), (1L, 2, 32), (1L, 3, 8),
      (2L, 0, 3),
      (3L, 0, 32), (3L, 1, 24)
    ))
    // stride semantics: doc 3's second chunk starts at token 25
    assert(out.find(r => r._1 == 3L && r._2 == 1).get._4 == "x25")
    // every token of doc 1 is covered at least once (provenance-complete)
    val covered = out.filter(_._1 == 1L).flatMap(r => (r._2 * 24) until (r._2 * 24 + r._3)).toSet
    assert(covered == (0 until 80).toSet)
    intercept[IllegalArgumentException](TextFns.slidingChunks(col("text"), window = 8, stride = 9))
  }
}
