package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Native ≡ UDF equivalence drill for the token-shingle expression — the
  * contract that lets every gram pipeline (dupSpanStats, exciseDupSpans,
  * containmentPairs, ngramJaccardPairs, wordNgrams) swap in the native
  * kernel without moving an oracle-hashed bit. Hostile corpora: null
  * text, empty strings, multi-space runs (split keeps empties), unicode
  * multi-byte tokens, exactly-n and shorter-than-n docs, n = 1.
  */
class NgramsSpec extends SparkSpec {

  private val hostile = Seq(
    null,
    "",
    " ",
    "   ",
    "one",
    "one two",
    "one two three",
    "one two three four five",
    "a  b   c",
    "émile ça va 日本語 🎯 ok",
    ("tok " * 200).trim
  )

  test("native ngramsFromTokens == UDF reference, n in {1,2,3,8}") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x19bL)
    val randoms = Vector.fill(200) {
      val n = rnd.nextInt(12)
      Vector.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString).mkString(" ")
    }
    val df = (hostile ++ randoms).toDF("t").repartition(5)
    Seq(1, 2, 3, 8).foreach { n =>
      val rows = df
        .select(
          TextFns.ngramsFromTokens(TextFns.tokens(col("t")), n).as("native"),
          TextFns.ngramsFromTokensUdf(TextFns.tokens(col("t")), n).as("ref")
        )
        .collect()
      rows.foreach { r =>
        assert(!r.isNullAt(0) && !r.isNullAt(1), s"n=$n nullability: $r")
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n: $r")
      }
    }
  }

  test("null array input yields an empty array, like the UDF") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Option.empty[Seq[String]]), Tuple1(Some(Seq("a", "b", "c")))).toDF("toks")
    val rows = df
      .select(
        TextFns.ngramsFromTokens(col("toks"), 2).as("native"),
        TextFns.ngramsFromTokensUdf(col("toks"), 2).as("ref")
      )
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"$r")
    }
  }
}
