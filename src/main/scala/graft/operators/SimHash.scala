package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash (Charikar '02) near-duplicate detection: a 64-bit locality-
  * sensitive fingerprint whose Hamming distance tracks cosine similarity of
  * the token multiset.
  *
  * Candidate generation uses the pigeonhole block trick (Manku et al.,
  * WWW'07): split the 64-bit fingerprint into `blocks` bands; two docs
  * within Hamming distance `maxHamming < blocks` must agree on at least one
  * band → join on (band index, band bits), verify with bit_count(xor).
  * Same no-cross-join shape as MinHash banding.
  */
object SimHash {

  /** 64-bit simhash of the lowercased whitespace tokens, built entirely
    * from codegen'd expressions: per bit k, sum ±1 over tokens by bit k of
    * xxhash64(token), take the sign.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    // Per-token 64-bit hash once; then 64 sign-sums over the array.
    val hashes = transform(toks, t => xxhash64(t))
    val bitCols = (0 until 64).map { k =>
      val votes = aggregate(
        col("_th"),
        lit(0),
        (acc, h) => acc + when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)
      )
      when(votes > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }
    df.select(col(idCol).as("id"), hashes.as("_th"))
      .select(col("id"), bitCols.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Pairs (a < b) with Hamming distance <= maxHamming. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3, blocks: Int = 4): DataFrame = {
    require(maxHamming < blocks, "pigeonhole needs maxHamming < blocks")
    val width = 64 / blocks
    val sigs = simhash64(df, idCol, textCol)
    val banded = sigs.select(
      col("id"),
      col("simhash"),
      posexplode(
        array((0 until blocks).map(b => shiftright(col("simhash"), b * width).bitwiseAND(lit((1L << width) - 1))): _*)
      ).as(Seq("band", "bits"))
    )
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bits") === col("r.bits") && col("l.id") < col("r.id"))
      .select(
        col("l.id").as("a"),
        col("r.id").as("b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming")
      )
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
