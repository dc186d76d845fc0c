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

  /** 64-bit simhash of the lowercased whitespace tokens: per bit k, sum ±1
    * over tokens by bit k of a 64-bit token hash, take the sign (tie → 0).
    * Computed by a compiled JVM UDF (a tight 64-counter loop per token) —
    * 64 interpreted aggregate expressions over the token array measured an
    * order of magnitude slower. The token hash is the first 8 md5 digest
    * bytes big-endian ([[graft.functions.OracleHash.md5Long]]) — r16:
    * recomputable in DuckDB from two 32-bit hex halves, so signatures AND
    * the emitted near-dup pairs are fully oracle-checked (the seeded-
    * murmur3 form was rows-only).
    */
  def simhash64(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val df = graft.Tables.ensureParallelism(df0.select(col(idCol), col(textCol)))
    val sim = udf((toks: Seq[String]) => {
      val counts = new Array[Int](64)
      toks.foreach { t =>
        val h = graft.functions.OracleHash.md5Long(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
      var sig = 0L
      var k = 0
      while (k < 64) {
        if (counts(k) > 0) sig |= (1L << k)
        k += 1
      }
      sig
    })
    df.select(col(idCol).as("id"), sim(TextFns.tokens(col(textCol))).as("simhash"))
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
    // groupBy rather than distinct: multi-band collisions collapse in the
    // map-side partial aggregation instead of shuffling one row per
    // colliding band (hamming is identical across a pair's collision rows,
    // so first() is deterministic).
    l.join(r, col("l.band") === col("r.band") && col("l.bits") === col("r.bits") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("a"), col("r.id").as("b"))
      .agg(first(bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
