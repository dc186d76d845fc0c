package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training-data pipelines.
  *
  * Everything keys off a hex prefix of md5(id): stable across runs,
  * engines, partitionings and scale (no RNG state, no sampleBy seed
  * drift), so a document's split/sample membership never changes as the
  * corpus grows — the property train/val/test hygiene actually requires.
  * Pure per-row expressions: embarrassingly parallel, no shuffle beyond
  * the caller's aggregation.
  */
object Sampling {

  /** First two hex chars of md5 of the (stringified) id: 256 deterministic
    * equal-probability buckets as a sortable string.
    */
  def hashBucket(id: Column): Column = substring(md5(id.cast("string")), 1, 2)

  /** Train/val/test assignment by hash-bucket range: buckets are uniform
    * over 00..ff, so ['00','c0') ≈ 75% train, ['c0','e0') ≈ 12.5% val,
    * rest ≈ 12.5% test.
    */
  def split(id: Column): Column =
    when(hashBucket(id) < "c0", "train")
      .when(hashBucket(id) < "e0", "val")
      .otherwise("test")

  /** Deterministic ~`fraction` sample within every stratum: membership is
    * a pure function of the id, uniform within each stratum because the
    * hash ignores the stratum column entirely.
    */
  def stratifiedKeep(id: Column, fraction: Double): Column = {
    require(fraction > 0 && fraction <= 1, s"fraction out of range: $fraction")
    // max(1): sub-1/512 fractions would round to zero buckets and
    // silently keep nothing; the floor grain of this sampler is 1/256.
    val buckets = math.round(fraction * 256).min(256).max(1)
    // 256 buckets would format as 3-char "100", which sorts BELOW 2-char
    // hex buckets — a full sample must short-circuit to true.
    if (buckets >= 256) lit(true) else hashBucket(id) < f"$buckets%02x"
  }

  /** Per-group keep rates — the corpus-MIXING primitive (down-weight one
    * source/language, up-weight another, the knob every pre-training data
    * recipe turns). Same deterministic md5 machinery at a finer 16-bit
    * grain (65536 buckets): a document's membership is a pure function of
    * its id and its group's rate — stable under corpus growth,
    * repartitioning, and engine — and rates compose with [[split]]
    * because both read disjoint functions of the same hash.
    *
    * Groups absent from `rates` are kept in full (rate 1.0).
    */
  def weightedKeep(id: Column, group: Column, rates: Map[String, Double]): Column = {
    require(rates.values.forall(r => r >= 0 && r <= 1), s"rates out of range: $rates")
    val prefix = substring(md5(id.cast("string")), 1, 4)
    rates.toSeq.sortBy(_._1).foldLeft(lit(true)) { case (acc, (g, rate)) =>
      val cond =
        if (rate >= 1.0) lit(true)
        else if (rate <= 0.0) lit(false)
        // 16-bit grain: keep the ids whose 4-hex-char prefix sorts below
        // round(rate·65536) rendered in hex — the string comparison is
        // exactly the numeric one because both sides are 4 lowercase hex
        // chars.
        else prefix < f"${math.round(rate * 65536).toInt.min(65535)}%04x"
      when(group === g, cond).otherwise(acc)
    }
  }
}
