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
}
