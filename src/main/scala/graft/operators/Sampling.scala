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

  /** The 16-bit Knuth multiplicative draw as an integer in [0, 65536):
    * computed as ((id mod 2¹⁶) · (K mod 2¹⁶)) mod 2¹⁶, which equals
    * (id · K) mod 2¹⁶ for EVERY 64-bit id — the naive `id * K` form
    * overflows Long past id ≈ 3.5e9 and THROWS under ANSI mode, so a
    * corpus with snowflake-style ids would crash the sampler. The
    * reduced form's intermediate maxes at 65535 · 31153 (K mod 2¹⁶),
    * and emitted membership is bit-identical to the original draw on
    * every id the original survived.
    */
  private[graft] def knuthDraw16(x: Column): Column =
    pmod(pmod(x, lit(65536L)) * lit(31153L), lit(65536L))

  /** The 16-bit Knuth multiplicative-hash fraction of an integer id —
    * the cross-engine-exact uniform draw (pure integer arithmetic, then
    * one exact /65536 division), for when the keep rate is a
    * data-derived COLUMN rather than a literal ([[weightedKeep]]'s
    * hex-prefix trick needs a literal to render).
    */
  def hashFrac(id: Column): Column =
    knuthDraw16(id) / 65536.0

  /** Temperature-flattened source mixing — the multilingual/multi-source
    * pretraining recipe (sample source s ∝ mass_s^α; α < 1 flattens the
    * head so rare sources punch above their byte share). Realized as
    * per-source keep rates (min_mass / mass_s)^(1−α): the smallest
    * source keeps everything, heavier sources downsample toward the
    * flattened proportions. Rates derive in-plan — one narrow per-group
    * aggregate plus a 1-row broadcast, AQE sizes the join back — and
    * membership is the deterministic [[hashFrac]] draw, stable under
    * corpus growth and repartitioning.
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      mass: Column,
      alpha: Double
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha out of range: $alpha")
    val masses = df.groupBy(col(groupCol)).agg(sum(mass).as("_mass"))
    val minMass = masses.agg(min(col("_mass")).as("_min_mass"))
    val rates = masses
      .crossJoin(broadcast(minMass))
      .select(col(groupCol), pow(col("_min_mass") / col("_mass"), 1.0 - alpha).as("_rate"))
    df.join(rates, groupCol)
      .filter(hashFrac(col(idCol)) < col("_rate"))
      .select(df.columns.map(col): _*)
  }

  /** Fractional-epoch mixture materialization — the pre-training recipe
    * "run source s for e_s epochs" (wiki 2.5, web 0.7, …): every doc of
    * source s emits floor(e_s) full copies plus one more iff its hash
    * draw falls under frac(e_s). The draw keys on (id + floor(e_s)) via
    * the same integer-exact [[hashFrac]] arithmetic, so the partial
    * epoch is a deterministic uniform subsample, stable under corpus
    * growth and engine. Sources absent from `epochs` contribute zero
    * copies (excluded from the mixture).
    *
    * Scale shape: one map-only pass — a per-row when-chain picks e_s,
    * an explode over sequence(0, copies−1) emits the copies with their
    * epoch ordinal (so downstream shard shuffling can interleave
    * epochs). No shuffle, no RNG state; output volume is exactly
    * Σ_s e_s·|s|, the recipe's token budget.
    */
  def epochsUpsample(
      df: DataFrame,
      id: Column,
      source: Column,
      epochs: Map[String, Double]
  ): DataFrame = {
    require(epochs.nonEmpty, "epochs map must be non-empty")
    epochs.values.foreach(e => require(e >= 0, s"epoch factors must be >= 0: $epochs"))
    val e = epochs.toSeq.sortBy(_._1).foldLeft(lit(0.0)) { case (acc, (s, f)) =>
      when(source === s, lit(f)).otherwise(acc)
    }
    val nf = floor(e) // Spark FLOOR(double) is already LONG
    val fr = e - floor(e)
    val extra = (knuthDraw16(id.cast("long") + nf) / 65536.0) < fr
    df.withColumn("__copies", nf + when(extra, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Concat-and-chunk sequence packing — the GPT-style pretraining
    * layout: within each shard, documents concatenate in id order and
    * chunk at `budget`-token boundaries. Emits where each document
    * lands: the pack it starts in, its token offset there, and whether
    * it straddles a pack boundary (the cross-document attention-mask /
    * loss-masking signal). The prefix sum is per-shard BY DESIGN —
    * packing is order-defined within a shard and embarrassingly
    * parallel across shards, so a deployment keys shards to stay
    * bounded (source × day/file) and the window never sees more than
    * one shard's rows; there is no global sort anywhere.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      shardCols: Seq[String],
      budget: Int
  ): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(shardCols.nonEmpty, "packing needs at least one shard column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCols.map(col): _*)
      .orderBy(col(idCol))
    val packOf = (boundary: Column) => floor(boundary / lit(budget.toDouble)).cast("long")
    df.select(shardCols.map(col) :+ col(idCol) :+ tokens.cast("long").as("n_tokens"): _*)
      .withColumn("_cum_end", sum(col("n_tokens")).over(w))
      .select(
        shardCols.map(col) :+ col(idCol) :+ col("n_tokens") :+
          packOf(col("_cum_end") - col("n_tokens")).as("pack_id") :+
          ((col("_cum_end") - col("n_tokens")) % budget).as("pack_offset") :+
          (packOf(col("_cum_end") - lit(1)) > packOf(col("_cum_end") - col("n_tokens")))
            .as("spans_boundary"): _*
      )
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
