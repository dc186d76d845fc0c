package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-duplicate detection (Broder '97 resemblance
  * sketching, the standard web-scale text-dedup pipeline).
  *
  * Pipeline shape (all shuffles are on small keys, never on document text,
  * and there is no cross join anywhere):
  *
  *   doc → token shingles → numPerms minhashes (per-row compute)
  *       → explode bands (bands× growth of a (id, int) pair only)
  *       → shuffle on (band, bandHash) → per-bucket sorted-id pair-gen
  *       → exact-Jaccard verification on candidates only
  *
  * At 100 TB: candidate generation is a groupBy on band hashes whose
  * cardinality is ~corpus size; the quadratic step is confined to single
  * buckets (collisions), which banding keeps tiny.
  */
object MinHashLSH {

  /** (id, shingles) per document. */
  def shingles(df: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame =
    df.select(col(idCol).as("id"), array_distinct(TextFns.wordNgrams(col(textCol), shingleSize)).as("shingles"))

  /** (id, sig) with `numPerms` minhash values per document. Permutation p
    * is `hash(shingle, p)` (seeded murmur3) — deterministic, no fitted
    * model state to broadcast.
    *
    * Shape: explode shingles → hash-aggregate `numPerms` `min()`s per id.
    * Map-side partial aggregation collapses each partition's shingles to
    * one 128-int state per doc before the shuffle, and every min() is a
    * codegen'd aggregate — unlike a nested array_min(transform(...))
    * expression, which falls out of whole-stage codegen and recomputes per
    * use.
    */
  def signatures(df: DataFrame, idCol: String, textCol: String, shingleSize: Int, numPerms: Int): DataFrame = {
    val exploded = shingles(df, idCol, textCol, shingleSize)
      .select(col("id"), explode(col("shingles")).as("sh"))
    val aggs = (0 until numPerms).map(p => min(hash(col("sh"), lit(p))).as(s"_h$p"))
    exploded
      .groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until numPerms).map(p => col(s"_h$p")): _*).as("sig"))
  }

  /** Candidate pairs (a < b) that collide in at least one LSH band, with
    * exact shingle-Jaccard verification `>= threshold`.
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numPerms: Int = 128,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    val rows = numPerms / bands
    val sh = shingles(df, idCol, textCol, shingleSize)
    val sigs = signatures(df, idCol, textCol, shingleSize, numPerms)

    // Explode into (band index, hash of the band's signature slice, id).
    val banded = sigs.select(
      col("id"),
      posexplode(
        array((0 until bands).map(b => hash(slice(col("sig"), b * rows + 1, rows), lit(b))): _*)
      ).as(Seq("band", "bandHash"))
    )

    // Same-bucket pairs via self-join on the band key; a < b dedupes the
    // symmetric pair, distinct collapses multi-band collisions.
    val l = banded.as("l")
    val r = banded.as("r")
    val cands = l
      .join(r, col("l.band") === col("r.band") && col("l.bandHash") === col("r.bandHash") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()

    // Verify with exact Jaccard over shingle sets (only on candidates).
    val sa = sh.select(col("id").as("a"), col("shingles").as("sh_a"))
    val sb = sh.select(col("id").as("b"), col("shingles").as("sh_b"))
    cands
      .join(sa, "a")
      .join(sb, "b")
      .select(
        col("a"),
        col("b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
