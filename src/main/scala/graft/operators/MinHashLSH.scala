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

  /** (id, shingles) per document. Tokens are materialized in their own
    * projection so the n-gram window expression reads an attribute, not a
    * re-evaluated split (see [[TextFns.ngramsFromTokens]]).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame =
    graft.Tables
      .ensureParallelism(df.select(col(idCol).as("id"), col(textCol).as("_text")))
      .select(col("id"), TextFns.tokens(col("_text")).as("_toks"))
      .select(col("id"), array_distinct(TextFns.ngramsFromTokens(col("_toks"), shingleSize)).as("shingles"))

  /** (id, sig) with `numPerms` minhash values per document, via the native
    * [[graft.functions.MinHashAgg]] TypedImperativeAggregate: explode
    * shingles → one-pass ObjectHashAggregate with a primitive int[] buffer
    * per doc. Map-side partial aggregation collapses each partition's
    * shingles to one signature state before the shuffle.
    */
  def signatures(df: DataFrame, idCol: String, textCol: String, shingleSize: Int, numPerms: Int): DataFrame =
    shingles(df, idCol, textCol, shingleSize)
      .select(col("id"), explode(col("shingles")).as("sh"))
      .groupBy(col("id"))
      .agg(graft.functions.MinHashAgg.minhash(col("sh"), numPerms).as("sig"))

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
    // Persisted: the shingle table feeds both verify sides (and the
    // signature aggregation reuses the same lineage).
    val sh = shingles(df, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = sh
      .select(col("id"), explode(col("shingles")).as("sh"))
      .groupBy(col("id"))
      .agg(graft.functions.MinHashAgg.minhash(col("sh"), numPerms).as("sig"))

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
      .select(col("a"), col("b"), round(Dedup.jaccardUdf(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
