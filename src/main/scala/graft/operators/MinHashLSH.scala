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

  /** The persisted LSH artifact an append-mostly corpus maintains: the
    * banded signature table (candidate side) and the shingle sets
    * (verify side). Both are pure per-document functions with fixed
    * seeds, so appending a delta is a plain union — no global recompute,
    * and rows written yesterday stay valid forever.
    */
  final case class MinHashIndex(banded: DataFrame, shingles: DataFrame)

  /** Band key = md5 hex of "band,v1,v2,…,vr" (the band's signature slice
    * rendered as decimal text). md5 instead of murmur3 (r16): collisions
    * are gone for practical purposes (the murmur3-32 form had ~2^-33
    * birthday odds per band-key pair of manufacturing a spurious
    * candidate), and the key is recomputable in DuckDB — the whole
    * candidate set is oracle-checked end-to-end. A 32-char key shuffles
    * ~24 bytes more than an int per (id, band) row; candidate generation
    * stays a groupBy on ~corpus-cardinality keys.
    */
  private def bandedOf(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(
      col("id"),
      posexplode(
        array((0 until bands).map(b =>
          md5(concat_ws(",", lit(b) +: (0 until rows).map(r => col("sig").getItem(b * rows + r).cast("string")): _*))
        ): _*)
      ).as(Seq("band", "bandHash"))
    )

  /** Build the [[MinHashIndex]] artifact for a corpus (the signature and
    * banding pipeline of [[nearDupPairs]], stopping at the stored
    * tables).
    */
  def index(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numPerms: Int = 128,
      bands: Int = 16
  ): MinHashIndex = {
    val sh = shingles(df, idCol, textCol, shingleSize)
    val sigs = sh
      .select(col("id"), explode(col("shingles")).as("sh"))
      .groupBy(col("id"))
      .agg(graft.functions.MinHashAgg.minhash(col("sh"), numPerms).as("sig"))
    MinHashIndex(bandedOf(sigs, bands, numPerms / bands), sh)
  }

  /** Incremental near-dup detection for an append-mostly corpus — the
    * operation a 100 TB training pipeline actually runs daily: dedup
    * only the DELTA against the existing artifact instead of
    * recomputing the corpus. Signature/banding compute is O(|delta|);
    * the band join probes the stored banded table (bucketed by band
    * hash at deployment scale, so only colliding buckets are touched);
    * the exact-Jaccard verify reads the stored shingle sets of just the
    * candidate ids. Emits exactly the pairs a full recompute over
    * corpus ∪ delta would emit that involve at least one delta doc —
    * so full(corpus) ∪ incremental(index, delta) ≡ full(corpus ∪ delta)
    * pair-for-pair (DedupSpec proves the equivalence; band hashes are
    * pure seeded functions of the text, which is what makes old and new
    * rows directly comparable).
    */
  def incrementalPairs(
      idx: MinHashIndex,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numPerms: Int = 128,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    val dIdx = index(delta, idCol, textCol, shingleSize, numPerms, bands)
    // Persisted (r19, the nearDupPairs banded-persist shape): the delta's
    // banded table feeds BOTH the union side and the delta join side, and
    // the signature merge + band hashing sit above the reusable exchange,
    // so each consumer re-ran them over the delta otherwise. Delta-sized.
    val dBanded = dIdx.banded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = idx.banded.select("id", "band", "bandHash").unionByName(dBanded.select("id", "band", "bandHash"))
    val l = dBanded.as("l") // every pair keeps >= 1 delta side
    val r = all.as("r")
    val cands = l
      .join(r, col("l.band") === col("r.band") && col("l.bandHash") === col("r.bandHash") && col("l.id") =!= col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("a"), greatest(col("l.id"), col("r.id")).as("b"))
      .distinct()
    val allSh = idx.shingles.unionByName(dIdx.shingles)
    val sa = allSh.select(col("id").as("a"), col("shingles").as("sh_a"))
    val sb = allSh.select(col("id").as("b"), col("shingles").as("sh_b"))
    cands
      .join(sa, "a")
      .join(sb, "b")
      .select(col("a"), col("b"), round(graft.functions.JaccardExprs.jaccardSim(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Fold a delta's artifact into the stored one (the post-ingest index
    * maintenance step): a pure union on both tables.
    */
  def appendIndex(idx: MinHashIndex, dIdx: MinHashIndex): MinHashIndex =
    MinHashIndex(
      idx.banded.unionByName(dIdx.banded),
      idx.shingles.unionByName(dIdx.shingles)
    )

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

    // Explode into (band index, hash of the band's signature slice, id)
    // — the same bandedOf the incremental artifact stores, so batch and
    // incremental candidates are bit-comparable.
    // Persisted (r19): BOTH candidate self-join sides consume this frame,
    // and the final minhash-signature merge + band hashing sit ABOVE the
    // reusable (id) exchange — stage reuse dedups only the partial
    // aggregation below it, so each side re-ran the merge + band md5 per
    // row (the r18 PPJoin-prefix finding, same shape). The banded table
    // is (id, band, bandHash) — tiny relative to the shingle table.
    val banded = bandedOf(sigs, bands, rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

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
      .select(col("a"), col("b"), round(graft.functions.JaccardExprs.jaccardSim(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
