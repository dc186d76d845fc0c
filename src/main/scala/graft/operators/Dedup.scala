package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact + fingerprint deduplication.
  *
  * Both are a single hash-aggregate on a digest of the content: map-side
  * partial aggregation collapses per-partition duplicates, so the shuffle
  * carries one (digest, partial) pair per distinct key per partition — the
  * only dedup plan that survives 100 TB (never `dropDuplicates` on the raw
  * text column, which would shuffle full documents).
  */
object Dedup {

  /** Duplicate groups by exact content hash: (hash, group size, kept id). */
  def exactGroups(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(md5(content).as("h"))
      .agg(count(lit(1)).as("n_dups"), min(id).as("keep_id"))

  /** Keep-first-id exact dedup: the surviving rows' ids. */
  def exactKeepIds(df: DataFrame, content: Column, id: Column): DataFrame =
    exactGroups(df, content, id).select(col("keep_id"))

  /** Near-dup groups via the normalization fingerprint (lower/dedupe/sort
    * tokens): catches reorderings and repeated-token variants.
    */
  def fingerprintGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(TextFns.fingerprint(text).as("fp"))
      .agg(count(lit(1)).as("n_dups"), min(id).as("keep_id"))

  /** Exact n-gram (token shingle) Jaccard pairs above `threshold`, with
    * length-bucket blocking: documents whose token counts land in the same
    * `lenBucket`-wide bucket are compared (near-dups have near-equal
    * length; docs straddling a boundary are also compared via the +1
    * bucket). Quadratic work is confined to a bucket — never a full cross
    * join. For web-scale recall guarantees prefer [[MinHashLSH]]; this is
    * the exact-verification variant.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.4,
      lenBucket: Int = 8
  ): DataFrame = {
    val base = df.select(
      col(idCol).as("id"),
      array_distinct(TextFns.wordNgrams(col(textCol), n)).as("sh"),
      floor(TextFns.tokenCount(col(textCol)) / lenBucket).cast("long").as("bucket")
    )
    // Each doc lands in its bucket and the next one, so boundary-straddling
    // pairs still collide exactly once via the lower bucket.
    val blocked = base.select(col("id"), col("sh"), explode(array(col("bucket"), col("bucket") + 1)).as("blk"))
    val l = blocked.as("l")
    val r = blocked.as("r")
    l.join(r, col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"), col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .distinct()
      .select(
        col("a"),
        col("b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))),
          4
        ).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }
}
