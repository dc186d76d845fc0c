package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10×/100× scale-evidence dataset generator: unions each SF-scaling table
  * N times with CONSISTENTLY shifted keys (the same key domain shifts by
  * the same stride everywhere, so joins keep their selectivity and per-key
  * group sizes stay constant — growth adds GROUPS, it does not fatten
  * them, which is how a real corpus scales). Fixed-size dims (region,
  * nation) copy through untouched. Usage:
  *
  *   runMain graft.ScaleData <srcDir> <outDir> [copies] [mutate]
  *
  * The output feeds Bench via SPARK_GRAFT_SF_DIR=<outDir> with
  * SPARK_GRAFT_BENCH_FILTER for subset runs (BENCH_r{N}_sf1.json).
  *
  * `mutate` mode (the 4th arg, literal "mutate") solves the similarity
  * problem plain replication has: verbatim copies give every document
  * N−1 exact twins, so near-dup DENSITY multiplies by N and a dedup run
  * at 10×/100× measures the corpus's dup density, not operator scaling.
  * Mutation applies a deterministic per-replica content transform that
  * is an INJECTION within each replica (pairwise similarity inside a
  * replica is exactly preserved — every planted near-dup survives) but
  * pushes CROSS-replica similarity far below every dedup threshold —
  * so the scaled corpus holds near-dup density ~constant: the true pair
  * set is, by construction, the per-replica shifted union of the base
  * corpus's pair set. Keys still shift; dims still copy through.
  *
  *   - documents.text: in EVERY replica (including 0), each token whose
  *     REPLICA-KEYED xxhash64 is ≢0 (mod 4) gains a replica-unique
  *     suffix ("~r<i>" — no corpus token contains '~', so the map
  *     cannot collide with an existing token). Within a replica the map
  *     depends only on the token VALUE, so it is an injection (token
  *     sets and shingle sets transform 1:1, Jaccard values are
  *     bit-identical). Across replicas i≠j a token survives both with
  *     p = 1/16 (the hash is keyed by the replica id — NOT a fixed
  *     parity, which would leave any all-keep document verbatim in
  *     EVERY replica): token Jaccard ≈ 1/31, 3-shingle survival
  *     1/4096, and the Jaccard≥threshold leakage tail is ~1e-20 per
  *     pair even for the corpus's shortest (10-token) docs — no
  *     quadratic-in-copies self-pair leakage at any bench scale. A
  *     quarter of the vocabulary stays shared across all replicas, so
  *     cross-replica LSH band collisions (the false-positive quadratic
  *     a real shared-vocabulary corpus pays) remain live in the
  *     measurement. The simhash fingerprints of cross-replica twins
  *     differ in far more than maxHamming bits.
  *   - embeddings.embedding: a per-replica signed coordinate
  *     permutation (an orthogonal map: vec'_k = s_k · vec_{π(k)}).
  *     Orthogonality preserves every within-replica cosine EXACTLY;
  *     across replicas the cosines collapse to ~N(0, 1/√d) noise.
  *     NOTE the honest limit: in d=64 the corpus's own 0.35-tail IS
  *     that noise tail (measured: base per-pair rate 0.21% ≈ the
  *     cross-replica rate after scrambling), so the scrambled corpus
  *     behaves exactly like a FRESH iid draw of N× vectors — which
  *     means embedding-space TRUE pair count grows quadratically with
  *     corpus size BY NATURE of iid fixed-dim vectors at a 2.8σ
  *     threshold, for any generator faithful to the data model.
  *     Constant-density scaling is achievable for text (sparse
  *     token space), not for low-dim embeddings; embedding-dedup scale
  *     runs must therefore be read as time-vs-EMITTED-OUTPUT, with the
  *     output itself growing ~quadratically. (Exact-copy replication,
  *     by contrast, inflates the rate to cos=1.0 on every copy pair —
  *     ×(N−1) artificial exact dups — which is what this mode fixes.)
  */
object ScaleData {

  /** Deterministic per-replica token mutation for document text (see
    * object doc). EVERY replica is mutated — including 0 — at rate 3/4:
    * a token is kept verbatim only when its replica-keyed hash ≡ 0
    * (mod 4). Within a replica the map stays an injection (value-keyed,
    * and no corpus token contains '~'), so pairwise Jaccard is
    * bit-identical; across any replica pair i≠j a token survives both
    * with p = 1/16, so a 3-shingle survives with p = 1/4096 — the
    * Jaccard≥0.5 leakage tail for the corpus's shortest docs (10
    * tokens at sf0.1) is ~1e-20 per pair. (The earlier 1/2-rate with
    * an untouched replica 0 left (0,i) shingle survival at 1/8, and
    * 11-token docs leaked above threshold at a measured ~2e-4/pair —
    * quadratic in copy count, which is exactly what this mode exists
    * to prevent.)
    */
  def mutateDocuments(df: DataFrame, textCol: String, replica: Int): DataFrame = {
    val sfx = lit(s"~r$replica")
    df.withColumn(
      textCol,
      concat_ws(
        " ",
        transform(
          split(col(textCol), " "),
          t => when(pmod(xxhash64(t, lit(replica)), lit(4)) === 0, t).otherwise(concat(t, sfx))
        )
      )
    )
  }

  /** The signed coordinate permutation for one replica: (π, s) drawn
    * from a replica-seeded deterministic RNG. Exposed so the spec can
    * verify the orthogonality invariant against the same map.
    */
  def embeddingMap(replica: Int, dim: Int): (Array[Int], Array[Int]) = {
    val rng = new scala.util.Random(0x5ca1e00L + replica)
    val perm = rng.shuffle((0 until dim).toVector).toArray
    val signs = Array.fill(dim)(if (rng.nextBoolean()) 1 else -1)
    (perm, signs)
  }

  /** Deterministic per-replica orthogonal remap of the embedding column
    * (see object doc). Replica 0 is the untouched base corpus. One
    * codegen'd array projection — no UDF, no shuffle.
    */
  def mutateEmbeddings(df: DataFrame, vecCol: String, replica: Int, dim: Int): DataFrame =
    if (replica == 0) df
    else {
      val (perm, signs) = embeddingMap(replica, dim)
      val remapped = array(
        (0 until dim).map(k =>
          (element_at(col(vecCol), perm(k) + 1) * lit(signs(k))).cast("float")
        ): _*
      )
      df.withColumn(vecCol, when(col(vecCol).isNull, col(vecCol)).otherwise(remapped))
    }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1ish")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val mutate = args.lift(3).contains("mutate")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // One stride per KEY DOMAIN (not per table): l_orderkey and o_orderkey
    // must shift identically or the join keys tear apart.
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1

    val orderStride = stride(read("orders"), "o_orderkey")
    val custStride  = stride(read("customer"), "c_custkey")
    val partStride  = stride(read("part"), "p_partkey")
    val suppStride  = stride(read("supplier"), "s_suppkey")
    val eventStride = stride(read("events"), "event_id")
    val userStride  = stride(read("events"), "user_id")
    val docStride   = stride(read("documents"), "doc_id")
    val vecStride   = stride(read("embeddings"), "vec_id")

    def scaled(
        name: String,
        shifts: Map[String, Long],
        mutateCopy: (DataFrame, Int) => DataFrame = (df, _) => df
    ): Unit = {
      val base = read(name)
      val parts = (0 until copies).map { i =>
        val shifted = shifts.foldLeft(base) { case (df, (k, s)) => df.withColumn(k, col(k) + lit(s * i)) }
        if (mutate) mutateCopy(shifted, i) else shifted
      }
      parts.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name x$copies${if (mutate) " (mutated)" else ""} -> $out")
    }
    def fixed(name: String): Unit = {
      read(name).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name (dim, copied) -> $out")
    }

    val embDim = read("embeddings")
      .select(size(col("embedding")).as("d")).filter(col("d") > 0).head().getInt(0)

    fixed("region")
    fixed("nation")
    scaled("customer", Map("c_custkey" -> custStride))
    scaled("supplier", Map("s_suppkey" -> suppStride))
    scaled("part", Map("p_partkey" -> partStride))
    scaled("orders", Map("o_orderkey" -> orderStride, "o_custkey" -> custStride))
    scaled(
      "lineitem",
      Map("l_orderkey" -> orderStride, "l_partkey" -> partStride, "l_suppkey" -> suppStride)
    )
    scaled("events", Map("event_id" -> eventStride, "user_id" -> userStride))
    scaled("documents", Map("doc_id" -> docStride), (df, i) => mutateDocuments(df, "text", i))
    scaled("embeddings", Map("vec_id" -> vecStride), (df, i) => mutateEmbeddings(df, "embedding", i, embDim))
    spark.stop()
  }
}
