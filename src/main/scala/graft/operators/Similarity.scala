package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an `array<float>` embedding column.
  *
  * Brute-force top-k is the correctness baseline: one scan, per-row cosine
  * against a literal query vector (broadcast as a constant into codegen),
  * then TakeOrderedAndProject (per-partition heaps + single reduce — no
  * global sort). Embarrassingly parallel: at 100 TB this is scan-bound.
  *
  * The scale path is LSH bucketing ([[VectorFns.hyperplaneSig]]): probes
  * join only their own signature bucket; a k-NN *join* shuffles both sides
  * on the signature instead of cross-joining.
  */
object Similarity {

  private def vecLit(v: Seq[Float]): Column = array(v.map(x => lit(x.toDouble)): _*)

  /** Exact top-k by cosine against a single query vector. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, query: Seq[Float], k: Int): DataFrame =
    emb
      .select(col(idCol), round(VectorFns.cosine(col(vecCol), vecLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)

  /** Batch k-NN join: for every probe row, its top-k neighbors from the
    * candidate set. Probes are broadcast (small side); ranking runs through
    * [[graft.plans.TopKPerKey]] — partial bounded heaps per partition, so
    * the shuffle carries at most k rows per probe per partition. A window
    * partitioned by probe_id would instead hash the ENTIRE scored set into
    * #probes partitions and sort it: a straggler machine whenever the probe
    * batch is small.
    */
  def knnJoin(
      probes: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"))
    val scored = c
      .join(broadcast(p))
      .select(
        col("probe_id"),
        col("cand_id"),
        round(VectorFns.cosine(col("probe_vec"), col("cand_vec")), 6).as("cos")
      )
    graft.plans.TopKPerKey
      .perKey(scored, Seq("probe_id"), Seq("cos" -> false, "cand_id" -> true), k)
      .select(col("probe_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** LSH-bucketed ANN: candidates whose hyperplane signature matches the
    * probe's in at least one of `tables` independent signatures, ranked by
    * exact cosine within the candidate set. Recall is tunable via
    * (nBits, tables); cost is a key-equality join, never a cross join.
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      nBits: Int = 12,
      tables: Int = 4
  ): DataFrame = {
    val sigd = graft.Tables
      .ensureParallelism(emb.select(col(idCol), col(vecCol)))
      .select(
        col(idCol),
        col(vecCol),
        posexplode(
          array((0 until tables).map(t => VectorFns.hyperplaneSig(col(vecCol), nBits, seed = t * 7919 + 1)): _*)
        ).as(Seq("table", "sig"))
      )
    val qlit = vecLit(query)
    val qsigs = (0 until tables).map(t => VectorFns.hyperplaneSig(qlit, nBits, seed = t * 7919 + 1))
    val probeSigs = emb.sparkSession
      .range(tables)
      .select(
        col("id").cast("int").as("table"),
        element_at(array(qsigs: _*), col("id").cast("int") + 1).as("sig")
      )
    sigd
      .join(broadcast(probeSigs), Seq("table", "sig"))
      .select(col(idCol), col(vecCol))
      .distinct()
      .select(col(idCol), round(VectorFns.cosine(col(vecCol), qlit), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer partitions vectors into
    * `nLists` cells; queries scan only the `nProbe` nearest cells.
    *
    * The centroids are a deterministic sample of the corpus (rows whose
    * id-hash lands in [0, nLists)) — at 100 TB you'd k-means them, but the
    * index structure and query path are identical: one broadcast of
    * `nLists` centroids, one scan to assign cells (this is the "build"),
    * then per-query a scan restricted to the probed cells. Cell
    * assignments would be persisted/bucketed in a real deployment so the
    * build cost amortizes across queries.
    */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String, nLists: Int): (DataFrame, DataFrame) = {
    // Deterministic pseudo-random sample: the nLists rows with the
    // smallest id-hash (a single TakeOrdered pass, no count, no RNG state).
    val centroids = emb
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
      .orderBy(pmod(hash(col("centroid_id")), lit(1 << 30)).asc, col("centroid_id"))
      .limit(nLists)
    // Nearest centroid per vector via min_by (hash aggregate with map-side
    // partials) — a window partitioned by id would sort nLists×N rows.
    val assigned = graft.Tables
      .ensureParallelism(emb.select(col(idCol), col(vecCol)))
      .join(broadcast(centroids))
      .groupBy(col(idCol))
      .agg(
        min_by(
          struct(col(vecCol).as("v"), col("centroid_id").as("cell")),
          struct(VectorFns.l2sq(col(vecCol), col("centroid_vec")).as("d"), col("centroid_id").as("c"))
        ).as("m")
      )
      .select(col(idCol), col("m.v").as(vecCol), col("m.cell").as("cell"))
    (centroids, assigned)
  }

  /** Top-k via IVF: rank cells by centroid distance to the query, scan the
    * nearest `nProbe` cells, exact cosine within them.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val (centroids, assigned) = ivfIndex(emb, idCol, vecCol, nLists)
    val qlit = vecLit(query)
    val probed = centroids
      .select(col("centroid_id"), VectorFns.l2sq(col("centroid_vec"), qlit).as("_d"))
      .orderBy(col("_d").asc, col("centroid_id"))
      .limit(nProbe)
      .select(col("centroid_id").as("cell"))
    assigned
      .join(broadcast(probed), "cell")
      .select(col(idCol), round(VectorFns.cosine(col(vecCol), qlit), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: bucket by one hyperplane
    * signature, pair within buckets (a < b), verify exact cosine >=
    * threshold. Same banding shape as MinHash — quadratic work confined to
    * buckets.
    */
  def embeddingNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nBits: Int = 8,
      tables: Int = 4
  ): DataFrame = {
    val sigd = graft.Tables
      .ensureParallelism(emb.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .select(
        col("id"),
        col("vec"),
        posexplode(
          array((0 until tables).map(t => VectorFns.hyperplaneSig(col("vec"), nBits, seed = t * 104729 + 13)): _*)
        ).as(Seq("table", "sig"))
      )
    // Candidate distinct() shuffles only (a, b) id pairs; the 64-float
    // vectors are joined back by id for the exact-cosine verify.
    val l = sigd.as("l")
    val r = sigd.as("r")
    val cands = l
      .join(r, col("l.table") === col("r.table") && col("l.sig") === col("r.sig") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    cands
      .join(base.select(col("id").as("a"), col("vec").as("va")), "a")
      .join(base.select(col("id").as("b"), col("vec").as("vb")), "b")
      .select(col("a"), col("b"), round(VectorFns.cosine(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
