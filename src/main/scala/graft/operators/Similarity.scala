package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One PQ-encoded vector: its coarse IVF cell and the per-subspace
  * codebook indices. Top-level public case class — encoder + Janino
  * requirements for use as a UDF return type.
  */
final case class PqCode(cell: Int, code: Seq[Int])

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

  /** The per-table hyperplane seed — one constant shared by index build
    * and probe so their signatures are bit-identical.
    */
  private def lshSeed(table: Int): Int = table * 7919 + 1

  /** LSH ANN index: the exploded (id, table, sig) signature table — the
    * artifact a deployment persists/buckets by (table, sig) once and
    * probes many times — plus the (id, vector) base for the exact
    * rescore. Signatures carry NO vectors: ids only.
    */
  final case class LshIndex(nBits: Int, tables: Int, sigs: DataFrame, base: DataFrame) {
    def persist(): LshIndex = {
      sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      this
    }
    def unpersist(): Unit = { sigs.unpersist(); () }
  }

  def lshIndex(emb: DataFrame, idCol: String, vecCol: String, nBits: Int, tables: Int): LshIndex = {
    val base = emb.select(col(idCol), col(vecCol))
    val sigs = graft.Tables
      .ensureParallelism(base)
      .select(
        col(idCol),
        posexplode(
          array((0 until tables).map(t => VectorFns.hyperplaneSig(col(vecCol), nBits, seed = lshSeed(t))): _*)
        ).as(Seq("table", "sig"))
      )
    LshIndex(nBits, tables, sigs, base)
  }

  /** Score a query against a prebuilt LSH index: candidates are rows whose
    * signature matches the probe's in at least one table, ranked by exact
    * cosine. Candidate dedup is on the ID ONLY (a row can collide in
    * several tables) — distinct() over (id, vector) would shuffle and
    * hash-compare 64-float arrays as grouping keys; the candidate-id set
    * is query-scale, so it broadcasts back onto the base for the exact
    * rescore and the vectors themselves never shuffle.
    */
  def scoreAgainstLsh(
      index: LshIndex,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      probeRadius: Int = 0
  ): DataFrame = {
    val qlit = vecLit(query)
    val qsigs = (0 until index.tables).map(t => VectorFns.hyperplaneSig(qlit, index.nBits, seed = lshSeed(t)))
    val exact = index.sigs.sparkSession
      .range(index.tables)
      .select(
        col("id").cast("int").as("table"),
        element_at(array(qsigs: _*), col("id").cast("int") + 1).as("sig")
      )
    // Multi-probe LSH (Lv et al., VLDB'07): also probe the buckets whose
    // signature differs from the query's in one bit — a near-miss on one
    // hyperplane is the most likely place for a lost neighbor. Radius 1
    // multiplies probed buckets by (1 + nBits) per table, which buys the
    // recall of ~nBits× more tables WITHOUT growing the stored index —
    // probe cost is still O(tables · nBits) broadcast rows, the index
    // stays one row per (vector, table).
    val probeSigs =
      if (probeRadius <= 0) exact
      else
        exact
          .select(
            col("table"),
            explode(array(lit(0L) +: (0 until index.nBits).map(b => lit(1L << b)): _*)).as("mask"),
            col("sig")
          )
          .select(col("table"), col("sig").bitwiseXOR(col("mask")).as("sig"))
    // candIds is NOT hint-broadcast: with hot buckets (skewed corpora,
    // small nBits) the candidate set can approach corpus size, and a
    // forced broadcast would OOM the driver. AQE converts the join to
    // broadcast-hash at runtime when the measured candidate set is small
    // (the common case) and keeps a shuffle join when it is not.
    val candIds = index.sigs
      .join(broadcast(probeSigs), Seq("table", "sig"))
      .select(col(idCol))
      .distinct()
    index.base
      .join(candIds, Seq(idCol))
      .select(col(idCol), round(VectorFns.cosine(col(vecCol), qlit), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** One-shot LSH ANN: build + score. Recall is tunable via (nBits,
    * tables); cost is a key-equality join, never a cross join. The split
    * exists so repeated queries amortize the signature build.
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      nBits: Int = 12,
      tables: Int = 4
  ): DataFrame =
    scoreAgainstLsh(lshIndex(emb, idCol, vecCol, nBits, tables), idCol, vecCol, query, k)

  /** IVF (inverted-file) ANN index: a coarse quantizer partitions vectors
    * into cells; queries scan only the `nProbe` nearest cells.
    *
    * `centroids` is driver-resident index METADATA — O(nLists) vectors,
    * the same order of magnitude as a probe batch, shipped to executors as
    * a broadcast closure. `assigned` is the corpus with its cell id: at
    * 100 TB this is the artifact you persist/bucket by cell once and score
    * thousands of queries against (see the Bm25 buildIndex/score split —
    * same amortization contract; `persist()` pins it for a
    * multi-query session, a real deployment writes it out).
    */
  final case class IvfIndex(centroids: Array[Array[Float]], assigned: DataFrame) {
    def persist(): IvfIndex = {
      assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      this
    }
    def unpersist(): Unit = { assigned.unpersist(); () }
  }

  /** Build the IVF index. Centroids are a deterministic pseudo-random
    * sample of the corpus (the `nLists` rows with the smallest id-hash —
    * one TakeOrdered pass, no RNG state; at 100 TB you'd k-means them, the
    * index structure is identical). Cell assignment is a PURE PROJECTION:
    * a compiled argmin over the closure-broadcast centroid array — one
    * scan, zero shuffle. The r2 form (broadcast join against the centroid
    * frame + min_by hash aggregate) expanded the corpus ×nLists and paid a
    * full aggregation; it also evaluated the centroid TakeOrdered twice
    * per query. Measured 4.2 s → well under 1 s at sf0.1.
    */
  /** Compiled argmin over the closure-broadcast centroid array — the cell
    * assignment is a pure projection (one scan, zero shuffle). NULL
    * vectors go to cell -1, which is never probed.
    */
  private def assignUdf(centroids: Array[Array[Float]]) = udf { (v: Seq[Float]) =>
    if (v == null) -1
    else {
      var best = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < centroids.length) {
        val c = centroids(i)
        var d = 0.0
        var j = 0
        val n = math.min(c.length, v.length)
        while (j < n) { val t = v(j).toDouble - c(j).toDouble; d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
  }

  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String, nLists: Int): IvfIndex = {
    // O(nLists) driver fetch: index metadata, same class as a probe-vector
    // fetch. Order (id-hash asc, id asc) is deterministic; the position in
    // this array IS the cell id.
    // NULL embeddings are excluded from the sample (getSeq would NPE) and
    // land in cell -1 at assignment — never probed.
    val centroids: Array[Array[Float]] = emb
      .select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .orderBy(pmod(hash(col(idCol)), lit(1 << 30)).asc, col(idCol))
      .limit(nLists)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    val assigned = graft.Tables
      .ensureParallelism(emb.select(col(idCol), col(vecCol)))
      .withColumn("cell", assignUdf(centroids)(col(vecCol)))
    IvfIndex(centroids, assigned)
  }

  /** Lloyd (k-means) refinement of the IVF coarse quantizer: each round
    * re-assigns every vector to its nearest centroid (pure projection)
    * and moves each centroid to its cell's per-dimension mean — one
    * explode + hash-aggregate per round, shuffling (cell, dim, partial
    * mean) triples, never vectors. Refined cells are tighter and more
    * even, so the same nProbe recovers more true neighbors (standard IVF
    * practice; the index structure and score path are unchanged). Empty
    * cells keep their previous centroid. The per-round cost is one corpus
    * scan — an index-build-time cost, amortized exactly like the build
    * itself.
    */
  def ivfRefine(emb: DataFrame, idCol: String, vecCol: String, index: IvfIndex, iters: Int): IvfIndex = {
    val base = emb.select(col(idCol), col(vecCol)).filter(col(vecCol).isNotNull)
    var cents = index.centroids
    for (_ <- 0 until iters) {
      // (cell, dim) means: nLists × dim result rows — driver-scale index
      // metadata, same class as the centroid array itself.
      val means = graft.Tables
        .ensureParallelism(base)
        .select(assignUdf(cents)(col(vecCol)).as("cell"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(avg("x").as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat)
      cents = next
    }
    IvfIndex(cents, base.withColumn("cell", assignUdf(cents)(col(vecCol))))
  }

  /** Build + refine in one call: the deterministic sample seeds Lloyd. */
  def ivfIndexKMeans(emb: DataFrame, idCol: String, vecCol: String, nLists: Int, iters: Int): IvfIndex =
    ivfRefine(emb, idCol, vecCol, ivfIndex(emb, idCol, vecCol, nLists), iters)

  /** The `nProbe` cells nearest to `query` — driver-side math over the
    * O(nLists) centroid array (distance asc, cell id asc on ties).
    */
  def probeCells(index: IvfIndex, query: Seq[Float], nProbe: Int): Seq[Int] =
    index.centroids.zipWithIndex
      .map { case (c, i) =>
        var d = 0.0
        var j = 0
        val n = math.min(c.length, query.length)
        while (j < n) { val t = query(j).toDouble - c(j).toDouble; d += t * t; j += 1 }
        (d, i)
      }
      .sortBy(identity)
      .take(nProbe)
      .map(_._2)
      .toSeq

  /** Score a query against a prebuilt index: filter to the probed cells
    * (a partition-prunable predicate when `assigned` is stored
    * partitioned/bucketed by cell), exact cosine within them, bounded
    * top-k — no join, no aggregation, no shuffle.
    */
  def scoreAgainstIvf(
      index: IvfIndex,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      nProbe: Int
  ): DataFrame = {
    val qlit = vecLit(query)
    val cells = probeCells(index, query, nProbe)
    index.assigned
      .filter(col("cell").isin(cells: _*))
      .select(col(idCol), round(VectorFns.cosine(col(vecCol), qlit), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** One-shot top-k via IVF: build + score. The split exists so repeated
    * queries amortize the build (see SimilaritySpec).
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4
  ): DataFrame =
    scoreAgainstIvf(ivfIndex(emb, idCol, vecCol, nLists), idCol, vecCol, query, k, nProbe)

  /** Product-quantized IVF index (Jégou/Douze/Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): each
    * vector's RESIDUAL against its coarse IVF centroid is split into `m`
    * subvectors, and each subvector stored as the index of its nearest
    * entry in a per-subspace codebook of `ksub` entries. A stored row is
    * (id, cell, m small ints) — m bytes of payload instead of dim floats
    * (8 vs 256 here): the index that still fits when the corpus doesn't.
    *
    * `centroids` and `codebooks` (m × ksub × dim/m floats) are
    * driver-resident metadata, same class as the IVF centroid array.
    * `codes` is the corpus-scale artifact a deployment persists; `base`
    * is the raw (id, vector) frame used only for the exact top rescore.
    */
  final case class PqIndex(
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      codes: DataFrame,
      base: DataFrame
  ) {
    def m: Int = codebooks.length
  }

  private def sqDist(a: Array[Float], b: Seq[Float], from: Int, until: Int): Double = {
    var d = 0.0
    var j = from
    while (j < until && j < b.length) { val t = b(j).toDouble - a(j - from).toDouble; d += t * t; j += 1 }
    d
  }

  private def nearestCell(centroids: Array[Array[Float]], v: Seq[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < centroids.length) {
      val d = sqDist(centroids(i), v, 0, centroids(i).length)
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Compiled (cell, code) encoder: coarse argmin, then per-subspace
    * argmin over the residual — a pure projection, one scan, no shuffle.
    * NULL vectors encode as cell -1 (never probed) with an empty code.
    */
  private def encodeUdf(centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]]) =
    udf { (v: Seq[Float]) =>
      if (v == null) PqCode(-1, Seq.empty)
      else {
        val cell = nearestCell(centroids, v)
        val c = centroids(cell)
        val res = Array.tabulate(v.length)(j => v(j) - (if (j < c.length) c(j) else 0f))
        val dsub = v.length / codebooks.length
        val code = Array.tabulate(codebooks.length) { mi =>
          var best = 0
          var bestD = Double.MaxValue
          var k = 0
          val book = codebooks(mi)
          while (k < book.length) {
            var d = 0.0
            var j = 0
            while (j < dsub) { val t = res(mi * dsub + j).toDouble - book(k)(j).toDouble; d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = k }
            k += 1
          }
          best
        }
        PqCode(cell, code.toSeq)
      }
    }

  /** Build the PQ index over an IVF coarse quantizer. Codebooks are
    * seeded from a deterministic id-hash sample of residuals (same
    * no-RNG trick as the IVF centroids) and tightened with `iters`
    * Lloyd rounds per subspace — each round is ONE corpus scan whose
    * aggregate output is (m × ksub × dim/m) means: driver-scale.
    */
  def pqIndex(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 1
  ): PqIndex = {
    val ivf = ivfIndex(emb, idCol, vecCol, nLists)
    val cents = ivf.centroids
    val dim = cents(0).length
    require(dim % m == 0, s"embedding dim $dim must divide into $m subspaces")
    val dsub = dim / m
    // ksub sample residuals, deterministic order — the seed codebooks.
    val sample = emb
      .select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .orderBy(pmod(hash(col(idCol), lit(17)), lit(1 << 30)).asc, col(idCol))
      .limit(ksub)
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val c = cents(nearestCell(cents, v))
        Array.tabulate(v.length)(j => v(j) - (if (j < c.length) c(j) else 0f))
      }
    var books = Array.tabulate(m)(mi => sample.map(_.slice(mi * dsub, (mi + 1) * dsub)))
    val base = emb.select(col(idCol), col(vecCol)).filter(col(vecCol).isNotNull)
    for (_ <- 0 until iters) {
      // One scan: encode, explode residual dims, mean per (subspace,
      // assigned code, dim-within-subspace). Empty codes keep their entry.
      val enc = encodeUdf(cents, books)
      val cb = books
      val residUdf = udf { (v: Seq[Float]) =>
        val c = cents(nearestCell(cents, v))
        Seq.tabulate(v.length)(j => v(j) - (if (j < c.length) c(j) else 0f))
      }
      val means = graft.Tables
        .ensureParallelism(base)
        .select(enc(col(vecCol)).as("pq"), posexplode(residUdf(col(vecCol))).as(Seq("dim", "x")))
        .select(
          (col("dim") / dsub).cast("int").as("sub"),
          element_at(col("pq.code"), (col("dim") / dsub).cast("int") + 1).as("codeId"),
          (col("dim") % dsub).as("within"),
          col("x")
        )
        .groupBy("sub", "codeId", "within")
        .agg(avg("x").as("mean"))
        .collect()
      val next = cb.map(_.map(_.clone()))
      means.foreach(r => next(r.getInt(0))(r.getInt(1))(r.getAs[Int]("within")) = r.getDouble(3).toFloat)
      books = next
    }
    val codes = graft.Tables
      .ensureParallelism(emb.select(col(idCol), col(vecCol)))
      .select(col(idCol), encodeUdf(cents, books)(col(vecCol)).as("pq"))
      .select(col(idCol), col("pq.cell").as("cell"), col("pq.code").as("code"))
    PqIndex(cents, books, codes, base)
  }

  /** Score a query against the PQ index by asymmetric distance (ADC):
    * per probed cell, a (m × ksub) lookup table of squared distances
    * between the query's residual subvectors and the codebook entries is
    * computed on the driver (tiny) and shipped in the scoring closure;
    * a stored code's approximate distance is then m table lookups — no
    * vectors are read for candidate ranking. The best `rerank` ids by
    * ADC are joined back to the base for exact cosine, so emitted scores
    * are exact and the approximation lives only in recall (the same
    * contract as the LSH/IVF paths).
    */
  def scoreAgainstPq(
      index: PqIndex,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      nProbe: Int,
      rerank: Int = 50
  ): DataFrame = {
    val cents = index.centroids
    val books = index.codebooks
    val dsub = cents(0).length / books.length
    val cells = index.centroids.zipWithIndex
      .map { case (c, i) => (sqDist(c, query, 0, c.length), i) }
      .sortBy(identity)
      .take(nProbe)
      .map(_._2)
    // LUT per probed cell: [m][ksub] squared distances of the query
    // residual to each codebook entry — nProbe × m × ksub doubles.
    val luts: Map[Int, Array[Array[Double]]] = cells.map { cell =>
      val c = cents(cell)
      val res = Array.tabulate(query.length)(j => query(j) - (if (j < c.length) c(j) else 0f))
      cell -> Array.tabulate(books.length) { mi =>
        books(mi).map(entry => sqDist(entry, res.toSeq, mi * dsub, (mi + 1) * dsub))
      }
    }.toMap
    val adcUdf = udf { (cell: Int, code: Seq[Int]) =>
      val lut = luts(cell)
      var d = 0.0
      var mi = 0
      while (mi < code.length) { d += lut(mi)(code(mi)); mi += 1 }
      d
    }
    val cand = index.codes
      .filter(col("cell").isin(cells.toSeq: _*))
      .select(col(idCol), adcUdf(col("cell"), col("code")).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(math.max(rerank, k))
      .select(col(idCol))
    index.base
      .join(cand, Seq(idCol))
      .select(col(idCol), round(VectorFns.cosine(col(vecCol), vecLit(query)), 6).as("cos"))
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
