package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the dimensionality-reduction /
  * whitening step a training-data pipeline runs before clustering,
  * dedup, or cheap ANN (and the classical compressed first phase of a
  * two-stage vector search: rank in k dims, rescore survivors exactly).
  *
  * Distributed the way the math decomposes: ONE corpus pass accumulates
  * the sufficient statistics — count, per-dimension sums (dim aggregate
  * columns, the ivfRefine pattern), and Σ x·xᵀ via the native
  * outer-product aggregate (shuffle carries dim² doubles per partition,
  * never vectors) — then the dim×dim covariance eigensolve is driver
  * math (cyclic Jacobi, deterministic sign/tie conventions). Projection
  * compiles to a codegen'd expression: k unrolled dot products per row,
  * no UDF, one scan.
  */
object Pca {

  /** `components` holds the top-k eigenvectors as ROWS (k × dim),
    * eigenvalue-descending; `offsets(j)` = components(j)·mean, so the
    * projection is y_j = w_j·x − offsets(j).
    */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double
  ) {
    def offsets: Array[Double] =
      components.map(w => w.indices.map(i => w(i) * mean(i)).sum)
    def explainedRatios: Array[Double] = eigenvalues.map(_ / totalVariance)
  }

  /** Fit a k-component PCA: one pass for (n, Σx per dim, Σ x·xᵀ), then
    * the driver eigensolve of C = Σxxᵀ/n − μμᵀ.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k > 0 && k <= dim, s"k must be in [1, $dim]")
    val v = col(vecCol)
    val vd = v.cast("array<double>")
    val aggs =
      Seq(count(lit(1)).as("_n"), graft.functions.OuterProductSumAgg.outerProductSum(vd, vd, dim).as("_xxt")) ++
        (0 until dim).map(i => sum(element_at(v, i + 1).cast("double")).as(s"_s$i"))
    val row = df.filter(v.isNotNull && size(v) === dim).agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    require(n > 1, s"PCA needs at least 2 vectors, got $n")
    val xxt = row.getSeq[Double](1)
    val mean = Array.tabulate(dim)(i => row.getDouble(2 + i) / n)
    val cov = Array.tabulate(dim, dim)((a, b) => xxt(a * dim + b) / n - mean(a) * mean(b))
    val (eigVals, eigVecs) = symEigen(cov)
    // order eigenpairs by value desc (stable on ties), fix sign so the
    // largest-|component| entry is positive (first index on ties)
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i))
    val top = order.take(k).map { ci =>
      val w = Array.tabulate(dim)(r => eigVecs(r)(ci))
      val m = w.indices.maxBy(i => (math.abs(w(i)), -i))
      if (w(m) < 0) w.map(-_) else w
    }
    PcaModel(mean, top.toArray, order.take(k).map(eigVals).toArray, (0 until dim).map(i => cov(i)(i)).sum)
  }

  /** The projection y = W(x − μ) as ONE array expression: the weight
    * matrix rides the plan as a nested-array literal and each component
    * is a zip_with/aggregate dot product — no UDF, no shuffle, and no
    * unrolled-term blowup (a k×dim unrolling at 16×64 breaks janino's
    * 64 KB method limit and silently drops the query to interpreted
    * mode — found by the full gate, hence the HOF form). The fold order
    * is element order, so results are deterministic.
    */
  def projectExpr(model: PcaModel, vec: Column): Column = {
    val w = typedLit(model.components.map(_.toSeq).toSeq)
    val off = typedLit(model.offsets.toSeq)
    val x = vec.cast("array<double>")
    transform(
      sequence(lit(1), lit(model.components.length)),
      j =>
        aggregate(
          zip_with(x, element_at(w, j), (a, b) => a * b),
          lit(0.0),
          (acc, t) => acc + t
        ) - element_at(off, j)
    )
  }

  /** Project every vector: (id, proj array<double>). */
  def project(df: DataFrame, idCol: String, vecCol: String, model: PcaModel): DataFrame =
    df.select(col(idCol), projectExpr(model, col(vecCol)).as("proj"))

  /** Two-phase PCA ANN: rank by NEGATIVE squared euclidean distance in
    * the k-dim projected space (cheap first phase — k mults/row instead
    * of dim), exact-cosine rescore of the top `window`, emit top
    * `kOut`. Both phases deterministic scans + bounded top-k; the
    * matryoshka pattern with a learned (optimal-variance) projection.
    */
  def pcaTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: PcaModel,
      queryVec: Seq[Float],
      window: Int,
      kOut: Int
  ): DataFrame = {
    val dim = model.mean.length
    require(queryVec.length == dim, s"query dim ${queryVec.length} != $dim")
    val q = model.components.map { w =>
      (0 until dim).map(i => w(i) * (queryVec(i) - model.mean(i))).sum
    }
    // ONE reference to the projection expression: the distance folds
    // over zip_with(proj, qLit) — referencing element_at(proj, j) per
    // component would duplicate the whole projection subtree k times
    // (the CollapseProject amplification documented in §5).
    val dist2 = aggregate(
      zip_with(projectExpr(model, col(vecCol)), typedLit(q.toSeq), (y, qj) => (y - qj) * (y - qj)),
      lit(0.0),
      (acc, t) => acc + t
    )
    val cand = df
      .select(col(idCol), col(vecCol), dist2.as("_d2"))
      .orderBy(col("_d2").asc, col(idCol))
      .limit(window)
    cand
      .select(
        col(idCol),
        round(graft.functions.VectorFns.cosine(col(vecCol), array(queryVec.map(f => lit(f.toDouble)): _*)), 6)
          .as("cos")
      )
      .orderBy(col("cos").desc, col(idCol))
      .limit(kOut)
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Deterministic sweep order, fixed tolerance — same inputs, same
    * outputs on any JVM.
    */
  private def symEigen(cIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val dim = cIn.length
    val a = cIn.map(_.clone())
    val v = Array.tabulate(dim, dim)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var changed = true
    while (changed && sweep < 50) {
      changed = false
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-12 * math.sqrt(math.abs(a(p)(p) * a(q)(q)) + 1e-300)) {
            changed = true
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            var r = 0
            while (r < dim) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < dim) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(dim)(i => a(i)(i)), v)
  }
}
