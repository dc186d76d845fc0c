package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** PCA contracts — the verification design for a rows-only key family:
  * algebraic identities that only a correct fit satisfies, plus the
  * two-phase search's recall floor (the ReplicaSpec pattern).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val k = 16

  test("fit: orthonormal components, descending eigenvalues, variance captured exactly") {
    val emb = Tables.embeddings(spark, Sf)
    val m = Pca.fit(emb, "embedding", dim, k)
    // orthonormality: w_i · w_j = δ_ij
    for (i <- 0 until k; j <- i until k) {
      val dot = (0 until dim).map(d => m.components(i)(d) * m.components(j)(d)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"w${i}.w${j} = $dot")
    }
    // eigenvalues descending, nonnegative, bounded by total variance
    assert(m.eigenvalues.toSeq == m.eigenvalues.sortBy(-_).toSeq)
    assert(m.eigenvalues.forall(_ >= -1e-9) && m.eigenvalues.sum <= m.totalVariance + 1e-6)
    // the distributed covariance equals an in-memory one (same math,
    // different partitioning) within float-accumulation noise
    val vecs = emb.select("embedding").as[Seq[Float]].collect().map(_.map(_.toDouble).toArray)
    val n = vecs.length
    val mu = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    assert((0 until dim).forall(i => math.abs(mu(i) - m.mean(i)) < 1e-9))
    // per-component projected variance IS the eigenvalue (the defining
    // property of principal axes) — checked distributed
    val proj = Pca.project(emb, "vec_id", "embedding", m)
    val projVar = proj
      .select((0 until k).map(j => variance(element_at(col("proj"), j + 1)).as(s"v$j")): _*)
      .head()
    (0 until k).foreach { j =>
      val v = projVar.getDouble(j) * (n - 1.0) / n // population variance
      assert(math.abs(v - m.eigenvalues(j)) < 1e-6 * math.max(1.0, m.eigenvalues(j)), s"component $j: $v vs ${m.eigenvalues(j)}")
    }
    // reconstruction identity: mean residual energy after projecting
    // onto the top-k axes = total variance − Σ top-k eigenvalues
    val recon = vecs.map { x =>
      val c = x.indices.map(i => x(i) - mu(i))
      val coords = m.components.map(w => w.indices.map(i => w(i) * c(i)).sum)
      val back = Array.tabulate(dim)(i => m.components.indices.map(j => coords(j) * m.components(j)(i)).sum)
      c.indices.map(i => { val d = c(i) - back(i); d * d }).sum
    }.sum / n
    val want = m.totalVariance - m.eigenvalues.sum
    assert(math.abs(recon - want) < 1e-6 * math.max(1.0, want), s"residual $recon vs $want")
  }

  test("pcaTopK: exact emitted scores, recall floor vs brute force over 5 probes") {
    val emb = Tables.embeddings(spark, Sf)
    val m = Pca.fit(emb, "embedding", dim, k)
    val recalls = (0L until 5L).map { pid =>
      val q = EntrySupport.queryVec(spark, Sf, pid)
      val base = emb.filter(col("vec_id") =!= pid)
      val got = Pca.pcaTopK(base, "vec_id", "embedding", m, q, window = 100, kOut = 10)
        .as[(Long, Double)].collect().toSeq
      val brute = base
        .select(
          col("vec_id"),
          round(functions.VectorFns.cosine(col("embedding"), array(q.map(x => lit(x.toDouble)): _*)), 6).as("cos")
        )
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
        .as[(Long, Double)].collect().toSeq
      // every emitted score is the exact cosine (the rescore phase)
      val bruteMap = base
        .select(
          col("vec_id"),
          round(functions.VectorFns.cosine(col("embedding"), array(q.map(x => lit(x.toDouble)): _*)), 6).as("cos")
        )
        .as[(Long, Double)].collect().toMap
      got.foreach { case (id, c) => assert(bruteMap(id) == c, s"probe $pid doc $id: $c vs exact ${bruteMap(id)}") }
      got.map(_._1).toSet.intersect(brute.map(_._1).toSet).size / 10.0
    }
    assert(recalls.forall(_ >= 0.5), s"recall floor breached: $recalls")
    assert(recalls.sum / recalls.size >= 0.7, s"mean recall too low: $recalls")
  }
}
