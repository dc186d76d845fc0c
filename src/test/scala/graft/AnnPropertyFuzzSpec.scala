package graft

import graft.operators.{Pca, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Generative PROPERTY drill for the no-oracle ANN tier — the
  * quantizer/refinement algorithms whose replica contracts are pinned
  * on one fixed corpus each. Over random corpora:
  *
  *  - Lloyd refinement (ivfRefine) never increases total distortion
  *    (the k-means convergence guarantee, within float tolerance),
  *    and every assignment lands in its argmin cell;
  *  - addToIvf assigns delta rows to the argmin cell of the EXISTING
  *    centroids (incremental maintenance never re-clusters);
  *  - PCA: components orthonormal, eigenvalues descending and
  *    non-negative, explained variance bounded by total variance, and
  *    the distributed projection equals the W(x−μ) fold per row;
  *  - SQ8 and BQ searches emit only EXACT scores (the family
  *    contract: approximation lives in recall, never in an emitted
  *    number), internally ordered, bounded and duplicate-free.
  */
class AnnPropertyFuzzSpec extends SparkSpec {

  private def mkCorpus(rnd: scala.util.Random, n: Int, dim: Int): Array[(Long, Array[Float])] = {
    val centers = Array.fill(5)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    Array.tabulate(n) { i =>
      val c = centers(rnd.nextInt(centers.length))
      (i.toLong, Array.tabulate(dim)(j => c(j) + (rnd.nextFloat() - 0.5f) * 0.5f))
    }
  }

  private def toDf(corpus: Seq[(Long, Array[Float])], rnd: scala.util.Random): DataFrame = {
    val s = spark
    import s.implicits._
    corpus.toDF("vec_id", "embedding").select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .repartition(1 + rnd.nextInt(4))
  }

  private def sqDist(a: Array[Float], c: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length && i < c.length) { val t = a(i).toDouble - c(i).toDouble; d += t * t; i += 1 }
    d
  }

  test("ivfRefine: Lloyd distortion monotone non-increasing; assignments are argmin cells") {
    val rnd = new scala.util.Random(0x11f4e51L)
    (1 to 4).foreach { ci =>
      val corpus = mkCorpus(rnd, 100 + rnd.nextInt(120), 8)
      val byId = corpus.toMap
      val df = toDf(corpus.toSeq, rnd)
      var idx = Similarity.ivfIndex(df, "vec_id", "embedding", nLists = 3 + rnd.nextInt(5))
      def distortion(i: Similarity.IvfIndex): Double =
        i.assigned
          .collect()
          .map { r =>
            val id = r.getLong(r.fieldIndex("vec_id"))
            sqDist(byId(id), i.centroids(r.getInt(r.fieldIndex("cell"))))
          }
          .sum
      var prev = distortion(idx)
      (1 to 3).foreach { it =>
        idx = Similarity.ivfRefine(df, "vec_id", "embedding", idx, 1)
        val cur = distortion(idx)
        assert(cur <= prev + 1e-6 * math.max(1.0, prev), s"corpus $ci iter $it: distortion rose $prev -> $cur")
        prev = cur
      }
      // final assignments are argmin cells (ties by lowest index, the
      // quantizer convention)
      idx.assigned.collect().foreach { r =>
        val id = r.getLong(r.fieldIndex("vec_id"))
        val cell = r.getInt(r.fieldIndex("cell"))
        val dists = idx.centroids.map(c => sqDist(byId(id), c))
        assert(dists(cell) <= dists.min + 1e-9, s"corpus $ci: vec $id not in argmin cell")
      }
    }
  }

  test("addToIvf: delta rows assigned to argmin of the EXISTING centroids") {
    val rnd = new scala.util.Random(0xadd1cfL)
    (1 to 4).foreach { ci =>
      val corpus = mkCorpus(rnd, 80 + rnd.nextInt(80), 8)
      val (base, delta) = corpus.partition(_._1 % 4 != 0)
      val idx = Similarity.ivfIndex(toDf(base.toSeq, rnd), "vec_id", "embedding", nLists = 4)
      val grown = Similarity.addToIvf(idx, toDf(delta.toSeq, rnd), "vec_id", "embedding")
      assert(grown.centroids.zip(idx.centroids).forall { case (a, b) => a.sameElements(b) },
        s"corpus $ci: addToIvf moved centroids")
      val byId = corpus.toMap
      val rows = grown.assigned.collect().map(r => r.getLong(r.fieldIndex("vec_id")) -> r.getInt(r.fieldIndex("cell")))
      assert(rows.map(_._1).toSet == corpus.map(_._1).toSet, s"corpus $ci: grown index lost rows")
      rows.foreach { case (id, cell) =>
        val dists = idx.centroids.map(c => sqDist(byId(id), c))
        assert(dists(cell) <= dists.min + 1e-9, s"corpus $ci: vec $id not in argmin cell after append")
      }
    }
  }

  test("PCA: orthonormal components, descending eigenvalues, bounded variance, projection == fold") {
    val rnd = new scala.util.Random(0xbca9e1L)
    (1 to 4).foreach { ci =>
      val dim = 8
      val corpus = mkCorpus(rnd, 100 + rnd.nextInt(100), dim)
      val df = toDf(corpus.toSeq, rnd)
      val k = 2 + rnd.nextInt(4)
      val model = Pca.fit(df, "embedding", dim, k)

      // orthonormality
      for (i <- model.components.indices; j <- i until model.components.length) {
        val dot = model.components(i).zip(model.components(j)).map { case (a, b) => a * b }.sum
        val expect = if (i == j) 1.0 else 0.0
        assert(math.abs(dot - expect) < 1e-6, s"corpus $ci: components ${i}x${j} = $dot")
      }
      // eigen spectrum
      assert(model.eigenvalues.forall(_ >= -1e-9), s"corpus $ci: negative eigenvalue")
      assert(model.eigenvalues.sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-12),
        s"corpus $ci: eigenvalues not descending")
      assert(model.eigenvalues.sum <= model.totalVariance + 1e-6, s"corpus $ci: explained > total variance")

      // distributed projection == W(x − μ) fold
      val projected = Pca.project(df, "vec_id", "embedding", model)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1))
        .toMap
      corpus.foreach { case (id, v) =>
        val want = model.components.zip(model.offsets).map { case (w, off) =>
          w.indices.map(i => v(i).toDouble * w(i)).sum - off
        }
        val got = projected(id)
        want.indices.foreach { j =>
          assert(math.abs(got(j) - want(j)) < 1e-9, s"corpus $ci vec $id comp $j: ${got(j)} != ${want(j)}")
        }
      }
    }
  }

  test("graph search: exact scores, rank-consistent, partition-invariant") {
    val rnd = new scala.util.Random(0x96a9a1L)
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { val x = a(i).toDouble; val y = b(i).toDouble; dot += x * y; na += x * x; nb += y * y; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 to 3).foreach { ci =>
      val corpus = mkCorpus(rnd, 90 + rnd.nextInt(80), 8)
      val byId = corpus.toMap
      val df = toDf(corpus.toSeq, rnd)
      val idx = Similarity.graphIndex(df, "vec_id", "embedding", m = 6, nLists = 6)
      val probes = Array.tabulate(3)(i => (500L + i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
      val pByIdQ = probes.toMap
      val k = 3 + rnd.nextInt(6)
      def run(e: DataFrame): Seq[(Long, Long, Double, Int)] =
        Similarity
          .graphSearchBatch(idx, e, "vec_id", "embedding", toDf(probes.toSeq, rnd), k)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          .sortBy(t => (t._1, t._4))
          .toSeq
      val got = run(df)
      got.foreach { case (pid, id, c, _) =>
        assert(c == r6(cosRef(byId(id), pByIdQ(pid))), s"corpus $ci: stale graph score ($pid, $id)")
      }
      got.groupBy(_._1).values.foreach { rs =>
        val sorted = rs.sortBy(_._4)
        assert(sorted.map(r => (-r._3, r._2)) == sorted.map(r => (-r._3, r._2)).sorted,
          s"corpus $ci: rank order violates (cos desc, id asc)")
        assert(sorted.size <= k && sorted.map(_._2).distinct.size == sorted.size)
      }
      // beam state is deterministic under repartitioning (ties by id)
      assert(got == run(toDf(corpus.toSeq, rnd).repartition(7)), s"corpus $ci: graph search partition-sensitive")
    }
  }

  test("SQ8 / BQ: emitted scores are exact cosines, ordered, bounded, duplicate-free") {
    val rnd = new scala.util.Random(0x58b9L)
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { val x = a(i).toDouble; val y = b(i).toDouble; dot += x * y; na += x * x; nb += y * y; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 to 4).foreach { ci =>
      val corpus = mkCorpus(rnd, 80 + rnd.nextInt(80), 8)
      val df = toDf(corpus.toSeq, rnd)
      val byId = corpus.toMap
      val q = Array.fill(8)(rnd.nextFloat() * 2f - 1f)
      val k = 3 + rnd.nextInt(8)
      val sq = Similarity.scoreAgainstSq(Similarity.sqIndex(df, "vec_id", "embedding"), "vec_id", "embedding", q.toSeq, k)
      val bq = Similarity.scoreAgainstBq(Similarity.bqIndex(df, "vec_id", "embedding"), "vec_id", "embedding", q.toSeq, k)
      Seq("sq8" -> sq, "bq" -> bq).foreach { case (name, res) =>
        val got = res.collect().map(r => (r.getLong(r.fieldIndex("vec_id")), r.getDouble(r.fieldIndex("cos")))).toSeq
        assert(got.size <= k && got.map(_._1).distinct.size == got.size, s"corpus $ci $name: size/dups")
        got.foreach { case (id, c) => assert(c == r6(cosRef(byId(id), q)), s"corpus $ci $name: stale score for $id") }
        assert(got.map(_._2) == got.map(_._2).sorted.reverse, s"corpus $ci $name: not ordered")
      }
    }
  }
}
