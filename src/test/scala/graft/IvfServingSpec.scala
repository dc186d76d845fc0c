package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The [[Similarity.IvfServing]] online handle (r17): the cell-bucketed
  * point-read tier must be RESULT-IDENTICAL to the oracle-gated
  * [[Similarity.scoreAgainstIvf]] plan path — same probed cells (the
  * serve path routes through the same driver-side argmin over the same
  * centroid array), same candidates (cell membership comes from the same
  * assignment table) and bit-identical scores (the per-task heap scores
  * with the CosineSim fold + HALF_UP 6dp). Unlike the graph/LSH tiers,
  * scoring happens INSIDE the pruned tasks (a cell is not
  * driver-bounded at 100 TB), so the spec also pins that only per-probe
  * top-k rows reach the driver-side merge: the contracts are sequence
  * equality, not bounds.
  */
class IvfServingSpec extends SparkSpec {

  private lazy val emb = {
    val e = Tables.embeddings(spark, Sf).persist()
    e.count()
    e
  }

  test("ivfSearchServe == scoreAgainstIvf: ids and bit-identical scores across probes and nProbe") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 16).persist()
    idx.assigned.count()
    val serving = Similarity.ivfServing(idx, "vec_id", "embedding")
    for (pid <- Seq(0L, 3L, 11L, 42L); nProbe <- Seq(1, 6, 16)) {
      val q = emb.filter(col("vec_id") === pid).select("embedding").head().getSeq[Float](0)
      val want = Similarity
        .scoreAgainstIvf(idx, "vec_id", "embedding", q, 10, nProbe = nProbe)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .toSeq
      val got = Similarity.ivfSearchServe(serving, q, 10, nProbe = nProbe)
      assert(
        got.map(_._1) == want.map(_._1),
        s"probe $pid nProbe $nProbe: id sequences diverge\n got=$got\n want=$want"
      )
      got.zip(want).foreach { case ((gi, gc), (wi, wc)) =>
        assert(
          java.lang.Double.doubleToLongBits(gc) == java.lang.Double.doubleToLongBits(wc),
          s"probe $pid id $gi/$wi: serve score $gc != plan score $wc (not bit-identical)"
        )
      }
    }
    serving.unpersist()
    idx.unpersist()
  }

  test("ivfSearchServeBatch == per-probe ivfSearchServe (batch shares one pruned job, same rows)") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 16).persist()
    idx.assigned.count()
    val serving = Similarity.ivfServing(idx, "vec_id", "embedding")
    val probes = Seq(0L, 7L, 21L).map { pid =>
      pid -> emb.filter(col("vec_id") === pid).select("embedding").head().getSeq[Float](0)
    }
    val got = Similarity.ivfSearchServeBatch(serving, probes, 5, nProbe = 6)
    val want = probes.flatMap { case (pid, q) =>
      Similarity.ivfSearchServe(serving, q, 5, nProbe = 6).map { case (id, c) => (pid, id, c) }
    }
    assert(got == want, s"batch serve diverges from per-probe serve\n got=$got\n want=$want")
    serving.unpersist()
    idx.unpersist()
  }

  test("duplicate probe ids are positionally independent (each row keeps its own vector)") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 16).persist()
    idx.assigned.count()
    val serving = Similarity.ivfServing(idx, "vec_id", "embedding")
    val q0 = emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
    val q7 = emb.filter(col("vec_id") === 7L).select("embedding").head().getSeq[Float](0)
    // same external id, two different vectors: per-probe state is keyed
    // by position, so both must answer as if served alone
    val got = Similarity.ivfSearchServeBatch(serving, Seq((99L, q0), (99L, q7)), 3, nProbe = 6)
    val alone0 = Similarity.ivfSearchServe(serving, q0, 3, nProbe = 6).map { case (id, c) => (99L, id, c) }
    val alone7 = Similarity.ivfSearchServe(serving, q7, 3, nProbe = 6).map { case (id, c) => (99L, id, c) }
    assert(got == alone0 ++ alone7, s"duplicate-id probes shared state\n got=$got")
    serving.unpersist()
    idx.unpersist()
  }

  test("serving cells are placed by their announced partitioner and carry no null/unassigned rows") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 16)
    val serving = Similarity.ivfServing(idx, "vec_id", "embedding", nBuckets = 8)
    val part = serving.cells.partitioner.get
    val misplaced = serving.cells
      .mapPartitionsWithIndex((pi, it) => it.filter { case (cell, _) => part.getPartition(cell) != pi }.map(_._1))
      .collect()
    assert(misplaced.isEmpty, s"cells outside their hash partition: ${misplaced.take(5).mkString(",")}")
    val badCells = serving.cells.keys.filter(c => c < 0 || c >= 16).collect()
    assert(badCells.isEmpty, s"unassigned/out-of-range cells in the serving RDD: ${badCells.take(5).mkString(",")}")
    serving.unpersist()
  }
}
