package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The [[Similarity.GraphServing]] online handle: bucketed point-read
  * serving must be RESULT-IDENTICAL to the DataFrame beam search — same
  * ids, bit-identical scores (the serve path re-implements the CosineSim
  * fold + Spark's HALF_UP 6dp round on the driver; any drift here would
  * silently fork the serving tier from the gated plans).
  */
class GraphServingSpec extends SparkSpec {

  private lazy val emb = {
    val e = Tables.embeddings(spark, Sf).persist()
    e.count()
    e
  }

  test("graphSearchServe == graphSearch: ids and bit-identical scores") {
    val idx = Similarity.graphIndex(emb, "vec_id", "embedding").persist()
    idx.neighbors.count()
    val serving = Similarity.graphServing(idx, emb, "vec_id", "embedding")
    val probeIds = Seq(0L, 3L, 11L, 42L)
    probeIds.foreach { pid =>
      val q = emb.filter(col("vec_id") === pid).select("embedding").head().getSeq[Float](0)
      val want = Similarity
        .graphSearch(idx, emb, "vec_id", "embedding", q, 10)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .toSeq
      val got = Similarity.graphSearchServe(serving, q, 10)
      assert(got.map(_._1) == want.map(_._1), s"probe $pid: id sets diverge\n got=$got\n want=$want")
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

  test("graphSearchServeBatch == per-probe graphSearchServe, probe-for-probe") {
    val idx = Similarity.graphIndex(emb, "vec_id", "embedding").persist()
    idx.neighbors.count()
    val serving = Similarity.graphServing(idx, emb, "vec_id", "embedding")
    val probeIds = Seq(0L, 3L, 11L, 42L)
    val probes = probeIds.map { pid =>
      pid -> emb.filter(col("vec_id") === pid).select("embedding").head().getSeq[Float](0)
    }
    val batch = Similarity
      .graphSearchServeBatch(serving, probes, 10)
      .groupBy(_._1)
      .view
      .mapValues(_.map { case (_, id, c) => (id, c) })
      .toMap
    probes.foreach { case (pid, q) =>
      val want = Similarity.graphSearchServe(serving, q, 10)
      val got = batch.getOrElse(pid, Nil)
      assert(got == want, s"probe $pid: batch serve diverges from scalar serve\n got=$got\n want=$want")
    }
    serving.unpersist()
    idx.unpersist()
  }

  test("graphSearchServeBatch rejects duplicate probe ids (state is id-keyed — r17 advice)") {
    val idx = Similarity.graphIndex(emb, "vec_id", "embedding").persist()
    idx.neighbors.count()
    val serving = Similarity.graphServing(idx, emb, "vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
    val e = intercept[IllegalArgumentException] {
      Similarity.graphSearchServeBatch(serving, Seq((5L, q), (5L, q)), 10)
    }
    assert(e.getMessage.contains("distinct"))
    serving.unpersist()
    idx.unpersist()
  }

  test("serving fetch prunes to the probed buckets (partition-pruned jobs)") {
    val idx = Similarity.graphIndex(emb, "vec_id", "embedding")
    val serving = Similarity.graphServing(idx, emb, "vec_id", "embedding", buckets = 8)
    // the handle is partitioned by id-hash: every key sits in its
    // announced bucket, so a point-read can prune (the runJob partition
    // list is derived from the same partitioner)
    val part = serving.vecs.partitioner.get
    val misplaced = serving.vecs
      .mapPartitionsWithIndex((pi, it) => it.filter { case (id, _) => part.getPartition(id) != pi }.map(_._1))
      .collect()
    assert(misplaced.isEmpty, s"keys outside their hash bucket: ${misplaced.take(5).mkString(",")}")
    assert(serving.nbrs.partitioner.contains(part) || serving.nbrs.partitioner.get.numPartitions == 8)
    // a query still answers correctly at an explicit bucket count
    val q = emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)
    val got = Similarity.graphSearchServe(serving, q, 5)
    assert(got.nonEmpty && got.map(_._2).forall(c => c >= -1.0 && c <= 1.0))
    serving.unpersist()
  }
}
