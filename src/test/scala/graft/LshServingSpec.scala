package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The [[Similarity.LshServing]] online handle: bucketed point-read
  * serving must be RESULT-IDENTICAL to the plan paths — same candidate
  * sets (the probe signature routes through the very kernel the index
  * build ran) and bit-identical scores (the serve path re-runs the
  * CosineSim fold + HALF_UP 6dp on the driver). Any drift here would
  * silently fork the serving tier from the oracle-gated plans, so the
  * contracts are set equality, not bounds.
  */
class LshServingSpec extends SparkSpec {

  private lazy val emb = {
    val e = Tables.embeddings(spark, Sf).persist()
    e.count()
    e
  }

  test("lshSearchServe == scoreAgainstLsh: ids and bit-identical scores, radius 0 and 1") {
    Seq(0, 1).foreach { radius =>
      val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 4, tables = 8).persist()
      idx.sigs.count()
      val serving = Similarity.lshServing(idx, "vec_id", "embedding")
      Seq(0L, 3L, 11L, 42L).foreach { pid =>
        val q = emb.filter(col("vec_id") === pid).select("embedding").head().getSeq[Float](0)
        val want = Similarity
          .scoreAgainstLsh(idx, "vec_id", "embedding", q, 10, probeRadius = radius)
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1)))
          .toSeq
        val got = Similarity.lshSearchServe(serving, q, 10, probeRadius = radius)
        assert(got.map(_._1) == want.map(_._1), s"radius $radius probe $pid: id sets diverge\n got=$got\n want=$want")
        got.zip(want).foreach { case ((gi, gc), (wi, wc)) =>
          assert(
            java.lang.Double.doubleToLongBits(gc) == java.lang.Double.doubleToLongBits(wc),
            s"radius $radius probe $pid id $gi/$wi: serve score $gc != plan score $wc (not bit-identical)"
          )
        }
      }
      serving.unpersist()
      idx.unpersist()
    }
  }

  test("lshSearchServeBatch == per-probe knnJoinLsh result sets at radius 1") {
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 4, tables = 4).persist()
    idx.sigs.count()
    val serving = Similarity.lshServing(idx, "vec_id", "embedding")
    val probeIds = Seq(0L, 7L, 21L)
    val probes = probeIds.map { pid =>
      pid -> emb.filter(col("vec_id") === pid).select("embedding").head().getSeq[Float](0)
    }
    val got = Similarity
      .lshSearchServeBatch(serving, probes, 5, probeRadius = 1)
      .map { case (p, id, c) => (p, id, c) }
      .toSet
    val want = Similarity
      .knnJoinLsh(idx, emb.filter(col("vec_id") < 22).filter(col("vec_id").isin(probeIds: _*)), "vec_id", "embedding", 5, probeRadius = 1)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("probe_id")), r.getLong(r.fieldIndex("cand_id")), r.getDouble(r.fieldIndex("cos"))))
      .toSet
    assert(got == want, s"batch serve diverges from knnJoinLsh\n got-only=${(got -- want).take(5)}\n want-only=${(want -- got).take(5)}")
    serving.unpersist()
    idx.unpersist()
  }

  test("serving buckets are placed by their announced partitioner (pruned point-reads are sound)") {
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 4, tables = 8)
    val serving = Similarity.lshServing(idx, "vec_id", "embedding", nBuckets = 8)
    val part = serving.buckets.partitioner.get
    val misplaced = serving.buckets
      .mapPartitionsWithIndex((pi, it) => it.filter { case (k, _) => part.getPartition(k) != pi }.map(_._1))
      .collect()
    assert(misplaced.isEmpty, s"bucket keys outside their hash partition: ${misplaced.take(5).mkString(",")}")
    val vpart = serving.vecs.partitioner.get
    val vMisplaced = serving.vecs
      .mapPartitionsWithIndex((pi, it) => it.filter { case (id, _) => vpart.getPartition(id) != pi }.map(_._1))
      .collect()
    assert(vMisplaced.isEmpty, s"vector ids outside their hash partition: ${vMisplaced.take(5).mkString(",")}")
    serving.unpersist()
  }
}
