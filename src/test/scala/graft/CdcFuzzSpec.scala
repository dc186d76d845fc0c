package graft

import graft.cdc.CdcBatch
import graft.search.Nested
import org.apache.spark.sql.functions._

/** Generative drill for the CDC apply semantics — the reference's core
  * loop (consume envelope, apply to state). The r14 E2E drill caught a
  * REAL applyDelta bug on a hand-written fixture (Debezium `c` dropped);
  * this spec randomizes the op sequences instead of hand-picking them.
  *
  * Part A: random changelogs (keys × ops × unique LSNs, shuffled
  * arrival order) through [[CdcBatch.applyOps]] — final state must equal
  * the per-key last-op fold: highest-seq op wins, `d` erases, anything
  * else upserts.
  *
  * Part B: random child-level deltas (multi-op per (parent, ordinal) in
  * ONE batch — the max_by reduction path; deletes of absent ordinals;
  * re-upserts; deltas for parents the artifact never had) through
  * [[Nested.applyDelta]] with seqCol — the maintained artifact must
  * equal [[Nested.nestedIndex]] REBUILT from the reference's final
  * child table. Maintained ≡ rebuilt is the CDC invariant the whole
  * index tier rests on.
  */
class CdcFuzzSpec extends SparkSpec {

  test("applyOps: 3 random changelogs equal the last-op-per-key fold") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xcdc1L)
    (1 to 3).foreach { round =>
      val nKeys = 40
      val events = rnd
        .shuffle(
          (1 to 300).map { seq =>
            val key = 1 + rnd.nextInt(nKeys)
            val op = Vector("c", "u", "d", "r")(rnd.nextInt(4))
            (key.toLong, seq.toLong, op, s"v${seq}_$key")
          }.toVector
        )
      val changelog = events.toDF("id", "lsn", "op", "payload")
      val got = CdcBatch
        .applyOps(changelog, "id", col("lsn"), col("op") === "d", col("payload"))
        .collect()
        .map(r => (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("payload"))))
        .toSet
      val want = events
        .groupBy(_._1)
        .flatMap { case (k, evs) =>
          val last = evs.maxBy(_._2)
          if (last._3 == "d") None else Some((k, last._4))
        }
        .toSet
      assert(got == want, s"round $round: applyOps != last-op fold\n got=$got\n want=$want")
    }
  }

  test("nested applyDelta: 3 random multi-op deltas — maintained artifact == rebuild from final state") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xcdc2L)
    (1 to 3).foreach { round =>
      val nParents = 30
      val parents = (1 to nParents).map(p => (p.toLong, s"dim$p")).toDF("pid", "dim")
      // base children: unique (pid, ord) pairs
      val baseChildren = rnd
        .shuffle((for { p <- 1 to nParents; o <- 0 until rnd.nextInt(5) } yield (p.toLong, o, s"b${p}_$o")).toVector)
      val childDf = baseChildren.toDF("cpid", "ord", "v")
      val artifact = Nested.nestedIndex(parents, childDf, "pid", "cpid", "items", Seq("ord", "v"))

      // delta: multi-op per (pid, ord) allowed; pids beyond the artifact
      val delta = (1 to 200).map { seq =>
        val pid = (1 + rnd.nextInt(nParents + 5)).toLong
        val ord = rnd.nextInt(6)
        val op = Vector("c", "u", "r", "d")(rnd.nextInt(4))
        (pid, ord, op, s"d${seq}", seq.toLong)
      }
      val deltaDf = rnd.shuffle(delta.toVector).toDF("cpid", "ord", "op", "v", "lsn")

      val maintained = Nested
        .applyDelta(artifact, deltaDf, "pid", "cpid", "items", Seq("ord", "v"), seqCol = Some("lsn"))
        .collect()
        .map(r =>
          r.getLong(r.fieldIndex("pid")) ->
            r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("items")).map(x => (x.getInt(0), x.getString(1)))
        )
        .toMap

      // reference: fold the delta onto the base child table, last op per
      // (pid, ord) by lsn; d erases, anything else upserts
      val lastOp = delta.groupBy(e => (e._1, e._2)).map { case (k, evs) => k -> evs.maxBy(_._5) }
      val finalChildren =
        baseChildren.filterNot(c => lastOp.contains((c._1, c._2))).map(c => (c._1, c._2, c._3)) ++
          lastOp.values.collect { case (pid, ord, op, v, _) if op != "d" && pid <= nParents => (pid, ord, v) }
      val want = (1 to nParents).map { p =>
        p.toLong -> finalChildren.filter(_._1 == p).map(c => (c._2, c._3)).toVector.sorted
      }.toMap

      assert(maintained.keySet == want.keySet, s"round $round: parent sets differ")
      want.foreach { case (pid, items) =>
        assert(
          maintained(pid).toVector == items,
          s"round $round parent $pid: maintained=${maintained(pid)} want=$items"
        )
      }

      // the invariant, stated the other way: rebuild from the reference's
      // final child table and compare artifact-to-artifact
      val rebuilt = Nested
        .nestedIndex(parents, finalChildren.toVector.toDF("cpid", "ord", "v"), "pid", "cpid", "items", Seq("ord", "v"))
        .collect()
        .map(r =>
          r.getLong(r.fieldIndex("pid")) ->
            r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("items")).map(x => (x.getInt(0), x.getString(1)))
        )
        .toMap
      assert(maintained == rebuilt, s"round $round: maintained != rebuilt")
    }
  }

  test("nested applyDelta: random micro-batch BOUNDARIES change nothing — any split folds to the same artifact") {
    // the streaming face is applyDelta per micro-batch; the invariant is
    // that WHERE the batch boundaries fall is immaterial
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xcdc3L)
    val nParents = 20
    val parents = (1 to nParents).map(p => (p.toLong, s"dim$p")).toDF("pid", "dim")
    val baseChildren =
      (for { p <- 1 to nParents; o <- 0 until rnd.nextInt(4) } yield (p.toLong, o, s"b${p}_$o")).toVector
    val artifact = Nested
      .nestedIndex(parents, baseChildren.toDF("cpid", "ord", "v"), "pid", "cpid", "items", Seq("ord", "v"))
      .cache()

    val stream = (1 to 120).map { seq =>
      ((1 + rnd.nextInt(nParents)).toLong, rnd.nextInt(5), Vector("c", "u", "r", "d")(rnd.nextInt(4)), s"s$seq", seq.toLong)
    }

    def fold(splits: Seq[Seq[(Long, Int, String, String, Long)]]): Map[Long, Seq[(Int, String)]] =
      splits
        .filter(_.nonEmpty)
        .foldLeft(artifact.toDF) { (ix, batch) =>
          Nested.applyDelta(ix, batch.toDF("cpid", "ord", "op", "v", "lsn"), "pid", "cpid", "items", Seq("ord", "v"), seqCol = Some("lsn"))
        }
        .collect()
        .map(r =>
          r.getLong(r.fieldIndex("pid")) ->
            r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("items")).map(x => (x.getInt(0), x.getString(1)))
        )
        .toMap

    val oneShot = fold(Seq(stream))
    (1 to 2).foreach { trial =>
      val cuts = (Vector(0, stream.size) ++ Vector.fill(1 + rnd.nextInt(4))(rnd.nextInt(stream.size))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => stream.slice(a, b) }
      val split = fold(batches)
      assert(split == oneShot, s"trial $trial: batch boundaries $cuts changed the artifact")
    }
  }
}
