package graft

import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Alert, Envelope, MetricPoint, ScoreEvent, StateChange, TopKEntry}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Crash-recovery drill for the stateful streaming layer (r17 — verdict
  * #6): the generative [[StreamingStateFuzzSpec]] proves state SEMANTICS
  * under arbitrary micro-batch slicing, but every query there lives one
  * uninterrupted run. This sibling kills the query at random batch
  * boundaries and restarts it from its checkpoint — the recovery path a
  * production deployment exercises on every executor loss — and asserts
  * the CUMULATIVE output across runs equals the restart-oblivious model:
  *
  *   - the CDC seq fence must survive the restart (a replayed/resumed
  *     envelope below the checkpointed fence must STILL drop — losing
  *     fence state would re-admit stale seqs, the silent-corruption case);
  *   - the top-k heap must resume from its truncated state, not refill;
  *   - the Welford baseline must reload BIT-FOR-BIT (mean/std/z emitted
  *     after the restart are compared as exact doubles — any
  *     serialization round-trip loss in the (n, mean, m2) state shows
  *     up here as a z-score mismatch).
  *
  * Mechanics: a real RocksDB state store + a real checkpointLocation per
  * scenario; the MemoryStream instance outlives the first query, so the
  * restarted query resumes from the committed offsets and reads only the
  * post-cut additions (exactly-once at the sink = run-1 rows ∪ run-2
  * rows with no replays or gaps). Fixed seed; failures print the batch
  * log and cut points.
  */
class StreamingRestartFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val seed = 0x2e57a27L

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  private def slices[T](rnd: scala.util.Random, events: Seq[T]): Seq[Seq[T]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[T]]
    var rest = events
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(4)
      out += rest.take(n)
      rest = rest.drop(n)
    }
    out.toSeq
  }

  /** Feed `batches` through `start`, stopping and restarting the query
    * from its checkpoint after each cut index; returns every row the
    * sink saw across all runs. The sink is a foreachBatch collector
    * keyed by batchId (the memory sink cannot recover from a
    * checkpoint) — keying by batchId makes it idempotent, exactly the
    * documented foreachBatch exactly-once contract, so a replayed
    * uncommitted batch overwrites instead of duplicating.
    */
  private def runWithRestarts[I, O](
      batches: Seq[Seq[I]],
      cuts: Set[Int],
      name: String
  )(start: (MemoryStream[I], (org.apache.spark.sql.Dataset[O], Long) => Unit, String) => org.apache.spark.sql.streaming.StreamingQuery)(
      implicit enc: org.apache.spark.sql.Encoder[I]
  ): Seq[O] = {
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft-restart-$name").toString
    val input = MemoryStream[I]
    val sink = new java.util.concurrent.ConcurrentHashMap[Long, Seq[O]]()
    val collect: (org.apache.spark.sql.Dataset[O], Long) => Unit =
      (df, id) => { sink.put(id, df.collect().toSeq); () }
    var q = start(input, collect, ckpt)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b)
        q.processAllAvailable()
        if (cuts.contains(i) && i != batches.size - 1) {
          q.stop()
          // the restart: a NEW query object, same checkpoint, same source
          q = start(input, collect, ckpt)
        }
      }
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      sink.asScala.toSeq.sortBy(_._1).flatMap(_._2)
    } finally q.stop()
  }

  test("CDC seq fence survives checkpoint restart: stale seqs still drop, no replays, no gaps") {
    withRocksDb {
      val rnd = new scala.util.Random(seed)
      (1 to 2).foreach { round =>
        val keys = (1 to 3).map(i => s"k$i")
        val events = rnd.shuffle(keys.flatMap { k =>
          rnd.shuffle((1 to 12).toList).take(8).map { s =>
            val op = rnd.nextInt(4) match { case 0 => "c"; case 1 => "d"; case _ => "u" }
            Envelope(k, s.toLong, op, s"$k:$s:$op")
          }
        })
        val batches = slices(rnd, events)
        require(batches.size >= 3, "need enough batches to cut")
        val cuts = Set(batches.size / 3, 2 * batches.size / 3)
        // restart-oblivious model: per key strictly-increasing fence
        val fence = scala.collection.mutable.Map.empty[String, Long]
        val want = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long)]
        batches.foreach { b =>
          b.groupBy(_.key).foreach { case (k, rows) =>
            rows.sortBy(_.seq).foreach { e =>
              if (fence.get(k).forall(_ < e.seq)) {
                fence(k) = e.seq
                want += ((k, if (e.op == "d") "d" else "u", e.payload, e.seq))
              }
            }
          }
        }
        val got = runWithRestarts[Envelope, StateChange](batches, cuts, s"rst_cdc_$round") {
          (in, collect, ck) =>
            CdcStream
              .applyChangesTws(in.toDS())
              .writeStream
              .foreachBatch(collect)
              .option("checkpointLocation", ck)
              .outputMode(OutputMode.Append)
              .start()
        }.map(c => (c.key, c.op, c.payload, c.seq))
        assert(
          got.sorted == want.sorted.toSeq,
          s"round $round: fence diverged across restart (cuts=$cuts)\n got=${got.sorted.mkString(",")}\n want=${want.sorted.mkString(",")}\n batches=$batches"
        )
      }
    }
  }

  test("top-k heap resumes from its truncated checkpointed state after restart") {
    withRocksDb {
      val rnd = new scala.util.Random(seed * 31)
      (1 to 2).foreach { round =>
        val k = 3
        val keys = Seq("a", "b")
        val events = Seq.fill(40) {
          ScoreEvent(keys(rnd.nextInt(keys.size)), rnd.nextInt(8).toLong, (rnd.nextInt(100) + 1).toDouble)
        }
        val batches = slices(rnd, events)
        val cuts = Set(batches.size / 2)
        val heap = scala.collection.mutable.Map.empty[String, Seq[(Long, Double)]]
        val want = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double, Int)]
        batches.foreach { b =>
          b.groupBy(_.key).foreach { case (key, rows) =>
            val merged = (heap.getOrElse(key, Seq.empty) ++ rows.map(e => (e.id, e.score)))
              .groupBy(_._1)
              .map { case (id, xs) => (id, xs.map(_._2).max) }
            val top = merged.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
            heap(key) = top
            top.zipWithIndex.foreach { case ((id, s), i) => want += ((key, id, s, i + 1)) }
          }
        }
        val got = runWithRestarts[ScoreEvent, TopKEntry](batches, cuts, s"rst_topk_$round") {
          (in, collect, ck) =>
            CdcStream
              .topKStream(in.toDS(), k)
              .writeStream
              .foreachBatch(collect)
              .option("checkpointLocation", ck)
              .outputMode(OutputMode.Append)
              .start()
        }.map(t => (t.key, t.id, t.score, t.rank))
        assert(
          got.sorted == want.sorted.toSeq,
          s"round $round: heap diverged across restart (cuts=$cuts)\n got=${got.sorted.mkString(",")}\n want=${want.sorted.mkString(",")}"
        )
      }
    }
  }

  test("Welford baseline reloads bit-for-bit: post-restart z-scores are exact doubles") {
    withRocksDb {
      val rnd = new scala.util.Random(seed * 131)
      (1 to 2).foreach { round =>
        val zT = 2.5
        val minN = 4L
        val keys = Seq("m1", "m2")
        val events = keys.flatMap { key =>
          (1 to 30).map { s =>
            val v =
              if (rnd.nextInt(5) == 0) 10.0 + (rnd.nextInt(2) * 2 - 1) * (40.0 + rnd.nextInt(20))
              else 10.0 + rnd.nextGaussian()
            MetricPoint(key, s.toLong, math.rint(v * 100) / 100)
          }
        }
        val shuffled = rnd.shuffle(events)
        val batches = slices(rnd, shuffled)
        val cuts = Set(batches.size / 3, 2 * batches.size / 3)
        val st = scala.collection.mutable.Map.empty[String, (Long, Double, Double)]
        val want = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double, Double, Double, Double)]
        batches.foreach { b =>
          b.groupBy(_.key).foreach { case (key, rows) =>
            var (n, mean, m2) = st.getOrElse(key, (0L, 0.0, 0.0))
            rows.sortBy(_.seq).foreach { p =>
              if (n >= minN) {
                val std = math.sqrt(m2 / (n - 1))
                if (std > 0 && math.abs(p.value - mean) / std > zT)
                  want += ((key, p.seq, p.value, mean, std, (p.value - mean) / std))
              }
              val n1 = n + 1
              val d = p.value - mean
              val mean1 = mean + d / n1
              m2 = m2 + d * (p.value - mean1)
              n = n1
              mean = mean1
            }
            st(key) = (n, mean, m2)
          }
        }
        val got = runWithRestarts[MetricPoint, Alert](
          batches,
          cuts,
          s"rst_anom_$round"
        ) { (in, collect, ck) =>
          CdcStream
            .anomalyAlerts(in.toDS(), zT, minN)
            .writeStream
            .foreachBatch(collect)
            .option("checkpointLocation", ck)
            .outputMode(OutputMode.Append)
            .start()
        }.map(a => (a.key, a.seq, a.value, a.mean, a.std, a.z))
        assert(want.nonEmpty, s"round $round: no alerts fired — fixture vacuous, widen the spike arm")
        // exact tuple equality: mean/std/z are doubles computed FROM the
        // reloaded (n, mean, m2) state — any round-trip loss diverges here
        assert(
          got.sorted == want.sorted.toSeq,
          s"round $round: Welford state not bit-identical across restart (cuts=$cuts)\n got=${got.sorted.mkString(",")}\n want=${want.sorted.mkString(",")}"
        )
      }
    }
  }
}
