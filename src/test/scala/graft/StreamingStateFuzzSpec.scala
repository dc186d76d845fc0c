package graft

import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Alert, Envelope, MetricPoint, ScoreEvent, StateChange, TopKEntry}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Generative differential drill for the transformWithState layer — the
  * same discipline that found the ScriptExpr ANSI-division crash, aimed
  * at the three custom stateful processors, whose contracts were pinned
  * by example-based specs only (r15 verdict #7):
  *
  *   - `applyChangesTws` (the CDC seq fence): random op/seq/key
  *     interleavings under ARBITRARY micro-batch slicing vs an in-memory
  *     fence model — out-of-order drops, duplicate seqs across batches,
  *     delete/resurrect chains;
  *   - `topKStream` (bounded leaderboard heap): the model replicates the
  *     per-batch heap-truncation semantics (state is the TRUNCATED top-k,
  *     so a dropped id's history is genuinely forgotten — the contract,
  *     not a bug), emissions compared batch-for-batch;
  *   - `anomalyAlerts` (causal Welford baseline): alerts AND their
  *     emitted mean/std/z compared BIT-FOR-BIT against an independent
  *     Welford fold (same sequential op order → identical doubles).
  *
  * Fixed seed; a failure prints the full event log + slicing so it
  * reproduces. The TTL eviction-resurrection fence stays in
  * StreamingSpec's clock-paced scenario (wall-clock expiry cannot be
  * made generative without flaking); everything here is TimeMode.None
  * and deterministic.
  */
class StreamingStateFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val seed = 0x57a7ef5L

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

  /** Random batch slicing of an event log: 1..4 events per micro-batch. */
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

  test("applyChangesTws == seq-fence model under random op/seq/slicing interleavings") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      val rnd = new scala.util.Random(seed)
      (1 to 3).foreach { round =>
        val keys = (1 to (2 + rnd.nextInt(3))).map(i => s"k$i")
        // per-key seq pools with gaps, shuffled globally: genuine
        // out-of-order arrivals and cross-batch duplicate seqs
        val events = rnd.shuffle(keys.flatMap { k =>
          val seqs = rnd.shuffle((1 to 12).toList).take(6 + rnd.nextInt(5))
          seqs.map { s =>
            val op = rnd.nextInt(4) match { case 0 => "c"; case 1 => "d"; case _ => "u" }
            Envelope(k, s.toLong, op, s"$k:$s:$op")
          }
        }) ++ keys.take(1).flatMap { k => // a guaranteed cross-batch duplicate
          Seq(Envelope(k, 999L, "u", s"$k:999:u"), Envelope(k, 999L, "u", s"$k:999:dup"))
        }
        val batches = slices(rnd, events)
        // model: per key, strictly-increasing fence; within a batch rows
        // apply in ascending seq
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
        val input = MemoryStream[Envelope]
        val q = CdcStream
          .applyChangesTws(input.toDS())
          .writeStream
          .format("memory")
          .queryName(s"fuzz_cdc_$round")
          .outputMode(OutputMode.Append)
          .start()
        try {
          batches.foreach { b => input.addData(b); q.processAllAvailable() }
          val got = spark
            .table(s"fuzz_cdc_$round")
            .as[StateChange]
            .collect()
            .map(c => (c.key, c.op, c.payload, c.seq))
          assert(
            got.sorted.toSeq == want.sorted.toSeq,
            s"round $round: fence diverges\n got=${got.sorted.mkString(",")}\n want=${want.sorted.mkString(",")}\n batches=$batches"
          )
        } finally q.stop()
      }
    }
  }

  test("topKStream == per-batch heap-truncation model under random slicing") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      val rnd = new scala.util.Random(seed * 31)
      (1 to 3).foreach { round =>
        val k = 2 + rnd.nextInt(3)
        val keys = Seq("a", "b")
        val events = Seq.fill(30 + rnd.nextInt(20)) {
          // small id pool forces upserts; downgrades must NOT replace
          ScoreEvent(keys(rnd.nextInt(keys.size)), rnd.nextInt(8).toLong, (rnd.nextInt(100) + 1).toDouble)
        }
        val batches = slices(rnd, events)
        // model: state = TRUNCATED top-k per key; per batch merge
        // (max per id), truncate, emit all ranks for touched keys
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
        val input = MemoryStream[ScoreEvent]
        val q = CdcStream
          .topKStream(input.toDS(), k)
          .writeStream
          .format("memory")
          .queryName(s"fuzz_topk_$round")
          .outputMode(OutputMode.Append)
          .start()
        try {
          batches.foreach { b => input.addData(b); q.processAllAvailable() }
          val got = spark
            .table(s"fuzz_topk_$round")
            .as[TopKEntry]
            .collect()
            .map(t => (t.key, t.id, t.score, t.rank))
          assert(
            got.sorted.toSeq == want.sorted.toSeq,
            s"round $round (k=$k): heap diverges\n got=${got.sorted.mkString(",")}\n want=${want.sorted.mkString(",")}\n batches=$batches"
          )
        } finally q.stop()
      }
    }
  }

  test("anomalyAlerts == causal Welford model, baselines bit-identical, any slicing") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      val rnd = new scala.util.Random(seed * 131)
      (1 to 3).foreach { round =>
        val zT = 2.0 + rnd.nextInt(3) * 0.5
        val minN = 3L + rnd.nextInt(3)
        val keys = Seq("m1", "m2")
        // unique seqs per key (duplicate-seq tie order inside a batch is
        // iterator-dependent — out of contract); values near 10 with
        // planted spikes so alerts actually fire
        val events = keys.flatMap { key =>
          (1 to 25).map { s =>
            val v =
              if (rnd.nextInt(6) == 0) 10.0 + (rnd.nextInt(2) * 2 - 1) * (40.0 + rnd.nextInt(20))
              else 10.0 + rnd.nextGaussian()
            MetricPoint(key, s.toLong, math.rint(v * 100) / 100)
          }
        }
        val shuffled = rnd.shuffle(events)
        val batches = slices(rnd, shuffled)
        // model: per key, rows in (batch order, seq within batch); the
        // EXACT same op sequence as AnomalyProcessor → identical doubles
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
        val input = MemoryStream[MetricPoint]
        val q = CdcStream
          .anomalyAlerts(input.toDS(), zT, minN)
          .writeStream
          .format("memory")
          .queryName(s"fuzz_anomaly_$round")
          .outputMode(OutputMode.Append)
          .start()
        try {
          batches.foreach { b => input.addData(b); q.processAllAvailable() }
          val got = spark
            .table(s"fuzz_anomaly_$round")
            .as[Alert]
            .collect()
            .map(a => (a.key, a.seq, a.value, a.mean, a.std, a.z))
          assert(want.nonEmpty, s"round $round: no alerts fired — fixture vacuous, widen the spike arm")
          assert(
            got.sorted.toSeq == want.sorted.toSeq,
            s"round $round (z>$zT, minN=$minN): alerts diverge\n got=${got.sorted.mkString(",")}\n want=${want.sorted.mkString(",")}"
          )
        } finally q.stop()
      }
    }
  }
}
