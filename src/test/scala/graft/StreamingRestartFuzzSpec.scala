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

  // ── r18: the incremental INDEX-maintenance paths (verdict #2) ─────────
  // The three arms below kill/resume the queries whose live-maintained ≡
  // rebuilt equivalence is the actual product claim: Bm25.applyDelta,
  // Nested.applyDelta, and the indexed percolator registry. Maintenance
  // wrappers hold the artifact outside the state store (the deployment
  // writes parquet segments), so the restart risk is OFFSET bookkeeping —
  // a replayed or skipped micro-batch after the cut corrupts the artifact
  // relative to the restart-oblivious fold.

  /** Feed `batches` into a maintenance wrapper's query, stopping and
    * re-attaching from the same checkpoint after each cut index — the
    * wrapper instance (≡ the durable artifact) outlives the query.
    */
  private def foldWithRestarts[I](
      batches: Seq[Seq[I]],
      cuts: Set[Int],
      input: MemoryStream[I],
      start: () => org.apache.spark.sql.streaming.StreamingQuery
  ): Unit = {
    var q = start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b)
        q.processAllAvailable()
        if (cuts.contains(i) && i != batches.size - 1) {
          q.stop()
          q = start()
        }
      }
      q.processAllAvailable()
    } finally q.stop()
  }

  test("BM25 incremental maintenance survives checkpoint restart: maintained ≡ rebuilt, posting-for-posting") {
    import graft.search.Bm25
    withRocksDb {
      val rnd = new scala.util.Random(seed * 7)
      (1 to 2).foreach { round =>
        val vocab = Vector("spark", "scan", "join", "shuffle", "filter", "merge", "sort", "hash", "query", "plan")
        def text(): String = Seq.fill(2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val baseDocs = (1L to 5L).map(id => (id, text()))
        // one op per id per batch — the applyDelta changelog contract
        // (CdcBatch collapses upstream); ids 1-3 never delete, so the
        // corpus stays nonempty and avgdl well-defined
        val batches = (1 to 8).map { _ =>
          rnd.shuffle((1L to 9L).toList).take(1 + rnd.nextInt(4)).map { id =>
            if (id > 3 && rnd.nextInt(4) == 0) (id, "d", "") else (id, "u", text())
          }
        }
        val cuts = Set(batches.size / 3, 2 * batches.size / 3)
        val docs = scala.collection.mutable.Map(baseDocs: _*)
        batches.foreach(_.foreach { case (id, op, t) => if (op == "d") docs.remove(id) else docs(id) = t })

        implicit val sq = spark.sqlContext
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft-restart-bm25-$round").toString
        val input = MemoryStream[(Long, String, String)]
        val streamed = new graft.streaming.StreamingBm25(
          Bm25.buildIndex(baseDocs.toDF("id", "text"), "id", "text"),
          "id",
          "text"
        )
        foldWithRestarts(batches, cuts, input, () => streamed.attach(input.toDF().toDF("id", "op", "text"), Some(ckpt)))

        val fresh = Bm25.buildIndex(docs.toSeq.toDF("id", "text"), "id", "text")
        def postings(ix: Bm25.Bm25Index) =
          ix.postings.select("id", "term", "dl", "tf").collect().map(_.toString).sorted.toSeq
        def corpus(ix: Bm25.Bm25Index) =
          ix.corpus.select("n_docs", "sum_dl", "avgdl").collect().map(_.toString).toSeq
        assert(
          postings(streamed.index) == postings(fresh),
          s"round $round: maintained postings diverged from rebuild (cuts=$cuts)\n batches=$batches"
        )
        // avgdl is the same IEEE division on exact integer (count, Σdl) —
        // bit-identical, so string equality is exact equality
        assert(
          corpus(streamed.index) == corpus(fresh),
          s"round $round: corpus stats diverged from rebuild (cuts=$cuts): ${corpus(streamed.index)} vs ${corpus(fresh)}"
        )
        val got = Bm25.scoreAgainstIndex(streamed.index, Seq("spark", "scan"), 10).as[(Long, Double)].collect().toSeq
        val want = Bm25.scoreAgainstIndex(fresh, Seq("spark", "scan"), 10).as[(Long, Double)].collect().toSeq
        assert(got == want && got.nonEmpty, s"round $round: scores diverged: $got vs $want")
      }
    }
  }

  test("nested-artifact maintenance survives checkpoint restart: multi-op child CDC, maintained ≡ rebuilt") {
    import graft.search.Nested
    withRocksDb {
      val rnd = new scala.util.Random(seed * 41)
      (1 to 2).foreach { round =>
        val fields = Seq("line", "qty")
        val parents = (1L to 4L).map(p => (p, s"p$p")).toDF("pid", "tag")
        val baseChildren = Seq((1L, 1, 10.0), (1L, 2, 20.0), (2L, 1, 30.0), (3L, 2, 5.0))
        // multi-op batches: SEVERAL ops per (parent, line) in one batch
        // are legal here because the stream names seqCol — applyDelta
        // must keep only the last op per element
        var seq = 0L
        val batches = (1 to 7).map { _ =>
          Seq.fill(2 + rnd.nextInt(5)) {
            seq += 1
            val cid = 1L + rnd.nextInt(4)
            val line = 1 + rnd.nextInt(3)
            if (rnd.nextInt(3) == 0) (cid, line, 0.0, "d", seq)
            else (cid, line, (rnd.nextInt(90) + 10).toDouble, "u", seq)
          }
        }
        val cuts = Set(batches.size / 3, 2 * batches.size / 3)
        // restart-oblivious model: per batch, last op per (parent, line)
        val state = scala.collection.mutable.Map[(Long, Int), Double](
          baseChildren.map { case (c, l, q) => (c, l) -> q }: _*
        )
        batches.foreach { b =>
          b.groupBy(e => (e._1, e._2)).foreach { case (key, ops) =>
            val last = ops.maxBy(_._5)
            if (last._4 == "d") state.remove(key) else state(key) = last._3
          }
        }

        implicit val sq = spark.sqlContext
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft-restart-nested-$round").toString
        val input = MemoryStream[(Long, Int, Double, String, Long)]
        val base = Nested.nestedIndex(parents, baseChildren.toDF("cid", "line", "qty"), "pid", "cid", "items", fields)
        val streamed = new graft.streaming.StreamingNested(base, "pid", "cid", "items", fields, seqCol = Some("seq"))
        foldWithRestarts(
          batches,
          cuts,
          input,
          () => streamed.attach(input.toDF().toDF("cid", "line", "qty", "op", "seq"), Some(ckpt))
        )

        val net = state.toSeq.map { case ((c, l), q) => (c, l, q) }
        val rebuilt = Nested.nestedIndex(parents, net.toDF("cid", "line", "qty"), "pid", "cid", "items", fields)
        def dump(df: org.apache.spark.sql.DataFrame) =
          df.selectExpr("pid", "transform(items, x -> struct(x.line, x.qty))")
            .as[(Long, Seq[(Int, Double)])]
            .collect()
            .toMap
        assert(
          dump(streamed.index) == dump(rebuilt),
          s"round $round: nested artifact diverged from rebuild (cuts=$cuts)\n batches=$batches"
        )
      }
    }
  }

  test("indexed percolator stream survives checkpoint restart: cumulative alerts ≡ batch percolate, no gaps or replays") {
    import graft.search.Percolate
    withRocksDb {
      val rnd = new scala.util.Random(seed * 101)
      (1 to 2).foreach { round =>
        val registry = Seq(
          (1L, Seq("spark", "shuffle"), true, None, None),
          (2L, Seq("scan", "merge"), false, None, None),
          (3L, Seq("join"), false, Some(20.0), None),
          (4L, Seq("filter", "sort", "hash"), true, None, Some(60.0)),
          (5L, Seq("query"), false, None, None)
        ).toDF("query_id", "terms", "conj", "rgt", "rlte")
        val index = Percolate.buildIndex(registry)
        val vocab = Vector("spark", "scan", "join", "shuffle", "filter", "merge", "sort", "hash", "query", "plan")
        var docId = 0L
        val batches = (1 to 8).map { _ =>
          Seq.fill(1 + rnd.nextInt(5)) {
            docId += 1
            val t = Seq.fill(2 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
            (docId, t, t.length.toLong)
          }
        }
        val cuts = Set(batches.size / 3, 2 * batches.size / 3)
        val got = runWithRestarts[(Long, String, Long), (Long, Long)](batches, cuts, s"rst_perc_$round") {
          (in, collect, ck) =>
            graft.streaming.PercolateStream
              .alertsIndexed(index, in.toDF().toDF("doc_id", "text", "n_chars"), "doc_id", "text", "n_chars")
              .as[(Long, Long)]
              .writeStream
              .foreachBatch(collect)
              .option("checkpointLocation", ck)
              .outputMode(OutputMode.Append)
              .start()
        }
        val want = Percolate
          .percolate(index, batches.flatten.toDF("doc_id", "text", "n_chars"), "doc_id", "text", "n_chars")
          .as[(Long, Long)]
          .collect()
          .toSeq
        assert(want.nonEmpty, s"round $round: no matches — fixture vacuous, widen the vocab overlap")
        assert(
          got.sorted == want.sorted,
          s"round $round: streamed alerts diverged from batch percolate (cuts=$cuts)\n got=${got.sorted.mkString(",")}\n want=${want.sorted.mkString(",")}"
        )
      }
    }
  }
}
