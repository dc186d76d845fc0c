package graft

import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Envelope, StateChange}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("CdcStream.applyChanges: upserts, deletes, out-of-order drops") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Envelope]
    val q = CdcStream
      .applyChanges(input.toDS())
      .writeStream
      .format("memory")
      .queryName("cdc_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(Envelope("1", 1L, "c", "v1"), Envelope("1", 2L, "u", "v2"), Envelope("2", 1L, "c", "w1"))
      q.processAllAvailable()
      input.addData(Envelope("1", 1L, "u", "stale"), Envelope("2", 2L, "d", "w1"))
      q.processAllAvailable()
      val out = spark.table("cdc_out").as[StateChange].collect()
      // batch 1: key1 advances twice, key2 once
      assert(out.count(_.key == "1") == 2)
      assert(out.filter(_.key == "1").map(_.payload).toSet == Set("v1", "v2"))
      // batch 2: stale seq=1 for key1 dropped; key2 tombstoned
      assert(!out.map(_.payload).contains("stale"))
      assert(out.filter(_.key == "2").map(_.op).toSeq.sorted == Seq("d", "u"))
    } finally q.stop()
  }

  test("percolate registry applies per-batch to a document stream") {
    // The percolate compile is a pure projection (when(pred, id) +
    // explode), so the SAME JsonDsl.percolate drives batch and
    // streaming — stored queries match documents as they flow past.
    implicit val sq = spark.sqlContext
    val registry = Seq(
      1L -> """{"query": {"term": {"status": "ACTIVE"}}}""",
      2L -> """{"query": {"range": {"amount": {"gte": 1000}}}}"""
    )
    val input = MemoryStream[(Long, String, Double)]
    val docs = input.toDF().toDF("id", "status", "amount")
    val q = graft.search.JsonDsl
      .percolate(docs, registry)
      .select("id", "query_id")
      .writeStream
      .format("memory")
      .queryName("percolate_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData((1L, "ACTIVE", 50.0), (2L, "BLOCKED", 1500.0))
      q.processAllAvailable()
      input.addData((3L, "ACTIVE", 2000.0))
      q.processAllAvailable()
      val out = spark.table("percolate_out").as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 1L), (2L, 2L), (3L, 1L), (3L, 2L)))
    } finally q.stop()
  }

  test("nested stored queries percolate a document stream (batch answers per micro-batch)") {
    // The wire nested clause compiles to a pure exists() predicate (no
    // join, no explode), so the JSON-DSL compile path is stream-safe:
    // stored queries with nested paths match per ELEMENT as documents
    // flow past. Fixture mirrors NestedSpec — parent 2 satisfies query 1
    // only ACROSS elements and must not match (the object-vs-nested
    // distinction), the childless parent 3 never matches.
    implicit val sq = spark.sqlContext
    val registry = Seq(
      1L -> """{"query": {"nested": {"path": "items", "query": {"bool": {"must": [
           {"term": {"items.flag": "R"}}, {"range": {"items.qty": {"gte": 48}}}]}}}}}""",
      2L -> """{"query": {"nested": {"path": "items", "query": {"term": {"items.flag": "N"}}}}}"""
    )
    val input = MemoryStream[(Long, Seq[(Int, String, Double)])]
    val docs = input
      .toDF()
      .toDF("pid", "raw")
      .select(
        col("pid"),
        expr("transform(raw, x -> struct(x._1 AS line, x._2 AS flag, x._3 AS qty))").as("items")
      )
    val q = graft.search.JsonDsl
      .percolate(docs, registry)
      .select("pid", "query_id")
      .writeStream
      .format("memory")
      .queryName("nested_percolate_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(
        (1L, Seq((1, "R", 50.0), (2, "N", 10.0))), // one element satisfies BOTH → q1 + q2
        (2L, Seq((1, "R", 10.0), (2, "N", 50.0)))  // q1 only across elements → q2 only
      )
      q.processAllAvailable()
      input.addData((3L, Seq.empty), (4L, Seq((1, "N", 5.0)))) // childless; q2-only
      q.processAllAvailable()
      val out = spark.table("nested_percolate_out").as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 1L), (1L, 2L), (2L, 2L), (4L, 2L)),
        s"streaming nested percolate disagrees with the batch answers: $out")
    } finally q.stop()
  }

  test("partial updates merge fields over the stored doc; delete clears; resurrection starts fresh") {
    implicit val sq = spark.sqlContext
    import CdcStream.{DocChange, PartialEnvelope}
    val input = MemoryStream[PartialEnvelope]
    val q = CdcStream
      .applyPartialChanges(input.toDS())
      .writeStream
      .format("memory")
      .queryName("partial_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(
        PartialEnvelope("1", 1L, "u", Map("name" -> "a", "tier" -> "basic")),
        PartialEnvelope("1", 2L, "u", Map("tier" -> "gold")) // merges over seq 1
      )
      q.processAllAvailable()
      input.addData(PartialEnvelope("1", 1L, "u", Map("tier" -> "stale"))) // fenced
      input.addData(PartialEnvelope("2", 1L, "u", Map("x" -> "1")), PartialEnvelope("2", 2L, "d", Map.empty))
      q.processAllAvailable()
      input.addData(PartialEnvelope("2", 3L, "u", Map("y" -> "2"))) // post-delete: fresh doc
      q.processAllAvailable()
      val out = spark.table("partial_out").as[DocChange].collect()
      val k1 = out.filter(_.key == "1").sortBy(_.seq).map(_.doc)
      assert(k1.toSeq == Seq(Map("name" -> "a", "tier" -> "basic"), Map("name" -> "a", "tier" -> "gold")))
      assert(!out.exists(_.doc.get("tier").contains("stale")))
      val k2 = out.filter(_.key == "2").sortBy(_.seq)
      assert(k2.map(_.op).toSeq == Seq("u", "d", "u"))
      assert(k2.last.doc == Map("y" -> "2")) // no resurrected 'x'
    } finally q.stop()
  }

  test("geofence alerts: geo_distance stored queries percolate a position stream") {
    // Composition: the percolate registry accepts ANY supported clause,
    // so geofencing is just geo_distance stored queries over a stream of
    // struct geo positions — matches emit as (id, fence) rows per batch.
    implicit val sq = spark.sqlContext
    val fences = Seq(
      1L -> """{"query": {"geo_distance": {"distance": "200km", "location": {"lat": 10.0, "lon": 20.0}}}}""",
      2L -> """{"query": {"geo_bounding_box": {"location": {
               "top_left": {"lat": 60.0, "lon": -10.0}, "bottom_right": {"lat": 40.0, "lon": 10.0}}}}}"""
    )
    val input = MemoryStream[(Long, Double, Double)]
    val positions = input
      .toDF()
      .toDF("id", "lat", "lon")
      .select(col("id"), struct(col("lat"), col("lon")).as("location"))
    val q = graft.search.JsonDsl
      .percolate(positions, fences)
      .select("id", "query_id")
      .writeStream
      .format("memory")
      .queryName("geofence_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData((100L, 10.5, 20.5), (101L, 50.0, 0.0), (102L, -30.0, 100.0))
      q.processAllAvailable()
      val out = spark.table("geofence_out").as[(Long, Long)].collect().toSet
      assert(out == Set((100L, 1L), (101L, 2L)))
    } finally q.stop()
  }

  test("TTL state eviction: an idle key leaves the store and its seq fence restarts") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    // Processing-time TimeMode keeps scheduling clock-advancing batches,
    // so processAllAvailable never quiesces — pace with a real trigger
    // and poll the sink instead. Two scenarios because exact short-TTL
    // expiry timing is clock-sensitive: (a) a LONG TTL behaves exactly
    // like the unbounded store (stale seq fenced), (b) a SHORT TTL
    // eventually evicts — the resurrected key accepts a seq the fence
    // would have dropped.
    def run(name: String, ttl: java.time.Duration)(body: (MemoryStream[Envelope], () => Seq[String]) => Unit): Unit = {
      val input = MemoryStream[Envelope]
      val q = CdcStream
        .applyChangesTtl(input.toDS(), ttl)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
        .start()
      try body(input, () => spark.table(name).as[StateChange].collect().map(_.payload).toSeq)
      finally q.stop()
    }
    def waitFor(payloads: () => Seq[String], p: String): Unit = {
      val deadline = System.currentTimeMillis + 90000
      while (!payloads().contains(p)) {
        assert(System.currentTimeMillis < deadline, s"timed out waiting for '$p' in ${payloads()}")
        Thread.sleep(200)
      }
    }
    try {
      run("cdc_ttl_long", java.time.Duration.ofMinutes(10)) { (input, payloads) =>
        input.addData(Envelope("1", 5L, "c", "v5"))
        waitFor(payloads, "v5")
        input.addData(Envelope("1", 1L, "u", "fenced"))
        Thread.sleep(1500) // several triggers — inside the 10 min TTL
        assert(!payloads().contains("fenced"), payloads().mkString(","))
      }
      run("cdc_ttl_short", java.time.Duration.ofSeconds(1)) { (input, payloads) =>
        input.addData(Envelope("1", 5L, "c", "v5"))
        waitFor(payloads, "v5")
        Thread.sleep(3000) // let the 1 s TTL lapse
        input.addData(Envelope("1", 1L, "u", "reborn")) // fence restarted
        waitFor(payloads, "reborn")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("incremental aggregate maintenance: the streamed running view converges to the batch answer") {
    // CDC-aware materialized-aggregate view: upserts add, deletes
    // subtract, the native streaming agg in Update mode maintains per-key
    // totals incrementally — the stream's LAST update per key must equal
    // a one-shot batch aggregate of the same changelog.
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, String, Double)]
    val delta = when(col("op") === "d", -col("amount")).otherwise(col("amount"))
    val q = input
      .toDF()
      .toDF("key", "op", "amount")
      .withColumn("delta", delta)
      .groupBy("key")
      .agg(sum("delta").as("total"))
      .writeStream
      .format("memory")
      .queryName("ivm_out")
      .outputMode(OutputMode.Update)
      .start()
    try {
      input.addData(("a", "c", 10.0), ("b", "c", 5.0), ("a", "u", 2.0))
      q.processAllAvailable()
      input.addData(("a", "d", 4.0), ("b", "u", 1.0))
      q.processAllAvailable()
      val updates = spark.table("ivm_out").as[(String, Double)].collect()
      // last update per key (the view's current state)
      val view = updates.zipWithIndex.groupBy(_._1._1).map { case (k, vs) => k -> vs.maxBy(_._2)._1._2 }
      val batch = Seq(("a", "c", 10.0), ("b", "c", 5.0), ("a", "u", 2.0), ("a", "d", 4.0), ("b", "u", 1.0))
        .toDF("key", "op", "amount")
        .withColumn("delta", delta)
        .groupBy("key")
        .agg(sum("delta").as("total"))
        .as[(String, Double)]
        .collect()
        .toMap
      assert(view == batch, s"incremental view $view diverged from batch $batch")
      assert(view == Map("a" -> 8.0, "b" -> 6.0))
    } finally q.stop()
  }

  test("transformWithState path emits the same changelog as flatMapGroupsWithState") {
    implicit val sq = spark.sqlContext
    // transformWithState mandates the RocksDB state store provider.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    val input = MemoryStream[Envelope]
    val q = CdcStream
      .applyChangesTws(input.toDS())
      .writeStream
      .format("memory")
      .queryName("cdc_tws_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(Envelope("1", 1L, "c", "v1"), Envelope("1", 2L, "u", "v2"), Envelope("2", 1L, "c", "w1"))
      q.processAllAvailable()
      input.addData(Envelope("1", 1L, "u", "stale"), Envelope("2", 2L, "d", "w1"))
      q.processAllAvailable()
      val out = spark.table("cdc_tws_out").as[StateChange].collect()
      assert(out.count(_.key == "1") == 2)
      assert(out.filter(_.key == "1").map(_.payload).toSet == Set("v1", "v2"))
      assert(!out.map(_.payload).contains("stale"))
      assert(out.filter(_.key == "2").map(_.op).toSeq.sorted == Seq("d", "u"))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming IVF maintenance: micro-batch upserts grow the index; cells match first-principles assignment") {
    import graft.operators.Similarity
    implicit val sq = spark.sqlContext
    // base corpus + train-time index
    val base = (0L until 30L).map(i => (i, Array.tabulate(4)(d => ((i % 5) * 2 + d).toFloat))).toDF("id", "v")
    val streamed = new graft.streaming.StreamingIvf(
      Similarity.ivfIndex(base, "id", "v", nLists = 4), "id", "v")
    val input = MemoryStream[(Long, Array[Float])]
    val q = streamed.attach(input.toDF().toDF("id", "v"))
    try {
      input.addData((100L, Array(1f, 2f, 3f, 4f)), (101L, Array(5f, 1f, 9f, 2f)))
      q.processAllAvailable()
      input.addData((102L, Array(0f, 1f, 2f, 3f)))
      q.processAllAvailable()
      val idx = streamed.index
      assert(idx.assigned.count() == 33, "base 30 + 3 streamed upserts")
      // every streamed vector sits in its first-principles nearest cell
      val cells = idx.assigned.filter(col("id") >= 100L).select("id", "cell", "v")
        .as[(Long, Int, Array[Float])].collect()
      def nearest(v: Array[Float]): Int = idx.centroids.zipWithIndex.minBy { case (c, _) =>
        math.sqrt(c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      }._2
      cells.foreach { case (id, cell, v) => assert(cell == nearest(v), s"vector $id landed in $cell") }
      // self-recall: a streamed vector is its own top hit on the grown index
      val top = Similarity.scoreAgainstIvf(idx, "id", "v", Seq(5f, 1f, 9f, 2f), 1, nProbe = 2)
        .as[(Long, Double)].collect()
      assert(top.head._1 == 101L && top.head._2 == 1.0)
    } finally q.stop()
  }

  test("streaming IVF upsert: a re-sent id supersedes its old vector — one row, new embedding wins") {
    import graft.operators.Similarity
    implicit val sq = spark.sqlContext
    val base = (0L until 30L).map(i => (i, Array.tabulate(4)(d => ((i % 5) * 2 + d).toFloat))).toDF("id", "v")
    val streamed = new graft.streaming.StreamingIvf(
      Similarity.ivfIndex(base, "id", "v", nLists = 4), "id", "v")
    val input = MemoryStream[(Long, Array[Float])]
    val q = streamed.attach(input.toDF().toDF("id", "v"))
    try {
      input.addData((100L, Array(9f, 9f, 9f, 9f)))
      q.processAllAvailable()
      // batch 2 RE-SENDS id 100 with a new embedding AND updates a BASE id
      input.addData((100L, Array(0f, 0f, 0f, 1f)), (7L, Array(5f, 1f, 9f, 2f)))
      q.processAllAvailable()
      val idx = streamed.index
      assert(idx.assigned.count() == 31, "upsert: no row-count inflation (30 base + 1 new; 2 ids superseded in place)")
      val v100 = idx.assigned.filter(col("id") === 100L).select("v").as[Array[Float]].collect()
      assert(v100.length == 1, s"exactly one row for a re-sent id, got ${v100.length}")
      assert(v100.head.toSeq == Seq(0f, 0f, 0f, 1f), "the LAST sent embedding wins")
      // a search can never return the superseded embedding: probing with
      // the OLD vector of id 7 no longer yields a 1.0 self-hit
      val stale = Similarity.scoreAgainstIvf(idx, "id", "v", Seq(9f, 9f, 9f, 9f), 1, nProbe = 4)
        .as[(Long, Double)].collect()
      assert(!(stale.head._1 == 100L && stale.head._2 == 1.0), "superseded embedding leaked into search")
      val fresh7 = Similarity.scoreAgainstIvf(idx, "id", "v", Seq(5f, 1f, 9f, 2f), 1, nProbe = 4)
        .as[(Long, Double)].collect()
      assert(fresh7.head._1 == 7L && fresh7.head._2 == 1.0, "updated base id searches at its new embedding")
    } finally q.stop()
  }

  test("streaming graph maintenance: post-stream index equals the batch addToGraph fold over the same deltas") {
    import graft.operators.Similarity
    implicit val sq = spark.sqlContext
    // Well-spread deterministic vectors (not clustered copies): an
    // inserted node's reverse links must compete against DIVERSE
    // adjacency cosines to survive the m-prune — the realistic shape;
    // a corpus of identical copies would always prune the newcomer.
    def vec(i: Long): Array[Float] =
      Array.tabulate(4)(d => (math.sin(i * 12.9898 + d * 78.233) * 10).toFloat)
    val base = (0L until 40L).map(i => (i, vec(i))).toDF("id", "v")
    val g0 = Similarity.graphIndex(base, "id", "v", m = 4, nLists = 4)
    val d1 = Seq((100L, vec(100L)), (101L, vec(101L)))
    val d2 = Seq((102L, vec(102L)))
    val streamed = new graft.streaming.StreamingGraph(g0, base, "id", "v", m = 4)
    val input = MemoryStream[(Long, Array[Float])]
    val q = streamed.attach(input.toDF().toDF("id", "v"))
    try {
      input.addData(d1: _*)
      q.processAllAvailable()
      input.addData(d2: _*)
      q.processAllAvailable()
      // batch twin: the same deltas folded sequentially through addToGraph
      val b1 = Similarity.addToGraph(g0, base, "id", "v", d1.toDF("id", "v"), m = 4)
      val c1 = base.unionByName(d1.toDF("id", "v"))
      val b2 = Similarity.addToGraph(b1, c1, "id", "v", d2.toDF("id", "v"), m = 4)
      val want = b2.neighbors.select("id", "nbr", "cos").as[(Long, Long, Double)].collect().toSet
      val got = streamed.index.neighbors.select("id", "nbr", "cos").as[(Long, Long, Double)].collect().toSet
      assert(got == want, s"streamed graph diverged from the batch fold: ${got.diff(want)} / ${want.diff(got)}")
      // the streamed corpus carries every insert; a streamed vector is
      // REACHABLE via beam search on the grown graph (rounds sized to
      // cover the 43-node graph's diameter from the fixed train-time
      // seeds — reachability is the contract here; 3-round recall has
      // its own floor in ReplicaSpec)
      assert(streamed.corpus.count() == 43)
      val hit = Similarity
        .graphSearch(streamed.index, streamed.corpus, "id", "v", vec(101L).toSeq, k = 1, beam = 16, rounds = 6)
        .as[(Long, Double)].collect().head
      assert(hit._1 == 101L && hit._2 == 1.0, s"streamed insert not reachable: $hit")
    } finally q.stop()
  }

  test("streaming BM25 maintenance: CDC doc stream folds into the posting index, equal to a fresh build") {
    import graft.search.Bm25
    implicit val sq = spark.sqlContext
    val base = Seq((1L, "spark joins data"), (2L, "slow scan"), (3L, "spark shuffle")).toDF("id", "text")
    val streamed = new graft.streaming.StreamingBm25(Bm25.buildIndex(base, "id", "text"), "id", "text")
    val input = MemoryStream[(Long, String, String)]
    val q = streamed.attach(input.toDF().toDF("id", "op", "text"))
    try {
      // batch 1: new doc + update of doc 2
      input.addData((4L, "c", "spark query planner"), (2L, "u", "fast spark scan"))
      q.processAllAvailable()
      // batch 2: delete doc 1
      input.addData((1L, "d", ""))
      q.processAllAvailable()
      val finalDocs = Seq((2L, "fast spark scan"), (3L, "spark shuffle"), (4L, "spark query planner"))
        .toDF("id", "text")
      val fresh = Bm25.buildIndex(finalDocs, "id", "text")
      val got = Bm25.scoreAgainstIndex(streamed.index, Seq("spark", "scan"), 10)
        .as[(Long, Double)].collect().toSeq
      val want = Bm25.scoreAgainstIndex(fresh, Seq("spark", "scan"), 10)
        .as[(Long, Double)].collect().toSeq
      assert(got == want, s"streamed index scores $got diverged from fresh build $want")
      assert(got.head._1 == 2L, "the updated doc matching both terms ranks first")
    } finally q.stop()
  }

  test("streaming nested-layout maintenance: child CDC micro-batches fold into the artifact, equal to rebuild") {
    import graft.search.Nested
    implicit val sq = spark.sqlContext
    val parents = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pid", "tag")
    val children = Seq((1L, 1, 10.0), (1L, 2, 20.0), (2L, 1, 30.0)).toDF("cid", "line", "qty")
    val fields = Seq("line", "qty")
    val base = Nested.nestedIndex(parents, children, "pid", "cid", "items", fields)
    val streamed = new graft.streaming.StreamingNested(base, "pid", "cid", "items", fields)
    val input = MemoryStream[(Long, Int, Double, String)]
    val q = streamed.attach(input.toDF().toDF("cid", "line", "qty", "op"))
    try {
      // batch 1: replace parent 1's line-1 element, give parent 3 a child
      input.addData((1L, 1, 99.0, "u"), (3L, 1, 7.0, "u"))
      q.processAllAvailable()
      // batch 2: delete parent 2's only element
      input.addData((2L, 1, 30.0, "d"))
      q.processAllAvailable()
      val net = Seq((1L, 1, 99.0), (1L, 2, 20.0), (3L, 1, 7.0)).toDF("cid", "line", "qty")
      val rebuilt = Nested.nestedIndex(parents, net, "pid", "cid", "items", fields)
      def dump(df: org.apache.spark.sql.DataFrame) =
        df.select(col("pid"), expr("transform(items, x -> struct(x.line, x.qty))").as("e"))
          .as[(Long, Seq[(Int, Double)])]
          .collect()
          .toMap
      assert(dump(streamed.index) == dump(rebuilt), "live-maintained nested artifact diverged from rebuild")
    } finally q.stop()
  }

  test("streaming near-dup detection: per-batch pairs union to the full-recompute answer") {
    import graft.operators.MinHashLSH
    implicit val sq = spark.sqlContext
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different document about spark shuffle plans")
    ).toDF("id", "text")
    val streamed = new graft.streaming.StreamingMinHash(MinHashLSH.index(base, "id", "text"), "id", "text")
    val input = MemoryStream[(Long, String)]
    val q = streamed.attach(input.toDF().toDF("id", "text"))
    try {
      // batch 1: a near-dup of doc 1; batch 2: a near-dup of the batch-1 doc
      input.addData((10L, "the quick brown fox jumps over the lazy dog tonight again"))
      q.processAllAvailable()
      input.addData((11L, "the quick brown fox jumps over the lazy dog tonight again ok"))
      q.processAllAvailable()
      val got = streamed.pairs.get.as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
      val all = base.unionByName(Seq(
        (10L, "the quick brown fox jumps over the lazy dog tonight again"),
        (11L, "the quick brown fox jumps over the lazy dog tonight again ok")
      ).toDF("id", "text"))
      val full = MinHashLSH.nearDupPairs(all, "id", "text").as[(Long, Long, Double)]
        .collect().map(p => (p._1, p._2)).toSet
      val basePairs = MinHashLSH.nearDupPairs(base, "id", "text").as[(Long, Long, Double)]
        .collect().map(p => (p._1, p._2)).toSet
      // streamed pairs + base-internal pairs == one-shot recompute over everything
      assert((got ++ basePairs) == full, s"streamed $got + base $basePairs != full $full")
      assert(got.contains((1L, 10L)) && got.contains((10L, 11L)))
    } finally q.stop()
  }

  test("topKStream keeps a bounded per-key leaderboard across batches") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    val input = MemoryStream[CdcStream.ScoreEvent]
    val q = CdcStream
      .topKStream(input.toDS(), k = 3)
      .writeStream
      .format("memory")
      .queryName("topk_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      import CdcStream.ScoreEvent
      input.addData(
        ScoreEvent("g", 1L, 10.0),
        ScoreEvent("g", 2L, 30.0),
        ScoreEvent("g", 3L, 20.0),
        ScoreEvent("g", 4L, 5.0)
      )
      q.processAllAvailable()
      val b1 = spark
        .table("topk_out")
        .as[CdcStream.TopKEntry]
        .collect()
      // k=3 bound: member 4 (score 5) never enters the board.
      assert(b1.map(e => (e.rank, e.id)).sorted.toSeq == Seq((1, 2L), (2, 3L), (3, 1L)))
      // Batch 2: member 4 improves past everyone; member 1 upserts (no dup).
      input.addData(ScoreEvent("g", 4L, 50.0), ScoreEvent("g", 1L, 15.0))
      q.processAllAvailable()
      val b2 = spark
        .table("topk_out")
        .as[CdcStream.TopKEntry]
        .collect()
        .drop(b1.length)
      assert(b2.map(e => (e.rank, e.id, e.score)).sorted.toSeq ==
        Seq((1, 4L, 50.0), (2, 2L, 30.0), (3, 3L, 20.0)))
      // Bounded state: the emitted board never exceeds k rows per batch.
      assert(b2.length == 3)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming anomaly alerts: causal z-score vs exact batch prefix moments, any micro-batch slicing") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    import CdcStream.{Alert, MetricPoint}
    // Two keys: "cpu" carries a planted spike at seq 9 and a later shift
    // that re-baselines; "mem" stays quiet and must never alert.
    val cpu = Seq(10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 10.1, 80.0, 10.3, 9.9, 10.4)
      .zipWithIndex
      .map { case (v, i) => MetricPoint("cpu", i + 1L, v) }
    val mem = (1 to 12).map(i => MetricPoint("mem", i.toLong, 50.0 + (i % 3)))
    val input = MemoryStream[MetricPoint]
    val q = CdcStream
      .anomalyAlerts(input.toDS(), zThreshold = 3.0, minN = 5L)
      .writeStream
      .format("memory")
      .queryName("anomaly_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // deliberately uneven micro-batches: the spike's batch also carries
      // its neighbors, so causality (baseline excludes the spike itself)
      // is what's under test, not batch boundaries
      val all = (cpu ++ mem).sortBy(p => (p.seq, p.key))
      input.addData(all.take(5): _*)
      q.processAllAvailable()
      input.addData(all.slice(5, 19): _*)
      q.processAllAvailable()
      input.addData(all.drop(19): _*)
      q.processAllAvailable()
      val alerts = spark.table("anomaly_out").as[Alert].collect().toSeq
      assert(alerts.map(_.key).toSet == Set("cpu"))
      assert(alerts.map(_.seq).toSet == Set(9L), s"expected only the planted spike, got $alerts")
      // the emitted baseline equals the exact batch moments over the
      // PREFIX (seq 1-8) — streaming state is slicing-invariant
      val prefix = cpu.take(8).map(_.value)
      val mean = prefix.sum / prefix.size
      val std = math.sqrt(prefix.map(v => (v - mean) * (v - mean)).sum / (prefix.size - 1))
      val a = alerts.head
      assert(math.abs(a.mean - mean) < 1e-9 && math.abs(a.std - std) < 1e-9)
      assert(math.abs(a.z - (80.0 - mean) / std) < 1e-9)
      // the spike folded into the baseline afterwards (re-baselining):
      // post-spike normal samples did not alert even though they deviate
      // from the pre-spike mean less than the spike did
      assert(!alerts.exists(_.seq > 9L))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("eventRate: windowed counts with watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = CdcStream
      .eventRate(df, "ts", "10 minutes", "1 hour")
      .writeStream
      .format("memory")
      .queryName("rate_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((ts(1), 1L), (ts(2), 2L), (ts(11), 3L))
      q.processAllAvailable()
      // advance watermark far enough to close both windows
      input.addData((java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 9L))
      q.processAllAvailable()
      val out = spark.table("rate_out").orderBy("window_start").as[(java.sql.Timestamp, Long)].collect()
      assert(out.map(_._2).toSeq == Seq(2L, 1L))
    } finally q.stop()
  }

  test("sessionWindows closes sessions after the gap") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = CdcStream
      .sessionWindows(df, "ts", "user_id", gap = "10 minutes", watermark = "1 minute")
      .writeStream
      .format("memory")
      .queryName("sess_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .start()
    try {
      def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // two bursts for user 1 separated by > gap, then advance watermark
      input.addData((ts(10, 0), 1L), (ts(10, 5), 1L), (ts(10, 30), 1L))
      q.processAllAvailable()
      input.addData((ts(12, 0), 9L))
      q.processAllAvailable()
      val out = spark
        .table("sess_out")
        .filter($"user_id" === 1L)
        .orderBy("session_start")
        .select("n_events")
        .as[Long]
        .collect()
      assert(out.toSeq == Seq(2L, 1L)) // burst of 2, then singleton session
    } finally q.stop()
  }

  test("enrich joins the stream against a broadcast dimension") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("nation_id", "payload")
    val dim = Seq((0L, "ALGERIA"), (1L, "ARGENTINA")).toDF("nation_id", "n_name")
    val q = CdcStream
      .enrich(stream, dim, Seq("nation_id"))
      .writeStream
      .format("memory")
      .queryName("enrich_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .start()
    try {
      input.addData((1L, "doc-a"), (5L, "doc-b"))
      q.processAllAvailable()
      val out = spark.table("enrich_out").orderBy("nation_id").collect()
      assert(out(0).getAs[String]("n_name") == "ARGENTINA")
      assert(out(1).isNullAt(out(1).fieldIndex("n_name"))) // left join keeps unmatched
    } finally q.stop()
  }

  test("intervalJoin attributes follow events to lead events within the window") {
    implicit val sq = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = CdcStream.intervalJoin(
      clicks.toDF().toDF("user_id", "click_ts"),
      buys.toDF().toDF("user_id", "buy_ts", "amount"),
      "user_id",
      "click_ts",
      "buy_ts",
      watermark = "10 seconds",
      within = "30 seconds"
    )
    val q = joined.writeStream
      .format("memory")
      .queryName("attr_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .start()
    try {
      clicks.addData((1L, ts(100)), (2L, ts(100)), (1L, ts(200)))
      // u1 buys 20s after the first click (in-window), u2 buys 60s after
      // (out of window), u3 buys with no click at all.
      buys.addData((1L, ts(120), 9.99), (2L, ts(160), 5.0), (3L, ts(130), 1.0))
      q.processAllAvailable()
      val out = spark
        .table("attr_out")
        .select("user_id", "click_ts", "buy_ts", "amount")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)]
        .collect()
        .toSet
      assert(out == Set((1L, ts(100), ts(120), 9.99)))
    } finally q.stop()
  }

  test("parseWithDlq routes malformed envelopes to the dead-letter frame") {
    import graft.cdc.ChangeEvent
    val rows = Seq(
      """{"before":null,"after":{"id":1,"s":"x"},"op":"c","ts_ms":1,"source":{"table":"t"}}""",
      """this is not json at all""",
      """{"after":{"no_id_field":2},"op":"c","ts_ms":2,"source":{"table":"t"}}"""
    ).toDF("value")
    val (ok, dlq) = ChangeEvent.parseWithDlq(rows, org.apache.spark.sql.functions.col("value"))
    assert(ok.count() == 1)
    assert(dlq.count() == 2)
    assert(dlq.as[String].collect().exists(_.contains("not json")))
  }

  test("streamingDedup drops duplicate keys within the watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "k")
    val q = CdcStream
      .streamingDedup(df, Seq("k"), "ts", "1 hour")
      .writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData((t, "a"), (t, "a"), (t, "b"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("streaming search-index maintenance: CDC batches fold into the posting artifact; live query equals rebuild") {
    // The reference's consumer loop end-to-end on Spark: a CDC stream of
    // document upserts/deletes maintains the BM25 posting artifact via
    // applyDelta per micro-batch, and the LIVE index answers queries
    // identically to a from-scratch rebuild over the final corpus state.
    // localCheckpoint stands in for the durable artifact store: it
    // detaches lineage from the streaming source and keeps it bounded
    // across batches (production writes parquet, the Memo shape).
    import graft.search.Bm25
    implicit val sq = spark.sqlContext
    val docs = Tables.documents(spark, Sf).select($"doc_id", $"text")
    val upd = docs
      .filter($"doc_id" % 3 === 0 && $"doc_id" % 7 === 0)
      .select($"doc_id", concat($"text", lit(" updated revision")).as("text"))
    val delIds = docs.filter($"doc_id" % 3 === 1 && $"doc_id" % 5 === 0).select($"doc_id")
    val input = MemoryStream[(Long, String, Boolean)] // (id, post-image text, deleted)
    var idx: Option[Bm25.Bm25Index] = None
    val q = input
      .toDF()
      .toDF("doc_id", "text", "deleted")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val batch = b.localCheckpoint(true)
        val upserts = batch.filter(!$"deleted").select($"doc_id", $"text")
        val deletes = batch.filter($"deleted").select($"doc_id")
        val next = idx match {
          case None    => Bm25.buildIndex(upserts, "doc_id", "text")
          case Some(i) => Bm25.applyDelta(i, upserts, deletes, "doc_id", "text")
        }
        idx = Some(Bm25.Bm25Index(next.postings.localCheckpoint(true), next.corpus.localCheckpoint(true)))
        ()
      }
      .start()
    try {
      def rows(df: org.apache.spark.sql.DataFrame, deleted: Boolean) =
        df.as[(Long, String)].collect().toIndexedSeq.map { case (id, t) => (id, t, deleted) }
      // batch 0: initial corpus slice
      input.addData(rows(docs.filter($"doc_id" % 3 === 0), deleted = false): _*)
      q.processAllAvailable()
      // batch 1: new docs + in-place updates of existing ones
      input.addData(rows(docs.filter($"doc_id" % 3 === 1).unionByName(upd), deleted = false): _*)
      q.processAllAvailable()
      // batch 2: the rest, plus deletes
      input.addData(
        rows(docs.filter($"doc_id" % 3 === 2), deleted = false) ++
          delIds.as[Long].collect().toIndexedSeq.map(id => (id, "", true)): _*
      )
      q.processAllAvailable()
    } finally q.stop()
    val finalCorpus = docs
      .join(upd.select($"doc_id".as("_u")), $"doc_id" === $"_u", "left_anti")
      .unionByName(upd)
      .join(delIds.select($"doc_id".as("_d")), $"doc_id" === $"_d", "left_anti")
    val live = Bm25.scoreAgainstIndex(idx.get, Seq("spark", "query"), 10).as[(Long, Double)].collect().toSeq
    val rebuilt = Bm25.topK(finalCorpus, "doc_id", "text", Seq("spark", "query"), 10).as[(Long, Double)].collect().toSeq
    assert(live == rebuilt && live.nonEmpty, s"live=$live rebuilt=$rebuilt")
    // the maintained corpus scalars equal the rebuild's exactly
    val a = idx.get.corpus.as[(Long, Long, Double)].collect().toSeq
    val b = Bm25.buildIndex(finalCorpus, "doc_id", "text").corpus.as[(Long, Long, Double)].collect().toSeq
    assert(a == b, s"maintained corpus $a != rebuilt $b")
  }

  test("streaming incremental near-dup: each batch probes then folds the artifact; equals full recompute") {
    // The daily append-mostly loop as a stream: every micro-batch of new
    // docs probes the accumulated MinHash artifact (incrementalPairs),
    // then folds its own signatures in (appendIndex) so the NEXT batch
    // sees it. Across all batches the discovered pair set must equal a
    // full from-scratch recompute over everything — on real data.
    import graft.operators.MinHashLSH
    implicit val sq = spark.sqlContext
    val all = Tables.documents(spark, Sf).select($"doc_id", $"text")
    val input = MemoryStream[(Long, String)]
    var idx: Option[MinHashLSH.MinHashIndex] = None
    val found = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val q = input
      .toDF()
      .toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // materialize the micro-batch: the artifact outlives the batch,
        // so its lineage must not reference the streaming source
        val batch = b.localCheckpoint(true)
        idx match {
          case None =>
            found ++= MinHashLSH
              .nearDupPairs(batch, "doc_id", "text", threshold = 0.5)
              .as[(Long, Long, Double)]
              .collect()
            idx = Some(MinHashLSH.index(batch, "doc_id", "text"))
          case Some(i) =>
            found ++= MinHashLSH
              .incrementalPairs(i, batch, "doc_id", "text", threshold = 0.5)
              .as[(Long, Long, Double)]
              .collect()
            idx = Some(MinHashLSH.appendIndex(i, MinHashLSH.index(batch, "doc_id", "text")))
        }
        ()
      }
      .start()
    try {
      for (r <- 0L until 3L) {
        input.addData(all.filter($"doc_id" % 3 === r).as[(Long, String)].collect().toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val full = MinHashLSH
      .nearDupPairs(all, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)]
      .collect()
      .toSet
    assert(found.toSet == full, {
      val missing = full -- found
      val extra = found.toSet -- full
      s"missing=$missing extra=$extra"
    })
    assert(full.nonEmpty, "vacuous: the corpus has no near-dup pairs at this threshold")
  }

  test("PercolateStream.alertsSuppressed: one page per (key, stored query) within the watermark horizon") {
    implicit val sq = spark.sqlContext
    val registry = Seq(
      1L -> """{"query": {"term": {"status": "ACTIVE"}}}""",
      2L -> """{"query": {"range": {"amount": {"gte": 1000}}}}"""
    )
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val docs = input.toDF().toDF("user_id", "ts", "status", "amount")
    val q = graft.streaming.PercolateStream
      .alertsSuppressed(docs, registry, "ts", "1 hour", Seq("user_id"))
      .select("user_id", "query_id")
      .writeStream
      .format("memory")
      .queryName("percolate_suppressed")
      .outputMode(OutputMode.Append)
      .start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      // user 10 breaches rule 1 twice within the horizon → ONE alert;
      // its second event also breaches rule 2 → that alert still fires
      // (suppression is per (key, query), not per key).
      input.addData((10L, t(0), "ACTIVE", 50.0), (20L, t(1), "BLOCKED", 10.0))
      q.processAllAvailable()
      input.addData((10L, t(5), "ACTIVE", 1500.0), (20L, t(6), "ACTIVE", 5.0))
      q.processAllAvailable()
      val out = spark.table("percolate_suppressed").as[(Long, Long)].collect().toSeq
      assert(out.count(_ == (10L -> 1L)) == 1, s"duplicate page not suppressed: $out")
      assert(out.toSet == Set(10L -> 1L, 10L -> 2L, 20L -> 1L), out.toString)
    } finally q.stop()
    // the unsuppressed twin is the batch projection verbatim: same rows
    // streaming and batch for the same data (stateless operator)
    val batchDocs = Seq(
      (10L, t(0), "ACTIVE", 50.0),
      (20L, t(1), "BLOCKED", 10.0),
      (10L, t(5), "ACTIVE", 1500.0),
      (20L, t(6), "ACTIVE", 5.0)
    ).toDF("user_id", "ts", "status", "amount")
    val batch = graft.streaming.PercolateStream
      .alerts(batchDocs, registry)
      .select("user_id", "query_id")
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(batch.count(_ == (10L -> 1L)) == 2, "batch projection must NOT suppress")
  }
}
