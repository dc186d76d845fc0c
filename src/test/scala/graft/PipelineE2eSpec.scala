package graft

import graft.cdc.ChangeEvent
import graft.search.{Bm25, Nested}
import graft.sources.{CdcSource, FileEnvelopeTransport}
import java.sql.DriverManager
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's WHOLE pipeline, end to end at sf1-ish scale (50 000
  * parents / 100 000 children — the documents table's sf1 cardinality):
  * Derby snapshot → Debezium-envelope transport (file landing zone) →
  * streaming micro-batch apply → LIVE index maintenance (BM25 postings
  * via Bm25.applyDelta + the nested array-of-structs artifact via
  * Nested.applyDelta with the seqCol multi-op contract) → serving
  * queries — asserted the way the reference's test.sh checks its stack:
  * COUNT PARITY between the source database and every index artifact,
  * and QUERY EQUALITY between the live-maintained artifacts and fresh
  * rebuilds over the final database state.
  */
class PipelineE2eSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:grafte2e;create=true"
  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }
  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c)
    finally c.close()
  }

  private val NDocs = 50000
  private val vocab = Seq(
    "spark", "scan", "join", "hash", "merge", "filter", "vector", "column",
    "batch", "window", "query", "table", "row", "sort", "group", "shuffle")
  private def bodyOf(i: Long): String = {
    val w = vocab((i % 16).toInt); val x = vocab(((i / 16) % 16).toInt); val y = vocab(((i / 256) % 16).toInt)
    s"$w $x $y doc$i"
  }

  private def envDoc(op: String, id: Long, body: String, ts: Long): String = {
    val img = s"""{"d_id":$id,"body":"$body"}"""
    val (b, a) = if (op == "d") (img, "null") else ("null", img)
    s"""{"before":$b,"after":$a,"op":"$op","ts_ms":$ts,"source":{"table":"docs"}}"""
  }
  private def envSec(op: String, id: Long, secNo: Int, qty: Double, ts: Long): String = {
    val img = s"""{"d_id":$id,"sec_no":$secNo,"qty":$qty}"""
    val (b, a) = if (op == "d") (img, "null") else ("null", img)
    s"""{"before":$b,"after":$a,"op":"$op","ts_ms":$ts,"source":{"table":"sections"}}"""
  }

  test("snapshot → envelope stream → live BM25 + nested maintenance ≡ rebuild over final DB state") {
    val t0 = System.nanoTime()
    // ── 1. Seed the source database ────────────────────────────────────
    withConn { c =>
      c.createStatement().execute(
        "CREATE TABLE e2e_docs (d_id BIGINT PRIMARY KEY, body VARCHAR(120))")
      c.createStatement().execute(
        "CREATE TABLE e2e_sections (d_id BIGINT, sec_no INT, qty DOUBLE, PRIMARY KEY (d_id, sec_no))")
      val di = c.prepareStatement("INSERT INTO e2e_docs VALUES (?, ?)")
      val si = c.prepareStatement("INSERT INTO e2e_sections VALUES (?, ?, ?)")
      (0L until NDocs).foreach { i =>
        di.setLong(1, i); di.setString(2, bodyOf(i)); di.addBatch()
        (1 to 2).foreach { s =>
          si.setLong(1, i); si.setInt(2, s); si.setDouble(3, (i % 100) + s.toDouble); si.addBatch()
        }
        if (i % 5000 == 4999) { di.executeBatch(); si.executeBatch() }
      }
      di.executeBatch(); si.executeBatch()
    }
    // ── 2. Snapshot (range-partitioned parallel JDBC read) + index build
    val snapDocs = CdcSource.snapshot(spark, url, "e2e_docs", "d_id", numPartitions = 8, props)
    val snapSecs = CdcSource.snapshot(spark, url, "e2e_sections", "d_id", numPartitions = 8, props)
    var bm25 = Bm25.buildIndex(snapDocs, "d_id", "body")
    bm25 = Bm25.Bm25Index(bm25.postings.localCheckpoint(true), bm25.corpus.localCheckpoint(true))
    var nested = Nested
      .nestedIndex(snapDocs.select("d_id"), snapSecs, "d_id", "d_id", "items", Seq("sec_no", "qty"))
      .localCheckpoint(true)
    val emptyItems = array().cast(nested.schema("items").dataType)
    // ── 3. Author the CDC batches (and apply them to Derby — the truth) ─
    // batch 1: 1000 new docs (with sections), 500 body updates, 500 doc
    // deletes (with their sections' deletes — the FK-cascade envelopes).
    // batch 2: section-level churn on surviving docs + the multi-op case:
    // insert-then-delete of ONE section in the SAME batch (seqCol leg).
    val ins = (NDocs.toLong until NDocs + 1000L)
    val upd = (0L until 500L)
    val del = (500L until 1000L)
    val b1 = ins.flatMap(i =>
      envDoc("c", i, bodyOf(i * 7), 1000 + i) +:
        (1 to 2).map(s => envSec("c", i, s, (i % 50) + s.toDouble, 1000 + i))) ++
      upd.map(i => envDoc("u", i, s"updated ${bodyOf(i + 3)}", 2000 + i)) ++
      del.flatMap(i =>
        (1 to 2).map(s => envSec("d", i, s, 0.0, 3000 + i)) :+ envDoc("d", i, bodyOf(i), 3000 + i))
    val secUpd = (1000L until 1500L)
    val b2 = secUpd.map(i => envSec("u", i, 1, 999.5, 5000 + i)) ++
      Seq(
        envSec("c", 2000L, 9, 42.0, 6001), // insert sec 9 on doc 2000 ...
        envSec("d", 2000L, 9, 42.0, 6002)  // ... and delete it, same batch
      )
    withConn { c =>
      val st = c.createStatement()
      val di = c.prepareStatement("INSERT INTO e2e_docs VALUES (?, ?)")
      val si = c.prepareStatement("INSERT INTO e2e_sections VALUES (?, ?, ?)")
      ins.foreach { i =>
        di.setLong(1, i); di.setString(2, bodyOf(i * 7)); di.addBatch()
        (1 to 2).foreach { s => si.setLong(1, i); si.setInt(2, s); si.setDouble(3, (i % 50) + s.toDouble); si.addBatch() }
      }
      di.executeBatch(); si.executeBatch()
      val du = c.prepareStatement("UPDATE e2e_docs SET body = ? WHERE d_id = ?")
      upd.foreach { i => du.setString(1, s"updated ${bodyOf(i + 3)}"); du.setLong(2, i); du.addBatch() }
      du.executeBatch()
      st.execute(s"DELETE FROM e2e_sections WHERE d_id >= 500 AND d_id < 1000")
      st.execute(s"DELETE FROM e2e_docs WHERE d_id >= 500 AND d_id < 1000")
      val su = c.prepareStatement("UPDATE e2e_sections SET qty = 999.5 WHERE d_id = ? AND sec_no = 1")
      secUpd.foreach { i => su.setLong(1, i); su.addBatch() }
      su.executeBatch()
      // the in-batch insert-then-delete nets to nothing in the DB
    }
    val landing = java.nio.file.Files.createTempDirectory("graft_e2e_landing").toFile
    def writeBatch(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        new java.io.File(landing, name).toPath,
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    writeBatch("batch1.jsonl", b1)
    writeBatch("batch2.jsonl", b2)
    // ── 4. Stream the landing zone; fold every micro-batch into the live
    //       artifacts (parent ops first, then child ops with seqCol) ────
    val transport = FileEnvelopeTransport(landing.getAbsolutePath, maxFilesPerTrigger = Some(1))
    def fold(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (!batch.isEmpty) {
        val parsed = ChangeEvent.parse(batch, col("value"), keyField = "d_id").localCheckpoint(true)
        // doc ops: last op per key within the batch (max_by ts_ms), then
        // split into post-image upserts and tombstones
        val docLast = graft.cdc.CdcBatch.latestState(
          parsed.filter(col("table") === "docs"),
          "key", col("ts_ms"),
          col("op"), element_at(col("after"), "body").as("body"))
        val docUp = docLast.filter(col("op") =!= "d")
          .select(col("key").cast("long").as("d_id"), col("body"))
        val docDel = docLast.filter(col("op") === "d").select(col("key").cast("long").as("d_id"))
        bm25 = Bm25.applyDelta(bm25, docUp, docDel, "d_id", "body")
        bm25 = Bm25.Bm25Index(bm25.postings.localCheckpoint(true), bm25.corpus.localCheckpoint(true))
        // nested artifact: parent membership first (deletes anti-join out,
        // inserts arrive with empty item arrays), then the child delta —
        // multi-op elements resolved by ts_ms through seqCol
        val newParents = docUp.select(col("d_id")).withColumn("items", emptyItems)
        val existing = nested.join(docDel, Seq("d_id"), "left_anti")
        val withParents = existing.unionByName(
          newParents.join(existing.select("d_id"), Seq("d_id"), "left_anti"))
        val secDelta = parsed.filter(col("table") === "sections")
          .select(
            col("key").cast("long").as("d_id"),
            coalesce(element_at(col("after"), "sec_no"), element_at(col("before"), "sec_no"))
              .cast("int").as("sec_no"),
            coalesce(element_at(col("after"), "qty"), element_at(col("before"), "qty"))
              .cast("double").as("qty"),
            col("op"),
            col("ts_ms"))
        nested = Nested
          .applyDelta(withParents, secDelta, "d_id", "d_id", "items", Seq("sec_no", "qty"),
            opCol = "op", seqCol = Some("ts_ms"))
          .localCheckpoint(true)
      }
    }
    val q = transport.stream(spark)
      .writeStream.outputMode("append")
      .foreachBatch(fold _)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // ── 5. Truth: fresh snapshot + rebuild over the FINAL DB state ─────
    val finalDocs = CdcSource.snapshot(spark, url, "e2e_docs", "d_id", numPartitions = 8, props)
      .localCheckpoint(true)
    val finalSecs = CdcSource.snapshot(spark, url, "e2e_sections", "d_id", numPartitions = 8, props)
      .localCheckpoint(true)
    // count parity, the reference test.sh check: DB rows == index docs
    val dbCount = finalDocs.count()
    assert(dbCount == NDocs + 1000 - 500, s"unexpected final DB cardinality: $dbCount")
    val bmCount = bm25.corpus.select("n_docs").as[Long].head()
    assert(bmCount == dbCount, s"BM25 corpus count $bmCount != DB count $dbCount")
    val nestedCount = nested.count()
    assert(nestedCount == dbCount, s"nested artifact count $nestedCount != DB count $dbCount")
    // BM25: posting-for-posting equality with a fresh rebuild
    val freshBm = Bm25.buildIndex(finalDocs, "d_id", "body")
    val pLive = bm25.postings.select("id", "dl", "term", "tf")
    val pFresh = freshBm.postings.select("id", "dl", "term", "tf")
    assert(pLive.exceptAll(pFresh).isEmpty && pFresh.exceptAll(pLive).isEmpty,
      "live BM25 postings diverged from rebuild")
    // ... and query equality where it matters: the served top-10
    val qTerms = Seq("spark", "scan")
    val liveTop = Bm25.scoreAgainstIndex(bm25, qTerms, 10).as[(Long, Double)].collect().toSeq
    val freshTop = Bm25.scoreAgainstIndex(freshBm, qTerms, 10).as[(Long, Double)].collect().toSeq
    assert(liveTop == freshTop && liveTop.nonEmpty, "BM25 top-10 diverged")
    // nested: artifact equality (items arrays are sort_array-canonical)
    val freshNested = Nested
      .nestedIndex(finalDocs.select("d_id"), finalSecs, "d_id", "d_id", "items", Seq("sec_no", "qty"))
    val liveJson = nested.select(col("d_id"), to_json(col("items")).as("j"))
    val freshJson = freshNested.select(col("d_id"), to_json(col("items")).as("j"))
    val dLive = liveJson.exceptAll(freshJson).limit(3).collect().toSeq
    val dFresh = freshJson.exceptAll(liveJson).limit(3).collect().toSeq
    assert(dLive.isEmpty && dFresh.isEmpty,
      s"live nested artifact diverged from rebuild: live-only=$dLive fresh-only=$dFresh")
    // ... the in-batch insert-then-delete netted out (seqCol contract)
    assert(nested.filter(col("d_id") === 2000L)
      .select(exists(col("items"), x => x.getField("sec_no") === 9)).as[Boolean].head() == false,
      "the same-batch insert+delete section survived")
    // ... and a serving nested query agrees with the rebuilt artifact
    def nestedHits(idx: DataFrame): Long =
      idx.filter(Nested.query(col("items"), x => x.getField("qty") >= 999.0)).count()
    val liveHits = nestedHits(nested)
    assert(liveHits == nestedHits(freshNested) && liveHits == 500,
      s"nested query diverged or wrong: $liveHits")
    // ── 6. The ALERTING loop (r14): the same envelope stream drives the
    //       indexed percolator against a 10⁴-rule registry — the
    //       reference's threshold/match alert panels over the CDC
    //       stream, at registry sizes the compiled tier cannot reach.
    //       500 live rules (vocab terms + body-length thresholds) +
    //       9 500 dormant ones (terms absent from the corpus — the
    //       realistic monitor registry where most rules match nothing).
    val tAlert = System.nanoTime()
    val liveRules = (0 until 500).map { i =>
      val t1 = vocab(i % 16); val t2 = vocab((i / 16) % 16)
      (i.toLong, Seq(t1, t2), i % 2 == 0,
        if (i % 3 == 0) Option(20.0) else Option.empty[Double],
        if (i % 5 == 0) Option(35.0) else Option.empty[Double])
    }
    val dormantRules = (0 until 9500).map { i =>
      (10000L + i, Seq(s"zz_rule_$i", "zz_never_in_corpus"), true,
        Option.empty[Double], Option.empty[Double])
    }
    val pindex = graft.search.Percolate.buildIndex(
      (liveRules ++ dormantRules).toDF("query_id", "terms", "conj", "rgt", "rlte"))
    val docUpStream = graft.cdc.ChangeEvent
      .parse(
        FileEnvelopeTransport(landing.getAbsolutePath, maxFilesPerTrigger = Some(1)).stream(spark),
        col("value"), keyField = "d_id")
      .filter(col("table") === "docs" && col("op") =!= "d")
      .select(col("key").cast("long").as("d_id"), element_at(col("after"), "body").as("body"))
      .withColumn("blen", length(col("body")))
    val alertQ = graft.streaming.PercolateStream
      .alertsIndexed(pindex, docUpStream, "d_id", "body", "blen")
      .writeStream.format("memory").queryName("e2e_alerts").outputMode("append")
      .start()
    try {
      alertQ.processAllAvailable()
      // the alerting leg must stay a stateless stream-static join — no
      // watermark, no state store, source-parallel append
      assert(alertQ.lastProgress.stateOperators.isEmpty,
        s"alerting leg grew state: ${alertQ.lastProgress.stateOperators.mkString(",")}")
    } finally alertQ.stop()
    val streamedAlerts = spark.table("e2e_alerts").as[(Long, Long)].collect().toSet
    assert(streamedAlerts.nonEmpty, "vacuous: no alerts fired over the CDC stream")
    assert(streamedAlerts.forall(_._2 < 10000L), "a dormant rule alerted")
    // Parity with the batch percolate over the FINAL DB state: every doc
    // image the stream upserted survives unchanged to the final state in
    // this drill (one upsert per doc, none later deleted), so batch-
    // percolating the final state restricted to the streamed ids must
    // reproduce the streamed alerts exactly.
    val streamedIds = (upd ++ ins).toDF("d_id")
    val batchAlerts = graft.search.Percolate
      .percolate(
        pindex,
        finalDocs.join(streamedIds, Seq("d_id")).withColumn("blen", length(col("body"))),
        "d_id", "body", "blen")
      .as[(Long, Long)].collect().toSet
    assert(streamedAlerts == batchAlerts,
      s"streamed alerts diverge from batch percolate over final state: " +
        s"stream-only=${(streamedAlerts -- batchAlerts).take(5)}, batch-only=${(batchAlerts -- streamedAlerts).take(5)}")
    info(f"alerting leg (10^4-rule registry over the CDC stream): ${streamedAlerts.size} alerts, ${(System.nanoTime() - tAlert) / 1e9}%.1f s")
    info(f"E2E drill (${NDocs} docs + ${2 * NDocs} sections + 2 CDC batches): ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
