package graft

import graft.sinks.{IndexFileSink, IndexOps}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Cross-attempt bookkeeping for the DLQ specs. Local-mode executors share
  * the JVM, so static state observes what the injected writers did.
  */
object FlakyWriter {
  val attempts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
  val written: java.util.Set[String] = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def reset(): Unit = { attempts.clear(); written.clear() }
  private def bump(id: String): Int = attempts.merge(id, 1, _ + _)

  def failFirstAttempt(badId: String): (String, String) => Unit = { (id, _) =>
    val n = bump(id)
    if (id == badId && n == 1) throw new RuntimeException(s"transient fault on $id")
    written.add(id): Unit
  }

  def alwaysFail(badId: String): (String, String) => Unit = { (id, _) =>
    bump(id): Unit
    if (id == badId) throw new RuntimeException(s"broken doc $id")
    written.add(id): Unit
  }
}

class IndexOpsSpec extends SparkSpec {
  import spark.implicits._

  private def freshIndex(): String = {
    val root = Files.createTempDirectory("graft-ops").toString
    val docs = Seq(
      (1L, "ACTIVE", 10.0),
      (2L, "ACTIVE", 150.0),
      (3L, "BLOCKED", 75.0),
      (4L, "INACTIVE", 200.0)
    ).toDF("id", "status", "amount")
    IndexFileSink.indexBatch(docs, root, "card", "id")
    root
  }

  test("deleteByQuery removes matching docs and rewrites the index") {
    val root = freshIndex()
    val deleted = IndexOps.deleteByQuery(spark, root, "card", col("status") === "BLOCKED")
    assert(deleted == 1L)
    val back = IndexFileSink.readIndex(spark, root, "card")
    assert(back.count() == 3)
    assert(back.filter(col("status") === "BLOCKED").count() == 0)
  }

  test("updateByQuery rewrites matching docs in place") {
    val root = freshIndex()
    val matched =
      IndexOps.updateByQuery(spark, root, "card", col("amount") > 100, Map("status" -> lit("HIGH_VALUE")))
    assert(matched == 2L)
    val back = IndexFileSink.readIndex(spark, root, "card")
    assert(back.filter(col("status") === "HIGH_VALUE").count() == 2)
    assert(back.filter(col("id") === 1).select("status").as[String].head() == "ACTIVE")
  }

  test("reindex copies with a transform; catIndices reports counts") {
    val root = freshIndex()
    val n = IndexOps.reindex(spark, root, "card", "card_active", _.filter(col("status") === "ACTIVE"))
    assert(n == 2L)
    val cat = IndexOps.catIndices(spark, root, Seq("card", "card_active")).as[(String, Long)].collect().toMap
    assert(cat == Map("card" -> 4L, "card_active" -> 2L))
  }

  test("retire drops partition directories older than the cutoff bucket") {
    import graft.sinks.PartitionedStore
    val path = Files.createTempDirectory("graft-retire").toString + "/events"
    PartitionedStore.writeByTime(Tables.events(spark, Sf), "ts", path, "yyyy-MM-dd")
    val before = PartitionedStore.read(spark, path).select("p_bucket").distinct().as[String].collect().sorted
    assert(before.length > 2)
    val cutoff = before(2) // keep the two oldest days out
    val retired = IndexOps.retire(spark, path, cutoff)
    assert(retired == before.take(2).toSeq)
    val after = PartitionedStore.read(spark, path).select("p_bucket").distinct().as[String].collect().sorted
    assert(after.toSeq == before.drop(2).toSeq)
    // the directories are gone from disk, not just filtered
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(!dirs.exists(d => before.take(2).exists(b => d.endsWith(b))))
  }

  test("recoverSwap restores an index stranded mid-swap") {
    val root = freshIndex()
    // simulate a crash between the two renames: live dir moved aside
    val f = new java.io.File(root)
    assert(new java.io.File(f, "card").renameTo(new java.io.File(f, "card.__old")))
    assert(IndexOps.recoverSwap(spark, root, "card"))
    assert(IndexFileSink.readIndex(spark, root, "card").count() == 4)
    // the next rewrite op also self-heals without an explicit recover call
    assert(new java.io.File(f, "card").renameTo(new java.io.File(f, "card.__old")))
    val deleted = IndexOps.deleteByQuery(spark, root, "card", col("id") === 1)
    assert(deleted == 1L)
    assert(IndexFileSink.readIndex(spark, root, "card").count() == 3)
  }

  test("rewrite ops leave no temp directory behind") {
    val root = freshIndex()
    IndexOps.deleteByQuery(spark, root, "card", col("id") === 1)
    IndexOps.updateByQuery(spark, root, "card", col("id") === 2, Map("status" -> lit("X")))
    val names = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(names == Set("card"), names.toString)
    assert(IndexFileSink.readIndex(spark, root, "card").count() == 3)
  }

  test("resolvePattern globs index names; aliasView unions with a filter") {
    val root = freshIndex()
    IndexOps.reindex(spark, root, "card", "card_archive")
    IndexOps.reindex(spark, root, "card", "transaction_2024", _.filter(col("amount") > 50))
    assert(IndexOps.resolvePattern(spark, root, "card*") == Seq("card", "card_archive"))
    assert(IndexOps.resolvePattern(spark, root, "*transaction*") == Seq("transaction_2024"))
    assert(IndexOps.resolvePattern(spark, root, "*") == Seq("card", "card_archive", "transaction_2024"))
    val active = IndexOps.aliasView(spark, root, Seq("card", "card_archive"), Some(col("status") === "ACTIVE"))
    assert(active.count() == 4) // 2 ACTIVE docs in each copy
    assert(active.filter(col("status") =!= "ACTIVE").count() == 0)
  }

  test("rollover cuts the next generation at maxDocs, not before") {
    val root = Files.createTempDirectory("graft-roll").toString
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    IndexFileSink.indexBatch(docs, root, "logs-000001", "id")
    // below the cap: no roll
    assert(IndexOps.rollover(spark, root, "logs", maxDocs = 10) == ("logs-000001", false))
    // at/over the cap: generation 2 becomes the write index
    assert(IndexOps.rollover(spark, root, "logs", maxDocs = 3) == ("logs-000002", true))
    // the new empty generation is the write index and does not re-roll
    assert(IndexOps.rollover(spark, root, "logs", maxDocs = 3) == ("logs-000002", false))
    // the read side still sees every generation via the pattern
    assert(IndexOps.resolvePattern(spark, root, "logs-*") == Seq("logs-000001", "logs-000002"))
    intercept[IllegalArgumentException](IndexOps.rollover(spark, root, "nope", 1))
  }

  test("ILM loop end-to-end: generations roll while the stream writes; pattern read + retire stay correct") {
    // TDD §3.5.3's lifecycle as one drill: a MemoryStream drives the
    // write side; every micro-batch asks _rollover for the current write
    // index (cutting the next generation at the doc cap) and bulk-writes
    // into it; the read side is the alias pattern across generations the
    // whole time; the delete phase retires the oldest generation without
    // touching the survivors.
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("graft-ilm").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "logs-000001"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = input
      .toDF()
      .toDF("_id", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (writeIx, _) = IndexOps.rollover(spark, root, "logs", maxDocs = 3)
        // per-doc id-named files (the streaming sink contract): batches
        // APPEND into the current generation — indexBatch's whole-index
        // overwrite would erase earlier micro-batches of the same gen
        val dlq = IndexFileSink.bulkIndexWithRetry(batch, root, writeIx, "_id")
        assert(dlq.isEmpty)
        ()
      }
      .start()
    try {
      input.addData(("1", "a"), ("2", "b"), ("3", "c"))
      q.processAllAvailable()
      input.addData(("4", "d"), ("5", "e"))
      q.processAllAvailable()
      input.addData(("6", "f"))
      q.processAllAvailable()
    } finally q.stop()
    // the cap cut a second generation mid-stream
    val gens = IndexOps.resolvePattern(spark, root, "logs-*")
    assert(gens == Seq("logs-000001", "logs-000002"), gens.toString)
    // the pattern read sees every doc exactly once across the roll
    def patternIds(): Seq[String] =
      IndexOps
        .aliasView(spark, root, IndexOps.resolvePattern(spark, root, "logs-*"))
        .select("_id")
        .as[String]
        .collect()
        .toSeq
        .sorted
    assert(patternIds() == Seq("1", "2", "3", "4", "5", "6"))
    // delete phase: the oldest generation ages out; survivors unharmed
    assert(IndexOps.retireIndices(spark, root, Seq("logs-000001")) == Seq("logs-000001"))
    assert(IndexOps.resolvePattern(spark, root, "logs-*") == Seq("logs-000002"))
    assert(patternIds() == Seq("4", "5", "6"))
    // a retired index retires idempotently (second call is a no-op)
    assert(IndexOps.retireIndices(spark, root, Seq("logs-000001")).isEmpty)
  }

  test("bulkIndexWithRetry: transient failures drain through the retry pass") {
    FlakyWriter.reset()
    val root = Files.createTempDirectory("graft-dlq").toString
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    // id 2 fails on its first attempt only — the bounded retry must drain it
    val dlq = IndexFileSink.bulkIndexWithRetry(
      docs, root, "idx", "id", maxRetries = 2, writeDoc = FlakyWriter.failFirstAttempt("2"))
    assert(dlq.isEmpty, dlq.collect().mkString(", "))
    assert(FlakyWriter.written.size() == 4, s"expected all docs written, got ${FlakyWriter.written}")
  }

  test("bulkIndexWithRetry: persistent failures land in the DLQ, remainder succeeds") {
    FlakyWriter.reset()
    val root = Files.createTempDirectory("graft-dlq").toString
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val dlq = IndexFileSink.bulkIndexWithRetry(
      docs, root, "idx", "id", maxRetries = 2, writeDoc = FlakyWriter.alwaysFail("3")).collect()
    assert(dlq.length == 1, dlq.mkString(", "))
    assert(dlq.head.id == "3")
    assert(dlq.head.attempts == 3, s"1 initial + 2 retries, got ${dlq.head.attempts}")
    assert(dlq.head.error.contains("broken doc"))
    assert(dlq.head.doc.contains("\"v\":\"c\""), "DLQ row must carry the serialized doc for replay")
    assert(FlakyWriter.written.size() == 3, s"the other docs must still be written: ${FlakyWriter.written}")
    // the failing doc was attempted exactly 3 times, not per-evaluation re-run
    assert(FlakyWriter.attempts.get("3") == 3, s"got ${FlakyWriter.attempts.get("3")} attempts")
  }

  test("bulkIndexWithRetry default writer produces the id-named-file index contract") {
    val root = Files.createTempDirectory("graft-dlq").toString
    val docs = Seq((7L, "x"), (8L, "y")).toDF("id", "v")
    val dlq = IndexFileSink.bulkIndexWithRetry(docs, root, "idx", "id")
    assert(dlq.isEmpty)
    val names = new java.io.File(root, "idx").listFiles().map(_.getName).toSet
    assert(names == Set("7.json", "8.json"), names.toString)
  }

  test("PartitionedStore: time filter prunes partitions at the scan") {
    import graft.sinks.PartitionedStore
    val path = Files.createTempDirectory("graft-part").toString + "/events"
    PartitionedStore.writeByTime(Tables.events(spark, Sf), "ts", path, "yyyy-MM-dd")
    val q = PartitionedStore.read(spark, path).filter(col("p_bucket") === "2024-01-05")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_bucket"), plan)
    assert(q.count() > 0)
    // partition pruning leaves non-matching day directories unread
    val all = PartitionedStore.read(spark, path).count()
    assert(q.count() < all)
  }
}
