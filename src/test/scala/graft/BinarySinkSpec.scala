package graft

import graft.multimodal.Binary
import graft.sinks.IndexFileSink
import org.apache.spark.sql.functions._
import java.nio.file.Files

class BinarySinkSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "thhello world payload"), (2L, "x" * 300)).toDF("doc_id", "text")

  test("asPayload: byte length, sha256, magic-byte format sniff") {
    val out = Binary.asPayload(docs, $"doc_id", $"text").orderBy("id").collect()
    assert(out(0).getAs[Int]("n_bytes") == 21)
    assert(out(0).getAs[String]("format") == "th-container")
    assert(out(1).getAs[String]("format") == "raw")
    assert(out(0).getAs[String]("sha256").length == 64)
  }

  test("frameSample: chunk count and stride sampling") {
    val out = Binary.frameSample(Binary.asPayload(docs, $"doc_id", $"text"), frameBytes = 64, stride = 2)
      .orderBy("id")
      .collect()
    assert(out(0).getAs[Int]("n_frames") == 1) // 21 bytes -> 1 frame
    val frames2 = out(1).getSeq[org.apache.spark.sql.Row](3)
    assert(out(1).getAs[Int]("n_frames") == 5) // 300 bytes -> 5 frames
    assert(frames2.map(_.getInt(0)) == Seq(0, 2, 4)) // every 2nd frame
  }

  test("frameSample: empty payload yields zero frames, not a phantom frame 0") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val meta = Binary.frameSample(Binary.asPayload(empty, $"doc_id", $"text"), 64, 4).head()
    assert(meta.getAs[Int]("n_frames") == 0)
    assert(meta.getSeq[org.apache.spark.sql.Row](3).isEmpty)
    assert(Binary.frameSampleRows(Binary.asPayload(empty, $"doc_id", $"text"), 64, 4).count() == 0)
  }

  test("tileFeaturePool: mean of per-tile digest features via exact integer sums, partition-proof") {
    val tiles = Binary.tileGrid(Binary.asPayload(docs, $"doc_id", $"text"), rowBytes = 32, tileW = 16, tileH = 4)
    val pooled = Binary.tileFeaturePool(tiles, dims = 4).orderBy("id").collect()
    assert(pooled.length == 2)
    // hand-check one value: e0 == sum of first digest bytes / (255 * n)
    val raw = tiles.orderBy("id", "tile_row", "tile_col").collect()
    val doc1 = raw.filter(_.getAs[Long]("id") == 1L)
    val expect = doc1.map(r => Integer.parseInt(r.getAs[String]("tile_md5").substring(0, 2), 16)).sum /
      (255.0 * doc1.length)
    assert(pooled(0).getAs[Long]("n_tiles") == doc1.length.toLong)
    assert(pooled(0).getAs[Double]("e0") == expect) // bitwise: one division of exact ints
    // every feature lands in [0, 1]
    (0 until 4).foreach(j => pooled.foreach(r => assert(r.getAs[Double](s"e$j") >= 0.0 && r.getAs[Double](s"e$j") <= 1.0)))
    // partition-proof: same bits at a different parallelism
    val repart = Binary.tileFeaturePool(tiles.repartition(7), dims = 4).orderBy("id").collect()
    assert(repart.map(_.getAs[Double]("e0")).toSeq == pooled.map(_.getAs[Double]("e0")).toSeq)
  }

  test("decodeFeatures: mapPartitions plumbing with the stub decoder") {
    val out = Binary.decodeFeatures(Binary.asPayload(docs, $"doc_id", $"text"), featureDim = 8).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Float](1).length == 8)
    // deterministic across invocations
    val again = Binary.decodeFeatures(Binary.asPayload(docs, $"doc_id", $"text"), 8).orderBy("id").collect()
    assert(out(0).getSeq[Float](1) == again(0).getSeq[Float](1))
  }

  test("resizeStub downsamples payload bytes deterministically") {
    val out = Binary.resizeStub(Binary.asPayload(docs, $"doc_id", $"text"), factor = 4).orderBy("id").collect()
    assert(out(1).getAs[Int]("orig_bytes") == 300)
    assert(out(1).getAs[Int]("resized_bytes") == 75)
    val again = Binary.resizeStub(Binary.asPayload(docs, $"doc_id", $"text"), 4).orderBy("id").collect()
    assert(out(1).getAs[Array[Byte]]("payload").toSeq == again(1).getAs[Array[Byte]]("payload").toSeq)
  }

  test("Dashboard renders all six reference panels non-empty") {
    val counts = graft.search.Dashboard.render(spark, Sf)
    assert(counts.size == 6)
    assert(counts.values.forall(_ > 0), counts.toString)
  }

  test("IndexFileSink batch roundtrip is idempotent") {
    val root = Files.createTempDirectory("graft-sink").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    IndexFileSink.indexBatch(df, root, "docs", "id", shards = 2)
    IndexFileSink.indexBatch(df, root, "docs", "id", shards = 2) // replay
    val back = IndexFileSink.readIndex(spark, root, "docs")
    assert(back.count() == 2)
    assert(back.select("_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("DocWriter applies upserts and deletes per document") {
    val root = Files.createTempDirectory("graft-docw").toString
    val w = new IndexFileSink.DocWriter(root, "idx")
    w.open(0, 0)
    val rows = Seq((1L, "u", "v1"), (2L, "u", "v2")).toDF("_id", "_op", "payload").collect()
    rows.foreach(w.process)
    assert(Files.exists(java.nio.file.Paths.get(root, "idx", "1.json")))
    val del = Seq((1L, "d", "")).toDF("_id", "_op", "payload").collect()
    del.foreach(w.process)
    assert(!Files.exists(java.nio.file.Paths.get(root, "idx", "1.json")))
    assert(Files.exists(java.nio.file.Paths.get(root, "idx", "2.json")))
    w.close(null)
  }
}
