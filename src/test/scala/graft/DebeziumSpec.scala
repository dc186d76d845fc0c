package graft

import graft.cdc.{ChangeEvent, IndexPipeline}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class DebeziumSpec extends SparkSpec {
  import spark.implicits._

  private val envelopes = Seq(
    """{"before":null,"after":{"id":1,"status":"ACTIVE","card_type":"DEBIT"},"op":"r","ts_ms":100,"source":{"table":"card"}}""",
    """{"before":null,"after":{"id":2,"status":"BLOCKED","card_type":"CREDIT"},"op":"c","ts_ms":110,"source":{"table":"card"}}""",
    """{"before":{"id":1,"status":"ACTIVE"},"after":{"id":1,"status":"INACTIVE","card_type":"DEBIT"},"op":"u","ts_ms":120,"source":{"table":"card"}}""",
    """{"before":{"id":2,"status":"BLOCKED"},"after":null,"op":"d","ts_ms":130,"source":{"table":"card"}}""",
    """{"before":null,"after":{"id":7,"amount":"50.00"},"op":"c","ts_ms":105,"source":{"table":"authorize_transaction"}}"""
  )

  test("parse extracts op/key/table and payload maps from Debezium JSON") {
    val parsed = ChangeEvent.parse(envelopes.toDF("value"), col("value"))
    val rows = parsed.orderBy("ts_ms").collect()
    assert(rows.map(_.getAs[String]("op")).toSeq == Seq("r", "c", "c", "u", "d"))
    assert(rows.head.getAs[String]("table") == "card")
    assert(rows.head.getAs[Map[String, String]]("after")("status") == "ACTIVE")
    // delete key comes from before-image
    assert(rows.last.getAs[String]("key") == "2")
  }

  test("materialize applies upserts and deletes per (table, key)") {
    val state = ChangeEvent.materialize(ChangeEvent.parse(envelopes.toDF("value"), col("value")))
    val rows = state.orderBy("table", "key").collect()
    assert(rows.length == 2) // card:1 (updated), auth:7; card:2 deleted
    val card1 = rows.find(r => r.getAs[String]("table") == "card").get
    assert(card1.getAs[Map[String, String]]("doc")("status") == "INACTIVE")
  }

  test("schema evolution: new payload fields flow through parse + materialize untouched") {
    // The generic map<string,string> payload IS the evolution strategy
    // (the reference consumer indexes whatever fields arrive): a column
    // added upstream mid-stream appears in evolved docs and simply stays
    // absent from older ones — no migration, no schema registry restart.
    val evolving = Seq(
      """{"before":null,"after":{"id":1,"name":"a"},"op":"c","ts_ms":1,"source":{"table":"t"}}""",
      """{"before":null,"after":{"id":1,"name":"a2","tier":"gold"},"op":"u","ts_ms":2,"source":{"table":"t"}}""",
      """{"before":null,"after":{"id":2,"name":"b"},"op":"c","ts_ms":1,"source":{"table":"t"}}"""
    ).toDF("value")
    val out = ChangeEvent
      .materialize(ChangeEvent.parse(evolving, col("value")))
      .select("key", "doc")
      .as[(String, Map[String, String])]
      .collect()
      .toMap
    assert(out("1") == Map("id" -> "1", "name" -> "a2", "tier" -> "gold"))
    assert(out("2") == Map("id" -> "2", "name" -> "b")) // pre-evolution rows untouched
  }

  test("runBatch writes one index per table with final state") {
    val in = Files.createTempDirectory("graft-env").toString
    val out = Files.createTempDirectory("graft-idx").toString
    Files.writeString(java.nio.file.Paths.get(in, "batch1.jsonl"), envelopes.mkString("\n"))
    IndexPipeline.runBatch(spark, in, out)
    val card = graft.sinks.IndexFileSink.readIndex(spark, out, "card")
    assert(card.count() == 1)
    assert(card.select("doc.status").as[String].head() == "INACTIVE")
    val auth = graft.sinks.IndexFileSink.readIndex(spark, out, "authorize_transaction")
    assert(auth.count() == 1)
  }

  test("runStream applies upserts then deletes idempotently") {
    val in = Files.createTempDirectory("graft-senv").toString
    val out = Files.createTempDirectory("graft-sidx").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    Files.writeString(
      java.nio.file.Paths.get(in, "b1.jsonl"),
      envelopes.filter(_.contains("\"table\":\"card\"")).mkString("\n")
    )
    val q = IndexPipeline.runStream(spark, in, out, "card", ckpt)
    q.awaitTermination(60000)
    val d1 = java.nio.file.Paths.get(out, "card", "1.json")
    val d2 = java.nio.file.Paths.get(out, "card", "2.json")
    assert(Files.exists(d1), "doc 1 should be indexed")
    assert(!Files.exists(d2), "doc 2 should be deleted")
    assert(Files.readString(d1).contains("INACTIVE"))
  }
}
