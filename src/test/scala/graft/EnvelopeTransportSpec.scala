package graft

import graft.cdc.IndexPipeline
import graft.sources.{EnvelopeTransport, FileEnvelopeTransport, KafkaEnvelopeTransport}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files

/** The envelope-transport seam: every transport yields the same
  * single-string-column streaming contract, and IndexPipeline.runStream
  * is transport-parameterized — the pipeline result is identical whether
  * envelopes arrive from files, a memory stream, or (on a cluster with
  * the connector jar) Kafka topics.
  */
class EnvelopeTransportSpec extends SparkSpec {

  private val envelopes = Seq(
    """{"before":null,"after":{"id":1,"status":"ACTIVE"},"op":"c","ts_ms":100,"source":{"table":"card"}}""",
    """{"before":{"id":1,"status":"ACTIVE"},"after":{"id":1,"status":"INACTIVE"},"op":"u","ts_ms":120,"source":{"table":"card"}}""",
    """{"before":null,"after":{"id":2,"status":"NEW"},"op":"c","ts_ms":110,"source":{"table":"card"}}""",
    """{"before":{"id":2,"status":"NEW"},"after":null,"op":"d","ts_ms":130,"source":{"table":"card"}}"""
  )

  private def runThrough(transport: EnvelopeTransport): (String, String) = {
    val out = Files.createTempDirectory("graft-tidx").toString
    val ckpt = Files.createTempDirectory("graft-tckpt").toString
    val q = IndexPipeline.runStream(spark, transport, out, "card", ckpt, "id")
    q.awaitTermination(60000)
    (out, ckpt)
  }

  private def assertFinalState(out: String): Unit = {
    val d1 = java.nio.file.Paths.get(out, "card", "1.json")
    val d2 = java.nio.file.Paths.get(out, "card", "2.json")
    assert(Files.exists(d1), "doc 1 should be indexed")
    assert(Files.readString(d1).contains("INACTIVE"))
    assert(!Files.exists(d2), "doc 2 should be deleted")
  }

  test("file transport drives the pipeline to the same final state as the batch path") {
    val in = Files.createTempDirectory("graft-tenv").toString
    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"), envelopes.mkString("\n"))
    val (out, _) = runThrough(FileEnvelopeTransport(in))
    assertFinalState(out)
  }

  test("any transport honoring the contract drives the pipeline — memory-stream impl") {
    val mem = new EnvelopeTransport {
      override def stream(s: SparkSession): DataFrame = {
        import s.implicits._
        implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
        val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
        ms.addData(envelopes)
        ms.toDF().toDF("value")
      }
    }
    val (out, _) = runThrough(mem)
    assertFinalState(out)
  }

  test("transports present one streaming string column named value") {
    val in = Files.createTempDirectory("graft-tenv2").toString
    val df = FileEnvelopeTransport(in).stream(spark)
    assert(df.isStreaming)
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) == Seq(("value", "string")))
  }

  test("Kafka transport fails fast (not silently) when the connector jar is absent") {
    // This sandbox carries no spark-sql-kafka jar: building the reader
    // must raise the standard missing-data-source error naming kafka —
    // the seam's behavior on a connector-less cluster is a loud failure
    // at stream construction, never a hung or empty stream.
    val e = intercept[Exception] {
      KafkaEnvelopeTransport("broker:9092", Seq("cdc.public.card")).stream(spark).schema
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.toLowerCase.contains("kafka")), e.toString)
  }
}
