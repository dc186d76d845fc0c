package graft

import graft.sources.CdcSource
import java.sql.DriverManager

/** CdcSource against a REAL embedded JDBC engine (Apache Derby, which
  * ships with the Spark distribution): the partitioned-snapshot and
  * watermark-poll paths execute end-to-end through Spark's JDBC source —
  * bounds query, range-partitioned parallel read, pushdown — not mocks.
  * (The Kafka/Debezium broker leg remains environment-blocked; this
  * covers the database side of the reference's ingest, consumer.py's
  * source contract.)
  */
class CdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftcdc;create=true"
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

  test("partitioned snapshot: range-split parallel read of a real Derby table") {
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE snap_orders (o_id BIGINT PRIMARY KEY, o_total DOUBLE, o_ts TIMESTAMP)")
      val ins = c.prepareStatement("INSERT INTO snap_orders VALUES (?, ?, ?)")
      (1 to 97).foreach { i =>
        ins.setLong(1, i.toLong); ins.setDouble(2, i * 10.5)
        ins.setTimestamp(3, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"))
        ins.addBatch()
      }
      ins.executeBatch()
    }
    val df = CdcSource.snapshot(spark, url, "snap_orders", "o_id", numPartitions = 4, props)
    assert(df.rdd.getNumPartitions == 4, "snapshot must range-split across JDBC partitions")
    assert(df.count() == 97)
    val sums = df.selectExpr("sum(o_id)", "round(sum(o_total), 1)").as[(Long, Double)].head()
    assert(sums == ((97L * 98 / 2, 97.0 * 98 / 2 * 10.5)))
    // identifier injection is rejected before any SQL is built
    intercept[IllegalArgumentException](
      CdcSource.snapshot(spark, url, "snap_orders; DROP TABLE snap_orders", "o_id", 2, props))
  }

  test("watermark poll: only rows strictly past the high-water mark come back, pushed down") {
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE poll_events (e_id BIGINT PRIMARY KEY, updated_at TIMESTAMP)")
      val ins = c.prepareStatement("INSERT INTO poll_events VALUES (?, ?)")
      Seq(
        (1L, "2024-03-01 10:00:00"), (2L, "2024-03-01 11:00:00"),
        (3L, "2024-03-01 12:00:00"), (4L, "2024-03-01 13:00:00")
      ).foreach { case (id, ts) =>
        ins.setLong(1, id); ins.setTimestamp(2, java.sql.Timestamp.valueOf(ts)); ins.addBatch()
      }
      ins.executeBatch()
    }
    val got = CdcSource
      .incremental(spark, url, "poll_events", "updated_at", java.sql.Timestamp.valueOf("2024-03-01 11:00:00"), props)
      .select("e_id").as[Long].collect().toSet
    assert(got == Set(3L, 4L), "strictly-greater watermark contract")
    // the watermark predicate reaches the JDBC scan (pushdown, not a
    // post-read Spark filter) — the property that makes polling O(delta)
    val plan = CdcSource
      .incremental(spark, url, "poll_events", "updated_at", java.sql.Timestamp.valueOf("2024-03-01 11:00:00"), props)
      .queryExecution.executedPlan.toString
    assert(
      plan.contains("PushedFilters") && plan.toLowerCase.contains("greaterthan(updated_at"),
      s"watermark not pushed down:\n$plan"
    )
  }

  test("empty source table: snapshot falls back to an unpartitioned read, zero rows, no NPE") {
    withConn(_.createStatement().execute("CREATE TABLE empty_t (id BIGINT, v DOUBLE)"))
    val df = CdcSource.snapshot(spark, url, "empty_t", "id", numPartitions = 4, props)
    assert(df.count() == 0)
  }

  test("end-to-end: Derby snapshot + watermark polls fold into the search index, equal to a fresh rebuild") {
    import org.apache.spark.sql.functions._
    import graft.search.Bm25
    // The reference's full ingest loop against a REAL database: initial
    // snapshot (op=r), then two poll cycles picking up inserts/updates,
    // each folded into the BM25 posting artifact via applyDelta — and
    // the final index must equal a fresh build over the final DB state
    // (the exactly-once/idempotence contract the reference relies on).
    withConn { c =>
      c.createStatement().execute(
        "CREATE TABLE docs_t (d_id BIGINT PRIMARY KEY, body VARCHAR(200), updated_at TIMESTAMP)")
      val ins = c.prepareStatement("INSERT INTO docs_t VALUES (?, ?, ?)")
      Seq(
        (1L, "spark joins data", "2024-05-01 09:00:00"),
        (2L, "slow table scan", "2024-05-01 09:30:00"),
        (3L, "spark shuffle plan", "2024-05-01 10:00:00")
      ).foreach { case (id, b, ts) =>
        ins.setLong(1, id); ins.setString(2, b); ins.setTimestamp(3, java.sql.Timestamp.valueOf(ts)); ins.addBatch()
      }
      ins.executeBatch()
    }
    val snap = CdcSource.snapshot(spark, url, "docs_t", "d_id", numPartitions = 2, props)
      .select(col("d_id").as("id"), col("body").as("text"))
    var index = Bm25.buildIndex(snap, "id", "text")
    var hwm = java.sql.Timestamp.valueOf("2024-05-01 10:00:00")
    // poll cycle 1: one new doc + an update of doc 2 land in the DB
    withConn { c =>
      val st = c.createStatement()
      st.execute("INSERT INTO docs_t VALUES (4, 'fast spark query planner', TIMESTAMP('2024-05-01 11:00:00'))")
      st.execute("UPDATE docs_t SET body = 'fast columnar scan', updated_at = TIMESTAMP('2024-05-01 11:30:00') WHERE d_id = 2")
    }
    def poll(): org.apache.spark.sql.DataFrame =
      CdcSource.incremental(spark, url, "docs_t", "updated_at", hwm, props)
        .select(col("d_id").as("id"), col("body").as("text"), col("updated_at"))
    val d1 = poll().localCheckpoint(true)
    index = Bm25.applyDelta(index, d1.select("id", "text"), d1.limit(0).select("id"), "id", "text")
    hwm = java.sql.Timestamp.valueOf("2024-05-01 11:30:00")
    // poll cycle 2: another update of the same doc (idempotent upsert path)
    withConn(_.createStatement().execute(
      "UPDATE docs_t SET body = 'fast vector scan engine', updated_at = TIMESTAMP('2024-05-01 12:00:00') WHERE d_id = 2"))
    val d2 = poll().localCheckpoint(true)
    index = Bm25.applyDelta(index, d2.select("id", "text"), d2.limit(0).select("id"), "id", "text")
    // truth: a fresh index over the CURRENT Derby state
    val finalState = CdcSource.snapshot(spark, url, "docs_t", "d_id", numPartitions = 2, props)
      .select(col("d_id").as("id"), col("body").as("text"))
    val fresh = Bm25.buildIndex(finalState, "id", "text")
    val got = index.postings.select("id", "term", "tf").as[(Long, String, Long)].collect().toSet
    val want = fresh.postings.select("id", "term", "tf").as[(Long, String, Long)].collect().toSet
    assert(got == want, s"folded index diverged from rebuild: ${got.diff(want)} / ${want.diff(got)}")
    val score = Bm25.scoreAgainstIndex(index, Seq("spark", "scan"), 10).as[(Long, Double)].collect().toSeq
    val scoreWant = Bm25.scoreAgainstIndex(fresh, Seq("spark", "scan"), 10).as[(Long, Double)].collect().toSeq
    assert(score == scoreWant && score.nonEmpty)
  }
}
