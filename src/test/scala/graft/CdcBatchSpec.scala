package graft

import graft.cdc.CdcBatch
import org.apache.spark.sql.functions._

class CdcBatchSpec extends SparkSpec {
  import spark.implicits._

  private def changelog = Seq(
    // (key, seq, op, payload)
    (1L, 1L, "c", "v1"),
    (1L, 2L, "u", "v2"),
    (1L, 3L, "u", "v3"),
    (2L, 1L, "c", "w1"),
    (2L, 2L, "d", "w1"),
    (3L, 5L, "c", "x1")
  ).toDF("key", "seq", "op", "payload")

  test("latestState keeps the highest-seq row per key") {
    val out = CdcBatch
      .latestState(changelog, "key", struct(col("seq")), col("seq"), col("op"), col("payload"))
      .orderBy("key")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq == Seq((1L, "v3"), (2L, "w1"), (3L, "x1")))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L, 5L))
  }

  test("applyOps drops keys whose final op is a delete") {
    val out = CdcBatch
      .applyOps(changelog, "key", struct(col("seq")), col("op") === "d", col("payload"))
      .orderBy("key")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L)) // key 2 deleted
  }

  test("opStats counts per op") {
    val out = CdcBatch.opStats(changelog, col("op")).orderBy("op").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("c", 3L), ("d", 1L), ("u", 2L)))
  }

  test("asOf join picks the latest strictly-prior build row per key") {
    import graft.operators.AsOfJoin
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val build = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "v1"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "v2"),
      (2L, ts("2024-01-01 09:00:00"), 3L, "w1")
    ).toDF("k", "bts", "bseq", "state")
    val probe = Seq(
      (1L, ts("2024-01-01 10:30:00"), 100L), // between v1 and v2
      (1L, ts("2024-01-01 11:00:00"), 101L), // equal ts -> strictly prior = v1
      (1L, ts("2024-01-01 12:00:00"), 102L), // after v2
      (2L, ts("2024-01-01 08:00:00"), 103L), // before any state -> null
      (3L, ts("2024-01-01 10:00:00"), 104L) // unknown key -> null
    ).toDF("k", "pts", "pid")
    val out = AsOfJoin
      .asOf(probe, build, "k", "pts", "bts", "bseq", Seq("state"))
      .orderBy("pid")
      .select("pid", "prior_state")
      .as[(Long, Option[String])]
      .collect()
    assert(out.toSeq == Seq(
      (100L, Some("v1")),
      (101L, Some("v1")),
      (102L, Some("v2")),
      (103L, None),
      (104L, None)
    ))
  }

  test("scd2 emits chained validity intervals, open-ended on the current row") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val log = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "v1"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "v2"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "v3"),
      (2L, ts("2024-01-01 09:00:00"), 4L, "w1")
    ).toDF("key", "ts", "id", "payload")
    val out = CdcBatch
      .scd2(log, "key", struct(col("ts"), col("id")), col("ts"), col("payload"))
      .orderBy("key", "version")
      .collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // each version's valid_to is the next version's valid_from
    assert(k1.init.map(_.getTimestamp(3)).toSeq == k1.tail.map(_.getTimestamp(2)).toSeq)
    // exactly one current row per key, the last one, with an open interval
    assert(out.filter(_.getBoolean(4)).map(r => (r.getLong(0), r.getString(5))).toSeq.sorted ==
      Seq((1L, "v3"), (2L, "w1")))
    assert(out.filter(_.getBoolean(4)).forall(_.isNullAt(3)))
  }

  test("latestState is a partial-aggregate plan, not a window sort") {
    val plan = CdcBatch
      .latestState(changelog, "key", struct(col("seq")), col("payload"))
      .queryExecution
      .executedPlan
      .toString
    // Map-side partial aggregation collapses duplicates before the single
    // key shuffle; there must be no Window (which would shuffle+sort the
    // full changelog).
    assert(plan.contains("partial_max_by"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
