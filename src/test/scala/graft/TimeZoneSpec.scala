package graft

import graft.search.JsonDsl
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** `time_zone` semantics on date_histogram / date_range / range, pinned
  * at the DST boundaries the sf-testdata window (January, EST-only)
  * cannot reach: America/New_York springs forward 2024-03-10 (07:00 UTC)
  * and falls back 2024-11-03 (06:00 UTC), so the local-midnight bucket
  * keys shift between 05:00 and 04:00 UTC across the year. A fixed
  * "-05:00" arithmetic would mis-bucket every EDT event — these fixtures
  * make that a loud failure instead of a silent dashboard skew.
  */
class TimeZoneSpec extends SparkSpec {

  private val NY = "America/New_York"

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val frame = {
    val s = spark
    import s.implicits._
    // UTC instants straddling local midnights and both DST transitions
    Seq(
      (1L, ts("2024-03-10 04:59:00"), 10.0), // 23:59 EST Mar 9  -> local Mar 9
      (2L, ts("2024-03-10 05:01:00"), 20.0), // 00:01 EST Mar 10 -> local Mar 10
      (3L, ts("2024-03-10 06:59:00"), 30.0), // 01:59 EST Mar 10 (minute before spring-forward)
      (4L, ts("2024-03-10 07:01:00"), 40.0), // 03:01 EDT Mar 10 (minute after)
      (5L, ts("2024-03-11 03:59:00"), 50.0), // 23:59 EDT Mar 10 -> STILL local Mar 10 (23-hour day)
      (6L, ts("2024-03-11 04:01:00"), 60.0), // 00:01 EDT Mar 11 -> local Mar 11
      (7L, ts("2024-11-03 05:30:00"), 70.0), // 01:30 EDT Nov 3 (first pass through 1am)
      (8L, ts("2024-11-03 06:30:00"), 80.0), // 01:30 EST Nov 3 (second pass — same local day)
      (9L, ts("2024-11-04 04:30:00"), 90.0)  // 23:30 EST Nov 3 -> STILL local Nov 3 (25-hour day)
    ).toDF("id", "ts", "value")
  }

  test("date_histogram time_zone: local days across spring-forward (23-hour day)") {
    val out = JsonDsl
      .parse(
        frame.filter(col("id") <= 6),
        s"""{"aggs": {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day", "time_zone": "$NY"}}}}"""
      )
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
      .toSeq
    // local Mar 9 key = 05:00 UTC (EST midnight); Mar 10 key = 05:00 UTC;
    // Mar 11 key = 04:00 UTC (EDT midnight — the day after the 23-hour day)
    assert(
      out == Seq(
        (ts("2024-03-09 05:00:00"), 1L),
        (ts("2024-03-10 05:00:00"), 4L), // ids 2,3,4,5 — the 23-hour local day
        (ts("2024-03-11 04:00:00"), 1L)
      ),
      s"got $out"
    )
  }

  test("date_histogram time_zone: local days across fall-back (25-hour day)") {
    val out = JsonDsl
      .parse(
        frame.filter(col("id") >= 7),
        s"""{"aggs": {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day", "time_zone": "$NY"}}}}"""
      )
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
      .toSeq
    // all three land in local Nov 3 (the 25-hour day); key = 04:00 UTC
    // (EDT midnight — the transition is at 2am, after the bucket start)
    assert(out == Seq((ts("2024-11-03 04:00:00"), 3L)), s"got $out")
  }

  test("date_histogram time_zone composes with a sum metric") {
    val out = JsonDsl
      .parse(
        frame.filter(col("id") <= 6),
        s"""{"aggs": {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day", "time_zone": "$NY"},
           |  "aggs": {"total": {"sum": {"field": "value"}}}}}}""".stripMargin
      )
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(
      out == Seq(
        (ts("2024-03-09 05:00:00"), 1L, 10.0),
        (ts("2024-03-10 05:00:00"), 4L, 140.0),
        (ts("2024-03-11 04:00:00"), 1L, 60.0)
      ),
      s"got $out"
    )
  }

  test("range query time_zone: endpoints are local wall clock, DST-aware") {
    // local [Mar 10 00:00, Mar 11 00:00) in NY = UTC [05:00 Mar 10, 04:00 Mar 11)
    // — the window is 23 real hours; a fixed-offset conversion would
    // wrongly include id 6 (04:01 UTC Mar 11 = 00:01 EDT Mar 11).
    val got = JsonDsl
      .parse(
        frame,
        s"""{"query": {"range": {"ts": {"gte": "2024-03-10 00:00:00", "lt": "2024-03-11 00:00:00",
           |  "time_zone": "$NY"}}}, "sort": ["id"], "_source": ["id"]}""".stripMargin
      )
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(got == Seq(2L, 3L, 4L, 5L), s"got $got")
  }

  test("date_range aggregation time_zone: local boundaries bucket the DST week") {
    val got = JsonDsl
      .parse(
        frame,
        s"""{"aggs": {"spans": {"date_range": {"field": "ts", "time_zone": "$NY",
           |  "ranges": [{"key": "a_before", "to": "2024-03-10 00:00:00"},
           |             {"key": "b_dstday", "from": "2024-03-10 00:00:00", "to": "2024-03-11 00:00:00"},
           |             {"key": "c_after", "from": "2024-03-11 00:00:00"}]}}}}""".stripMargin
      )
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(got == Seq(("a_before", 1L), ("b_dstday", 4L), ("c_after", 4L)), s"got $got")
  }

  test("terms missing: substituted docs form a competing bucket; order/size intact") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "x"), (2L, "x"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]), (6L, "y")
    ).toDF("id", "tag")
    val got = JsonDsl
      .parse(df, """{"aggs": {"t": {"terms": {"field": "tag", "missing": "NONE", "size": 2}}}}""")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    // NONE(3) > x(2) > y(1); size=2 truncates AFTER ordering
    assert(got == Seq(("NONE", 3L), ("x", 2L)), s"got $got")
  }
}
