package graft

import graft.search.JsonDsl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Generative drill for the PIT × paging × mutation-API interactions —
  * the r14 verdict's named fuzz gap. A random upsert changelog grows
  * WHILE clients hold PIT handles and page through them:
  *
  *   - PIT isolation: a pit answers from the changelog frozen at its
  *     creation ts — re-issuing the same pit body against a GROWN
  *     changelog (late events on old keys + brand-new keys) must return
  *     byte-identical results, and a later pit must see the growth.
  *   - search_after under PIT: cursor pages cut from the frozen state
  *     concatenate to exactly the reference state in sort order — page
  *     boundaries can't drop or duplicate rows however the page size
  *     divides the key count, and pages stay stable mid-growth.
  *   - sliced scroll over a PIT state: slices are disjoint, exhaustive,
  *     and each slice's pages concatenate in order (the parallel-export
  *     contract _reindex relies on).
  *   - mutation APIs against a PIT state: _update_by_query applies its
  *     ctx._source script to exactly the reference's matched docs (in
  *     statement order), _delete_by_query's ledger counts the reference
  *     match set — both evaluated on the FROZEN state, so growth after
  *     the pit never leaks into the mutation's scope.
  *
  * The reference is a pure Scala fold of the event list (last-write-wins
  * by (ts, event_id) among events at or before the pit).
  */
class PitScrollFuzzSpec extends SparkSpec {

  private case class Ev(eventId: Long, k: Long, ts: Long, v: Int, tag: String)

  private val tagPool = Vector("red", "blue", "green", "plum")
  private val Base = 1704067200L // 2024-01-01 UTC

  private def genEvents(rnd: scala.util.Random, n: Int, keys: Int, startId: Long, startTs: Long): Vector[Ev] =
    Vector.tabulate(n) { i =>
      Ev(startId + i, rnd.nextInt(keys).toLong, startTs + i * 7 + rnd.nextInt(5), rnd.nextInt(1000),
        tagPool(rnd.nextInt(tagPool.size)))
    }

  private def toDf(evs: Seq[Ev]): DataFrame = {
    val s = spark
    import s.implicits._
    evs
      .map(e => (e.eventId, e.k, e.ts, e.v, e.tag))
      .toDF("event_id", "k", "_epoch", "v", "tag")
      .select(col("event_id"), col("k"), timestamp_seconds(col("_epoch")).as("ts"), col("v"), col("tag"))
  }

  /** last-write-wins state at `pit`: (k, v, tag) per surviving key */
  private def refState(evs: Seq[Ev], pit: Long): Map[Long, (Int, String)] =
    evs
      .filter(_.ts <= pit)
      .groupBy(_.k)
      .map { case (k, g) =>
        val last = g.maxBy(e => (e.ts, e.eventId))
        k -> (last.v, last.tag)
      }

  private def pitTs(epoch: Long): String = Timestamp.from(java.time.Instant.ofEpochSecond(epoch)).toString

  private def pitBody(pit: Long, extra: String = ""): String =
    s"""{"pit": {"id": "${pitTs(pit)}"}$extra, "sort": ["k"], "_source": ["k", "v", "tag"]}"""

  private def search(changelog: DataFrame, body: String): Seq[(Long, Int, String)] =
    JsonDsl
      .pitSearch(changelog, "k", Seq("ts", "event_id"), "ts", Seq("v", "tag"), body)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSeq

  test("PIT isolation + search_after paging survive changelog growth") {
    val rnd = new scala.util.Random(0x917AL)
    (1 to 8).foreach { ci =>
      val keys = 10 + rnd.nextInt(40)
      val evs = genEvents(rnd, 120 + rnd.nextInt(120), keys, 0L, Base)
      val pit = evs(evs.size / 2 + rnd.nextInt(evs.size / 4)).ts
      val want = refState(evs, pit).toSeq.map { case (k, (v, t)) => (k, v, t) }.sortBy(_._1)
      val df0 = toDf(evs)

      // full frozen read
      assert(search(df0, pitBody(pit)) == want, s"#$ci pit read != reference")

      // page through with search_after; random page size
      val size = 1 + rnd.nextInt(7)
      def pages(changelog: DataFrame): Seq[(Long, Int, String)] = {
        var out = Vector.empty[(Long, Int, String)]
        var cursor: Option[Long] = None
        var guard = 0
        while (guard < 200) {
          guard += 1
          val after = cursor.map(c => s""", "search_after": [$c]""").getOrElse("")
          val page = search(changelog, pitBody(pit, s"""$after, "size": $size""").replace("\"sort\"", "\"sort\""))
          if (page.isEmpty) guard = 200
          else {
            out ++= page
            cursor = Some(page.last._1)
            if (page.size < size) guard = 200
          }
        }
        out
      }
      assert(pages(df0) == want, s"#$ci search_after pages != reference (size=$size)")

      // GROW the changelog: late writes on old keys + brand-new keys,
      // all strictly after the pit — the held pit must not move, a
      // later pit must see everything
      val growth = genEvents(rnd, 60, keys + 10, startId = 10000L, startTs = evs.map(_.ts).max + 10)
      val grown = toDf(evs ++ growth)
      assert(search(grown, pitBody(pit)) == want, s"#$ci pit moved under growth")
      assert(pages(grown) == want, s"#$ci pit pages changed under growth (size=$size)")
      val latePit = (evs ++ growth).map(_.ts).max
      val wantLate = refState(evs ++ growth, latePit).toSeq.map { case (k, (v, t)) => (k, v, t) }.sortBy(_._1)
      assert(search(grown, pitBody(latePit)) == wantLate, s"#$ci later pit misses growth")
    }
  }

  test("sliced scroll over a PIT state: disjoint, exhaustive, in order") {
    val rnd = new scala.util.Random(0x5c2011L)
    (1 to 6).foreach { ci =>
      val evs = genEvents(rnd, 150, 30 + rnd.nextInt(30), 0L, Base)
      val pit = evs(80 + rnd.nextInt(40)).ts
      val want = refState(evs, pit).toSeq.map { case (k, (v, t)) => (k, v, t) }.sortBy(_._1)
      val state = graft.cdc.CdcBatch
        .latestState(toDf(evs).filter(col("ts") <= lit(pitTs(pit)).cast("timestamp")),
          "k", struct(col("ts"), col("event_id")), col("v"), col("tag"))
      val maxSlices = 2 + rnd.nextInt(3)
      val size = 3 + rnd.nextInt(5)
      val all = (0 until maxSlices).flatMap { sl =>
        Iterator
          .from(0)
          .map { p =>
            JsonDsl
              .scroll(
                state,
                s"""{"sort": ["k"], "size": $size, "slice": {"id": $sl, "max": $maxSlices},
                   | "_source": ["k", "v", "tag"]}""".stripMargin,
                page = p
              )
              .collect()
              .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
              .toSeq
          }
          .takeWhile(_.nonEmpty)
          .toVector
          .flatten
      }
      // each slice pages in order; slices are disjoint and exhaustive
      assert(all.size == want.size, s"#$ci slices lost/duplicated rows: ${all.size} vs ${want.size}")
      assert(all.sortBy(_._1) == want, s"#$ci slice union != reference")
      (0 until maxSlices).foreach { sl =>
        val sliceKeys = all.filter(_._1 % maxSlices == sl).map(_._1)
        assert(sliceKeys == sliceKeys.sorted, s"#$ci slice $sl pages out of order")
      }
    }
  }

  test("mutation APIs on a PIT state: update/delete scope is the frozen match set") {
    val rnd = new scala.util.Random(0xfeedL)
    (1 to 8).foreach { ci =>
      val evs = genEvents(rnd, 160, 40, 0L, Base)
      val pit = evs(100).ts
      val ref = refState(evs, pit)
      val state = graft.cdc.CdcBatch
        .latestState(toDf(evs).filter(col("ts") <= lit(pitTs(pit)).cast("timestamp")),
          "k", struct(col("ts"), col("event_id")), col("v"), col("tag"))
      val cut = rnd.nextInt(900)
      val bump = 1 + rnd.nextInt(9)

      // _update_by_query: matched docs get sequential ctx._source script
      val updated = JsonDsl
        .updateByQuery(
          state,
          s"""{"query": {"range": {"v": {"gte": $cut}}},
             | "script": {"source": "ctx._source.v = v + $bump; ctx._source.v = v * 2"}}""".stripMargin
        )
        .select("k", "v")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)))
        .toMap
      val wantUpd = ref.collect { case (k, (v, _)) if v >= cut => k -> ((v + bump) * 2) }
      assert(updated == wantUpd, s"#$ci _update_by_query diverged (cut=$cut bump=$bump)")

      // growth after the pit must not widen the mutation's scope
      val grown = evs ++ genEvents(rnd, 50, 40, 20000L, evs.map(_.ts).max + 5)
      val stateG = graft.cdc.CdcBatch
        .latestState(toDf(grown).filter(col("ts") <= lit(pitTs(pit)).cast("timestamp")),
          "k", struct(col("ts"), col("event_id")), col("v"), col("tag"))
      val ledger = JsonDsl
        .deleteByQuery(stateG, s"""{"query": {"range": {"v": {"gte": $cut}}}}""")
        .head()
      val wantDel = ref.count { case (_, (v, _)) => v >= cut }
      assert(
        ledger.getLong(0) == wantDel && ledger.getLong(1) == ref.size - wantDel && ledger.getLong(2) == ref.size,
        s"#$ci _delete_by_query ledger (${ledger.toSeq}) != (deleted=$wantDel, remaining=${ref.size - wantDel}, total=${ref.size})"
      )
    }
  }
}
