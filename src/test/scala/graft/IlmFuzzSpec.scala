package graft

import graft.sinks.{IndexFileSink, IndexOps}
import org.apache.spark.sql.functions._

/** Generative drill for the ILM write loop — rollover / bulk write /
  * retire interleaved over a live alias family (the r14 verdict's named
  * fuzz gap "the ILM rollover/retire loop under concurrent writes"; the
  * repo's concurrency contract is single-writer, so "concurrent" here
  * means arbitrary INTERLEAVINGS of the three ops, which is what an
  * orchestrator actually serializes). A reference model (gen →
  * id → doc map) folds the same op sequence; after every few ops and at
  * the end:
  *
  *   - rollover targets and `rolled` flags match the model exactly
  *     (rolls at maxDocs, idempotent when the fresh gen is empty,
  *     generation numbers strictly increase, never reuses a retired
  *     name because retire only ages out the OLDEST generations),
  *   - resolvePattern sees exactly the model's live generations,
  *   - catIndices doc counts match per generation,
  *   - aliasView row set == the model's union (writes always landed in
  *     the generation rollover named — never a retired one).
  */
class IlmFuzzSpec extends SparkSpec {

  private case class Doc(id: Long, v: Long, tag: String)
  private val tagPool = Vector("a", "b", "c", "d")

  test("rollover/write/retire interleavings: engine == reference model") {
    val rnd = new scala.util.Random(0x11fcL)
    (1 to 4).foreach { ci =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-ilm-$ci").toString
      val alias = "logs"
      val maxDocs = 4 + rnd.nextInt(8)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, f"$alias-${1}%06d"))

      // reference model: live generations in order, docs per generation
      var gens = Vector(f"$alias-${1}%06d")
      val docsOf = scala.collection.mutable.Map(gens.head -> Map.empty[Long, Doc])
      var nextId = 0L
      var maxGen = 1

      def refRolloverTarget(): (String, Boolean) = {
        val current = gens.max
        if (docsOf(current).size < maxDocs) (current, false)
        else {
          maxGen += 1
          val next = f"$alias-$maxGen%06d"
          (next, true)
        }
      }

      def writeBatch(): Unit = {
        // the ILM write step: ask rollover for the target, then bulk-write
        val (target, rolled) = IndexOps.rollover(spark, root, alias, maxDocs)
        val (wantTarget, wantRolled) = refRolloverTarget()
        assert(
          target == wantTarget && rolled == wantRolled,
          s"#$ci rollover: got ($target,$rolled) want ($wantTarget,$wantRolled); gens=$gens"
        )
        if (rolled) { gens :+= target; docsOf(target) = Map.empty }
        assert(gens.contains(target), s"#$ci write targets unknown/retired gen $target")
        val batch = Vector.tabulate(1 + rnd.nextInt(4)) { _ =>
          nextId += 1
          Doc(nextId, rnd.nextInt(1000).toLong, tagPool(rnd.nextInt(tagPool.size)))
        }
        val merged = docsOf(target) ++ batch.map(d => d.id -> d)
        docsOf(target) = merged
        val s = spark
        import s.implicits._
        IndexFileSink.indexBatch(
          merged.values.toSeq.sortBy(_.id).map(d => (d.id, d.v, d.tag)).toDF("id", "v", "tag"),
          root,
          target,
          "id"
        )
      }

      def retireOldest(): Unit = {
        // age out the oldest 1..2 generations, but never the write index
        if (gens.size > 1) {
          val n = 1 + rnd.nextInt(math.min(2, gens.size - 1))
          val victims = gens.take(n)
          val removed = IndexOps.retireIndices(spark, root, victims)
          assert(removed == victims.filter(docsOf(_).nonEmpty) || removed == victims,
            s"#$ci retire removed $removed, asked $victims")
          // empty-but-created dirs also get removed; model drops them all
          gens = gens.drop(n)
          victims.foreach(docsOf.remove)
        }
      }

      def audit(): Unit = {
        val live = IndexOps.resolvePattern(spark, root, s"$alias-*")
        assert(live == gens.sorted, s"#$ci live gens $live != model $gens")
        val nonEmpty = gens.filter(docsOf(_).nonEmpty)
        if (nonEmpty.nonEmpty) {
          val counts = IndexOps
            .catIndices(spark, root, nonEmpty)
            .collect()
            .map(r => r.getString(0) -> r.getLong(1))
            .toMap
          nonEmpty.foreach { g =>
            assert(counts(g) == docsOf(g).size.toLong, s"#$ci catIndices $g: ${counts(g)} != ${docsOf(g).size}")
          }
          val view = IndexOps
            .aliasView(spark, root, nonEmpty)
            .select("id", "v", "tag")
            .collect()
            .map(r => Doc(r.getLong(0), r.getLong(1), r.getString(2)))
            .toSet
          val want = nonEmpty.flatMap(docsOf(_).values).toSet
          assert(view == want, s"#$ci aliasView diverged: ${view.size} vs ${want.size} docs")
        }
      }

      (1 to 18).foreach { _ =>
        rnd.nextInt(5) match {
          case 0       => retireOldest()
          case 4       => audit()
          case _       => writeBatch()
        }
      }
      audit()
      // generation numbers never regressed or reused
      assert(gens == gens.sorted && gens.distinct == gens, s"#$ci generation order broke: $gens")
    }
  }
}
