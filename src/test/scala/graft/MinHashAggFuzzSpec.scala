package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Generative drill for the native MinHash TypedImperativeAggregate —
  * custom buffer, merge, and serde code below Catalyst. Random (group,
  * shingle) datasets with NULL shingles and all-NULL groups, under
  * random input partitioning (forcing map-side partials, serialization
  * across the shuffle, and merge), against a plain-Scala fold of the
  * same per-permutation murmur3 minimum. Signature arrays must match
  * int for int; an all-NULL group must yield the untouched
  * Int.MaxValue buffer.
  */
class MinHashAggFuzzSpec extends SparkSpec {

  private def refHash(s: String, seed: Int): Int = {
    val bytes = s.getBytes("UTF-8")
    Murmur3_x86_32.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)
  }

  test("5 random datasets: native minhash_agg == plain fold, int for int") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x3141L)
    val shingleVocab = Vector.tabulate(60)(i => s"sh${i}_${"x" * (i % 7)}")

    (1 to 5).foreach { ci =>
      val numPerms = Vector(8, 16, 32)(rnd.nextInt(3))
      val nGroups = 12
      val rows = Vector.tabulate(400) { _ =>
        val g = 1 + rnd.nextInt(nGroups)
        val sh = if (rnd.nextInt(10) == 0) null else shingleVocab(rnd.nextInt(shingleVocab.size))
        (g.toLong, sh)
      } ++ Vector((99L, null), (99L, null)) // an all-NULL group
      val df = rows.toDF("gid", "shingle").repartition(1 + rnd.nextInt(8))

      val got = df
        .groupBy("gid")
        .agg(MinHashAgg.minhash(col("shingle"), numPerms).as("sig"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector)
        .toMap

      val want = rows.groupBy(_._1).map { case (g, evs) =>
        val sig = Array.fill(numPerms)(Int.MaxValue)
        evs.foreach {
          case (_, null) => ()
          case (_, sh) =>
            var p = 0
            while (p < numPerms) { val h = refHash(sh, p); if (h < sig(p)) sig(p) = h; p += 1 }
        }
        g -> sig.toVector
      }

      assert(got.keySet == want.keySet, s"dataset #$ci: group sets differ")
      want.foreach { case (g, sig) =>
        assert(got(g) == sig, s"dataset #$ci perms=$numPerms group $g: ${got(g).take(4)} != ${sig.take(4)}")
      }
    }
  }
}
