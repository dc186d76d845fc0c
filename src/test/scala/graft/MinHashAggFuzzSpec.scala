package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._

/** Generative drill for the native MinHash TypedImperativeAggregate —
  * custom buffer, merge, and serde code below Catalyst. Random (group,
  * shingle) datasets with NULL shingles and all-NULL groups, under
  * random input partitioning (forcing map-side partials, serialization
  * across the shuffle, and merge), against an INDEPENDENT spelling of
  * the md5-affine permutation contract (hex-string parse here vs the
  * kernel's digest-byte shifts — a different code path to the same
  * documented spec). Signature arrays must match int for int; an
  * all-NULL group must yield the untouched Int.MaxValue buffer.
  */
class MinHashAggFuzzSpec extends SparkSpec {

  // the documented contract, spelled independently: base = first 15 hex
  // chars of md5(s) as a 60-bit int, mod P; perm p = (a_p·base + b_p) % P
  private val P = 2147483647L
  private def refHash(s: String, p: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val base = java.lang.Long.parseLong(hex.substring(0, 15), 16) % P
    val a = ((p.toLong * 1103515245L + 12345L) % (P - 1L)) + 1L
    val b = (p.toLong * 69069L + 7L) % P
    ((a * base + b) % P).toInt
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
