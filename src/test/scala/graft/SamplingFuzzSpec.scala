package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Generative drill for the deterministic sampling/mixing family. The
  * whole family's value proposition is CROSS-ENGINE determinism — a
  * document's membership is a pure function of its id — so every
  * contract here is an exact set/multiset equality against an
  * independent Scala fold of the documented hash math:
  *
  *  - split / stratifiedKeep / weightedKeep: md5-hex-prefix bucketing
  *    reproduced via MessageDigest (2-, 2- and 4-char grains);
  *  - temperatureMix: per-source keep rates (min_mass/mass)^(1−α) with
  *    the 16-bit Knuth multiplicative draw;
  *  - epochsUpsample: floor(e) copies + one more iff the (id+floor(e))
  *    draw falls under frac(e), multiset-exact including epoch ids;
  *  - packSequences: per-shard prefix-sum packing (pack id, offset,
  *    boundary-straddle flag) vs a sorted fold.
  *
  * Random ids include large and non-contiguous values — the hash
  * machinery must not depend on dense small ids.
  */
class SamplingFuzzSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def knuthFrac(x: Long): Double = {
    val m = BigInt(x) * BigInt(2654435761L)
    val r = ((m % 65536) + 65536) % 65536
    r.toDouble / 65536.0
  }

  private def mkIds(rnd: scala.util.Random, n: Int): Seq[Long] =
    Seq.fill(n)(math.abs(rnd.nextLong()) % (if (rnd.nextBoolean()) 100000L else 4000000000L)).distinct

  test("split / stratifiedKeep / weightedKeep == md5-prefix reference folds") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x5a3b11L)
    val groups = Vector("web", "wiki", "code", "books", "news")
    (1 to 6).foreach { ci =>
      val ids = mkIds(rnd, 300 + rnd.nextInt(300))
      val rows = ids.map(id => (id, groups(rnd.nextInt(groups.size))))
      val df = rows.toDF("id", "src").repartition(1 + rnd.nextInt(4))

      // split
      val gotSplit = df
        .select(col("id"), Sampling.split(col("id")).as("part"))
        .collect()
        .map(r => r.getLong(0) -> r.getString(1))
        .toMap
      ids.foreach { id =>
        val b = md5hex(id.toString).take(2)
        val want = if (b < "c0") "train" else if (b < "e0") "val" else "test"
        assert(gotSplit(id) == want, s"corpus $ci: split($id) ${gotSplit(id)} != $want")
      }

      // stratifiedKeep at a random fraction
      val fraction = (1 + rnd.nextInt(99)) / 100.0
      val buckets = math.round(fraction * 256).min(256).max(1)
      val gotKeep = df.filter(Sampling.stratifiedKeep(col("id"), fraction)).select("id").as[Long].collect().toSet
      val wantKeep = ids.filter(id => buckets >= 256 || md5hex(id.toString).take(2) < f"$buckets%02x").toSet
      assert(gotKeep == wantKeep, s"corpus $ci: stratifiedKeep($fraction) set mismatch")

      // weightedKeep with random per-group rates (some missing, 0, 1)
      val rates = groups.take(3 + rnd.nextInt(3)).map(g => g -> Seq(0.0, 1.0, rnd.nextInt(100) / 100.0)(rnd.nextInt(3))).toMap
      val gotW = df.filter(Sampling.weightedKeep(col("id"), col("src"), rates)).select("id").as[Long].collect().toSet
      val wantW = rows.filter { case (id, g) =>
        rates.get(g) match {
          case None                 => true
          case Some(r) if r >= 1.0  => true
          case Some(r) if r <= 0.0  => false
          case Some(r)              => md5hex(id.toString).take(4) < f"${math.round(r * 65536).toInt.min(65535)}%04x"
        }
      }.map(_._1).toSet
      assert(gotW == wantW, s"corpus $ci: weightedKeep($rates) set mismatch")
    }
  }

  test("temperatureMix == (min_mass/mass)^(1-alpha) keep-rate fold") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x7e4a2fL)
    val groups = Vector("en", "de", "fr", "ja")
    (1 to 6).foreach { ci =>
      val ids = mkIds(rnd, 200 + rnd.nextInt(300))
      val rows = ids.map(id => (id, groups(rnd.nextInt(groups.size)), (1 + rnd.nextInt(50)).toDouble))
      val df = rows.toDF("id", "lang", "mass").repartition(1 + rnd.nextInt(4))
      val alpha = Seq(0.3, 0.5, 0.7, 1.0)(rnd.nextInt(4))
      val got = Sampling.temperatureMix(df, "id", "lang", col("mass"), alpha).select("id").as[Long].collect().toSet
      val masses = rows.groupBy(_._2).map { case (g, xs) => g -> xs.map(_._3).sum }
      val minMass = masses.values.min
      val want = rows.filter { case (id, g, _) =>
        knuthFrac(id) < math.pow(minMass / masses(g), 1.0 - alpha)
      }.map(_._1).toSet
      assert(got == want, s"corpus $ci alpha=$alpha: temperatureMix set mismatch")
    }
  }

  test("epochsUpsample == floor+fractional-draw fold, multiset-exact with epoch ids") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xe90c45L)
    val groups = Vector("wiki", "web", "code", "papers")
    (1 to 6).foreach { ci =>
      val ids = mkIds(rnd, 150 + rnd.nextInt(200))
      val rows = ids.map(id => (id, groups(rnd.nextInt(groups.size))))
      val df = rows.toDF("id", "src").repartition(1 + rnd.nextInt(4))
      val epochs = groups.take(3).map(g => g -> (rnd.nextInt(35) / 10.0)).toMap // "papers" absent -> 0 copies
      val got = Sampling
        .epochsUpsample(df, col("id"), col("src"), epochs)
        .select(col("id"), col("epoch"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sorted
        .toSeq
      val want = rows.flatMap { case (id, g) =>
        val e = epochs.getOrElse(g, 0.0)
        val nf = math.floor(e).toLong
        val fr = e - math.floor(e)
        val copies = nf + (if (knuthFrac(id + nf) < fr) 1L else 0L)
        (0L until copies).map(ep => (id, ep))
      }.sorted
      assert(got == want, s"corpus $ci epochs=$epochs: upsample multiset mismatch")
    }
  }

  test("packSequences == per-shard prefix-sum fold (pack id, offset, straddle flag)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x9ac45dL)
    (1 to 6).foreach { ci =>
      val nShards = 1 + rnd.nextInt(4)
      val ids = mkIds(rnd, 100 + rnd.nextInt(200))
      val rows = ids.map(id => (id, s"shard${id % nShards}", 1L + rnd.nextInt(900)))
      val df = rows.toDF("id", "shard", "n_tok").repartition(1 + rnd.nextInt(4))
      val budget = 256 + rnd.nextInt(2048)
      val got = Sampling
        .packSequences(df, "id", col("n_tok"), Seq("shard"), budget)
        .select("shard", "id", "n_tokens", "pack_id", "pack_offset", "spans_boundary")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .sortBy(t => (t._1, t._2))
        .toSeq
      val want = rows
        .groupBy(_._2)
        .toSeq
        .flatMap { case (shard, xs) =>
          var cum = 0L
          xs.sortBy(_._1).map { case (id, _, n) =>
            val start = cum
            cum += n
            val packId = start / budget
            (shard, id, n, packId, start % budget, (cum - 1) / budget > packId)
          }
        }
        .sortBy(t => (t._1, t._2))
      assert(got == want, s"corpus $ci budget=$budget: packing mismatch")
    }
  }
}
