package graft

import graft.search.{Fuzzy, JsonDsl}
import org.apache.spark.sql.functions._

/** Generative drill for the scroll cursor and the three suggesters —
  * against independent Scala folds:
  *
  *  - scroll: full page walks (random sort direction, page size)
  *    concatenate to the one-shot ordered fold, and SLICED scrolls
  *    partition it — the s slices are disjoint and their union is
  *    exactly the unsliced walk;
  *  - term suggester: levenshtein candidates from the corpus
  *    vocabulary (0 < dist ≤ max), ranked (dist asc, freq desc, term
  *    asc) — the vocabulary is deliberately dense in near-neighbors;
  *  - phrase suggester: per-position candidates composed and ranked
  *    by corpus bigram frequency with unigram backoff (bigram desc,
  *    dist asc, freq desc, phrase asc);
  *  - completion suggester: edge-ngram posting lookup, most frequent
  *    first, ties lexicographic.
  */
class CursorSuggestFuzzSpec extends SparkSpec {

  // dense near-neighbor vocabulary: many pairs at levenshtein 1-2
  private val vocab = Vector(
    "cat", "bat", "hat", "rat", "mat", "cart", "care", "card", "scan", "scat",
    "spark", "spars", "sparse", "shark", "stark", "merge", "verge", "serge"
  )

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      )
    d(a.length)(b.length)
  }

  test("scroll: page walks == one-shot fold; sliced scrolls partition it exactly") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x5c2011L)
    (1 to 6).foreach { ci =>
      val n = 60 + rnd.nextInt(120)
      val rows = Seq.tabulate(n)(i => (i.toLong, rnd.nextInt(40)))
      val df = rows.toDF("id", "num").repartition(1 + rnd.nextInt(4))
      val desc = rnd.nextBoolean()
      val size = 3 + rnd.nextInt(12)
      val body =
        s"""{"sort": [{"num": "${if (desc) "desc" else "asc"}"}, {"id": "asc"}], "size": $size}"""
      def walk(b: String): Seq[(Long, Int)] = {
        val out = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
        var page = 0
        var done = false
        while (!done && page < 100) {
          val rs = JsonDsl
            .scroll(df, b, page = page)
            .collect()
            .map(r => (r.getLong(r.fieldIndex("id")), r.getInt(r.fieldIndex("num"))))
          out ++= rs
          if (rs.length < size) done = true else page += 1
        }
        out.toSeq
      }
      val want = rows.sortBy { case (id, num) => (if (desc) -num else num, id) }
      assert(walk(body) == want, s"corpus $ci: scroll walk != one-shot fold")

      // sliced: id-modulo on the primary sort field — primary must be id
      val smax = 2 + rnd.nextInt(2)
      val sbody = (i: Int) =>
        s"""{"sort": [{"id": "asc"}], "size": $size, "slice": {"id": $i, "max": $smax}}"""
      val slices = (0 until smax).map(i => walk(sbody(i)))
      slices.combinations(2).foreach { case Seq(a, b) =>
        assert(a.map(_._1).toSet.intersect(b.map(_._1).toSet).isEmpty, s"corpus $ci: slices overlap")
      }
      assert(
        slices.flatten.sortBy(_._1) == rows.sortBy(_._1),
        s"corpus $ci: sliced union != corpus (smax=$smax)"
      )
      slices.zipWithIndex.foreach { case (sl, i) =>
        assert(sl == sl.sortBy(_._1), s"corpus $ci: slice $i not in sort order")
        assert(sl.forall { case (id, _) => id % smax == i }, s"corpus $ci: slice $i membership")
      }
    }
  }

  private def mkDocs(rnd: scala.util.Random, n: Int): Seq[String] =
    Seq.fill(n)(Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))

  test("term suggester == levenshtein-vocabulary fold (dist asc, freq desc, term asc)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x5e77e57L)
    (1 to 8).foreach { ci =>
      val docs = mkDocs(rnd, 50 + rnd.nextInt(100))
      val df = docs.map(Tuple1(_)).toDF("text").repartition(1 + rnd.nextInt(4))
      val term = (vocab(rnd.nextInt(vocab.size)) + (if (rnd.nextBoolean()) "x" else "")).toLowerCase
      val maxDist = 1 + rnd.nextInt(2)
      val k = 2 + rnd.nextInt(6)
      val got = Fuzzy
        .suggest(df, "text", term, maxDist, k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.get(2).toString.toInt))
        .toSeq
      val freq = docs.flatMap(_.split(" ", -1)).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val want = freq.toSeq
        .map { case (t, f) => (t, f, lev(t, term)) }
        .filter { case (_, _, d) => d > 0 && d <= maxDist }
        .sortBy { case (t, f, d) => (d, -f, t) }
        .take(k)
      assert(got == want, s"corpus $ci: suggest('$term', $maxDist) mismatch\ngot  $got\nwant $want")
    }
  }

  test("phrase suggester == bigram-backoff fold; completion suggester == posting fold") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x981a5eL)
    (1 to 6).foreach { ci =>
      val docs = mkDocs(rnd, 50 + rnd.nextInt(80))
      val df = docs.map(Tuple1(_)).toDF("text").repartition(1 + rnd.nextInt(4))
      val toks = docs.map(_.split(" ", -1).toSeq)
      val freq = toks.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val bigrams = toks
        .flatMap(ts => ts.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
        .groupBy(identity)
        .map { case (b, xs) => b -> xs.size.toLong }

      val p1 = vocab(rnd.nextInt(vocab.size))
      val p2 = vocab(rnd.nextInt(vocab.size))
      val maxDist = 1
      val k = 3 + rnd.nextInt(5)
      val got = Fuzzy
        .suggestPhrase(df, "text", Seq(p1, p2), maxDist, k)
        .collect()
        .map(r => (r.getString(0), r.get(1).toString.toInt, r.getLong(2), r.getLong(3)))
        .toSeq
      def cands(t: String): Seq[(String, Long, Int)] =
        freq.toSeq.map { case (w, f) => (w, f, lev(w, t)) }.filter(_._3 <= maxDist)
      val want = (for {
        (w1, f1, d1) <- cands(p1)
        (w2, f2, d2) <- cands(p2)
      } yield (s"$w1 $w2", d1 + d2, bigrams.getOrElse((w1, w2), 0L), f1 + f2))
        .sortBy { case (ph, d, c12, f) => (-c12, d, -f, ph) }
        .take(k)
      assert(got == want, s"corpus $ci: phrase suggest ('$p1 $p2') mismatch\ngot  $got\nwant $want")

      // completion: edge-ngram posting equality lookup
      val (mn, mx) = (2, 5)
      val idx = Fuzzy.completionIndex(df, "text", mn, mx)
      val word = vocab(rnd.nextInt(vocab.size))
      val plen = mn + rnd.nextInt(math.min(mx, word.length) - mn + 1)
      val prefix = word.take(plen)
      val gotC = Fuzzy
        .complete(idx, prefix, k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSeq
      val wantC = freq.toSeq
        .filter { case (t, _) => t.length >= prefix.length && t.startsWith(prefix) }
        .sortBy { case (t, f) => (-f, t) }
        .take(k)
      assert(gotC == wantC, s"corpus $ci: complete('$prefix') mismatch\ngot  $gotC\nwant $wantC")
    }
  }
}
