package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._

/** Generative drill for the custom TopKPerKey physical operator — the
  * one component class where a bug lives below Catalyst (bounded heaps,
  * partial/final phases, its own SparkPlan). Random datasets (group
  * sizes below / at / far above k, NULL keys, NULLs in ordering
  * columns), random k, random mixed-direction multi-column orderings
  * (a unique id appended so expected output is deterministic), random
  * input partitioning so the map-side partial heaps and the final
  * merge both run — against a plain sort-and-take reference with
  * Spark's null ordering (NULLS FIRST ascending, NULLS LAST
  * descending).
  */
class TopKFuzzSpec extends SparkSpec {

  private case class Row0(key: Option[String], a: Option[Int], b: Option[String], id: Long)

  test("30 random configs: TopKPerKey == sort-and-take reference, rank for rank") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x70b99L)
    val keys = Vector("k1", "k2", "k3", "k4", "k5", "k6")
    val bs = Vector("x", "y", "z", "w")

    (1 to 30).foreach { ci =>
      val n = 50 + rnd.nextInt(250)
      val rows = Vector.tabulate(n) { i =>
        Row0(
          if (rnd.nextInt(12) == 0) None else Some(keys(rnd.nextInt(keys.size))),
          if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(20)),
          if (rnd.nextInt(8) == 0) None else Some(bs(rnd.nextInt(bs.size))),
          i.toLong
        )
      }
      val k = 1 + rnd.nextInt(7)
      val ordering0: Seq[(String, Boolean)] = rnd.nextInt(3) match {
        case 0 => Seq("a" -> rnd.nextBoolean())
        case 1 => Seq("b" -> rnd.nextBoolean())
        case 2 => Seq("a" -> rnd.nextBoolean(), "b" -> rnd.nextBoolean())
      }
      val ordering = ordering0 :+ ("id" -> true) // unique tie-break
      val df = rows
        .map(r => (r.key.orNull, r.a.map(Int.box).orNull, r.b.orNull, r.id))
        .toDF("key", "a", "b", "id")
        .select(col("key"), col("a").cast("int").as("a"), col("b"), col("id"))
        .repartition(1 + rnd.nextInt(6))

      val got = TopKPerKey
        .perKey(df, Seq("key"), ordering, k)
        .collect()
        .map(r =>
          (Option(r.get(r.fieldIndex("key"))).map(_.toString),
           r.getLong(r.fieldIndex("id")),
           r.getInt(r.fieldIndex("rank")))
        )
        .toSet

      // reference: Spark null ordering — asc nulls FIRST, desc nulls LAST
      def cmpOpt[T](x: Option[T], y: Option[T], asc: Boolean)(implicit ord: Ordering[T]): Int =
        (x, y) match {
          case (None, None) => 0
          case (None, _) => if (asc) -1 else 1
          case (_, None) => if (asc) 1 else -1
          case (Some(xv), Some(yv)) => if (asc) ord.compare(xv, yv) else ord.compare(yv, xv)
        }
      val rowOrd = new Ordering[Row0] {
        def compare(x: Row0, y: Row0): Int = {
          ordering0.foreach { case (f, asc) =>
            val c =
              if (f == "a") cmpOpt(x.a, y.a, asc)
              else cmpOpt(x.b, y.b, asc)
            if (c != 0) return c
          }
          java.lang.Long.compare(x.id, y.id)
        }
      }
      val want = rows
        .groupBy(_.key)
        .flatMap { case (key, g) =>
          g.sorted(rowOrd).take(k).zipWithIndex.map { case (r, i) => (key, r.id, i + 1) }
        }
        .toSet

      assert(
        got == want,
        s"config #$ci k=$k ordering=$ordering: extra=${(got -- want).take(4)} missing=${(want -- got).take(4)}"
      )
    }
  }
}
