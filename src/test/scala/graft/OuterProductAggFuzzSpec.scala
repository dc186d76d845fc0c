package graft

import graft.functions.OuterProductSumAgg
import org.apache.spark.sql.functions._

/** Generative drill for the native outer-product accumulator (the OPQ
  * training statistic M = Σ x·yᵀ). Vectors hold small INTEGER values as
  * doubles, so every product and partial sum is exact in IEEE double and
  * the comparison is bit-for-bit even under random partitioning — the
  * drill exercises the buffer, the cross-partition serde, and the merge,
  * with NULL vector rows skipped.
  */
class OuterProductAggFuzzSpec extends SparkSpec {

  test("4 random datasets: outer_product_sum == plain fold, exact") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x0f0L)

    (1 to 4).foreach { ci =>
      val dim = Vector(3, 5, 8)(rnd.nextInt(3))
      def vec(): Array[Double] = Array.fill(dim)(rnd.nextInt(17).toDouble - 8)
      val rows = Vector.tabulate(300) { _ =>
        if (rnd.nextInt(12) == 0) (null, null)
        else (vec(), vec())
      }
      val df = rows
        .map { case (x, y) => (Option(x).map(_.toSeq).orNull, Option(y).map(_.toSeq).orNull) }
        .toDF("x", "y")
        .repartition(1 + rnd.nextInt(8))

      val got = df
        .agg(OuterProductSumAgg.outerProductSum(col("x"), col("y"), dim).as("m"))
        .collect()(0)
        .getSeq[Double](0)
        .toVector

      val want = {
        val m = new Array[Double](dim * dim)
        rows.foreach {
          case (null, _) | (_, null) => ()
          case (x, y) =>
            for (a <- 0 until dim; b <- 0 until dim) m(a * dim + b) += x(a) * y(b)
        }
        m.toVector
      }
      assert(got == want, s"dataset #$ci dim=$dim: ${got.take(4)} != ${want.take(4)}")
    }
  }
}
