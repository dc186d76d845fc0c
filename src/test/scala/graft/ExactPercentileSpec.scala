package graft

import graft.functions.ExactPercentileAgg.exactPercentile
import org.apache.spark.sql.functions._

/** Bit-equality drill for the native exact-percentile aggregate against
  * Spark's built-in `percentile` — the contract that lets every exact
  * percentile/boxplot/mad/quartile entry swap in the primitive-buffer
  * implementation without moving a single oracle-hashed output bit.
  * Covers: random multisets with heavy duplication (exercising the
  * equal-keys branch), negative values and ±0.0, nulls skipped, single
  * values, grouped aggregation with per-group interpolation, scalar and
  * array forms, and random partitioning (cross-partition merge + serde).
  */
class ExactPercentileSpec extends SparkSpec {

  private val ladders: Seq[Seq[Double]] =
    Seq(Seq(0.5), Seq(0.25, 0.5, 0.75), Seq(0.0, 0.01, 0.5, 0.9, 0.99, 1.0))

  test("random multisets: exact_percentile == percentile, bit-for-bit (global)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x18aL)
    (1 to 6).foreach { ci =>
      val n = 1 + rnd.nextInt(400)
      // small integer grid /4 → many exact duplicates; a few nulls
      val rows = Vector.tabulate(n) { _ =>
        if (rnd.nextInt(11) == 0) None
        else Some((rnd.nextInt(41) - 20).toDouble / 4.0 * (if (rnd.nextBoolean()) 1 else -1))
      }
      val df = rows.toDF("v").repartition(1 + rnd.nextInt(7))
      ladders.foreach { ps =>
        val got = df.agg(exactPercentile(col("v"), ps)).collect()(0)
        val want = df.agg(percentile(col("v"), lit(ps.toArray))).collect()(0)
        assert(
          got.getSeq[Double](0).map(java.lang.Double.doubleToLongBits) ==
            want.getSeq[Double](0).map(java.lang.Double.doubleToLongBits),
          s"case $ci ps=$ps: got ${got.getSeq[Double](0)} want ${want.getSeq[Double](0)}"
        )
      }
      // scalar form
      val gs = df.agg(exactPercentile(col("v"), 0.37)).collect()(0).getDouble(0)
      val ws = df.agg(percentile(col("v"), lit(0.37))).collect()(0).getDouble(0)
      assert(java.lang.Double.doubleToLongBits(gs) == java.lang.Double.doubleToLongBits(ws))
    }
  }

  test("grouped: per-group arrays match the built-in, including 1-row groups") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x18bL)
    val rows = Vector.tabulate(500) { i =>
      val g = s"g${rnd.nextInt(7)}"
      if (rnd.nextInt(13) == 0) (g, None) else (g, Some(rnd.nextDouble() * 100 - 50))
    } :+ (("lonely", Some(42.0)))
    val df = rows.toDF("g", "v").repartition(5)
    val ps = Seq(0.25, 0.5, 0.75)
    val got = df.groupBy("g").agg(exactPercentile(col("v"), ps).as("q")).collect()
      .map(r => r.getString(0) -> Option(r.getSeq[Double](1)).map(_.map(java.lang.Double.doubleToLongBits))).toMap
    val want = df.groupBy("g").agg(percentile(col("v"), lit(ps.toArray)).as("q")).collect()
      .map(r => r.getString(0) -> Option(r.getSeq[Double](1)).map(_.map(java.lang.Double.doubleToLongBits))).toMap
    assert(got == want)
  }

  test("edge cases: ±0.0 ordering, all-null group → null, single value, long child cast") {
    val s = spark
    import s.implicits._
    val df0 = Seq(-0.0, 0.0, -0.0, 0.0, 1.0).toDF("v")
    Seq(0.0, 0.2, 0.25, 0.5, 0.75, 1.0).foreach { p =>
      val g = df0.agg(exactPercentile(col("v"), p)).collect()(0).getDouble(0)
      val w = df0.agg(percentile(col("v"), lit(p))).collect()(0).getDouble(0)
      assert(java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(w), s"p=$p")
    }
    val dfNull = Seq[Option[Double]](None, None).toDF("v")
    assert(dfNull.agg(exactPercentile(col("v"), Seq(0.5))).collect()(0).isNullAt(0))
    assert(dfNull.agg(percentile(col("v"), lit(Array(0.5)))).collect()(0).isNullAt(0))
    val one = Seq(3.25).toDF("v")
    assert(one.agg(exactPercentile(col("v"), Seq(0.0, 0.5, 1.0))).collect()(0)
      .getSeq[Double](0) == Seq(3.25, 3.25, 3.25))
    // long child: the helper casts to double; built-in keeps longs and
    // converts at interpolation — results must agree at these magnitudes
    val dl = Seq(1L, 2L, 5L, 100L, 7L).toDF("v")
    val gl = dl.agg(exactPercentile(col("v"), Seq(0.3, 0.5, 0.77))).collect()(0).getSeq[Double](0)
    val wl = dl.agg(percentile(col("v"), lit(Array(0.3, 0.5, 0.77)))).collect()(0).getSeq[Double](0)
    assert(gl.map(java.lang.Double.doubleToLongBits) == wl.map(java.lang.Double.doubleToLongBits))
  }
}
