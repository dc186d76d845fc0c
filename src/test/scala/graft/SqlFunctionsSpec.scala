package graft

class SqlFunctionsSpec extends SparkSpec {

  test("registerAll exposes native aggregate and kernels to SQL") {
    GraftFunctions.registerAll(spark)
    val sig = spark
      .sql("SELECT minhash_agg(s, 8) AS sig FROM VALUES ('aa'), ('bb'), ('cc') AS t(s)")
      .head()
      .getSeq[Int](0)
    assert(sig.length == 8)
    // deterministic
    val sig2 = spark
      .sql("SELECT minhash_agg(s, 8) AS sig FROM VALUES ('aa'), ('bb'), ('cc') AS t(s)")
      .head()
      .getSeq[Int](0)
    assert(sig == sig2)

    val cos = spark
      .sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head()
      .getDouble(0)
    assert(cos == 1.0)

    val jac = spark
      .sql("SELECT jaccard_sim(array('a','b'), array('b','c')) AS j")
      .head()
      .getDouble(0)
    assert(math.abs(jac - 1.0 / 3.0) < 1e-12)
  }

  test("minhash_agg signature sketches set overlap") {
    GraftFunctions.registerAll(spark)
    val df = spark.sql(
      """SELECT id, minhash_agg(s, 64) AS sig FROM VALUES
        | (1, 'x'), (1, 'y'), (1, 'z'),
        | (2, 'x'), (2, 'y'), (2, 'z'),
        | (3, 'p'), (3, 'q'), (3, 'r')
        |AS t(id, s) GROUP BY id""".stripMargin
    )
    val sigs = df.collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(sigs(1) == sigs(2)) // identical sets -> identical signatures
    assert(sigs(1) != sigs(3))
  }

  test("outer_product_sum accumulates sum of x·yT across rows and partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),
      (Seq(0.5, -1.0), Seq(2.0, 0.0)),
      (Seq(2.0, 2.0), Seq(-1.0, 1.0))
    )
    // truth[a][b] = sum_i x_i[a] * y_i[b]
    val truth = Array.tabulate(2, 2)((a, b) => rows.map { case (x, y) => x(a) * y(b) }.sum)
    val got = rows
      .toDF("x", "y")
      .repartition(3) // force partial buffers + a merge
      .agg(graft.functions.OuterProductSumAgg.outerProductSum(col("x"), col("y"), 2).as("m"))
      .head()
      .getSeq[Double](0)
    for (a <- 0 until 2; b <- 0 until 2)
      assert(got(a * 2 + b) == truth(a)(b), s"M[$a][$b]: ${got(a * 2 + b)} != ${truth(a)(b)}")
    // analysis-time type check: non-array children are rejected
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1.0, 2.0))
        .toDF("x", "y")
        .agg(graft.functions.OuterProductSumAgg.outerProductSum(col("x"), col("y"), 2))
        .head()
    }
  }

  test("NearestCells kernel: ordering, ties, ragged vectors, edge sizes — codegen and interpreted agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.VectorFns
    val cents = Array(
      Array(0f, 0f), // cell 0
      Array(1f, 0f), // cell 1
      Array(0f, 1f), // cell 2 — same distance from (0.5, 0.5) as cell 1
      Array(9f, 9f)  // cell 3 — far
    )
    def top(v: Array[Float], k: Int): Seq[Int] = {
      val df = Seq(Tuple1(v)).toDF("v")
      val interpreted = df
        .select(graft.functions.VectorFns.nearestCells(col("v"), cents, k).as("c"))
        .head()
        .getSeq[Int](0)
        .toSeq
      // force the row through a whole-stage-codegen projection too (a
      // filter keeps the projection inside codegen)
      val codegen = df
        .filter(lit(true))
        .select(graft.functions.VectorFns.nearestCells(col("v"), cents, k).as("c"))
        .head()
        .getSeq[Int](0)
        .toSeq
      assert(interpreted == codegen, s"codegen/interpreted split on ${v.toSeq}")
      interpreted
    }
    // plain ordering: nearest first
    assert(top(Array(0.9f, 0.1f), 2) == Seq(1, 0))
    // TIE: (0.5, 0.5) is equidistant from cells 1 and 2 — lower index
    // wins, and it also ties cell 0 — full order by (dist, idx)
    assert(top(Array(0.5f, 0.5f), 3) == Seq(0, 1, 2))
    // k > nLists clamps
    assert(top(Array(0f, 0f), 9) == Seq(0, 1, 2, 3))
    // ragged: a 1-dim vector scores against the first dim only
    assert(top(Array(1f), 1) == Seq(1))
    // null vector → null array (never a crash)
    val nullRow = Seq(Tuple1(null.asInstanceOf[Array[Float]]))
      .toDF("v")
      .select(graft.functions.VectorFns.nearestCells(col("v"), cents, 2).as("c"))
      .head()
    assert(nullRow.isNullAt(0))
    // empty centroid set → empty result, not an exception
    val empty = Seq(Tuple1(Array(1f, 2f)))
      .toDF("v")
      .select(graft.functions.VectorFns.nearestCells(col("v"), Array.empty[Array[Float]], 2).as("c"))
      .head()
      .getSeq[Int](0)
    assert(empty.isEmpty)
    // analysis-time type check: non-float arrays rejected
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(Array(1.0, 2.0))).toDF("v").select(graft.functions.VectorFns.nearestCells(col("v"), cents, 1)).head()
    }
  }

  test("native dot_product / l2_sq expressions are bit-identical to the SQL UDF twins") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(0xd07157L)
    // float AND double sides (any combination is legal), ragged lengths,
    // adversarial magnitudes — the parity must be BITWISE (long bits),
    // not within-epsilon: the native kernels claim the exact UDF fold
    val rows = Seq.tabulate(64) { i =>
      val n = 1 + rnd.nextInt(9)
      val a = Array.fill(n)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat)
      val b = Array.fill(1 + rnd.nextInt(9))(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3))
      (i, a, b)
    }
    val df = rows.toDF("i", "af", "bd").cache()
    val native = df
      .select(
        col("i"),
        graft.functions.VectorFns.dot(col("af"), col("bd")).as("dot"),
        graft.functions.VectorFns.l2sq(col("af"), col("bd")).as("l2")
      )
      .collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    df.createOrReplaceTempView("vec_parity")
    val viaUdf = spark
      .sql("""SELECT i, dot_product(CAST(af AS ARRAY<DOUBLE>), bd) AS dot,
             |       l2_sq(CAST(af AS ARRAY<DOUBLE>), bd) AS l2 FROM vec_parity""".stripMargin)
      .collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    rows.foreach { case (i, _, _) =>
      assert(
        java.lang.Double.doubleToLongBits(native(i)._1) == java.lang.Double.doubleToLongBits(viaUdf(i)._1) &&
          java.lang.Double.doubleToLongBits(native(i)._2) == java.lang.Double.doubleToLongBits(viaUdf(i)._2),
        s"row $i: native ${native(i)} != udf ${viaUdf(i)}"
      )
    }
    // null semantics: null if either side is null
    val nr = Seq((Array(1.0f), null.asInstanceOf[Array[Double]]))
      .toDF("a", "b")
      .select(graft.functions.VectorFns.dot(col("a"), col("b")).as("d"), graft.functions.VectorFns.l2sq(col("a"), col("b")).as("l"))
      .head()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
    df.unpersist()
  }
}
