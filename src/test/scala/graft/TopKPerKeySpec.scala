package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("perKey equals the window row_number form on the real corpus") {
    val orders = Tables.orders(spark, Sf)
    val native = TopKPerKey
      .perKey(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        Seq("o_orderpriority"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true),
        3
      )
      .select("o_orderpriority", "o_orderkey", "rank")
      .as[(String, Long, Int)]
      .collect()
      .toSet
    val w = Window.partitionBy("o_orderpriority").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val windowed = orders
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select("o_orderpriority", "o_orderkey", "rank")
      .as[(String, Long, Int)]
      .collect()
      .toSet
    assert(native == windowed)
  }

  test("physical plan is the custom exec with no sort") {
    val df = TopKPerKey.perKey(
      Tables.orders(spark, Sf).select("o_orderpriority", "o_orderkey"),
      Seq("o_orderpriority"),
      Seq("o_orderkey" -> true),
      2
    )
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), plan)
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"), plan)
  }

  test("ties and sparse keys: k larger than group size") {
    val df = Seq((1L, 10), (1L, 20), (2L, 5)).toDF("k", "v")
    val out = TopKPerKey
      .perKey(df, Seq("k"), Seq("v" -> false), 5)
      .orderBy("k", "rank")
      .as[(Long, Int, Int)]
      .collect()
    assert(out.toSeq == Seq((1L, 20, 1), (1L, 10, 2), (2L, 5, 1)))
  }
}
