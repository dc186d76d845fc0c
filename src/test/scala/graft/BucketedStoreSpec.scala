package graft

import graft.sinks.BucketedStore
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the write-once/join-many layout for
  * fact-fact joins. The assertions are about the PLAN — the join of two
  * same-bucketed tables must contain no shuffle exchange at all.
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables join with zero shuffle exchange") {
    val li = Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, Sf).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    BucketedStore.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    BucketedStore.writeBucketed(o, "b_orders", "l_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
      val joined = BucketedStore
        .coLocatedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // correctness: equals the plain (shuffling) join
      val want = li
        .join(o, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("qty"))
        .orderBy("l_orderkey")
        .as[(Long, Double)]
        .collect()
        .toSeq
      val got = joined.orderBy("l_orderkey").as[(Long, Double)].collect().toSeq
      assert(got == want && got.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucket-key aggregation also skips the shuffle") {
    val agg = BucketedStore
      .read(spark, "b_lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"bucketed agg still shuffles:\n$plan")
  }
}
