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

  test("nested applyDelta on a parent-bucketed artifact: only the delta shuffles") {
    // The §5 claim behind Nested.applyDelta ("at 100 TB the artifact is
    // id-bucketed, so the join is bucket-local and the rewrite touches
    // |delta|-many buckets"), proven on the PLAN: against a
    // parent-key-bucketed artifact the applyDelta join drops exactly the
    // artifact-side exchange its unbucketed twin pays — the only shuffles
    // left belong to the delta-sized aggregation/co-partitioning.
    import graft.search.Nested
    val parents = Tables.orders(spark, Sf).select(col("o_orderkey").as("pid"))
    val children = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey").as("cid"), col("l_linenumber").as("line"), col("l_quantity").as("qty"))
    val artifact = Nested.nestedIndex(parents, children, "pid", "cid", "items", Seq("line", "qty"))
    BucketedStore.writeBucketed(artifact, "b_nested_art", "pid", 8)
    val delta = Seq(
      (1L, 1, 99.0, "u"),
      (2L, 1, 0.0, "d"),
      (3L, 9, 7.0, "c")
    ).toDF("cid", "line", "qty", "op")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r.findAllIn(df.queryExecution.executedPlan.toString).length
      val plain = Nested.applyDelta(artifact, delta, "pid", "cid", "items", Seq("line", "qty"))
      val bucketed = Nested.applyDelta(
        BucketedStore.read(spark, "b_nested_art"), delta, "pid", "cid", "items", Seq("line", "qty"))
      assert(exchanges(bucketed) == exchanges(plain) - 1,
        s"bucketed artifact should drop exactly its own exchange: " +
          s"plain=${exchanges(plain)}, bucketed=${exchanges(bucketed)}\n" +
          bucketed.queryExecution.executedPlan.toString)
      // and the maintained artifacts agree row-for-row
      val canon = (df: org.apache.spark.sql.DataFrame) =>
        df.select(col("pid"), to_json(col("items")).as("j")).as[(Long, String)].collect().toMap
      assert(canon(bucketed) == canon(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
