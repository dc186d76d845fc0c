package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** r19 scratch instrument (deleted before the final commit): per-key job
  * timeline — how much of a key's wall time is Spark-job execution vs
  * driver gaps (planning, collects, scheduling) — plus min-of-three wall
  * timing with the bench's own toRdd action. Usage:
  *   runMain graft.ProbeR19 <sfDir> key1,key2,...
  */
object ProbeR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args(1).split(",").toSeq else Seq("ann_ivf_opq_full_build")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Job timeline listener: (start, end) per job id.
    val jobs = scala.collection.concurrent.TrieMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.put(s.jobId, (s.time, 0L))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.updateWith(e.jobId)(_.map { case (s, _) => (s, e.time) })
    })

    def force(df: org.apache.spark.sql.DataFrame): Unit = { df.queryExecution.toRdd.count(); () }

    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      // Warm pass (JIT + codegen + memo artifacts), not reported.
      try force(fn(spark, sfDir))
      catch { case e: Throwable => println(s"[probe] $key warm FAILED: $e") }
      spark.catalog.clearCache()
      val runs = (0 until 3).map { i =>
        jobs.clear()
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val js = jobs.values.toSeq.filter(_._2 > 0).sortBy(_._1)
        val jobSum = js.map { case (s, e) => (e - s) / 1e3 }.sum
        // Serialized span: union of job intervals (overlapping jobs count once).
        val merged = js.foldLeft(List.empty[(Long, Long)]) {
          case (acc @ ((ms, me) :: rest), (s, e)) =>
            if (s <= me) (ms, math.max(me, e)) :: rest else (s, e) :: acc
          case (Nil, j) => List(j)
        }
        val span = merged.map { case (s, e) => (e - s) / 1e3 }.sum
        (wall, js.size, jobSum, span)
      }
      val best = runs.minBy(_._1)
      println(
        f"[probe] $key%-32s wall=${best._1}%6.3f jobs=${best._2}%3d jobSum=${best._3}%6.3f span=${best._4}%6.3f driverGap=${best._1 - best._4}%6.3f  (all walls: ${runs.map(r => f"${r._1}%.3f").mkString(", ")})"
      )
    }
    spark.stop()
  }
}
