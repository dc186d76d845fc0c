package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // The generated-class cache defaults to 100 entries — a 453-query
      // warm-up pass evicts every early key's codegen classes before its
      // timed run, so those keys pay compile+interpret again WHEN timed
      // (the r12 "ANN regression": ann_graph_build 3.66→7.28 s with zero
      // code changes — half-warm runs, not a real slowdown). Size the
      // cache to hold the whole suite so warm-up actually warms.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional subset run (scale experiments): comma-separated key
    // substrings. A filtered run records to bench_filtered.json so the
    // full-suite record in bench_full.json (the box-load guard baseline
    // and the round diff source) is never overwritten by a subset.
    val filterPats = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.split(",").toSeq)
    val recordPath = if (filterPats.isDefined) "bench_filtered.json" else "bench_full.json"
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => filterPats.forall(_.exists(name.contains)) }
      .sortBy(_._1)
    // The timing action materializes the query's OWN plan — every output
    // column, every ordering — by counting its InternalRow RDD. A plain
    // df.count() builds a NEW count-aggregate plan over the query, and
    // Catalyst then prunes everything the count doesn't need: unreferenced
    // aggregate expressions, final left joins against by-key aggregates,
    // global sorts — under-measuring output-materializing operators by
    // orders of magnitude (text_dup_spans_excise: 0.75 s counted vs
    // 127.8 s materialized at 100x, the r11 finding). toRdd executes the
    // same optimized plan a write would, without collecting rows to the
    // driver.
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }
    // Warm-up pass: JIT + codegen compilation + parquet footer caches, so
    // the timed pass measures steady-state query cost.
    ordered.foreach { case (_, fn) =>
      try force(fn(spark, sfDir))
      catch { case _: Throwable => () }
    }
    // Cumulative stop-the-world GC time across all collectors — read
    // around each sample so a GC-poisoned environment (heap pressure,
    // co-tenant memory steal) is machine-visible in the artifact instead
    // of a forensic guess (the r16 driver-vs-committed 3-7x cluster sat
    // on allocation-heavy keys with no way to tell GC from plan).
    def gcMs(): Long = {
      val it = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
      var t = 0L
      while (it.hasNext) { val v = it.next().getCollectionTime; if (v > 0) t += v }
      t
    }
    // Returns (wall seconds — negative on failure, gc seconds).
    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
      val g0 = gcMs()
      val t0 = System.nanoTime()
      val ok =
        try { force(fn(spark, sfDir)); true }
        catch { case _: Throwable => false }
      // Operators that persist intermediates (shingle tables) own their
      // lineage, not their cache lifecycle — drop cached blocks between
      // queries so the suite's memory footprint stays per-query.
      spark.catalog.clearCache()
      // A failed query is reported as NEGATIVE time-to-failure so the
      // bench JSON distinguishes failures from passes.
      val dt = (System.nanoTime() - t0) / 1e9
      val gdt = (gcMs() - g0) / 1e3
      (if (ok) dt else -dt, gdt)
    }
    // Previous recorded per-query times (bench_full.json from the last
    // run), used as the box-load guard baseline below.
    val prev: Map[String, Double] =
      try {
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get("bench_full.json"))
        """"([A-Za-z0-9_]+)":(-?\d+(?:\.\d+)?)""".r
          .findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .toMap
      } catch { case _: Throwable => Map.empty }
    // Every key is timed THREE times and the min recorded — one UNIFORM
    // policy for every key, no threshold-gated retries. History of the
    // policy: single runs landed at the half-warm JIT level (r12's
    // phantom "ANN regression"); min-of-two fixed that but r15 bolted on
    // a threshold-gated third pass for inflated keys, which reintroduced
    // the methodology inconsistency the min-of-two comment itself banned
    // (near-threshold keys best-of-two, inflated keys best-of-three —
    // selectively biasing exactly the judged keys). r16: min-of-three
    // for EVERYONE, and all three samples published (bench_variance
    // .json + band stats in the record) so the sampling policy and the
    // box's noise band are auditable instead of arguable. A REAL
    // slowdown reproduces in all three runs; the policy cannot hide one.
    //
    // r17: the three samples are taken as three INTERLEAVED FULL SWEEPS
    // of the suite (sweep 1 = every key once, then sweep 2, then 3) —
    // NOT back-to-back per key. Back-to-back triples share whatever
    // minutes-scale environment state surrounds the key (the r16
    // driver-record cluster: 3-7x inflation with TIGHT triples on a
    // contiguous stretch of allocation-heavy keys — three co-located
    // samples can't decorrelate sustained contention). Sweeping spaces a
    // key's samples by a full suite pass (~minutes), so a poisoned
    // stretch poisons at most one sample per key and min-of-three
    // recovers; per-sweep wall+GC totals in the record show WHICH sweep
    // was hit.
    val sweeps: Seq[(Seq[(String, (Double, Double))], Double, Double)] = (0 until 3).map { _ =>
      val g0 = gcMs()
      val t0 = System.nanoTime()
      val one = ordered.map { case (name, fn) => name -> timeOne(fn) }
      (one, (System.nanoTime() - t0) / 1e9, (gcMs() - g0) / 1e3)
    }
    val byKey: Seq[Map[String, (Double, Double)]] = sweeps.map(_._1.toMap)
    val samples: Seq[(String, Seq[Double])] = ordered.map { case (name, _) =>
      name -> byKey.map(_(name)._1)
    }
    val gcSamples: Map[String, Seq[Double]] = ordered.map { case (name, _) =>
      name -> byKey.map(_(name)._2)
    }.toMap
    // min of the passes; if ANY run failed its (negative) time wins, so a
    // flaky key surfaces in the errors list instead of being silently
    // recorded as a clean pass off its lucky runs.
    val results: Map[String, Double] = samples.map { case (n, ts) => n -> ts.min }.toMap
    // Millisecond precision keeps the whole line under the driver's stdout
    // tail capture (full-precision doubles pushed r2's line past it and the
    // per-query map was truncated); the identical JSON also lands in
    // bench_full.json so rounds can diff without scraping stdout.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    // Whole-run load detection: the per-query retry can't fix a run where
    // the box was loaded THROUGHOUT — round 8 recorded ~44 phantom
    // 1.5-2.5x "regressions" in one such run, inflating both the round
    // diff and this guard's own baseline. If >20% of comparable queries
    // still exceed 1.5x their recorded time after retries, that is box
    // load (dozens of simultaneous real regressions don't happen): keep
    // the previous record as the diff base and park the suspect run in
    // bench_loaded.json for inspection.
    // Subset runs compare against a different scale factor's record (the
    // sf1ish experiments), so the guard only judges full-suite runs.
    val comparable =
      if (filterPats.isDefined) Nil
      else results.toSeq.filter { case (k, v) => v > 0 && prev.get(k).exists(_ > 0) }
    val inflated = comparable.count { case (k, v) => v > 1.5 * prev(k) }
    // Two trips: >20% of queries individually inflated, OR the comparable
    // total up >25% (a run where the heavy tail uniformly doubled can stay
    // under the per-query count while the total plainly shows the load).
    val totNew = comparable.map(_._2).sum
    val totPrev = comparable.map { case (k, _) => prev(k) }.sum
    val loadPoisoned = comparable.nonEmpty &&
      (inflated * 5 > comparable.size || (totPrev > 0 && totNew > 1.25 * totPrev))
    val outPath = if (loadPoisoned && filterPats.isEmpty) "bench_loaded.json" else recordPath
    // Per-key noise band across the three samples: rel spread =
    // (max-min)/min of the clean samples. The record carries the band's
    // median/p90/max so round-over-round diffs can be judged against the
    // instrument's OWN resolution; the raw samples land in
    // bench_variance.json for per-key forensics.
    val spreads = samples.collect {
      case (n, ts) if ts.forall(_ > 0) => n -> ((ts.max - ts.min) / ts.min)
    }.sortBy(_._2)
    def pct(p: Double): Double =
      if (spreads.isEmpty) 0.0 else spreads(math.min(spreads.size - 1, (p * spreads.size).toInt))._2
    val band =
      s"""{"median_rel_spread":${f3(pct(0.5))},"p90_rel_spread":${f3(pct(0.9))},"max_rel_spread":${f3(pct(1.0))}}"""
    // r17 shape: each key carries its three wall samples AND the GC
    // seconds observed during each — a key whose slow sample coincides
    // with a GC spike (or a sweep whose gc total jumps) is environment,
    // not plan, and the artifact now says so by itself.
    val varLine = samples.sortBy(_._1).map { case (n, ts) =>
      "\"" + n + "\":{\"t\":[" + ts.map(f3).mkString(",") + "],\"gc\":[" +
        gcSamples(n).map(f3).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(if (filterPats.isDefined) "bench_variance_filtered.json" else "bench_variance.json"),
      varLine + "\n")
    val sweepStats =
      s"""{"wall":[${sweeps.map(s => f3(s._2)).mkString(",")}],"gc":[${sweeps.map(s => f3(s._3)).mkString(",")}]}"""
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","runs":3,"aggregation":"min","sampling":"interleaved_sweeps","sweeps":$sweepStats,"band":$band,"queries":$qs,"errors":$errors,"load_poisoned":$loadPoisoned,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    println(line)
    // The full line outgrew the driver's stdout-tail capture (the record
    // keeps the LAST ~4 KB, so a >4 KB line survives only as a
    // front-truncated, unparseable fragment — BENCH_r06's `parsed: null`).
    // Emit a compact, always-parseable summary LAST: same schema, the
    // per-query map restricted to the slowest 15; the complete map is
    // committed in bench_full.json for per-query diffs across rounds.
    val slow = results.toSeq
      .filter(_._2 >= 0)
      .sortBy { case (name, dt) => (-dt, name) }
      .take(15)
      .map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","runs":3,"aggregation":"min","sampling":"interleaved_sweeps","sweeps":$sweepStats,"band":$band,"n_queries":${results.size},"queries":$slow,"errors":$errors,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
