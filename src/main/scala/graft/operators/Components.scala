package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge

/** Connected components over a pair graph — the step that turns near-dup
  * PAIRS (MinHash/SimHash/PPJoin output) into dedup CLUSTERS with one
  * surviving canonical document each.
  *
  * Algorithm: iterative min-label propagation (the HashToMin family,
  * Rastogi et al. ICDE'13): every node starts labeled with itself; each
  * round a node takes the minimum label among itself and its neighbors;
  * fixpoint when no label changes. Each round is one join + one
  * hash-aggregate — both shuffle on node id — and the round count is the
  * cluster diameter, which for near-dup graphs is tiny (duplicates of one
  * document form near-cliques). The driver loop carries only the converged
  * flag, never data.
  *
  * Checkpointing: each round's label table is materialized eagerly to
  * truncate lineage (without it Catalyst re-optimizes a strictly larger
  * plan every round and iteration time balloons). Two modes:
  *
  *  - default: in-memory/local-disk blocks (localCheckpoint semantics, via
  *    [[PlanBridge.materialize]] so round N−1's blocks are released the
  *    moment round N exists — bounded memory at any round count). Blocks
  *    live on executors only: an executor loss kills the job.
  *  - `checkpointDir = Some(dir)`: every round spills to parquet under
  *    `dir` and reads back — durable, fault-tolerant lineage truncation
  *    for real-cluster deployments (the job survives executor loss;
  *    earlier-round files are deleted as soon as the next round lands).
  */
object Components {

  /** (node, component) for every node appearing in `pairs`, where
    * component = the minimum node id reachable through the pair graph.
    * Deterministic; survivors are the rows with node == component.
    *
    * Convergence is detected from the exact decimal SUM of labels (labels
    * only ever decrease, so an unchanged sum over the fixed node set ⟺
    * fixpoint) — one single-stage aggregate per round instead of a join
    * against the previous labels.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    // The sum-of-labels convergence test needs numeric labels (a string
    // id casts to null and null==null would read as instant convergence).
    // Hash string ids to longs first (xxhash64) — the standard move at
    // scale anyway.
    Seq(aCol, bCol).foreach { c =>
      require(
        pairs.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"connectedComponents requires numeric node ids; '$c' is ${pairs.schema(c).dataType.catalogString} — hash string ids first"
      )
    }
    val spark = pairs.sparkSession
    val fs: Option[(org.apache.hadoop.fs.FileSystem, String)] = checkpointDir.map { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), dir)
    }
    // One checkpoint step: (materialized frame, release handle for the
    // PREVIOUS round's storage — blocks or parquet files).
    def step(df: DataFrame, round: Int): (DataFrame, () => Unit) = fs match {
      case Some((hfs, dir)) =>
        val path = s"$dir/round_$round"
        df.write.mode("overwrite").parquet(path)
        (spark.read.parquet(path), () => { hfs.delete(new org.apache.hadoop.fs.Path(path), true); () })
      case None =>
        val m = PlanBridge.materialize(df)
        (m.df, () => m.unpersist())
    }

    // Checkpoint the edge list too: it cuts the (potentially expensive)
    // upstream candidate-generation plan out of every round.
    val (edges0, releaseEdges) = step(
      pairs
        .select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst"))),
      round = -1
    )

    // Size the iteration's parallelism to the MATERIALIZED graph, not the
    // upstream fact table: near-dup pair graphs are orders of magnitude
    // smaller than their corpus, and every propagation round schedules a
    // task per partition — 32-way rounds over a few hundred edges are pure
    // scheduling overhead. One partition per ~500k edges, capped at the
    // inherited width (so a genuinely huge graph keeps full parallelism).
    val nEdges = edges0.count()
    val parts = math.max(1, math.min(edges0.rdd.getNumPartitions, (nEdges / 500000L).toInt + 1))
    // No second checkpoint: re-running the (tiny) repartition shuffle from
    // the checkpointed edges each round is cheaper than holding a second
    // materialized copy of the edge list alive.
    val edges =
      if (parts < edges0.rdd.getNumPartitions) edges0.repartition(parts, col("dst"))
      else edges0

    var (labels, releaseLabels) = step(
      edges
        .select(col("src").as("node"))
        .distinct()
        .withColumn("lbl", col("node")),
      round = 0
    )

    var prevSum: java.math.BigDecimal = null
    var converged = labels.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // Each node adopts min(own label, neighbors' labels).
      val (next, releaseNext) = step(
        edges
          .join(labels.withColumnRenamed("node", "dst"), "dst")
          .select(col("src").as("node"), col("lbl"))
          .union(labels)
          .groupBy("node")
          .agg(min("lbl").as("lbl")),
        round = iter + 1
      )
      val s = next.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
      converged = s == prevSum
      prevSum = s
      // Round N is materialized — release round N−1's blocks/files now, so
      // storage stays at two rounds' worth regardless of iteration count.
      releaseLabels()
      labels = next
      releaseLabels = releaseNext
      iter += 1
    }
    releaseEdges()
    // Partially-propagated labels are silently WRONG clusters — refuse
    // them. Diameter > maxIter means the caller must raise the budget.
    require(
      converged,
      s"connectedComponents did not converge in $maxIter rounds (component diameter exceeds maxIter) — raise maxIter"
    )
    labels.select(col("node"), col("lbl").as("component"))
  }
}
