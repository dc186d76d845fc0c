package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * flag, never data; at 100 TB you add a checkpoint every few rounds to
  * truncate lineage, which `checkpointEvery` does via localCheckpoint.
  */
object Components {

  /** (node, component) for every node appearing in `pairs`, where
    * component = the minimum node id reachable through the pair graph.
    * Deterministic; survivors are the rows with node == component.
    *
    * Two things keep the per-round cost flat: every round's label table is
    * localCheckpoint'ed EAGERLY (truncating both lineage and the logical
    * plan — without it each round re-optimizes a strictly larger plan and
    * iteration time balloons), and convergence is detected from the exact
    * decimal SUM of labels (labels only ever decrease, so an unchanged sum
    * over the fixed node set ⟺ fixpoint) — one single-stage aggregate per
    * round instead of a join against the previous labels.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25
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
    // Checkpoint the edge list too: it cuts the (potentially expensive)
    // upstream candidate-generation plan out of every round.
    val edges0 = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()

    // Size the iteration's parallelism to the MATERIALIZED graph, not the
    // upstream fact table: near-dup pair graphs are orders of magnitude
    // smaller than their corpus, and every propagation round schedules a
    // task per partition — 32-way rounds over a few hundred edges are pure
    // scheduling overhead. One partition per ~500k edges, capped at the
    // inherited width (so a genuinely huge graph keeps full parallelism).
    val nEdges = edges0.count()
    val parts = math.max(1, math.min(edges0.rdd.getNumPartitions, (nEdges / 500000L).toInt + 1))
    // No second checkpoint: re-running the (tiny) repartition shuffle from
    // the checkpointed RDD each round is cheaper than holding a second
    // materialized copy of the edge list alive.
    val edges =
      if (parts < edges0.rdd.getNumPartitions) edges0.repartition(parts, col("dst"))
      else edges0

    var labels = edges
      .select(col("src").as("node"))
      .distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()

    var prevSum: java.math.BigDecimal = null
    var converged = labels.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // Each node adopts min(own label, neighbors' labels).
      val next = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("lbl"))
        .union(labels)
        .groupBy("node")
        .agg(min("lbl").as("lbl"))
        .localCheckpoint()
      val s = next.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    // Partially-propagated labels are silently WRONG clusters — refuse
    // them. Diameter > maxIter means the caller must raise the budget.
    require(
      converged,
      s"connectedComponents did not converge in $maxIter rounds (component diameter exceeds maxIter) — raise maxIter"
    )
    labels.select(col("node"), col("lbl").as("component"))
  }
}
