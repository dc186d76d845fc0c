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
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25,
      checkpointEvery: Int = 5
  ): DataFrame = {
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = edges
      .select(col("src").as("node"))
      .distinct()
      .withColumn("lbl", col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // Each node adopts min(own label, neighbors' labels).
      val proposed = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("lbl"))
        .union(labels)
        .groupBy("node")
        .agg(min("lbl").as("lbl"))
      val next =
        (if ((iter + 1) % checkpointEvery == 0) proposed.localCheckpoint() else proposed)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = next
        .withColumnRenamed("lbl", "new_lbl")
        .join(labels, "node")
        .filter(col("new_lbl") =!= col("lbl"))
        .count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("node"), col("lbl").as("component"))
  }
}
