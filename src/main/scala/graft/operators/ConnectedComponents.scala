package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the graph
  * half of end-to-end fuzzy deduplication (near-dup PAIRS are not yet a
  * dedup decision: transitive chains a~b~c must collapse into ONE keep
  * set, which is exactly a connected-components problem).
  *
  * Each iteration joins the current labels across the edge set and keeps
  * the per-node minimum — O(component diameter) iterations, each one
  * shuffle-join + one shuffle-aggregate. Near-dup graphs are sparse with
  * tiny diameters (clusters are near-cliques), so this converges in a
  * handful of rounds; for adversarial long-chain graphs at extreme scale
  * the large-star/small-star contraction is the upgrade path, same API.
  */
object ConnectedComponents {

  /** Labels every node (single `id` column) with the minimum node id
    * reachable through `pairs` (columns `doc_a`, `doc_b`). Returns
    * (id, component). */
  def minLabel(nodes: DataFrame, pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // localCheckpoint everywhere: an iterative fixpoint otherwise grows
    // the logical plan by one join+aggregate per round, so analysis time
    // (and recovery lineage) compounds — the checkpoint pins each round to
    // a cached RDD scan. It also materializes the (possibly expensive)
    // pair-generation upstream exactly once.
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionAll(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .localCheckpoint()
    // seed with nodes ∪ edge endpoints: an endpoint missing from `nodes`
    // would otherwise never contribute its own id as a label candidate AND
    // would enter a round with a null prev, silently ending the fixpoint
    // one round early with wrong components
    var labels = nodes.select(col("id"))
      .unionByName(edges.select(col("u").as("id")))
      .distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val viaNeighbors = edges.join(labels, col("v") === col("id"))
        .select(col("u").as("id"), col("component"))
      // the node's own previous label rides through the aggregate (self
      // rows tagged), so the convergence probe is a filter over the
      // checkpointed round — one shuffle job per round, not two
      val round = labels.select(col("id"), col("component"), lit(true).as("self"))
        .unionByName(viaNeighbors.withColumn("self", lit(false)))
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"),
          min(when(col("self"), col("component"))).as("prev"))
        .localCheckpoint() // eager: materializes the round
      changed = round.filter(col("component") < col("prev")).count()
      labels = round.select(col("id"), col("component"))
      i += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters iterations " +
          "(component diameter exceeds the cap — raise maxIters or use a " +
          "star-contraction variant)")
    labels
  }
}
