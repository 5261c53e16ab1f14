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
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionAll(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .persist()
    var labels = nodes.select(col("id"), col("id").as("component")).persist()
    labels.count()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val viaNeighbors = edges.join(labels, col("v") === col("id"))
        .select(col("u").as("id"), col("component"))
      val next = labels.unionByName(viaNeighbors)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .persist()
      next.count()
      // convergence probe: one small join over the (node-sized) label sets;
      // the loop is driver-controlled like Closure's iterative fixpoint
      changed = next
        .join(labels.withColumnRenamed("component", "prev"), Seq("id"))
        .filter(col("component") =!= col("prev")).count()
      labels.unpersist(blocking = false)
      labels = next
      i += 1
    }
    edges.unpersist(blocking = false)
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters iterations " +
          "(component diameter exceeds the cap — raise maxIters or use a " +
          "star-contraction variant)")
    labels
  }
}
