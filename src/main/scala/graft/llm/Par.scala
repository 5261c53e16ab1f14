package graft.llm

import org.apache.spark.sql.DataFrame

/** Width for compute-barrier repartitions. A `repartition(col)` without an
  * explicit partition count is fair game for AQE partition coalescing, which
  * on byte-tiny inputs collapses the exchange to ONE partition — serializing
  * exactly the per-row kernel work (sketches, signatures, buckets) the
  * barrier exists to parallelize. Pinning the count to the cluster's default
  * parallelism keeps the barrier AQE-proof while still scaling with the
  * cluster, not the data.
  */
object Par {
  def of(df: DataFrame): Int = df.sparkSession.sparkContext.defaultParallelism
}
