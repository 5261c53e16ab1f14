package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (EXT row I8; no
  * reference-repo counterpart) — the graph-cohesion filter of
  * crawl-corpus curation: nodes outside the k-core are weakly embedded
  * (spam rings, isolated boilerplate families thin out first), and the
  * core is where link-authority priors like PageRank are trustworthy.
  *
  * Synchronous peeling: every round deletes ALL nodes whose degree among
  * currently-alive nodes is < k, simultaneously. The fixpoint is the
  * k-core (Seidman 1983); synchronous rounds make the iteration
  * DETERMINISTIC and engine-reproducible — and because peeling is
  * IDEMPOTENT at the fixpoint, an oracle that unrolls MORE rounds than
  * convergence needs computes the identical set, so one fixed-depth
  * DuckDB CTE chain checks the true-convergence engine result at every
  * scale factor.
  *
  * Scale design: the symmetric edge table is repartitioned by `u` ONCE
  * and localCheckpoint-ed; each round's degree count then reuses that
  * partitioning (no per-round edge shuffle — the same trick as the
  * PageRank loop). The alive set starts at |V| and only shrinks; joins
  * against it stay AQE-broadcastable in the common case and degrade to
  * co-partitioned shuffles when |V| is huge. Rounds are O(diameter of
  * the peel cascade), each a fixed small job; the loop localCheckpoints
  * the alive set to truncate lineage, and a `maxRounds` guard turns a
  * runaway cascade into an explicit error instead of an endless job
  * chain.
  */
object KCore {

  /** Nodes of the `k`-core of the undirected graph given as unique
    * `a < b` edge pairs, with each node's within-core degree. */
  def core(edges: DataFrame, k: Int, maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"bad k: $k")
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("u"))
      .localCheckpoint() // one shuffle serves every round's degree count
    var alive = sym.select(col("u")).distinct().localCheckpoint()
    var n = alive.count()
    var rounds = 0
    while (true) {
      if (rounds >= maxRounds) {
        throw new IllegalStateException(
          s"k-core peeling did not converge in $maxRounds rounds " +
            s"($n nodes still alive) — raise maxRounds")
      }
      // degrees among currently-alive nodes; survivors keep their degree
      val survivors = sym
        .join(alive, "u")
        .join(alive.select(col("u").as("v")), "v")
        .groupBy(col("u"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .localCheckpoint()
      val m = survivors.count()
      if (m == n) {
        // fixpoint: nothing was peeled, so `deg` was computed among the
        // final core itself — it IS the within-core degree
        return survivors.select(col("u").as("node"), col("deg").as("core_degree"))
      }
      alive = survivors.select(col("u"))
      n = m
      rounds += 1
    }
    throw new IllegalStateException("unreachable")
  }
}
