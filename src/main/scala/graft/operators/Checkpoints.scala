package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative localCheckpoint loops.
  *
  * `Dataset.localCheckpoint()` caches the materialized rows as RDD blocks
  * in the block manager, and `Dataset.unpersist()` does NOT release them
  * (it only clears CacheManager entries, and checkpoint caching happens a
  * level below). A loop that checkpoints per round therefore pins
  * O(rounds × |V|) of blocks until the driver GCs the RDD references —
  * on a long-lived session that is storage-quota leakage, not memory
  * safety. The checkpointed RDD is reachable from the frame's analyzed
  * plan (the `LogicalRDD` leaf the checkpoint rewrote it to), so the
  * blocks can be dropped eagerly the moment a successor round has
  * materialized.
  */
private[graft] object Checkpoints {

  /** Release the block-manager storage behind a localCheckpoint-ed frame.
    * Safe to call only once every downstream consumer has either finished
    * or been re-checkpointed — i.e. the standard loop shape
    * `val prev = state; state = step(state).localCheckpoint();
    * Checkpoints.release(prev)` (the new eager checkpoint materialized
    * BEFORE the release).
    *
    * Deliberately acts only when the frame's ROOT is the checkpoint leaf
    * (what `localCheckpoint()` returns): walking an arbitrary derived plan
    * would also unpersist any SHARED checkpoint leaves it references
    * (e.g. a loop's static edge table), and a localCheckpoint RDD whose
    * blocks are dropped cannot recompute — its lineage is truncated by
    * design. No-op on anything else. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** Per-(session, slot) registry for checkpoints that live until the NEXT
    * invocation of the same query supersedes them (the recursive-SQL
    * queries hand a checkpointed input to a lazily-consumed result, so
    * they cannot release in a try/finally). Keyed weakly by SparkSession,
    * holding only a WEAK reference to the checkpoint's root RDD — storing
    * the DataFrame itself would strongly reach the session through
    * `Dataset.sparkSession` and pin the WeakHashMap key forever (the
    * round-10 leak). One session's supersede can never release an RDD
    * belonging to another session's context; a closed session's entries
    * vanish; and an RDD the caller has dropped gets its blocks reclaimed
    * by Spark's ContextCleaner on GC even if the slot never supersedes
    * again. Remaining caveat, documented at the call sites: two CONCURRENT
    * invocations of the SAME query in ONE session still race — consume the
    * returned frame before re-invoking. */
  private val slots: java.util.Map[
      org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[
        String, java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap())

  /** Register `df` as slot `slot`'s live checkpoint for session `s`,
    * releasing whatever the slot previously held. Returns `df`. */
  def supersede(s: org.apache.spark.sql.SparkSession, slot: String,
      df: DataFrame): DataFrame = {
    val rdd: org.apache.spark.rdd.RDD[_] = df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd
      case _ => null // nothing releasable at the root; slot still advances
    }
    val m = slots.synchronized {
      slots.computeIfAbsent(s, _ =>
        new java.util.concurrent.ConcurrentHashMap[
          String, java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]())
    }
    Option(m.put(slot, new java.lang.ref.WeakReference(rdd)))
      .flatMap(r => Option(r.get()))
      .foreach(_.unpersist(blocking = false))
    df
  }
}
