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
    * again. Two CONCURRENT invocations of the SAME query in ONE session
    * are detected by the per-slot generation guard (round 12): the loser's
    * frame fails loudly on consumption instead of silently racing. */
  private val slots: java.util.Map[
      org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[
        String, java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap())

  /** Per-(sessionUUID, slot) generation counters for the concurrent-use
    * guard. Keyed by plain strings (no session pinning; bounded by the
    * number of distinct slots); readable from GUARD tasks so a superseded
    * frame fails loudly instead of surfacing Spark's block-not-found. In
    * local mode (the battery) guard tasks see this map directly; on a
    * multi-JVM cluster executors see an empty map and the guard
    * deliberately no-ops (consumption then fails with Spark's own missing-
    * checkpoint error — the guard narrows the failure, never widens it). */
  private val gens =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def assertCurrent(key: String, gen: Long): Unit = {
    val cur = gens.get(key)
    if (cur != null && cur.longValue != gen)
      throw new IllegalStateException(
        s"checkpoint slot '$key' generation $gen was superseded by " +
          s"generation $cur: a concurrent re-invocation of the same query " +
          "released this result's blocks — consume each invocation's " +
          "result before re-invoking (Checkpoints.supersede)")
  }

  /** Register `df` as slot `slot`'s live checkpoint for session `s`,
    * releasing whatever the slot previously held. Returns `df` wrapped in
    * a GENERATION GUARD (round 12): consuming a frame whose slot has since
    * been superseded by a re-invocation fails loudly with the remedy in
    * the message — the guard runs before the checkpoint scan in every
    * task, so the clear error wins over the block-not-found the released
    * blocks would otherwise produce. */
  def supersede(s: org.apache.spark.sql.SparkSession, slot: String,
      df: DataFrame): DataFrame = {
    val rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow] =
      df.queryExecution.analyzed match {
        case lr: LogicalRDD => lr.rdd
        case _ => null // nothing releasable at the root; slot still advances
      }
    // identityHashCode distinguishes sessions well enough for a guard key
    // (collisions only blur WHICH session superseded, never miss a bump)
    val key = Integer.toHexString(System.identityHashCode(s)) + "/" + slot
    // bump the generation BEFORE releasing the previous blocks, so a
    // stale frame's guard observes the new generation no later than the
    // blocks disappear
    val gen = gens.merge(key, 1L, (a, b) => a + b).longValue
    val m = slots.synchronized {
      slots.computeIfAbsent(s, _ =>
        new java.util.concurrent.ConcurrentHashMap[
          String, java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]())
    }
    Option(m.put(slot, new java.lang.ref.WeakReference(rdd)))
      .flatMap(r => Option(r.get()))
      .foreach(_.unpersist(blocking = false))
    if (rdd == null) df
    else org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
      s, new GuardedCheckpointRDD(rdd, key, gen), df.schema)
  }
}

/** Pass-through RDD over a localCheckpoint's rows that asserts its slot
  * generation is still current BEFORE pulling the parent iterator — the
  * deterministic loud path for the concurrent same-slot race
  * ([[Checkpoints.supersede]]). Narrow, partition-preserving, no
  * serialization change (InternalRow in, InternalRow out). */
private[graft] class GuardedCheckpointRDD(
    parent: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
    key: String,
    gen: Long)
    extends org.apache.spark.rdd.RDD[
      org.apache.spark.sql.catalyst.InternalRow](parent) {

  override def getPartitions: Array[org.apache.spark.Partition] =
    firstParent[org.apache.spark.sql.catalyst.InternalRow].partitions

  override def compute(
      split: org.apache.spark.Partition,
      context: org.apache.spark.TaskContext)
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    Checkpoints.assertCurrent(key, gen)
    firstParent[org.apache.spark.sql.catalyst.InternalRow]
      .iterator(split, context)
  }
}
