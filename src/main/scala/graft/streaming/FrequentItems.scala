package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.HeavyHitters

/** H8 — streaming frequent items: Misra–Gries summaries as keyed
  * `mapGroupsWithState` state.
  *
  * The naive streaming formulation — a stateful count per token — grows
  * state with the VOCABULARY, which is unbounded on an open token feed
  * (n-grams, URLs, user agents). Here the state key is a hash BUCKET
  * (`pmod(xxhash64(token), nBuckets)`), and each bucket's state is one
  * bounded ≤k-counter Misra–Gries summary: per micro-batch, the batch's
  * tokens fold into a fresh summary ([[HeavyHitters.summarize]]) that
  * merges into the state ([[HeavyHitters.merge]]) under the mergeable-
  * summaries rule, so total state is nBuckets × k counters FOREVER,
  * independent of vocabulary or stream length.
  *
  * Guarantee carried across batches: merging preserves the Misra–Gries
  * bound, so after any number of batches a bucket's summary still contains
  * every token whose cumulative bucket count exceeds n_bucket/(k+1) —
  * the same superset property the batch operator recounts against
  * (StreamingSpec proves it against exact batch counts).
  *
  * Each update emits the bucket's current summary (token/count arrays
  * sorted for determinism); `n` is the bucket's cumulative token count,
  * monotone per bucket, so downstream consumers can keep the latest row
  * per bucket without relying on sink ordering.
  */
object FrequentItems {

  case class TokenEvent(bucket: Int, token: String)

  case class BucketSummary(
      bucket: Int,
      n: Long,
      tokens: Array[String],
      counts: Array[Long])

  /** The bucket assignment, shared by the stream and any batch
    * ground-truth check: stable across runs and engines' partitioning. */
  def bucketOf(token: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(token), lit(nBuckets)).cast("int")

  def frequentTokensStream(
      tokens: DataFrame,
      tokenCol: String,
      nBuckets: Int = 32,
      k: Int = 64): Dataset[BucketSummary] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens
      .select(bucketOf(col(tokenCol), nBuckets).as("bucket"),
        col(tokenCol).as("token"))
      .as[TokenEvent]
      .groupByKey(_.bucket)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update(k))
  }

  private[streaming] def update(k: Int)(
      bucket: Int,
      events: Iterator[TokenEvent],
      state: GroupState[BucketSummary]): BucketSummary = {
    val (prevMap, prevN) = state.getOption
      .map(s => (s.tokens.zip(s.counts).toMap, s.n))
      .getOrElse((Map.empty[String, Long], 0L))
    val (batchMap, batchN) = HeavyHitters.summarize(events.map(_.token), k)
    val merged = HeavyHitters.merge(prevMap, batchMap, k)
    val toks = merged.keys.toArray.sorted
    val out = BucketSummary(bucket, prevN + batchN, toks, toks.map(merged))
    state.update(out)
    out
  }
}
