package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 scale mitigations).
  *
  * A shuffled equi-join sends every row of a key to ONE reducer; a hot key
  * (one user with 1% of 100 TB) turns into a single straggler task. AQE's
  * skew-join split handles this for sort-merge joins it plans itself, but
  * not for pre-shuffled inputs (bucketed tables), streaming micro-batches,
  * or deliberately AQE-pinned exchanges. Salting restores balance
  * explicitly: left rows scatter across `buckets` sub-keys, the (smaller)
  * right side is replicated into every sub-key, and the join runs on
  * `(key, salt)` — hot keys fan out `buckets`-wide at the cost of
  * `buckets`× replication of the right side.
  *
  * The salt is derived by hashing the whole left row PLUS its per-partition
  * row position (not `rand()`): content alone would send identical
  * duplicate rows of a hot key to one salt bucket, silently collapsing the
  * fan-out back into a single straggler. The position term
  * (`monotonically_increasing_id`) is retry-stable for deterministic
  * sources — a re-executed file-scan task re-reads the same split in the
  * same order — which is the same determinism contract Spark's own shuffle
  * retry machinery assumes of its inputs.
  */
object SkewJoin {

  /** Inner equi-join `left[leftKey] = right[rightKey]` with the left side
    * salted `buckets` ways and the right side replicated. Column names must
    * be disjoint apart from the keys; output columns = left ++ right. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val l = left.withColumn("__salt",
      pmod(xxhash64((left.columns.map(col) :+ monotonically_increasing_id()).toSeq: _*),
        lit(buckets.toLong)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    // frame-qualified key refs so leftKey == rightKey (natural-join naming)
    // resolves unambiguously instead of AMBIGUOUS_REFERENCE
    l.join(r, l("__salt") === r("__salt") && l(leftKey) === r(rightKey))
      .drop("__salt")
  }
}
