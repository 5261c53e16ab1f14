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
  * The salt is derived by hashing the whole left row (not `rand()` and not
  * a row-position term), so a retried task salts identically no matter how
  * its input rows are reordered — position-based salts silently lose or
  * duplicate join rows when a shuffle-fetch failure re-runs a map task
  * whose shuffle blocks arrive in a different order. The deliberate cost:
  * rows that are EXACT duplicates (every column equal) share a salt and
  * stay on one reducer. If a hot key's volume comes from verbatim
  * duplicate rows rather than distinct payloads, pre-aggregate them
  * (`groupBy(*).count()`), join, and re-expand — that both restores the
  * fan-out and shrinks the shuffle.
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
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(buckets.toLong)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    // frame-qualified key refs so leftKey == rightKey (natural-join naming)
    // resolves unambiguously instead of AMBIGUOUS_REFERENCE
    l.join(r, l("__salt") === r("__salt") && l(leftKey) === r(rightKey))
      .drop("__salt")
  }
}
