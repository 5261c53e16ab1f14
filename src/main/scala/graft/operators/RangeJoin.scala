package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval ("range") join (SURVEY §2 D5): pairs of rows sharing a key with
  * the right timestamp inside `[left ts, left ts + window]`.
  *
  * The naive plan — equi-join on the key with the range predicates left as
  * residual conditions — degenerates to an O(n²) per-key comparison inside
  * the sort-merge join: every hot key (a user with millions of events at
  * 100 TB) becomes a quadratic straggler. Binning the time axis at window
  * width and joining on `(key, bucket)` bounds the fan-out: a right row in
  * `[t, t+w]` lies in `bucket(t)` or `bucket(t)+1`, so each left row is
  * duplicated into exactly those two buckets and every candidate pair is
  * produced exactly once (a right row's single bucket matches one of the
  * two). Hot keys are additionally spread across the time axis, so the
  * shuffle partitioning keeps working when a single key is itself huge.
  */
object RangeJoin {

  /** Join `left` and `right` on `leftKey = rightKey` with
    * `right[rightTs] ∈ [left[leftTs], left[leftTs] + windowMicros]`
    * (both ends inclusive). Timestamp columns must be TIMESTAMP type;
    * output contains all columns of both inputs.
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      windowMicros: Long): DataFrame = {
    require(windowMicros > 0, s"window must be positive: $windowMicros")
    val lb = left
      .withColumn("__bkt_base", floor(unix_micros(col(leftTs)) / windowMicros))
      .withColumn("__bkt", explode(array(col("__bkt_base"), col("__bkt_base") + 1)))
      .drop("__bkt_base")
    val rb = right
      .withColumn("__bkt_r", floor(unix_micros(col(rightTs)) / windowMicros))
    lb.join(rb,
        col("__bkt") === col("__bkt_r") &&
          col(leftKey) === col(rightKey) &&
          unix_micros(col(rightTs)) >= unix_micros(col(leftTs)) &&
          unix_micros(col(rightTs)) <= unix_micros(col(leftTs)) + windowMicros)
      .drop("__bkt", "__bkt_r")
  }

  /** Convenience overload taking the window as a Duration. Key and
    * timestamp column names must differ between the two sides (same-name
    * references are ambiguous in a join condition). */
  def within(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      window: java.time.Duration): DataFrame = {
    require(leftKey != rightKey && leftTs != rightTs,
      s"left/right column names must differ: ($leftKey,$rightKey) ($leftTs,$rightTs)")
    within(left, right, leftKey, rightKey, leftTs, rightTs,
      window.toNanos / 1000L)
  }
}
