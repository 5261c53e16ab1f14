package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** H9 — streaming approximate distinct per event-time window: HyperLogLog
  * registers as keyed `flatMapGroupsWithState` state (the streaming
  * counterpart of `d08_approx_distinct`).
  *
  * An exact streaming distinct needs state proportional to the number of
  * distinct values per window — unbounded on an open feed of user ids /
  * URLs / tokens. Here each window's state is one fixed 2^P-register HLL
  * sketch (P=9 → 512 bytes): per micro-batch the batch's pre-hashed
  * values fold into the registers (register-wise max — the mergeable-
  * summaries rule, so arrival order and batch boundaries cannot change
  * the state), and the estimate is the standard bias-corrected harmonic
  * mean (Flajolet et al., AOFA 2007) with the small-range linear-counting
  * correction. Relative error ≈ 1.04/√512 ≈ 4.6%.
  *
  * The value is hashed with `xxhash64` IN THE PLAN (before the stateful
  * operator), so a batch ground-truth can reproduce the registers
  * bit-for-bit with the same column expression — StreamingSpec asserts
  * exact register equality, not just estimate proximity.
  *
  * State is evicted by event-time timeout `ttl` past each window's last
  * activity (same anchoring rule as the H5 accumulator: the window's own
  * max event time, floored by the watermark); the timeout emits the
  * window's sketch once more with `finalized = true` — the at-most-once
  * "window closed" row — and removes the state, so live state is bounded
  * by the number of ACTIVE windows regardless of stream length.
  */
object ApproxDistinct {

  val P: Int = 9
  val M: Int = 1 << P

  /** `ts_w` keeps the watermarked column's name so the event-time
    * metadata survives into the grouped Dataset (EventTimeTimeout's
    * analysis check requires it). */
  case class HashedEvent(win_start_us: Long, h: Long, ts_w: java.sql.Timestamp)

  case class WindowEstimate(
      win_start_us: Long,
      n_events: Long,
      estimate: Long,
      registers: Array[Byte],
      finalized: Boolean)

  /** Register fold for one 64-bit hash: bucket = top P bits, rho = leading
    * zeros of the rest + 1. Shared verbatim by the spec's batch truth. */
  def fold(regs: Array[Byte], h: Long): Unit = {
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rho = if (w == 0) 65 - P else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  /** Bias-corrected estimate with the small-range linear-counting branch. */
  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1 + 1.079 / M)
    val e = alpha * M.toDouble * M.toDouble / sum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else e
    math.round(corrected)
  }

  def distinctPerWindow(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDur: String = "1 hour",
      lateness: String = "10 minutes",
      stateTtlMinutes: Long = 30): Dataset[WindowEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttl = stateTtlMinutes * 60000L
    events
      .withColumn("ts_w", col(tsCol))
      .withWatermark("ts_w", lateness)
      .select(
        unix_micros(window(col("ts_w"), windowDur).getField("start"))
          .as("win_start_us"),
        xxhash64(col(valueCol)).as("h"),
        col("ts_w"))
      .as[HashedEvent]
      .groupByKey(_.win_start_us)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout())(update(ttl))
  }

  private[streaming] def update(ttlMs: Long)(
      win: Long,
      events: Iterator[HashedEvent],
      state: GroupState[WindowEstimate]): Iterator[WindowEstimate] = {
    if (state.hasTimedOut) {
      // window idle past the TTL: emit the closing row, drop the state
      val fin = state.get.copy(finalized = true)
      state.remove()
      return Iterator.single(fin)
    }
    val prev = state.getOption
    val regs = prev.map(_.registers.clone).getOrElse(new Array[Byte](M))
    var n = prev.map(_.n_events).getOrElse(0L)
    var maxMs = 0L
    events.foreach { e =>
      fold(regs, e.h)
      n += 1
      if (e.ts_w != null && e.ts_w.getTime > maxMs) maxMs = e.ts_w.getTime
    }
    val out = WindowEstimate(win, n, estimate(regs), regs, finalized = false)
    state.update(out)
    // same anchoring rule (and rationale) as SpanStream.updateRunStatus
    val anchor = math.max(maxMs, state.getCurrentWatermarkMs())
    if (anchor > 0) state.setTimeoutTimestamp(anchor + ttlMs)
    Iterator.single(out)
  }
}
