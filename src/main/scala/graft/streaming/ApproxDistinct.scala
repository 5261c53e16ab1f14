package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** H9 — streaming approximate distinct per event-time window: HyperLogLog
  * registers as keyed `flatMapGroupsWithState` state (the streaming
  * counterpart of the batch `approx_count_distinct` surface that
  * `d08_approx_error_gate` oracle-checks).
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
  * State is evicted by event-time timeout anchored at the WINDOW END
  * (floored by the watermark — Spark requires timeouts strictly beyond
  * it), with the TTL floored at the allowed lateness. Those two choices
  * make the `finalized = true` closing row genuinely final: every event
  * of window W has ts < W.end, so when the timeout fires the watermark
  * is ≥ W.end + max(ttl, lateness), which means any further W event is
  * inadmissibly late and is dropped BEFORE the stateful operator — the
  * evicted window can never be resurrected with empty registers (and the
  * window-end anchor is constant, so a batch of older events can never
  * pull an already-set timeout earlier). Live state stays bounded by the
  * number of ACTIVE windows regardless of stream length.
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

  private def intervalMs(s: String): Long = {
    val i = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(i.months == 0, s"calendar-month intervals not supported: $s")
    i.days * 86400000L + i.microseconds / 1000L
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
    // TTL floored at the lateness: a shorter TTL would finalize windows
    // that admissible events can still reach (see the class doc)
    val ttl = math.max(stateTtlMinutes * 60000L, intervalMs(lateness))
    val winDurMs = intervalMs(windowDur)
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
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout())(update(ttl, winDurMs))
  }

  private[streaming] def update(ttlMs: Long, winDurMs: Long)(
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
    events.foreach { e =>
      fold(regs, e.h)
      n += 1
    }
    val out = WindowEstimate(win, n, estimate(regs), regs, finalized = false)
    state.update(out)
    // anchor at the window END (constant per key, ≥ every event the window
    // can ever contain), floored by the watermark for legality
    val winEndMs = win / 1000L + winDurMs
    val anchor = math.max(winEndMs, state.getCurrentWatermarkMs())
    state.setTimeoutTimestamp(anchor + ttlMs)
    Iterator.single(out)
  }
}
