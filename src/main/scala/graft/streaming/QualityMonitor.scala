package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** H10 — continuous data-quality monitoring: the batch expectation audit
  * (`queries.LlmOps.expectations`) run as a watermarked streaming
  * aggregate, so a corrupted upstream feed trips within one window
  * instead of at the next batch audit.
  *
  * Every check is a scan-level predicate folded into ONE windowed
  * aggregate as a conditional sum — N checks cost zero extra passes and
  * no extra state; state is one row per (window), TTL-bounded by the
  * watermark like any event-time window. Emitted rows are append-mode
  * final (post-watermark), so a downstream alerting sink sees each
  * window exactly once.
  */
object QualityMonitor {

  /** Per-window violation counts. `checks` = (name, violation predicate);
    * output columns: window, n_rows, one violation-count column per
    * check. Works identically on a static DataFrame (stream/batch parity
    * is the spec's gate). */
  def monitor(
      events: DataFrame,
      timeCol: String,
      windowLen: String = "1 minute",
      lateness: String = "10 minutes",
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val sums = checks.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    }
    val in = if (events.isStreaming) events.withWatermark(timeCol, lateness)
      else events
    in.groupBy(window(col(timeCol), windowLen))
      .agg(count(lit(1)).as("n_rows"), sums: _*)
  }

  /** The fixture-schema checks used by the spec: null user, non-positive
    * value, unknown event type. */
  def eventChecks: Seq[(String, Column)] = Seq(
    ("null_user", col("user_id").isNull),
    ("bad_value", col("value").isNotNull && col("value") < 0),
    ("unknown_type", !col("event_type").isin("view", "cart", "purchase")))
}
