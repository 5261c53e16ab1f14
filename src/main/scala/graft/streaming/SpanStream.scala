package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Group H — Structured-Streaming surface over the span JSONL append
  * pattern (SURVEY §2 Group H; the reference is batch-only and papers over
  * flush latency with sleeps, `opentelemetry_helpers.py:534-537` — a
  * watermark models that lateness honestly).
  *
  * The streaming schema reads attribute values as plain strings (Spark's
  * JSON source coerces scalars); streaming aggregations only touch
  * name/time/status columns, so the typed attribute codec is not needed on
  * this path.
  */
object SpanStream {

  /** Streaming-friendly span schema (envelope columns only). */
  val streamSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("context", StructType(Seq(
      StructField("trace_id", StringType),
      StructField("span_id", StringType),
      StructField("trace_state", StringType)))),
    StructField("parent_id", StringType),
    StructField("kind", StringType),
    StructField("start_time", StringType),
    StructField("end_time", StringType),
    StructField("status", StructType(Seq(
      StructField("status_code", StringType),
      StructField("description", StringType)))),
    StructField("attributes", MapType(StringType, StringType))))

  /** H1 — live span tailing: stream-read a directory of span JSONL files. */
  def readSpanStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(streamSchema)
      .json(dir)
      .withColumn("start_ts", to_timestamp(col("start_time")))
      .withColumn("end_ts", to_timestamp(col("end_time")))

  /** H4 — watermarked view: spans arrive when they END (flush delay), so
    * lateness is bounded by the exporter flush interval. */
  def withLateness(spans: DataFrame, lateness: String = "10 minutes"): DataFrame =
    spans.withWatermark("end_ts", lateness)

  /** H2 — tumbling/sliding task-throughput windows: completed task spans
    * per window × status. */
  def taskThroughput(
      spans: DataFrame,
      windowLen: String = "1 minute",
      slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col("end_ts"), windowLen, s)
      case None => window(col("end_ts"), windowLen)
    }
    withLateness(spans)
      .filter(col("name") === "execute-task")
      .groupBy(w, col("status.status_code").as("status_code"))
      .agg(count(lit(1)).as("n_tasks"),
        sum(unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
          .as("total_us"))
  }

  /** H3 — session windows per trace: one session per burst of span arrivals
    * within `gap` of each other. */
  def traceSessions(spans: DataFrame, gap: String = "30 seconds"): DataFrame =
    withLateness(spans)
      .groupBy(session_window(col("end_ts"), gap), col("context.trace_id").as("trace_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("status.status_code") === "ERROR", 1).otherwise(0))
          .as("n_errors"))

  /** H6 — streaming exact dedup: drop re-delivered spans by span id within
    * the watermark (at-least-once exporters re-flush on retry; state for a
    * key is dropped once the watermark passes it, so state size is bounded
    * by the lateness window, not the stream's lifetime — the property that
    * matters on an unbounded 100 TB span feed). */
  def dedupSpans(spans: DataFrame, lateness: String = "10 minutes"): DataFrame =
    withLateness(spans, lateness)
      // dedup keys must be top-level columns; hoist the nested span id
      .withColumn("span_id", col("context.span_id"))
      .dropDuplicatesWithinWatermark("span_id" :: Nil)
      .drop("span_id")

  /** H7 — stream-stream interval join: attach each completed child span to
    * its parent span as both stream in. Both sides carry watermarks and
    * the join condition bounds the child's event time to
    * [parent.end_ts − horizon, parent.end_ts] — children always finish
    * before their parent closes, and no earlier than the parent's horizon
    * — so Spark can evict join state for both sides once the watermark
    * passes; without the range bound the join buffer would grow with the
    * stream's lifetime. Inner join: a child whose parent never arrives
    * (dropped trace) is silently discarded, the honest at-least-once
    * answer. */
  def childParentJoin(
      spans: DataFrame,
      lateness: String = "10 minutes",
      horizon: String = "1 hour"): DataFrame = {
    val children = withLateness(spans, lateness)
      .filter(col("parent_id").isNotNull)
      .select(col("parent_id").as("c_parent"),
        col("context.span_id").as("c_span"),
        col("name").as("c_name"),
        col("end_ts").as("c_end"))
    val parents = withLateness(spans, lateness)
      .select(col("context.span_id").as("p_span"),
        col("name").as("p_name"),
        col("end_ts").as("p_end"))
    children.join(parents,
      col("c_parent") === col("p_span") &&
        col("c_end") >= col("p_end") - expr(s"interval $horizon") &&
        col("c_end") <= col("p_end"))
      .select(col("p_span"), col("p_name"), col("c_span"), col("c_name"),
        (unix_micros(col("p_end")) - unix_micros(col("c_end")))
          .as("drain_us"))
  }

  // ---- H5: stateful per-trace run-status accumulator ----

  case class SpanEvent(
      trace_id: String,
      name: String,
      status_code: String,
      end_time: String,
      // the watermarked event-time column: must flow into the grouped
      // Dataset or the EventTimeTimeout analysis check rejects the query
      end_ts: java.sql.Timestamp)

  case class RunStatus(
      trace_id: String,
      n_tasks: Long,
      n_errors: Long,
      last_end_time: String,
      finished: Boolean)

  /** H5 — `flatMapGroupsWithState` accumulator keyed by trace: counts task
    * spans and errors as they stream in, emits an updated status row per
    * batch, finalizes when the `dag-top-span` end arrives.
    *
    * State is EVICTED by event-time timeout: a trace idle for `stateTtl`
    * past the watermark is dropped (finished or abandoned either way), so
    * state size is bounded by the number of ACTIVE traces — the property
    * that keeps this runnable on an unbounded span feed. A span arriving
    * after its trace was evicted re-opens the trace from zero counts,
    * which is the honest at-least-once answer without unbounded memory. */
  def runStatusStream(
      spans: DataFrame,
      lateness: String = "10 minutes",
      stateTtlMinutes: Long = 30): Dataset[RunStatus] = {
    val spark = spans.sparkSession
    import spark.implicits._
    val ttl = stateTtlMinutes * 60000L
    withLateness(spans, lateness)
      .select(col("context.trace_id").as("trace_id"), col("name"),
        col("status.status_code").as("status_code"), col("end_time"),
        col("end_ts"))
      .as[SpanEvent]
      .groupByKey(_.trace_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout())(
        updateRunStatus(ttl))
  }

  private[streaming] def updateRunStatus(ttlMs: Long)(
      traceId: String,
      events: Iterator[SpanEvent],
      state: GroupState[RunStatus]): Iterator[RunStatus] = {
    if (state.hasTimedOut) {
      // idle past the TTL: drop the state, emit nothing (the last emitted
      // row already carries the final counts)
      state.remove()
      return Iterator.empty
    }
    var s = state.getOption.getOrElse(RunStatus(traceId, 0L, 0L, "", finished = false))
    var maxEventMs = 0L
    events.foreach { e =>
      val isTask = e.name == "execute-task"
      if (e.end_ts != null && e.end_ts.getTime > maxEventMs)
        maxEventMs = e.end_ts.getTime
      s = s.copy(
        n_tasks = s.n_tasks + (if (isTask) 1 else 0),
        n_errors = s.n_errors +
          (if (isTask && e.status_code == "ERROR") 1 else 0),
        last_end_time =
          if (e.end_time != null && e.end_time > s.last_end_time) e.end_time
          else s.last_end_time,
        finished = s.finished || e.name == "dag-top-span")
    }
    state.update(s)
    // TTL anchored to the trace's OWN latest event time (not the watermark,
    // which is still 0 during the first batch and lags by the lateness —
    // anchoring there would evict first-batch traces almost immediately);
    // the watermark max keeps the timestamp legal for very late stragglers
    // (Spark requires a timeout strictly beyond the current watermark).
    // anchor == 0 means every event had a null/unparseable end_ts AND the
    // watermark has not advanced — setting a 1970-anchored timeout would
    // evict this ACTIVE trace the moment any other trace advances the
    // watermark, so skip the timeout this round (reset on the next batch)
    val anchor = math.max(maxEventMs, state.getCurrentWatermarkMs())
    if (anchor > 0) state.setTimeoutTimestamp(anchor + ttlMs)
    Iterator.single(s)
  }
}
