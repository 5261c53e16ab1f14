package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.QualityMonitor

/** H10 streaming quality monitor: per-window violation counts are exact,
  * stream/batch parity holds, and append mode emits each finalized window
  * once. */
class QualityMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-03-01 09:$m%02d:$s%02d")

  // three 1-minute windows; known violations per window
  private val rows = Seq(
    // window 09:00: 1 null user, 1 bad value
    (Some("u1"), ts(0, 10), Some(5.0), "view"),
    (None, ts(0, 20), Some(1.0), "cart"),
    (Some("u2"), ts(0, 30), Some(-2.0), "purchase"),
    // window 09:01: clean
    (Some("u3"), ts(1, 15), Some(3.0), "view"),
    (Some("u4"), ts(1, 45), None, "cart"),
    // window 09:02: 1 unknown type
    (Some("u5"), ts(2, 5), Some(9.0), "refund"))

  private def eventsDf = rows.toDF("user_id", "ts", "value", "event_type")

  test("batch monitor counts violations exactly, one aggregate pass") {
    val got = QualityMonitor.monitor(eventsDf, "ts", "1 minute", "10 minutes",
      QualityMonitor.eventChecks)
      .select(col("window.start").cast("string").as("w"), col("n_rows"),
        col("null_user"), col("bad_value"), col("unknown_type"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "2024-03-01 09:00:00" -> ((3L, 1L, 1L, 0L)),
      "2024-03-01 09:01:00" -> ((2L, 0L, 0L, 0L)),
      "2024-03-01 09:02:00" -> ((1L, 0L, 0L, 1L))))
  }

  test("streaming monitor matches the batch result (parity) in complete mode") {
    val dir = Files.createTempDirectory("graft-quality").toString
    eventsDf.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(eventsDf.schema).parquet(dir)
    val q = QualityMonitor.monitor(stream, "ts", "1 minute", "10 minutes",
      QualityMonitor.eventChecks)
      .writeStream.outputMode("complete").format("memory")
      .queryName("quality_c").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("quality_c")
        .select(col("window.start").cast("string"), col("n_rows"),
          col("null_user"), col("bad_value"), col("unknown_type"))
        .collect().map(_.toSeq).toSet
      val batch = QualityMonitor.monitor(eventsDf, "ts", "1 minute",
        "10 minutes", QualityMonitor.eventChecks)
        .select(col("window.start").cast("string"), col("n_rows"),
          col("null_user"), col("bad_value"), col("unknown_type"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch && streamed.size == 3)
    } finally q.stop()
  }

  test("append mode finalizes windows past the watermark exactly once") {
    val dir = Files.createTempDirectory("graft-quality-a").toString
    // first batch: the three windows above
    eventsDf.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(eventsDf.schema).parquet(s"$dir/in")
    val q = QualityMonitor.monitor(stream, "ts", "1 minute", "5 minutes",
      QualityMonitor.eventChecks)
      .writeStream.outputMode("append").format("memory")
      .queryName("quality_a").start()
    try {
      q.processAllAvailable()
      // second batch far ahead advances the watermark past all three
      Seq((Some("zz"), ts(30, 0), Some(1.0), "view"))
        .toDF("user_id", "ts", "value", "event_type")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val finalized = spark.table("quality_a")
        .select(col("window.start").cast("string")).as[String].collect().toSet
      assert(Set("2024-03-01 09:00:00", "2024-03-01 09:01:00",
        "2024-03-01 09:02:00").subsetOf(finalized))
      assert(spark.table("quality_a").groupBy(col("window")).count()
        .filter(col("count") > 1).count() == 0)
    } finally q.stop()
  }
}
