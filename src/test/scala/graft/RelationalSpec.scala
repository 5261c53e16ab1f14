package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** Edge-semantics pins for the D-group reshaping/session operators — the
  * cases the sf0.01 oracle data may not exercise but the oracle SQL's
  * formulation assumes. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: boundary gaps merge, strictly-greater gaps split") {
    // Spark merges TOUCHING session windows: an event at exactly
    // last + gap still joins the session; only a strictly greater gap
    // splits. The DuckDB oracle's island formulation must therefore flag
    // a new session on ts > prev + gap (NOT >=) — this pin caught it.
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:59:59.999999"), 1.0), // < gap → merges
      (1L, ts("2024-01-01 01:59:59.999999"), 1.0), // chain extends
      (2L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, ts("2024-01-01 01:00:00"), 1.0), // exactly gap → still merges
      (2L, ts("2024-01-01 02:00:00.000001"), 1.0) // 1µs past gap → NEW
    ).toDF("user_id", "ts", "value")
    val out = Relational.sessionize(events, "1 hour")
      .select(col("user_id"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(out == List((1L, 3L), (2L, 1L), (2L, 2L)))
  }

  test("pivotCounts: absent combos come back 0, matching COUNT FILTER") {
    val events = Seq(
      (0L, "click"), (0L, "click"), (0L, "view"),
      (1L, "view") // bucket 1 has no clicks at all
    ).toDF("user_id", "event_type")
    val out = Relational.pivotCounts(events,
      col("user_id").as("user_bucket"), "event_type", Seq("click", "view"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(0L -> ((2L, 1L)), 1L -> ((0L, 1L))))
  }

  test("window ntile/percent_rank: single-row partition yields 0.0 ranks") {
    // min orders-per-customer in the fixture is 1 — the oracle relies on
    // both engines defining percent_rank = 0 (not NULL/NaN) when n = 1
    val one = Seq((10L, 5L, 100.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val r = one.select(
      ntile(4).over(w).as("q"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd")).head()
    assert(r.getInt(0) == 1 && r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0)
  }
}
