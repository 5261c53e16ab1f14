package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** asOfWithin: the staleness bound nulls exactly the too-old matches —
  * boundary inclusive, missing matches stay null, fresh matches intact. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("staleness bound nulls stale matches, keeps boundary-fresh ones") {
    val probes = Seq(
      (1L, "u1", ts(30)), // prior at 10:25 → 5 min old → fresh
      (2L, "u2", ts(30)), // prior at 10:20 → exactly 10 min → fresh (>=)
      (3L, "u3", ts(30)), // prior at 10:05 → 25 min old → stale
      (4L, "u4", ts(30))) // no prior at all
      .toDF("event_id", "user_id", "ts")
    val features = Seq(
      ("u1", ts(25), 100L),
      ("u2", ts(20), 200L),
      ("u3", ts(5), 300L))
      .toDF("user_id", "ts", "feat")
    val got = AsOfJoin.asOfWithin(probes, features, "user_id", "ts", "ts",
      Seq("feat"), expr("INTERVAL 10 MINUTES"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> None, 4L -> None))
  }

  test("among several fresh candidates the latest one wins") {
    val probes = Seq((1L, "u", ts(30))).toDF("event_id", "user_id", "ts")
    val features = Seq(("u", ts(22), 1L), ("u", ts(28), 2L), ("u", ts(31), 3L))
      .toDF("user_id", "ts", "feat")
    val got = AsOfJoin.asOfWithin(probes, features, "user_id", "ts", "ts",
      Seq("feat"), expr("INTERVAL 10 MINUTES")).collect()
    assert(got.head.getLong(3) == 2L) // 10:31 is in the future, 10:28 wins
  }
}
