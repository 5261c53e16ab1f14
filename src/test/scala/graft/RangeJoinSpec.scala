package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** The binned range join must agree with the naive residual-condition join
  * on every bucket geometry: pairs inside one bucket, pairs straddling a
  * bucket edge, and pairs exactly `window` apart (inclusive upper bound). */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 30L * 60 * 1000000 // 30 min in micros

  private def events(rows: (Long, Long, Long)*) = // (user, id, offsetMicros)
    rows.toSeq.toDF("user_id", "event_id", "off")
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) + col("off")))
      .drop("off")

  private def naive(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame) =
    a.join(b, col("user_id") === col("b_user") &&
      unix_micros(col("b_ts")) >= unix_micros(col("a_ts")) &&
      unix_micros(col("b_ts")) <= unix_micros(col("a_ts")) + W)

  test("D5 binned range join == naive join incl. bucket edges") {
    val e = events(
      (1L, 1L, 0L), // bucket 0
      (1L, 2L, W / 2), // same bucket as 1
      (1L, 3L, W - 1), // end of bucket, pairs with 1 and 2
      (1L, 4L, W), // exactly window after id 1 — inclusive bound
      (1L, 5L, 3 * W + 7), // far away, pairs with nothing before it
      (2L, 6L, 0L), // other user: never pairs with user 1
      (2L, 7L, W + 1)) // > window after 6 — excluded
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("ts").as("b_ts"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = pairs(graft.operators.RangeJoin
      .within(a, b, "user_id", "b_user", "a_ts", "b_ts", W))
    val expected = pairs(naive(a, b))
    assert(binned == expected)
    // sanity on the fixture itself: inclusive upper bound + self-pairs
    assert(expected.contains((1L, 4L)))
    assert(expected.contains((1L, 1L)))
    assert(!expected.contains((6L, 7L)))
    assert(!expected.exists { case (x, y) => x <= 5 && y >= 6 })
  }

  test("skew-salted join resolves same-named keys on both sides") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "lv")
    val right = Seq((1L, "x"), (3L, "y")).toDF("k", "rv")
    val out = graft.operators.SkewJoin
      .saltedJoin(left, right, "k", "k", buckets = 4)
      .select(col("lv"), col("rv")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "x")))
  }

  test("skew-salted join matches the plain join on a hot-key dataset") {
    // one hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(i => (1L, s"l$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"t$i")))
      .toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("rk", "rv")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("lv"), col("rv")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val plain = rows(left.join(right, col("k") === col("rk")))
    val salted = rows(graft.operators.SkewJoin
      .saltedJoin(left, right, "k", "rk", buckets = 8))
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 900) // the hot key really joined
  }

  test("D5 binned range join emits each pair exactly once") {
    val e = events((1L, 1L, 0L), (1L, 2L, W / 3), (1L, 3L, W + W / 3))
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("ts").as("b_ts"))
    val out = graft.operators.RangeJoin
      .within(a, b, "user_id", "b_user", "a_ts", "b_ts", W)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.size == out.distinct.size, s"duplicated pairs: $out")
  }
}
