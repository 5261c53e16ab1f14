package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sinks.Bucketing

/** The bucketed-layout contract on the PHYSICAL plan: joins and
  * aggregations on the bucket key run shuffle-free, and results match the
  * unbucketed baseline exactly. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withForcedSmj[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val tables: Unit = {
    val facts = (1 to 1000).map(i => (i.toLong % 97, i.toLong, s"f$i"))
      .toDF("k", "seq", "payload")
    val dims = (0L until 97L).map(k => (k, s"dim$k")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", "k", buckets = 4)
    Bucketing.writeBucketed(dims, "b_dims", "k", buckets = 4)
  }

  test("same-key join of co-bucketed tables plans with zero exchanges") {
    tables
    withForcedSmj {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = executed(joined)
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 1000)
      // spot-check content against a recomputed baseline
      val got = joined.filter($"seq" === 5L).select($"name").head().getString(0)
      assert(got == "dim5")
    }
  }

  test("aggregation on the bucket key plans shuffle-free") {
    tables
    val agg = spark.table("b_facts").groupBy($"k").agg(count(lit(1)).as("n"))
    assert(!executed(agg).contains("Exchange"), executed(agg))
    val m = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 97 && m(1L) == 11L && m(96L) == 10L)
  }

  test("join on a NON-bucket column still shuffles (the layout is the win)") {
    tables
    withForcedSmj {
      val byOther = spark.table("b_facts").as("a")
        .join(spark.table("b_facts").as("b"), $"a.seq" === $"b.seq")
      assert(executed(byOther).contains("Exchange"))
    }
  }
}
