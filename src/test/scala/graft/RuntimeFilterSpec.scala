package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime bloom-filter semi-join reduction — the other half of the
  * scale-join story next to bucketing: when a fact-fact join's build side
  * carries a selective filter, Catalyst injects a bloom filter built from
  * the build side's join keys into the PROBE side's scan, so non-matching
  * fact rows die at the scan instead of crossing the shuffle. At 100 TB
  * the exchange is the dominant cost, and this prunes it by the build
  * side's selectivity with one sketch broadcast.
  *
  * The thresholds are lowered here only because the fixture is tiny — at
  * real scale the defaults (10 MB creation side, 10 GB application side)
  * gate injection to exactly the joins where it pays.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, ov) =>
      ov.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("selective build side injects a bloom filter into the probe scan") {
    withConfs(Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val li = graft.queries.Tables.lineitem(spark, sf)
      val urgent = graft.queries.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // build side: bloom_filter_agg over the filtered orders' join keys
      assert(plan.contains("bloom_filter_agg"), plan)
      // probe side: might_contain applied BEFORE the lineitem shuffle
      assert(plan.contains("might_contain"), plan)
      // semantics unchanged: row count matches the uninjected join
      val expected = withConfs(Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")) {
        li.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
      }
      assert(joined.count() == expected && expected > 0)
    }
  }
}
