package graft

import org.scalatest.funsuite.AnyFunSuite

/** Rows-only queries (no DuckDB oracle) get their determinism evidence
  * here: identical canonical output under different shuffle
  * partitionings. As of round 11 the set is EMPTY — every query in the
  * battery carries a full hash oracle (the md5/integer-Lloyd
  * derandomizations flipped the last sketch/bucket generators), and the
  * hash compare subsumes this check — so the first assertion now PINS
  * that coverage: a new query landing without an oracle entry fails here
  * and must either get one or be exercised by the partitioning harness
  * below. */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("every query is oracle-checked; any rows-only stragglers are partitioning-independent") {
    val noOracle = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .toSeq.sorted
    assert(noOracle.isEmpty,
      s"rows-only queries reappeared without oracle entries: $noOracle — " +
        "add a DuckDB oracle (preferred) or consciously extend this spec")
    def canon(name: String, parts: String): Seq[String] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    noOracle.foreach { name =>
      val a = canon(name, "4")
      val b = canon(name, "7")
      assert(a == b, s"$name diverges across partitionings")
      assert(a.nonEmpty, s"$name returned no rows at $sf")
    }
  }
}
