package graft

import org.scalatest.funsuite.AnyFunSuite

/** The six rows-only queries (no DuckDB oracle by declared design —
  * engine-specific sketches/buckets) get their determinism evidence here:
  * identical canonical output under different shuffle partitionings. The
  * oracle-checked battery gets this for free from the hash compare; these
  * rows otherwise only have the driver's row-count check. */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("rows-only queries are partitioning-independent") {
    val noOracle = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .toSeq.sorted
    assert(noOracle.nonEmpty)
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
