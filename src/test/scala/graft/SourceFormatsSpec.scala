package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** D1 source-format coverage beyond parquet/JSONL/zip: ORC and CSV
  * round-trips preserve content exactly (CSV through explicit schema +
  * header — the interchange format external corpus drops arrive in). */
class SourceFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("ORC round-trip of a fixture table is content-identical") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val docs = graft.queries.Tables.documents(spark, sf)
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    val a = docs.select(md5(concat_ws("",
      docs.columns.map(c => col(c).cast("string")): _*))).as("h")
      .collect().map(_.getString(0)).sorted.toSeq
    val b = back.select(md5(concat_ws("",
      back.columns.map(c => col(c).cast("string")): _*))).as("h")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("CSV round-trip with explicit schema preserves typed columns") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val orders = graft.queries.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("string").as("o_orderdate"),
        col("o_orderpriority"))
    orders.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(orders.schema)
      .option("header", "true").csv(dir)
    assert(back.count() == orders.count())
    val sumA = orders.agg(sum(col("o_totalprice")).cast("decimal(18,2)"))
      .head().getDecimal(0)
    val sumB = back.agg(sum(col("o_totalprice")).cast("decimal(18,2)"))
      .head().getDecimal(0)
    assert(sumA == sumB)
    val keysA = orders.agg(sum(col("o_orderkey")), max(col("o_orderpriority")))
      .head()
    val keysB = back.agg(sum(col("o_orderkey")), max(col("o_orderpriority")))
      .head()
    assert(keysA == keysB)
  }
}
