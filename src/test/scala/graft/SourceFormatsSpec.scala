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

  test("XML round-trip with explicit schema preserves typed columns") {
    // Spark 4 ships the XML datasource natively — the remaining
    // interchange format enterprise corpus drops arrive in. Writer emits
    // string-ish element text, so the read side applies the explicit
    // schema (same discipline as the CSV round-trip).
    val dir = Files.createTempDirectory("graft-xml").toString
    val docs = graft.queries.Tables.documents(spark, sf)
    docs.write.mode("overwrite").format("xml")
      .option("rootTag", "corpus").option("rowTag", "doc").save(dir)
    val back = spark.read.format("xml").option("rowTag", "doc")
      .schema(docs.schema).load(dir)
    assert(back.count() == docs.count())
    val a = docs.select(md5(concat_ws("",
      docs.columns.map(c => col(c).cast("string")): _*)).as("h"))
      .collect().map(_.getString(0)).sorted.toSeq
    val b = back.select(md5(concat_ws("",
      back.columns.map(c => col(c).cast("string")): _*)).as("h"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("range-partitioned layout lets parquet stats skip non-matching files") {
    // 100 TB scan design: a time-series corpus written repartitionByRange
    // on its filter key gives every file a narrow min/max band, so the
    // parquet reader's row-group statistics drop non-matching groups
    // before they reach the scan output. A hash-shuffled layout of the
    // SAME data spreads every time band across every file — row-group
    // stats prune nothing. The scan-node output-row metric measures the
    // difference directly.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val total = ev.count()
    val clusteredDir = Files.createTempDirectory("graft-layout-range").toString
    val shuffledDir = Files.createTempDirectory("graft-layout-hash").toString
    // INT96 (Spark's legacy default) carries no pushdown-usable stats —
    // a 100 TB time-series corpus must be written as TIMESTAMP_MICROS
    // for the skipping below to exist at all
    val tsTypeKey = "spark.sql.parquet.outputTimestampType"
    val prevTsType = spark.conf.get(tsTypeKey)
    try {
      spark.conf.set(tsTypeKey, "TIMESTAMP_MICROS")
      ev.repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
        .write.mode("overwrite").parquet(clusteredDir)
      ev.repartition(8, col("event_id"))
        .write.mode("overwrite").parquet(shuffledDir)
    } finally spark.conf.set(tsTypeKey, prevTsType)
    // a ~10% time slice in the middle of the range (exact quantiles:
    // relativeError 0 — the probe must be deterministic)
    val Array(lo, hi) = ev.withColumn("ts_us", unix_micros(col("ts")))
      .stat.approxQuantile("ts_us", Array(0.45, 0.55), 0.0)
    def scannedRows(dir: String): (Long, Long) = {
      // filter on the RAW column with timestamp literals — a predicate
      // wrapped in a function (e.g. unix_micros(ts) >= x) cannot be
      // pushed to the parquet reader and would skip nothing
      val q = spark.read.parquet(dir)
        .filter(col("ts") >= timestamp_micros(lit(lo.toLong)) &&
          col("ts") < timestamp_micros(lit(hi.toLong)))
      val matching = q.count()
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s }
      assert(scan.nonEmpty, "expected a FileSourceScanExec leaf")
      (scan.map(_.metrics("numOutputRows").value).sum, matching)
    }
    val (clusteredScan, m1) = scannedRows(clusteredDir)
    val (shuffledScan, m2) = scannedRows(shuffledDir)
    assert(m1 == m2 && m1 > 0)
    // clustered: only the 1-2 files whose band intersects the slice emit
    // rows; shuffled: every file's row group intersects, nothing skipped
    assert(clusteredScan <= total / 2,
      s"clustered layout should skip most row groups: $clusteredScan of $total")
    assert(shuffledScan >= (total * 9) / 10,
      s"hash layout should scan ~everything: $shuffledScan of $total")
    assert(clusteredScan < shuffledScan / 2)
  }
}
