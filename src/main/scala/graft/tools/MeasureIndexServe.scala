package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** One-off build/serve split for the two PERSISTED dedup index tiers
  * (shingle postings vs md5-MinHash bands) on a scale-audit shard dir:
  * build each index once (bucketed parquet write), then time serve-only
  * passes (median of 3) answering the 10% increment from the stored
  * tables. Not part of the battery; results recorded in BASELINE.md
  * (session-12/14 amortization tables). Usage:
  *   sbt "runMain graft.tools.MeasureIndexServe /tmp/scaleaudit/sf1.6"
  */
object MeasureIndexServe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Long): Double = {
      val ts = (1 to 3).map(_ => time(f)).sorted
      ts(1)
    }

    val buildSh = time {
      graft.sinks.Bucketing.writeBucketed(
        graft.llm.Dedup.buildPostingIndex(base, "doc_id", "text", n = 3),
        "ms_posting_index", "sh", buckets = 32)
    }
    val serveSh = median3 {
      graft.llm.Dedup.incrementalDedupFromIndex(
        spark.table("ms_posting_index"), batch, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleFreq = Some(1000))
        .queryExecution.toRdd.count()
    }
    val buildBand = time {
      val (bands, feats) = graft.llm.Dedup.buildBandIndex(base, "doc_id", "text")
      graft.sinks.Bucketing.writeBucketed(bands, "ms_band_index", "band_key", 32)
      graft.sinks.Bucketing.writeBucketed(feats, "ms_band_feats", "doc_b", 32)
    }
    val serveBand = median3 {
      graft.llm.Dedup.incrementalDedupFromBandIndex(
        spark.table("ms_band_index"), spark.table("ms_band_feats"),
        batch, "doc_id", "text")
        .queryExecution.toRdd.count()
    }
    println(f"$dir shingle: build=$buildSh%.2f serve=$serveSh%.2f | " +
      f"band: build=$buildBand%.2f serve=$serveBand%.2f")
    spark.stop()
  }
}
