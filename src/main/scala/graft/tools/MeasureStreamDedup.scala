package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Throughput measurement for the H13 streaming verified-dedup path
  * ([[graft.streaming.StreamDedup.verifiedStream]]) at fixed state caps —
  * the 64× scale evidence VERDICT r12 item 6 asks for. Not part of the
  * battery; results recorded in BASELINE.md.
  *
  * Protocol: feed the shard's documents through a MemoryStream in
  * `--batch-docs`-sized micro-batches (deterministic doc_id order), state
  * caps fixed (bucketCap 32, no TTL so results are volume-comparable),
  * time the full drain, report docs/s and emitted pairs. Scaling the
  * CORPUS 1×/16×/64× at a fixed batch size scales the number of batches —
  * a state-bounded ingest should hold docs/s roughly FLAT (state per band
  * bucket is capped, so per-batch work tracks batch size, not history);
  * a falling docs/s curve would mean per-arrival cost grows with total
  * ingested volume.
  *
  * Usage:
  *   sbt "runMain graft.tools.MeasureStreamDedup <sfDir> [batchDocs] [rocksdb]"
  *
  * The optional third arg switches the state store to the RocksDB
  * provider — the production choice once total state outgrows what the
  * default in-memory HDFS-backed provider can snapshot per batch (its
  * maintenance cost grows with the number of distinct band buckets, i.e.
  * linearly with ingested volume; RocksDB pays per-CHANGE instead).
  */
object MeasureStreamDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchDocs = args.lift(1).map(_.toInt).getOrElse(500)
    val rocksdb = args.lift(2).contains("rocksdb")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
    if (rocksdb) {
      builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing is the half of the pairing that makes
      // per-commit cost track the BATCH, not total state: without it every
      // commit uploads the changed SST files (grows with store size via
      // compaction — measured 138 docs/s at 64×, BELOW the in-memory
      // provider's 165); with it commits write only the batch's changed
      // entries and snapshot uploads move to async maintenance
      builder.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.queries.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .filter(col("text").isNotNull)
      .as[(Long, String)]
      .collect() // driver feed: the measurement target is the ENGINE's
                 // per-batch cost, so the source must not be the bottleneck
      .sortBy(_._1)
    val batches = docs.grouped(batchDocs).toSeq
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamDedup.verifiedStream(
      mem.toDF().toDF("doc_id", "text"), bucketCap = 32, stateTtlMinutes = 0)
    val q = out.writeStream.format("memory").outputMode("append")
      .queryName("msd_pairs").start()
    try {
      // warm the streaming plan/codegen on the first batch, untimed
      mem.addData(batches.head: _*); q.processAllAvailable()
      val t0 = System.nanoTime()
      batches.tail.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val secs = (System.nanoTime() - t0) / 1e9
      val fed = batches.tail.map(_.length.toLong).sum
      val pairs = spark.table("msd_pairs").count()
      val store = if (rocksdb) "rocksdb" else "memory"
      println(f"$dir store=$store docs=${docs.length}%d batch=$batchDocs%d " +
        f"timed_docs=$fed%d secs=$secs%.2f docs_per_s=${fed / secs}%.0f " +
        f"pairs=$pairs%d")
    } finally q.stop()
    spark.stop()
  }
}
