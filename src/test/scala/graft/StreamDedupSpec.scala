package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamDedup

/** H11 streaming incremental near-dup candidates
  * ([[graft.streaming.StreamDedup]]): batch parity, cross-batch pairing,
  * bucket-cap eviction, and redelivery tolerance. */
class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again!"),
    (2L, "completely different content about spark query engines at scale"),
    (3L, "the quick brown fox jumps over the lazy dog again and again"),
    (4L, "le chat noir dort dans la maison pres de la fenetre tranquille"))

  private def runBatches(name: String, batches: Seq[Seq[(Long, String)]],
      cap: Int = 32): Set[(Long, Long)] = {
    val mem = MemoryStream[(Long, String)]
    // stateTtlMinutes = 0 (NoTimeout): a registered processing-time
    // timeout makes the engine schedule no-data batches forever under
    // processAllAvailable — see the operator's scaladoc
    val out = StreamDedup.candidateStream(
      mem.toDF().toDF("doc_id", "text"), bucketCap = cap,
      stateTtlMinutes = 0)
    val q = out.writeStream.format("memory").outputMode("append")
      .queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
  }

  test("streaming candidates match the batch generator across batches") {
    val streamed = runBatches("sd_parity",
      Seq(corpus.take(2), corpus.drop(2)))
    val batch = graft.llm.Dedup.minHashCandidates(
      corpus.toDF("doc_id", "text"), "doc_id", "text")
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    // the near-dup family {0,1,3} must be among the candidates
    assert(batch.contains((0L, 3L)) && batch.contains((0L, 1L)))
  }

  test("bucket cap evicts oldest: transitive pair is missed, not wrong") {
    val t = "identical text for every copy of this document body here"
    val streamed = runBatches("sd_cap",
      Seq(Seq((1L, t)), Seq((2L, t)), Seq((3L, t))), cap = 1)
    assert(streamed.contains((1L, 2L)) && streamed.contains((2L, 3L)))
    assert(!streamed.contains((1L, 3L)), "evicted doc must not pair")
  }

  test("redelivered docs do not re-pair or self-pair") {
    val t = "identical text for every copy of this document body here"
    val streamed = runBatches("sd_redeliver",
      Seq(Seq((1L, t)), Seq((2L, t)), Seq((2L, t), (1L, t))))
    assert(streamed == Set((1L, 2L)))
  }

  private def runVerified(name: String, batches: Seq[Seq[(Long, String)]],
      threshold: Double = 0.5): Set[(Long, Long, Double)] = {
    val mem = MemoryStream[(Long, String)]
    val out = StreamDedup.verifiedStream(
      mem.toDF().toDF("doc_id", "text"), threshold = threshold,
      stateTtlMinutes = 0)
    val q = out.writeStream.format("memory").outputMode("append")
      .queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally q.stop()
  }

  // doc 1 is a WORD-level near-dup (not the "!"-variant of `corpus`, whose
  // md5 signature is identical to doc 0's on all 64 components): its
  // deterministic signature estimate vs docs 0/3 is 35/64 = 0.546875 —
  // above the 0.5 threshold, visibly below 1.0
  private val vCorpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox leaps over the sleepy cat again and again"),
    (2L, "completely different content about spark query engines at scale"),
    (3L, "the quick brown fox jumps over the lazy dog again and again"),
    (4L, "le chat noir dort dans la maison pres de la fenetre tranquille"))

  test("H13 verified stream matches the batch signature-verified tier") {
    val streamed = runVerified("sd_verified",
      Seq(vCorpus.take(2), vCorpus.drop(2)))
    val batch = graft.llm.Dedup.signatureVerifiedPairs(
      vCorpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // per-band re-emission collapses under Set; estimates are the SAME
    // md5 signatures on both sides, so the parity is bit-for-bit
    assert(streamed == batch)
    // exact copies estimate 1.0; the word-level near-dup scores below 1
    // but above threshold; the unrelated docs never verify
    assert(streamed.contains((0L, 3L, 1.0)))
    assert(streamed.exists(p => p._1 == 0L && p._2 == 1L &&
      p._3 < 1.0 && p._3 >= 0.5))
    assert(!streamed.exists(p => p._1 == 2L || p._2 == 2L ||
      p._1 == 4L || p._2 == 4L))
  }

  test("H13 verified stream drops sub-threshold collisions at ingest") {
    // same family as above but a high threshold: only exact copies verify
    val streamed = runVerified("sd_verified_thresh",
      Seq(vCorpus.take(2), vCorpus.drop(2)), threshold = 0.999)
    assert(streamed.map(p => (p._1, p._2)) == Set((0L, 3L)))
  }

  test("RocksDB + changelog checkpointing (the production state store) " +
      "emits identical pairs to the in-memory provider") {
    // BASELINE Session-16 measured this config's throughput (the 64×
    // maintenance dip recovers only with changelog checkpointing ON);
    // this pins its CORRECTNESS: the store swap changes no results, for
    // both the H11 candidate stream and the H13 verified stream.
    // providerClass is read from the session conf at query start, so the
    // shared test session can switch per-query; restored in finally.
    val pKey = "spark.sql.streaming.stateStore.providerClass"
    val cKey = "spark.sql.streaming.stateStore.rocksdb" +
      ".changelogCheckpointing.enabled"
    val prev = spark.conf.getOption(pKey)
    spark.conf.set(pKey,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    spark.conf.set(cKey, "true")
    try {
      val cand = runBatches("sd_rocks_cand",
        Seq(corpus.take(2), corpus.drop(2)))
      val candMem = graft.llm.Dedup.minHashCandidates(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
        .select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cand == candMem,
        "RocksDB candidate pairs diverged from the batch generator")
      val verified = runVerified("sd_rocks_ver",
        Seq(vCorpus.take(2), vCorpus.drop(2)))
      val verMem = graft.llm.Dedup.signatureVerifiedPairs(
        vCorpus.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(verified == verMem,
        "RocksDB verified pairs diverged from the batch tier")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(pKey, v)
        case None => spark.conf.unset(pKey)
      }
      spark.conf.unset(cKey)
    }
  }
}
