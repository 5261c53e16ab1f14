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
}
