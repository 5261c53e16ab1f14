package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** H11 — streaming incremental near-dup candidate detection: MinHash-LSH
  * band buckets as bounded stream state (EXT; the live variant of the
  * batch `i2_minhash_lsh_candidates` / `i1_bloom_reference_dedup` flow —
  * an ingest pipeline flags a new document's near-duplicates the moment
  * it arrives, instead of re-running batch dedup over the full corpus).
  *
  * Plan shape: the signature + band hashes are computed IN the streaming
  * plan (same expressions as the batch candidate generator, so the two
  * agree bucket-for-bucket — StreamDedupSpec pins parity), then
  * `flatMapGroupsWithState` keyed by (band_idx, band_hash) holds at most
  * `bucketCap` doc ids per bucket. A new arrival emits a candidate pair
  * against every stored id in any shared bucket.
  *
  * State bounds, both load-bearing on an unbounded feed: `bucketCap`
  * bounds each bucket (oldest evicted first — a popular bucket is
  * boilerplate anyway), and a processing-time TTL drops buckets idle past
  * `stateTtlMinutes` entirely. Consequences, documented honestly: a pair
  * whose older member was evicted is MISSED (the batch pass remains the
  * completeness backstop), a pair sharing several bands is emitted once
  * per shared band, and redelivered docs re-pair at-least-once — all
  * standard for streaming candidate generation; downstream dedups by
  * (doc_a, doc_b) and exact-verifies.
  */
object StreamDedup {

  case class BandRow(doc_id: Long, band_idx: Int, band_hash: Int)
  case class CandidatePair(doc_a: Long, doc_b: Long, band_idx: Int)
  case class BucketState(docs: List[Long]) // oldest first

  /** Candidate pairs over a stream of (doc_id, text). `stateTtlMinutes`
    * 0 disables the processing-time TTL (NoTimeout) — REQUIRED under
    * test harnesses that drive the query with `processAllAvailable`:
    * with a registered timeout the engine keeps scheduling no-data
    * micro-batches to fire it, and the drain call chases them forever. A
    * production trigger interval does not have that problem. */
  def candidateStream(
      docs: DataFrame,
      shingleN: Int = 5,
      k: Int = 64,
      nBands: Int = 16,
      bucketCap: Int = 32,
      stateTtlMinutes: Long = 60): Dataset[CandidatePair] = {
    require(k % nBands == 0, s"k=$k must divide into nBands=$nBands")
    require(bucketCap >= 1, s"bad bucketCap: $bucketCap")
    require(stateTtlMinutes >= 0, s"bad stateTtlMinutes: $stateTtlMinutes")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = k / nBands
    val sig = graft.llm.Dedup.minHashSignature(
      graft.llm.Dedup.charShingles(col("text"), shingleN), k)
    docs
      .select(col("doc_id").cast("long").as("doc_id"), sig.as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(nBands - 1)),
          j => hash(concat_ws(",", slice(col("sig"), j * r + 1, lit(r))), j)))
          .as(Seq("band_idx", "band_hash")))
      .as[BandRow]
      .groupByKey(b => (b.band_idx, b.band_hash))
      .flatMapGroupsWithState(
        OutputMode.Append,
        if (stateTtlMinutes > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout())(
        updateBucket(bucketCap, stateTtlMinutes * 60000L))
  }

  private[streaming] def updateBucket(cap: Int, ttlMs: Long)(
      key: (Int, Int),
      rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[CandidatePair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var stored = state.getOption.map(_.docs).getOrElse(Nil)
    // sort new arrivals so same-batch pairing is deterministic regardless
    // of task-internal row order
    val newDocs = rows.map(_.doc_id).toArray.distinct.sorted
    val out = Vector.newBuilder[CandidatePair]
    newDocs.foreach { d =>
      if (!stored.contains(d)) { // redelivery: already-known ids re-pair nothing
        stored.foreach { s =>
          out += CandidatePair(math.min(s, d), math.max(s, d), key._1)
        }
        stored = stored :+ d
      }
    }
    if (stored.length > cap) stored = stored.takeRight(cap)
    state.update(BucketState(stored))
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.result().iterator
  }
}
