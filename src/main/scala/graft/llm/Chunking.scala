package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window preparation (SURVEY §2 I7c/I7d): chunking documents into
  * fixed-size token windows and packing variable-length documents into
  * fixed-budget training sequences — the last mile between a curated
  * corpus and a training dataloader.
  */
object Chunking {

  /** Overlapping word-window chunks: chunk i covers words
    * `[i·stride, i·stride + size)`; the last window starts at the final
    * position that still adds new words. Pure column expressions — the
    * windows are SLICED FIRST (a `transform` over the offset sequence)
    * and only then exploded, so each output row carries one ~size-word
    * chunk. Exploding offsets next to the full word array and slicing
    * after would copy the whole document into every chunk row —
    * O(words × chunks) per doc instead of the ~(size/stride)× blow-up
    * the overlap itself costs.
    *
    * Emits (id, chunk_idx, chunk_text, n_chunk_words). Documents shorter
    * than one window yield exactly one chunk (the whole doc); null text
    * yields no rows. */
  def chunkByWords(
      df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"need 1 <= stride <= size, got size=$size stride=$stride")
    val ws = split(col(textCol), " +")
    val n = org.apache.spark.sql.functions.size(ws)
    // number of chunks: 1 + ceil(max(0, n - size) / stride); floor-div via
    // the (x + stride - 1) trick — Spark's `/` is true division
    val nChunks = lit(1L) +
      floor((greatest(n - size, lit(0)) + (stride - 1)).cast("double") / stride)
        .cast("long")
    df.select(col(idCol), posexplode(
      transform(sequence(lit(0L), nChunks - 1),
        i => slice(ws, (i * stride + 1).cast("int"), lit(size))))
      .as(Seq("chunk_idx", "__chunk")))
      // null text: greatest() above swallows the null word count into one
      // offset whose slice is null — drop it (null docs chunk to nothing)
      .filter(col("__chunk").isNotNull)
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", col("__chunk")).as("chunk_text"),
        org.apache.spark.sql.functions.size(col("__chunk")).as("n_chunk_words"))
  }

  /** Greedy best-fit-decreasing sequence packing: within each partition,
    * documents are packed in (token count DESC, id ASC) order into
    * sequences of at most `budget` tokens; a document alone larger than
    * the budget gets its own pack, flagged oversize — and that pack is
    * CLOSED (nothing else can join it, not even a zero-token doc).
    * Packing is a sequential decision, so at scale it runs per-partition
    * (pack ids embed the partition — no coordination after the initial
    * sort); the INVARIANTS (every doc packed exactly once, token totals
    * conserved, no pack over budget except flagged oversize singletons)
    * hold regardless of partitioning and are what the oracle gate checks.
    *
    * Memory/CPU per partition: membership rows STREAM out (nothing
    * buffered per doc); open-pack state is a TreeMap of remaining-budget
    * → pack ids, O(log packs) per doc — a linear scan over an open list
    * would go quadratic on a partition where nothing fits. Pack totals
    * come from one aggregation over the emitted memberships (the
    * scale-correct place for them). Null or negative token counts are
    * rejected loudly — pre-filter them.
    *
    * Emits (id, tokens, pack_id, pack_tokens, oversize). */
  def packGreedy(
      df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"bad token budget: $budget")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol).cast("long"), col(tokensCol).cast("long"))
      .sortWithinPartitions(col(tokensCol).desc, col(idCol).asc)
    val memberSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tokens", LongType, nullable = false),
      StructField("pack_id", StringType, nullable = false)))
    val rdd = in.rdd.mapPartitionsWithIndex { (part, rows) =>
      val byRem = new java.util.TreeMap[Long, java.util.ArrayDeque[Int]]()
      var nextPack = 0
      def open(rem: Long, pid: Int): Unit =
        byRem.computeIfAbsent(rem, _ => new java.util.ArrayDeque[Int]()).push(pid)
      rows.map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          "packGreedy: null id or token count — pre-filter the input")
        val id = r.getLong(0)
        val tok = r.getLong(1)
        require(tok >= 0, s"packGreedy: negative token count $tok for doc $id")
        val fit = byRem.ceilingEntry(tok) // best fit: smallest adequate rem
        val pid =
          if (fit != null) {
            val q = fit.getValue
            val p = q.poll()
            if (q.isEmpty) byRem.remove(fit.getKey)
            open(fit.getKey - tok, p)
            p
          } else {
            val p = nextPack
            nextPack += 1
            if (tok <= budget) open(budget - tok, p) // oversize stays closed
            p
          }
        Row(id, tok, s"p$part-$pid")
      }
    }
    val members = spark.createDataFrame(rdd, memberSchema)
    val totals = members.groupBy(col("pack_id"))
      .agg(sum(col("tokens")).as("pack_tokens"))
    members.join(totals, Seq("pack_id"))
      .select(col("id"), col("tokens"), col("pack_id"), col("pack_tokens"),
        (col("pack_tokens") > budget).as("oversize"))
  }

  /** Concat-and-chunk shard layout: the corpus token stream in `idCol`
    * order, cut into fixed-length training sequences of `seqLen` tokens —
    * the dataloader-facing twin of [[packGreedy]] (packing never splits a
    * document; sharding always fills the sequence, splitting documents at
    * the boundary like GPT-style pretraining loaders).
    *
    * The global token offset of each document is a PREFIX SUM over the id
    * order. A bare `sum over (order by id)` window is a single-partition
    * sort — the classic scale cliff — so it runs two-level: range-bucket
    * the ids (buckets ≈ parallelism, derived from the id span), cumsum
    * WITHIN each bucket in parallel, then cumsum the ~1k bucket totals in
    * one tiny window and broadcast-join the offsets back. Correct for any
    * id distribution; bucket BALANCE follows the id spread (ids are
    * near-contiguous for corpus fixtures — a pathologically clustered id
    * space degrades parallelism, not correctness).
    *
    * Emits one membership row per (sequence, document) overlap:
    * (seq_id, id, tokens, start_in_seq, n_toks) — a document longer than
    * `seqLen` spans several rows. Zero-token documents occupy no stream
    * positions and emit nothing. Null ids/counts are rejected loudly;
    * pre-filter null text upstream. */
  def shardSequences(
      df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long, nBuckets: Int = 1024): DataFrame = {
    require(seqLen >= 1, s"bad sequence length: $seqLen")
    require(nBuckets >= 1, s"bad bucket count: $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val in = df.select(col(idCol).cast("long").as("id"),
      col(tokensCol).cast("long").as("n"))
    val b = in.agg(min(col("id")), max(col("id")), sum(col("n")),
      count(when(col("id").isNull || col("n").isNull || col("n") < 0, 1)))
      .head()
    require(b.getLong(3) == 0,
      "shardSequences: null id/count or negative count — pre-filter the input")
    if (b.isNullAt(0)) return in.limit(0).select(
      lit(0L).as("seq_id"), col("id"), col("n").as("tokens"),
      lit(0L).as("start_in_seq"), lit(0L).as("n_toks"))
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    // ceil-div keeps bucket ids in [0, nBuckets) without overflow on a
    // full-range id span
    val span = math.max(1L, (hi - lo) / nBuckets + 1L)
    val bucketed = in.withColumn("b", ((col("id") - lo) / span).cast("long"))
    val within = bucketed.withColumn("w",
      coalesce(sum(col("n")).over(Window.partitionBy(col("b"))
        .orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    // the battery's ONE allowed empty-key window (PlanBudgetSpec pins the
    // set): its input is the bucket-totals frame — |buckets| ≤ nBuckets
    // rows by construction, never |rows| — so the single-task stage is
    // O(nBuckets) regardless of corpus size (all 8 residual WindowExec
    // warnings in a full Verify run attribute here, round 12)
    val offsets = bucketed.groupBy(col("b")).agg(sum(col("n")).as("bn"))
      .withColumn("off",
        coalesce(sum(col("bn")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("off"))
    val placed = within
      .join(broadcast(offsets), Seq("b"))
      .select(col("id"), col("n"), (col("w") + col("off")).as("start"))
      .filter(col("n") > 0)
    placed
      .select(col("id"), col("n"), col("start"),
        explode(sequence(floor(col("start") / seqLen).cast("long"),
          floor((col("start") + col("n") - 1) / seqLen).cast("long")))
          .as("seq_id"))
      .select(col("seq_id"), col("id"), col("n").as("tokens"),
        (greatest(col("seq_id") * seqLen, col("start")) -
          col("seq_id") * seqLen).as("start_in_seq"),
        (least((col("seq_id") + 1) * seqLen, col("start") + col("n")) -
          greatest(col("seq_id") * seqLen, col("start"))).as("n_toks"))
  }
}
