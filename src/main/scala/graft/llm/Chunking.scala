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
    * position that still adds new words. Pure column expressions (explode
    * over a `sequence` of offsets + `slice`) — no UDF, no shuffle beyond
    * the explode, linear in corpus size.
    *
    * Emits (id, chunk_idx, chunk_text, n_chunk_words). Documents shorter
    * than one window yield exactly one chunk (the whole doc). */
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
    df.select(col(idCol), ws.as("__ws"),
      explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__ws"), (col("chunk_idx") * stride + 1).cast("int"), lit(size))
          .as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", col("__chunk")).as("chunk_text"),
        org.apache.spark.sql.functions.size(col("__chunk")).as("n_chunk_words"))
  }

  /** Greedy first-fit sequence packing: within each partition, documents
    * are packed in (token count DESC, id ASC) order into sequences of at
    * most `budget` tokens; a document alone larger than the budget gets
    * its own pack, flagged oversize. Packing is a sequential decision, so
    * at scale it runs per-partition (pack ids embed the partition — no
    * coordination, no shuffle after the initial sort); the INVARIANTS
    * (every doc packed exactly once, token totals conserved, no pack over
    * budget except flagged singletons) hold regardless of partitioning
    * and are what the oracle gate checks.
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
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tokens", LongType, nullable = false),
      StructField("pack_id", StringType, nullable = false),
      StructField("pack_tokens", LongType, nullable = false),
      StructField("oversize", BooleanType, nullable = false)))
    val rdd = in.rdd.mapPartitionsWithIndex { (part, rows) =>
      // open packs as (remaining budget, pack index, members); first-fit
      // over a small open list bounded by the budget/min-doc ratio
      val packs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Int, scala.collection.mutable.ArrayBuffer[(Long, Long)])]
      var nextPack = 0
      rows.foreach { r =>
        val (id, tok) = (r.getLong(0), r.getLong(1))
        val fit = packs.indexWhere(_._1 >= tok)
        if (fit >= 0) {
          val (rem, pid, members) = packs(fit)
          members += ((id, tok))
          packs(fit) = (rem - tok, pid, members)
        } else {
          val members = scala.collection.mutable.ArrayBuffer((id, tok))
          packs += ((math.max(budget - tok, 0L), nextPack, members))
          nextPack += 1
        }
      }
      packs.iterator.flatMap { case (_, pid, members) =>
        val total = members.map(_._2).sum
        members.map { case (id, tok) =>
          Row(id, tok, s"p$part-$pid", total, total > budget)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
